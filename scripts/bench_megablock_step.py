"""Full-train-step megablock A/B at the shapes where the block-level kernel
wins: deit64 (257 ragged tokens — the shape whose op table shows 28% pure
data movement, DEIT64_OPTABLE_r03.json) and v2-32px as the control.

Per case: the production scanned train step (make_device_data_train_fn,
device-resident uint8 data) with runtime.megablock off vs on, saved-residual
backward.  Dropout stays at the config default — the megablock's in-kernel
hardware-PRNG dropout path is the production path under test, matching the
reference's always-on dropout (ref:src/v2/utils.py:30).

Usage: python scripts/bench_megablock_step.py [deit64|v2|all]
Writes /tmp/megablock_step_ab.json; timing = sync_timeit (host readback).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from vitgan_tpu import config as C
from vitgan_tpu.ops.policy import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
from vitgan_tpu.models import build_gan
from vitgan_tpu.train import create_train_state
from vitgan_tpu.train.step import make_device_data_train_fn
from vitgan_tpu.utils.timing import sync_timeit


def run(name, base_cfg, scan_steps, iters):
    out = {"case": name}
    for mb in ("off", "on"):
        cfg = C.replace(base_cfg, **{"runtime.megablock": mb,
                                     "runtime.megablock_bwd": "saved"})
        from vitgan_tpu.ops.policy import apply_from_runtime

        apply_from_runtime(cfg.runtime)
        m = cfg.model
        gan = build_gan(cfg)
        state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
        host = np.random.default_rng(0)
        b, s, c = m.batch_size, m.image_size, m.channels
        n_data = max(512, 2 * b)
        dataset = jax.device_put(
            host.integers(0, 256, (n_data, s, s, c), dtype=np.uint8))
        idx = jax.device_put(
            host.integers(0, n_data, (scan_steps, b)).astype(np.int32))
        fn = make_device_data_train_fn(gan, cfg, scan_steps, donate=False)
        t = sync_timeit(fn, state, dataset, idx, iters=iters)
        ips = b * scan_steps / t
        out[f"megablock_{mb}"] = {"img_per_sec": round(ips, 1),
                                  "step_ms": round(t / scan_steps * 1e3, 3)}
        print(json.dumps({name: out[f"megablock_{mb}"], "megablock": mb}),
              flush=True)
    out["speedup"] = round(out["megablock_on"]["img_per_sec"]
                           / out["megablock_off"]["img_per_sec"], 3)
    print(json.dumps(out), flush=True)
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    results = []
    if which in ("deit64", "all"):
        results.append(run("deit64", C.deit64_config(), scan_steps=8, iters=3))
    if which in ("v2", "all"):
        results.append(run("v2_32px",
                           C.ExperimentConfig(
                               family="v2",
                               data=C.DataConfig(dataset="synthetic")),
                           scan_steps=16, iters=5))
    with open("/tmp/megablock_step_ab.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr)
    main()
