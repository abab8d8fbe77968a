"""A/B the Pallas attention routing in the FULL production train step.

tests/test_tpu_onchip.py times the kernels in isolation; this script answers
the production question — does routing attention through the Pallas flash
kernels (`runtime.use_pallas=always`) beat XLA's fused attention
(`use_pallas=never`) inside the complete scanned G+D train step at long
sequence lengths?  hires128 (1024 tokens, depth 12, remat) is the config the
kernels exist for.  Prints one JSON line; an arm that OOMs reports null
(XLA materializes (N, N) score blocks the flash kernel never does).

Usage: python scripts/bench_pallas_e2e.py [preset=hires128|deit64|v2|v1] [scan_steps] [iters] [modes]

``modes`` is comma-separated from {always,never,auto} (default all three).
Note: 'always' forces the flash kernel even at CIFAR-scale sequences where
it was never designed to run — at v2 (65 tokens) that arm compiles for >25
minutes on this host and is not a production configuration; use
'auto,never' there (auto routes v2 attention to XLA and the MLP to the
fused kernel when rows >= 2048).
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
from vitgan_tpu.models import build_gan  # noqa: E402
from vitgan_tpu.ops.policy import apply_from_runtime, set_policy  # noqa: E402
from vitgan_tpu.train import create_train_state  # noqa: E402
from vitgan_tpu.train.step import make_device_data_train_fn  # noqa: E402
from vitgan_tpu.utils.timing import sync_timeit  # noqa: E402


def measure(cfg: C.ExperimentConfig, use_pallas: str, scan_steps: int, iters: int):
    apply_from_runtime(cfg.runtime)
    set_policy(mode=use_pallas)
    m = cfg.model
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    host = np.random.default_rng(0)
    b, s, c = m.batch_size, m.image_size, m.channels
    dataset = jax.device_put(host.integers(0, 256, (256, s, s, c), dtype=np.uint8))
    idx = jax.device_put(host.integers(0, 256, (scan_steps, b)).astype(np.int32))
    fn = make_device_data_train_fn(gan, cfg, scan_steps, donate=False)
    try:
        t = sync_timeit(fn, state, dataset, idx, iters=iters)
    except Exception as e:
        print(f"# use_pallas={use_pallas}: {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr)
        return None
    return b * scan_steps / t


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "hires128"
    scan_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    modes = (sys.argv[4].split(",") if len(sys.argv) > 4
             else ["always", "never", "auto"])
    syn = C.DataConfig(dataset="synthetic")
    cfg = C.replace(C.deit64_config() if preset == "deit64"
                    else C.highres_config(128), data=syn)
    out = {"metric": f"{preset} train-step img/s, kernel routing A/B",
           "scan_steps": scan_steps}
    # 'auto' is the production policy (attention kernel gated on seq>=256,
    # fused MLP on rows>=2048); always/never force both kernels on/off.
    for mode in modes:
        ips = measure(cfg, mode, scan_steps, iters)
        out[f"img_per_sec_pallas_{mode}"] = round(ips, 2) if ips else None
    a = out.get("img_per_sec_pallas_always") or out.get("img_per_sec_pallas_auto")
    n = out.get("img_per_sec_pallas_never")
    out["pallas_speedup"] = round(a / n, 3) if a and n else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
