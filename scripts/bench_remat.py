"""A/B the rematerialization policy on the hires configs (1024-token v2).

``runtime.remat`` trades recompute FLOPs for HBM: 'full' checkpoints whole
transformer blocks, 'dots' (jax.checkpoint_policies.dots_with_no_batch_dims_
saveable) keeps MXU outputs and recomputes only elementwise work, 'never'
keeps everything.  Measures the scanned production path per mode on the real
chip (host-readback timing) and prints one JSON line; a mode that OOMs is
reported as null.

Usage: python scripts/bench_remat.py [image_size=128|256] [scan_steps] [iters]
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


def measure(cfg: C.ExperimentConfig, remat: str, scan_steps: int, iters: int):
    apply_from_runtime(cfg.runtime)
    set_policy(remat=remat)
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
    except Exception as e:  # XlaRuntimeError: RESOURCE_EXHAUSTED etc.
        print(f"# remat={remat}: {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr)
        return None
    return b * scan_steps / t


def main():
    image_size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    scan_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cfg = C.replace(C.highres_config(image_size),
                    data=C.DataConfig(dataset="synthetic"))
    out = {"metric": f"hires{image_size} train-step img/s by remat mode",
           "scan_steps": scan_steps}
    for mode in ("full", "dots", "never"):
        ips = measure(cfg, mode, scan_steps, iters)
        out[f"img_per_sec_remat_{mode}"] = round(ips, 2) if ips else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
