"""A/B the MXU head-padding policy on the v1 family (108-wide heads).

``runtime.head_pad`` zero-pads per-head attention width to the 128-lane MXU
tile (exact math — see vitgan_tpu/ops/policy.py:head_pad_amount).  The v1
paper config is the motivating case: 4 heads x 108 = 432-wide tokens, so
every attention matmul otherwise runs a partially-filled lane tile.  This
script measures the same scanned production path as scripts/bench_suite.py
with head_pad=never vs head_pad=always and prints one JSON line.

Usage: python scripts/bench_head_pad.py [scan_steps] [iters]
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
from vitgan_tpu.ops.policy import set_policy  # noqa: E402
from vitgan_tpu.train import create_train_state  # noqa: E402
from vitgan_tpu.train.step import make_device_data_train_fn  # noqa: E402
from vitgan_tpu.utils.timing import sync_timeit  # noqa: E402


def measure(head_pad: str, scan_steps: int, iters: int) -> float:
    cfg = C.ExperimentConfig(family="v1", data=C.DataConfig(dataset="synthetic"))
    set_policy(head_pad=head_pad)
    m = cfg.model
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    host = np.random.default_rng(0)
    b, s, c = m.batch_size, m.image_size, m.channels
    dataset = jax.device_put(host.integers(0, 256, (512, s, s, c), dtype=np.uint8))
    idx = jax.device_put(host.integers(0, 512, (scan_steps, b)).astype(np.int32))
    fn = make_device_data_train_fn(gan, cfg, scan_steps, donate=False)
    t = sync_timeit(fn, state, dataset, idx, iters=iters)
    return b * scan_steps / t


def main():
    scan_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    never = measure("never", scan_steps, iters)
    always = measure("always", scan_steps, iters)
    print(json.dumps({
        "metric": "v1 train-step img/s, head_pad A/B (108 -> 128 lanes)",
        "img_per_sec_head_pad_never": round(never, 1),
        "img_per_sec_head_pad_always": round(always, 1),
        "speedup": round(always / never, 3),
        "scan_steps": scan_steps,
    }))


if __name__ == "__main__":
    main()
