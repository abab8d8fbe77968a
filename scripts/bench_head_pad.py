"""A/B the MXU head-padding policy (vitgan_tpu/ops/policy.py:head_pad_amount).

``runtime.head_pad`` zero-pads per-head attention width to the 128-lane MXU
tile (exact math).  Motivating cases: v1's 4x108-wide heads (non-tile width)
and deit64/hires' 64-wide heads (half tile).  Measures the same scanned
production path as scripts/bench_suite.py — full production runtime applied
(rbg PRNG, persistent cache) — with head_pad=never vs head_pad=always and
prints one JSON line.

Usage: python scripts/bench_head_pad.py [family=v1|deit64|hires128] [scan_steps] [iters]
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


def build_cfg(family: str) -> C.ExperimentConfig:
    syn = C.DataConfig(dataset="synthetic")
    if family == "deit64":
        return C.replace(C.deit64_config(), data=syn)
    if family == "hires128":
        return C.replace(C.highres_config(128), data=syn)
    return C.ExperimentConfig(family=family, data=syn)


def measure(cfg: C.ExperimentConfig, head_pad: str, scan_steps: int, iters: int) -> float:
    apply_from_runtime(cfg.runtime)  # production runtime: rbg PRNG, cache
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
    family = sys.argv[1] if len(sys.argv) > 1 else "v1"
    scan_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    cfg = build_cfg(family)
    never = measure(cfg, "never", scan_steps, iters)
    always = measure(cfg, "always", scan_steps, iters)
    print(json.dumps({
        "metric": f"{family} train-step img/s, head_pad A/B",
        "img_per_sec_head_pad_never": round(never, 1),
        "img_per_sec_head_pad_always": round(always, 1),
        "speedup": round(always / never, 3),
        "scan_steps": scan_steps,
    }))


if __name__ == "__main__":
    main()
