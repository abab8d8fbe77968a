"""Decompose per-call overhead vs on-chip step time for the v2 flagship step.

Times the scanned production train fn at two scan lengths S1 < S2 (same jitted
family, two compiles) and solves

    t_call(S) = overhead + S * t_step

so ``t_step`` is the pure on-device per-step time (what the chip does) and
``overhead`` is everything per dispatch: tunnel round-trip, host readback,
dispatch queueing.  From t_step and the XLA FLOP model it prints the honest
MFU of the step itself, independent of dispatch amortization (VERDICT r1
item 2: "how much is tunnel sync overhead per call vs chip time").

Usage: python scripts/bench_overhead.py [s1] [s2] [iters]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vitgan_tpu import config as C
from vitgan_tpu.ops.policy import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
from vitgan_tpu.models import build_gan  # noqa: E402
from vitgan_tpu.ops.policy import apply_from_runtime  # noqa: E402
from vitgan_tpu.train import create_train_state  # noqa: E402
from vitgan_tpu.train.step import make_device_data_train_fn  # noqa: E402
from vitgan_tpu.utils.timing import sync_timeit  # noqa: E402

PEAK_TFLOPS_V5E_BF16 = 197.0


def main():
    s1 = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    s2 = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    assert s2 > s1

    cfg = C.ExperimentConfig(family="v2", data=C.DataConfig(dataset="synthetic"))
    apply_from_runtime(cfg.runtime)
    m = cfg.model
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    host = np.random.default_rng(0)
    b, s, c = m.batch_size, m.image_size, m.channels
    dataset = jax.device_put(host.integers(0, 256, (512, s, s, c), dtype=np.uint8))

    times = {}
    for steps in (s1, s2):
        idx = jax.device_put(host.integers(0, 512, (steps, b)).astype(np.int32))
        fn = make_device_data_train_fn(gan, cfg, steps, donate=False)
        times[steps] = sync_timeit(fn, state, dataset, idx, iters=iters)

    t_step = (times[s2] - times[s1]) / (s2 - s1)
    overhead = times[s1] - s1 * t_step

    from vitgan_tpu.utils.benchutil import xla_step_gflops

    gflops = xla_step_gflops(cfg, gan, state)

    rec = {
        "metric": "v2 train-step dispatch decomposition (t_call = overhead + S*t_step)",
        "scan_points": [s1, s2],
        "t_call_s1_ms": round(times[s1] * 1e3, 3),
        "t_call_s2_ms": round(times[s2] * 1e3, 3),
        "on_chip_step_ms": round(t_step * 1e3, 4),
        "per_call_overhead_ms": round(overhead * 1e3, 3),
        "img_per_sec_chip_only": round(b / t_step, 1),
        "step_gflops": round(gflops, 2) if gflops else None,
        "chip_tflops": round(gflops / t_step / 1e3, 2) if gflops else None,
        "mfu_pct_vs_v5e_bf16_peak": (
            round(100.0 * gflops / t_step / 1e3 / PEAK_TFLOPS_V5E_BF16, 2)
            if gflops else None),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
