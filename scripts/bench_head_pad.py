"""A/B the MXU head-padding policy (vitgan_tpu/ops/policy.py:head_pad_amount).

``runtime.head_pad`` zero-pads per-head attention width to the 128-lane MXU
tile (exact math).  Motivating cases: v1's 4x108-wide heads (non-tile width)
and deit64/hires' 64-wide heads (half tile).  Measures the scanned production
path (vitgan_tpu.utils.benchutil) — full production runtime applied (rbg
PRNG, persistent cache) — with head_pad=never vs head_pad=always and prints
one JSON line.  Measured result (BENCHMARKS.md): no win — 'auto' never pads.

Usage: python scripts/bench_head_pad.py [preset=v1|deit64|...] [scan_steps] [iters]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vitgan_tpu.ops.policy import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
from vitgan_tpu.ops.policy import apply_from_runtime, set_policy  # noqa: E402
from vitgan_tpu.utils.benchutil import build_preset_cfg, measure_scanned_train  # noqa: E402


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "v1"
    scan_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    cfg = build_preset_cfg(preset)
    out = {}
    for mode in ("never", "always"):
        apply_from_runtime(cfg.runtime)  # production runtime: rbg PRNG, cache
        set_policy(head_pad=mode)
        out[mode] = measure_scanned_train(cfg, scan_steps, iters)
    print(json.dumps({
        "metric": f"{preset} train-step img/s, head_pad A/B",
        "img_per_sec_head_pad_never": round(out["never"], 1),
        "img_per_sec_head_pad_always": round(out["always"], 1),
        "speedup": round(out["always"] / out["never"], 3),
        "scan_steps": scan_steps,
    }))


if __name__ == "__main__":
    main()
