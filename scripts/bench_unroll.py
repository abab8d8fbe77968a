"""A/B the lax.scan unroll factor on the scanned production train path.

The v2-scale op profile (scripts/profile_step.py, BENCHMARKS.md) showed a
long tail of ~100 small fusions with no dominant op — the one structural
lever left at that scale is cross-step fusion, which ``lax.scan`` blocks at
iteration boundaries.  ``unroll=k`` clones the step body k times inside the
loop so XLA may fuse across adjacent steps (at k x the compile time and
code size).  This measures the scanned path per unroll factor on the real
chip and prints one JSON line.

Usage: python scripts/bench_unroll.py [preset=v2] [scan_steps=64] [iters=5]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vitgan_tpu.ops.policy import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
from vitgan_tpu import config as C  # noqa: E402
from vitgan_tpu.ops.policy import apply_from_runtime  # noqa: E402
from vitgan_tpu.utils.benchutil import build_preset_cfg, measure_scanned_train  # noqa: E402


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "v2"
    scan_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    base = build_preset_cfg(preset)
    out = {"metric": f"{preset} scanned train img/s by scan unroll factor",
           "scan_steps": scan_steps}
    for k in (1, 2, 4):
        if scan_steps % k:
            continue
        cfg = C.replace(base, **{"runtime.scan_unroll": k})
        apply_from_runtime(cfg.runtime)
        try:
            ips = measure_scanned_train(cfg, scan_steps, iters)
        except Exception as e:
            print(f"# unroll={k}: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
            ips = None
        out[f"img_per_sec_unroll_{k}"] = round(ips, 2) if ips else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
