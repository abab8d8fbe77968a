"""A/B TPU compiler options on the scanned v2 production train path.

The v2-32px op profile is a long tail of 20-40 us fusions; the one compiler
knob that plausibly merges them is the scoped-VMEM budget XLA gives each
fusion's scratch (``xla_tpu_scoped_vmem_limit_kib``).  On this tunneled
platform the client-side XLA_FLAGS parser does not know TPU backend flags
(the process aborts on them), so arms are passed per-compile via PJRT
``compiler_options`` on the lowered executable — which the backend accepts
and which is part of the compilation-cache key.

Usage: python scripts/bench_xla_flags.py [preset=v2] [scan_steps=64] [iters=5]
"""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vitgan_tpu.ops.policy import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
from vitgan_tpu.ops.policy import apply_from_runtime  # noqa: E402
from vitgan_tpu.utils.benchutil import build_preset_cfg, build_scanned_harness  # noqa: E402
from vitgan_tpu.utils.timing import sync_timeit  # noqa: E402


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "v2"
    scan_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    cfg = build_preset_cfg(preset)
    apply_from_runtime(cfg.runtime)
    fn, state, dataset, idx = build_scanned_harness(cfg, scan_steps)
    lowered = fn.lower(state, dataset, idx[0])

    arms = [
        ("default", None),
        ("vmem48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
        ("vmem96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ]
    out = {"metric": f"{preset} scanned train img/s by TPU compiler options",
           "scan_steps": scan_steps}
    for name, opts in arms:
        try:
            exe = lowered.compile(compiler_options=opts) if opts else lowered.compile()
            t = sync_timeit(exe, state, dataset, idx[0], iters=iters)
            ips = cfg.model.batch_size * scan_steps / t
        except Exception as e:
            print(f"# arm {name}: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
            ips = None
        out[f"img_per_sec_{name}"] = round(ips, 2) if ips else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
