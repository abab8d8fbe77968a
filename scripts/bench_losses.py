"""Measure the training cost of the D-regularization options at v2 scale.

The repo offers WGAN-GP (reference parity: the ref's dead wgan path made
live, ref:src/v2/training.py:88-117) and R1 (documented deviation: the
modern, cheaper stabilizer — losses.r1_penalty).  Both add a second-order
gradient term to the D update; this measures what each actually costs on
the chip relative to plain BCE, on the scanned production path.

Usage: python scripts/bench_losses.py [preset=v2] [scan_steps=64] [iters=5]
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
    arms = [
        ("bce", {}),
        ("bce_r1", {f"{preset}.r1_gamma": 10.0, f"{preset}.r1_interval": 1}),
        ("bce_r1_lazy16", {f"{preset}.r1_gamma": 10.0,
                           f"{preset}.r1_interval": 16}),
        ("wgan_gp", {f"{preset}.loss": "wgan-gp"}),
    ]
    out = {"metric": f"{preset} scanned train img/s by D-regularizer",
           "scan_steps": scan_steps}
    for name, overrides in arms:
        cfg = C.replace(base, **overrides) if overrides else base
        apply_from_runtime(cfg.runtime)
        try:
            ips = measure_scanned_train(cfg, scan_steps, iters)
        except Exception as e:
            print(f"# arm {name}: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
            ips = None
        out[f"img_per_sec_{name}"] = round(ips, 2) if ips else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
