"""A/B the Pallas kernel routing in the FULL production train step.

tests/test_tpu_onchip.py times the kernels in isolation; this script answers
the production question — does routing through the Pallas kernels beat XLA
inside the complete scanned G+D train step?  hires128 (1024 tokens, depth
12, remat) is the config the flash-attention kernel exists for.  Prints one
JSON line; an arm that OOMs reports null (XLA materializes (N, N) score
blocks the flash kernel never does).

Usage: python scripts/bench_pallas_e2e.py [preset] [scan_steps] [iters] [modes]

``preset`` is any vitgan_tpu.utils.benchutil preset (v1 | v2 | dcgan | cnn |
mlp | deit64 | hires128 | hires256).  ``modes`` is comma-separated from
{always,never,auto} (default all three).  Note: 'always' forces the flash
kernel even at CIFAR-scale sequences where it was never designed to run —
its compile there takes tens of minutes and is not a production
configuration; use 'auto,never' for the short-sequence families ('auto'
routes their attention to XLA and the MLP to the fused kernel when
rows >= 2048).
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
    preset = sys.argv[1] if len(sys.argv) > 1 else "hires128"
    scan_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    modes = (sys.argv[4].split(",") if len(sys.argv) > 4
             else ["always", "never", "auto"])
    cfg = build_preset_cfg(preset)
    out = {"metric": f"{preset} train-step img/s, kernel routing A/B",
           "scan_steps": scan_steps}
    # 'auto' is the production policy (attention kernel gated on seq>=256,
    # fused MLP on rows>=2048); always/never force both kernels on/off.
    for mode in modes:
        apply_from_runtime(cfg.runtime)
        set_policy(mode=mode)
        try:
            ips = measure_scanned_train(cfg, scan_steps, iters, dataset_images=256)
        except Exception as e:
            print(f"# use_pallas={mode}: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
            ips = None
        out[f"img_per_sec_pallas_{mode}"] = round(ips, 2) if ips else None
    a = out.get("img_per_sec_pallas_always") or out.get("img_per_sec_pallas_auto")
    n = out.get("img_per_sec_pallas_never")
    out["pallas_speedup"] = round(a / n, 3) if a and n else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
