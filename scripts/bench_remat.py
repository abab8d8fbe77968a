"""A/B the rematerialization policy on the hires configs (1024-token v2).

``runtime.remat`` trades recompute FLOPs for HBM: 'full' checkpoints whole
transformer blocks, 'dots' (jax.checkpoint_policies.dots_with_no_batch_dims_
saveable) keeps MXU outputs and recomputes only elementwise work, 'attn'
additionally saves the named flash-attention outputs (custom calls are not
dots, so 'dots' re-runs the kernel in every rematted backward), 'never'
keeps everything.  Measures the scanned production path per mode on the real
chip and prints one JSON line; a mode that OOMs is reported as null.
Measured result (BENCHMARKS.md): never OOMs at hires128, dots ~= full.

Usage: python scripts/bench_remat.py [image_size=128|256] [scan_steps] [iters]
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
    image_size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    scan_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cfg = build_preset_cfg(f"hires{image_size}")
    out = {"metric": f"hires{image_size} train-step img/s by remat mode",
           "scan_steps": scan_steps}
    for mode in ("full", "dots", "attn", "never"):
        apply_from_runtime(cfg.runtime)
        set_policy(remat=mode)
        try:
            ips = measure_scanned_train(cfg, scan_steps, iters, dataset_images=256)
        except Exception as e:  # XlaRuntimeError: RESOURCE_EXHAUSTED etc.
            print(f"# remat={mode}: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
            ips = None
        out[f"img_per_sec_remat_{mode}"] = round(ips, 2) if ips else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
