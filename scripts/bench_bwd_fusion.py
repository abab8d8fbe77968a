"""A/B the fused single-pass flash backward vs the two-pass kernels on chip.

The two-pass backward (dq kernel + dk/dv kernel) recomputes the score and dp
matmuls in both passes: 7 block-matmuls per tile.  The fused kernel
(ops/attention.py:_flash_bwd_fused_kernel) computes dq+dk+dv in one sweep —
5 block-matmuls — at the cost of full-sequence VMEM residency (so VMEM-regime
shapes only).  This measures fwd+bwd wall time for both choices at production
shapes, transfer-free timing (sync_timeit_scalar).

Usage: SCRATCH=... python scripts/bench_bwd_fusion.py [iters=8]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vitgan_tpu.ops.policy import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vitgan_tpu.ops import attention as A  # noqa: E402
from vitgan_tpu.ops.policy import set_policy  # noqa: E402
from vitgan_tpu.utils.timing import sync_timeit_scalar  # noqa: E402

# (label, b, h, n, d, score_mode) — hires128/256 attention shape (1024 tokens,
# 64-wide heads) and the kernel-sweet-spot shape from tune_attention.
SHAPES = [
    ("hires_1024x64_dot", 32, 6, 1024, 64, "dot"),
    ("sweep_4096x96_dot", 8, 4, 4096, 96, "dot"),
    ("sweep_4096x96_l2", 8, 4, 4096, 96, "l2"),
]


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    for label, b, h, n, d, mode in SHAPES:
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (b, h, n, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, h, n, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, h, n, d), jnp.bfloat16)
        out = {}
        for choice in ("two_pass", "fused"):
            set_policy(bwd_fusion=choice)
            g = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
                A.flash_attention(q, k, v, mode, float(d)) ** 2),
                argnums=(0, 1, 2)))
            try:
                out[choice] = sync_timeit_scalar(g, q, k, v, iters=iters)
            except Exception as e:  # OOM etc: report, keep going
                out[choice] = None
                print(f"# {label} {choice}: {type(e).__name__}: {str(e)[:160]}",
                      file=sys.stderr)
        set_policy(bwd_fusion="auto")
        rec = {"case": label, "score_mode": mode,
               "fwdbwd_ms_two_pass": round(out["two_pass"] * 1e3, 3)
               if out["two_pass"] else None,
               "fwdbwd_ms_fused": round(out["fused"] * 1e3, 3)
               if out["fused"] else None}
        if out["two_pass"] and out["fused"]:
            rec["fused_speedup"] = round(out["two_pass"] / out["fused"], 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
