"""Flash-attention kernel tuning sweep on the real chip.

The on-chip lane (tests/test_tpu_onchip.py) showed our flash fwd at N=4096,
D=96 runs ~60 ms — ~3.4 TFLOP/s implied, far below the MXU.  This script
(a) sweeps block_q/block_k for our kernel (fwd and fwd+bwd, dot mode),
(b) times XLA fused attention, and (c) times jax.experimental's reference
TPU flash kernel (dot only, no L2 mode) as a speed-of-light target for the
same shape.  One JSON line per case, host-readback timing throughout.

Usage: python scripts/tune_attention.py [n=4096] [d=96] [iters=10]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vitgan_tpu.ops.policy import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
from vitgan_tpu.ops import attention as A  # noqa: E402
from vitgan_tpu.utils.timing import sync_timeit_scalar  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    b, h = 8, 4
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, n, d), jnp.bfloat16)
    # MXU matmul FLOPs for attention fwd: QK^T + PV.
    gflop_fwd = 2 * 2 * b * h * n * n * d / 1e9

    def report(case, t_fwd, t_bwd=None):
        rec = {"case": case, "fwd_ms": round(t_fwd * 1e3, 3),
               "fwd_tflops": round(gflop_fwd / t_fwd / 1e3, 2)}
        if t_bwd is not None:
            rec["fwdbwd_ms"] = round(t_bwd * 1e3, 3)
        print(json.dumps(rec), flush=True)

    # XLA fused attention.
    xl = jax.jit(lambda q, k, v: A.attention_reference(q, k, v, "dot", float(d)))
    gxl = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        A.attention_chunked(q, k, v, "dot", float(d), chunk=512) ** 2),
        argnums=(0, 1, 2)))
    report("xla_fused", sync_timeit_scalar(xl, q, k, v, iters=iters),
           sync_timeit_scalar(gxl, q, k, v, iters=max(2, iters // 2)))

    # jax.experimental reference TPU flash kernel (speed-of-light target).
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention as F

        sm = 1.0 / (float(d) ** 0.5)
        fl_ref = jax.jit(lambda q, k, v: F.flash_attention(q, k, v, sm_scale=sm))
        gfl_ref = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
            F.flash_attention(q, k, v, sm_scale=sm) ** 2), argnums=(0, 1, 2)))
        report("jax_flash_reference", sync_timeit_scalar(fl_ref, q, k, v, iters=iters),
               sync_timeit_scalar(gfl_ref, q, k, v, iters=max(2, iters // 2)))
    except Exception as e:
        print(f"# jax flash reference unavailable: {type(e).__name__}: {str(e)[:160]}",
              file=sys.stderr)

    # Our kernel across block sizes.
    for bq in (256, 512, 1024):
        for bk in (256, 512, 1024):
            if bq > n or bk > n:
                continue
            fl = jax.jit(lambda q, k, v, bq=bq, bk=bk: A.flash_attention(
                q, k, v, "dot", float(d), block_q=bq, block_k=bk))
            gfl = jax.jit(jax.grad(lambda q, k, v, bq=bq, bk=bk: jnp.sum(
                A.flash_attention(q, k, v, "dot", float(d),
                                  block_q=bq, block_k=bk) ** 2), argnums=(0, 1, 2)))
            try:
                t_f = sync_timeit_scalar(fl, q, k, v, iters=iters)
                t_b = sync_timeit_scalar(gfl, q, k, v, iters=max(2, iters // 2))
            except Exception as e:
                print(f"# bq={bq} bk={bk}: {type(e).__name__}: {str(e)[:120]}",
                      file=sys.stderr)
                continue
            report(f"ours_bq{bq}_bk{bk}", t_f, t_b)


if __name__ == "__main__":
    main()
