"""A/B flash-attention block sizes at the production hires shapes.

Motivation (round-3 profile): at hires128 the DISCRIMINATOR sequence is 1025
tokens (1024 patches + CLS), and `_pad_qkv` ceils the token axis to
max(block_q, block_k).  With the 512-block default that is n_pad = 1536 —
**50% padding**, i.e. 2.25x the score FLOPs actually needed — while 384-wide
blocks give n_pad = 1152 (12%).  This measures fwd and fwd+grad per block
size at the exact hires128/hires256 attention shapes on the chip.

Usage: python scripts/bench_flash_blocks.py [case=hires128_D] [iters=30] [blocks=512,384,256,128]
Cases: hires128_D (32,6,1025,64)  hires128_G (32,6,1024,64)
       hires256_D (32,6,1025,64 @patch8 => same)  deit64_D (64,3,257,64)
Prints one JSON line per block size.
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vitgan_tpu.ops.policy import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vitgan_tpu.ops.attention import flash_attention  # noqa: E402
from vitgan_tpu.utils.timing import sync_timeit_scalar  # noqa: E402

CASES = {
    "hires128_D": (32, 6, 1025, 64),
    "hires128_G": (32, 6, 1024, 64),
    "deit64_D": (64, 3, 257, 64),
}


def main():
    case = sys.argv[1] if len(sys.argv) > 1 else "hires128_D"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    blocks = (tuple(int(x) for x in sys.argv[3].split(","))
              if len(sys.argv) > 3 else (512, 384, 256, 128))
    b, h, n, d = CASES[case]
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(k2, (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(k3, (b, h, n, d), jnp.bfloat16)

    def pad_of(block):
        from vitgan_tpu.ops.attention import _ceil_to
        return _ceil_to(n, block)

    for block in blocks:
        if block > pad_of(block):
            continue
        fwd = jax.jit(functools.partial(
            flash_attention, score_mode="dot", block_q=block, block_k=block))

        def loss(q, k, v):
            return jnp.sum(fwd(q, k, v).astype(jnp.float32))

        grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        try:
            fwd_s = sync_timeit_scalar(
                lambda q: jnp.sum(fwd(q, k, v).astype(jnp.float32)), q,
                iters=iters)
            bwd_s = sync_timeit_scalar(
                lambda q: sum(jnp.sum(g.astype(jnp.float32))
                              for g in grad(q, k, v)), q, iters=iters)
            print(json.dumps({
                "case": case, "shape": [b, h, n, d], "block": block,
                "n_pad": pad_of(block),
                "pad_waste_pct": round(100 * (pad_of(block) - n) / pad_of(block), 1),
                "fwd_us": round(fwd_s * 1e6, 1),
                "fwd_grad_us": round(bwd_s * 1e6, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            print(json.dumps({"case": case, "block": block,
                              "error": f"{type(e).__name__}: {e}"}), flush=True)


if __name__ == "__main__":
    main()
