"""A/B: fused megablock kernel vs the XLA composition, encoder block forward.

The v2-32px op profile left exactly one schedule-level hypothesis open
(BENCHMARKS.md "Op-level profile"): whole-transformer-block megafusion.  This
measures it directly on the chip — one v2 encoder block forward, XLA
(`_encoder_apply`, dropout-free) vs the single-kernel Pallas megablock
(`ops/fused_block.py`) — at the flagship shapes:

  - G fwd   : B=64,  N=65, E=128, H=4, hidden=256
  - D concat: B=128, same (the step's real+fake concatenated D forward)
  - deit64  : B=64,  N=257, E=192, H=6 (BASELINE config #4 discriminator)

Timing: sync_timeit_scalar (4-byte readback; see utils/timing.py and the
axon tunnel notes in BENCHMARKS.md).  Usage: SCRATCH=/root/scratch python
scripts/bench_megablock.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# MEGABLOCK_SMOKE=1: CPU logic smoke (interpret-mode kernels, tiny case and
# iteration counts) so the script can't burn chip time on a trivial bug.
SMOKE = os.environ.get("MEGABLOCK_SMOKE") == "1"
if SMOKE:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from vitgan_tpu.ops.policy import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from vitgan_tpu.config import V2Config
from vitgan_tpu.models.vitgan_v2 import _encoder_apply, _encoder_init
from vitgan_tpu.ops.fused_block import fused_encoder_block
from vitgan_tpu.utils.timing import sync_timeit_scalar

ITERS = 2 if SMOKE else 50
CASES = [
    ("v2_G_b64", dict(b=64, image_size=32, patch=4, embed=128, heads=4)),
    ("v2_Dcat_b128", dict(b=128, image_size=32, patch=4, embed=128, heads=4)),
    ("deit64_b64", dict(b=64, image_size=64, patch=4, embed=192, heads=6)),
]
if SMOKE:
    CASES = [("smoke", dict(b=8, image_size=16, patch=4, embed=32, heads=2))]


def run_case(name, s, groups=(4, 8, 16)):
    if SMOKE:
        groups = (4,)
    cfg = V2Config(image_size=s["image_size"], patch_size=s["patch"],
                   embed_dim=s["embed"], num_heads=s["heads"], mlp_ratio=2,
                   dropout=0.0)
    n = (cfg.image_size // cfg.patch_size) ** 2 + 1
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          _encoder_init(jax.random.PRNGKey(0), cfg))
    x = jax.random.normal(jax.random.PRNGKey(1), (s["b"], n, cfg.embed_dim),
                          jnp.bfloat16)

    xla_fn = jax.jit(lambda x, p: _encoder_apply(p, x, cfg, None, False))
    t_xla = sync_timeit_scalar(xla_fn, x, params, iters=ITERS, warmup=3)

    best = None
    for g in groups:
        pl_fn = jax.jit(lambda x, p, g=g: fused_encoder_block(
            x, p, num_heads=cfg.num_heads, group=g, interpret=SMOKE))
        try:
            t = sync_timeit_scalar(pl_fn, x, params, iters=ITERS, warmup=3)
        except Exception as e:  # e.g. VMEM overflow at large groups
            print(f"  group {g}: {type(e).__name__}", file=sys.stderr)
            continue
        if best is None or t < best[1]:
            best = (g, t)
    if best is None:
        print(json.dumps({"case": name, "error": "no group compiled"}), flush=True)
        return {"case": name, "error": "no group compiled"}
    g, t_pl = best

    # dropout variant (mask generation + 2 extra mask writes) at the best
    # group — hardware PRNG, so skipped in the CPU smoke (no interpret lowering)
    from vitgan_tpu.ops.fused_block import encoder_block_fused_dropout

    seed = jnp.asarray(7, jnp.int32)
    t_do = None
    if not SMOKE:
        do_fn = jax.jit(lambda x, p, s: fused_encoder_block(
            x, p, num_heads=cfg.num_heads, group=g, rate=0.1, seed=s)[0])
        t_do = sync_timeit_scalar(do_fn, x, params, seed, iters=ITERS, warmup=3)

    # fwd+bwd: megablock fwd + exact-recompute XLA bwd vs pure XLA AD
    cot = jax.random.normal(jax.random.PRNGKey(2), x.shape, x.dtype)
    g_xla = jax.jit(jax.grad(
        lambda x, p: jnp.sum(_encoder_apply(p, x, cfg, None, False) * cot),
        argnums=(0, 1)))
    t_xla_fb = sync_timeit_scalar(g_xla, x, params, iters=ITERS, warmup=3)
    from vitgan_tpu.ops.fused_block import encoder_block_fused

    g_pl = jax.jit(jax.grad(
        lambda x, p: jnp.sum(encoder_block_fused(x, p, cfg.num_heads, 1e-5,
                                                 g, SMOKE) * cot),
        argnums=(0, 1)))
    t_pl_fb = sync_timeit_scalar(g_pl, x, params, iters=ITERS, warmup=3)
    t_do_fb = None
    if not SMOKE:
        g_do = jax.jit(jax.grad(
            lambda x, p: jnp.sum(encoder_block_fused_dropout(
                x, p, seed, 0.1, cfg.num_heads, 1e-5, g, False) * cot),
            argnums=(0, 1)))
        t_do_fb = sync_timeit_scalar(g_do, x, params, iters=ITERS, warmup=3)

    # fwd+bwd with the SAVED-RESIDUAL single-kernel backward (no forward
    # recompute; the forward pays extra residual writes) — the round-3 fix
    # for the recompute backward erasing the block-level forward win.
    from vitgan_tpu.ops.fused_block import (encoder_block_fused_dropout_saved,
                                            encoder_block_fused_saved)

    t_sv_fb = t_sv_do_fb = None
    if not SMOKE:  # bwd kernel relies on TPU grid semantics (grad accum)
        for bg in (2, 4):
            g_sv = jax.jit(jax.grad(
                lambda x, p, bg=bg: jnp.sum(encoder_block_fused_saved(
                    x, p, cfg.num_heads, 1e-5, g, False, bg) * cot),
                argnums=(0, 1)))
            try:
                t = sync_timeit_scalar(g_sv, x, params, iters=ITERS, warmup=3)
            except Exception as e:
                print(f"  saved bwd_group {bg}: {type(e).__name__}",
                      file=sys.stderr)
                continue
            if t_sv_fb is None or t < t_sv_fb[1]:
                t_sv_fb = (bg, t)
        if t_sv_fb is not None:
            bg = t_sv_fb[0]
            g_sv_do = jax.jit(jax.grad(
                lambda x, p: jnp.sum(encoder_block_fused_dropout_saved(
                    x, p, seed, 0.1, cfg.num_heads, 1e-5, g, False, bg) * cot),
                argnums=(0, 1)))
            t_sv_do_fb = sync_timeit_scalar(g_sv_do, x, params, iters=ITERS,
                                            warmup=3)

    us = lambda t: round(t * 1e6, 1) if t is not None else None  # noqa: E731
    res = {"case": name, "tokens": n, "embed": cfg.embed_dim, "group": g,
           "fwd": {"xla_us": us(t_xla), "pallas_us": us(t_pl),
                   "pallas_dropout_us": us(t_do),
                   "speedup": round(t_xla / t_pl, 3)},
           "fwd_bwd": {"xla_us": us(t_xla_fb), "pallas_us": us(t_pl_fb),
                       "pallas_dropout_us": us(t_do_fb),
                       "speedup": round(t_xla_fb / t_pl_fb, 3)},
           "fwd_bwd_saved": None if t_sv_fb is None else {
               "bwd_group": t_sv_fb[0], "pallas_us": us(t_sv_fb[1]),
               "pallas_dropout_us": us(t_sv_do_fb),
               "speedup": round(t_xla_fb / t_sv_fb[1], 3)}}
    print(json.dumps(res), flush=True)
    return res


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr)
    out = [run_case(n, s) for n, s in CASES]
    with open("/tmp/megablock_ab.json", "w") as f:
        json.dump(out, f, indent=1)
