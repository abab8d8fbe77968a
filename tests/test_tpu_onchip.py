"""On-TPU kernel lane (VERDICT r1 item 5): numerics + honestly-timed comparisons
of the Pallas kernels against the XLA reference ON THE REAL CHIP.

Run alone (the rest of the suite expects the CPU-forced platform):

    RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_onchip.py -q -s

All timings use utils.timing.sync_timeit (timed to host readback — the only
trustworthy synchronization point on the tunneled platform).
"""

import json
import os

import numpy as np
import pytest

ON_CHIP = os.environ.get("RUN_TPU_TESTS", "") == "1"
pytestmark = pytest.mark.skipif(not ON_CHIP, reason="RUN_TPU_TESTS=1 only")

if ON_CHIP:
    import jax
    import jax.numpy as jnp

    from vitgan_tpu.ops import attention as A
    from vitgan_tpu.ops.fused_mlp import _reference as mlp_ref, fused_ln_mlp
    from vitgan_tpu.utils.timing import sync_timeit_scalar

    if not any(d.platform == "tpu" for d in jax.devices()):
        pytestmark = pytest.mark.skip(reason="no TPU device present")


def _qkv(key, b=4, h=4, n=1024, d=96, dtype="bfloat16"):
    kq, kk, kv = jax.random.split(key, 3)
    shape = (b, h, n, d)
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    return (jax.random.normal(kq, shape, dt), jax.random.normal(kk, shape, dt),
            jax.random.normal(kv, shape, dt))


@pytest.mark.parametrize("mode", ["dot", "l2", "l2ref"])
@pytest.mark.parametrize("n", [65, 1024])
def test_flash_forward_parity_on_chip(mode, n):
    q, k, v = _qkv(jax.random.PRNGKey(0), n=n)
    ref = jax.jit(lambda q, k, v: A.attention_reference(q, k, v, mode, 96.0))(q, k, v)
    out = jax.jit(lambda q, k, v: A.flash_attention(q, k, v, mode, 96.0))(q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("mode", ["dot", "l2"])
def test_flash_grad_parity_on_chip_padded_seq(mode):
    """seq_len=1000 over 256-blocks => 4 k-blocks with padding ONLY in the last:
    regression for the dkv global-key-index pad mask."""
    q, k, v = _qkv(jax.random.PRNGKey(1), b=2, h=2, n=1000, d=64, dtype="float32")

    def loss_flash(q, k, v):
        return jnp.sum(A.flash_attention(q, k, v, mode, 64.0,
                                         block_q=256, block_k=256) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(A.attention_reference(q, k, v, mode, 64.0) ** 2)

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        a, b = np.asarray(a), np.asarray(b)
        # Norm-based: MXU matmul precision on the cancellation-heavy l2 path
        # gives ~0.7% pointwise noise; a pad-masking bug would be O(1) here.
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        assert rel < 2e-2, f"d{name} rel-norm err {rel:.4f} ({mode})"


@pytest.mark.parametrize("mode", ["dot", "l2"])
def test_flash_dma_streaming_parity_on_chip(mode, monkeypatch):
    """Force the HBM-streaming (double-buffered DMA) fwd+bwd path at N=2048."""
    monkeypatch.setattr(A, "_KV_VMEM_BUDGET_BYTES", 1 << 16)
    q, k, v = _qkv(jax.random.PRNGKey(2), b=1, h=2, n=2048, d=96, dtype="float32")

    def loss(f):
        return jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(f(q, k, v) ** 2), argnums=(0, 1, 2)))(q, k, v)

    gf = loss(lambda q, k, v: A.flash_attention(q, k, v, mode, 96.0,
                                                block_q=512, block_k=512))
    gr = loss(lambda q, k, v: A.attention_reference(q, k, v, mode, 96.0))
    for a, b in zip(gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        assert rel < 2e-2, f"rel-norm err {rel:.4f} ({mode})"


def test_fused_mlp_parity_on_chip():
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 7)
    rows, d, hidden = 4096, 384, 1536
    x = jax.random.normal(ks[0], (rows, d), jnp.bfloat16)
    ln_s = jnp.ones((d,)); ln_b = jnp.zeros((d,))
    w1 = 0.02 * jax.random.normal(ks[1], (d, hidden))
    b1 = jnp.zeros((hidden,))
    w2 = 0.02 * jax.random.normal(ks[2], (hidden, d))
    b2 = jnp.zeros((d,))
    out = jax.jit(lambda *a: fused_ln_mlp(*a, "gelu", 1e-5, True, 256, False))(
        x, ln_s, ln_b, w1, b1, w2, b2)
    ref = jax.jit(lambda *a: mlp_ref(*a, "gelu", 1e-5, True))(
        x, ln_s, ln_b, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_timed_pallas_vs_xla(capsys):
    """Honestly-timed kernel-vs-XLA comparison at 4k tokens; emits one JSON line
    per case.  Soft gate: the Pallas path must not be catastrophically slower.

    Timing uses sync_timeit_scalar: the result is a 25MB tensor and a
    full-leaf readback would add ~1s of tunnel transfer amortized over iters,
    inflating every number (that bug shaped round-2's first kernel table)."""
    results = []
    for mode in ("dot", "l2"):
        q, k, v = _qkv(jax.random.PRNGKey(4), b=8, h=4, n=4096, d=96)
        fl = jax.jit(lambda q, k, v: A.flash_attention(q, k, v, mode, 96.0))
        xl = jax.jit(lambda q, k, v: A.attention_reference(q, k, v, mode, 96.0))
        t_fl = sync_timeit_scalar(fl, q, k, v, iters=20)
        t_xl = sync_timeit_scalar(xl, q, k, v, iters=20)

        gfl = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
            A.flash_attention(q, k, v, mode, 96.0) ** 2), argnums=(0, 1, 2)))
        gxl = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
            A.attention_chunked(q, k, v, mode, 96.0, chunk=512) ** 2), argnums=(0, 1, 2)))
        t_gfl = sync_timeit_scalar(gfl, q, k, v, iters=10)
        t_gxl = sync_timeit_scalar(gxl, q, k, v, iters=10)
        results.append({"case": f"attn_{mode}_n4096", "fwd_pallas_ms": t_fl * 1e3,
                        "fwd_xla_ms": t_xl * 1e3, "fwdbwd_pallas_ms": t_gfl * 1e3,
                        "fwdbwd_xla_chunked_ms": t_gxl * 1e3})
        assert t_fl < 2.0 * t_xl, f"flash fwd {mode} catastrophically slow"
        assert t_gfl < 2.0 * t_gxl, f"flash bwd {mode} catastrophically slow"

    with capsys.disabled():
        for r in results:
            print("\nONCHIP " + json.dumps({k: round(v, 3) if isinstance(v, float) else v
                                            for k, v in r.items()}))


@pytest.mark.parametrize("mode", ["dot", "l2"])
def test_fused_backward_parity_on_chip(mode):
    """Single-pass fused backward vs two-pass on the real chip (padded seq,
    several q/k blocks — the scratch-accumulation path)."""
    from vitgan_tpu.ops.policy import set_policy

    q, k, v = _qkv(jax.random.PRNGKey(2), b=2, h=2, n=1000, d=64, dtype="float32")

    def loss_flash(q, k, v):
        return jnp.sum(A.flash_attention(q, k, v, mode, 64.0,
                                         block_q=256, block_k=256) ** 2)

    try:
        set_policy(bwd_fusion="fused")
        gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
        gf = [np.asarray(x) for x in gf]
        set_policy(bwd_fusion="two_pass")
        gt = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
        gt = [np.asarray(x) for x in gt]
    finally:
        set_policy(bwd_fusion="auto")
    for a, b, name in zip(gf, gt, "qkv"):
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        assert rel < 1e-3, f"d{name} fused-vs-two-pass rel-norm err {rel:.5f} ({mode})"


def test_fused_block_parity_on_chip():
    """Megablock (whole v2 encoder block in one kernel) vs the XLA
    composition, on Mosaic rather than the interpreter."""
    from vitgan_tpu.config import V2Config
    from vitgan_tpu.models.vitgan_v2 import _encoder_apply, _encoder_init
    from vitgan_tpu.ops.fused_block import fused_encoder_block

    cfg = V2Config(image_size=32, patch_size=4, embed_dim=128, num_heads=4,
                   mlp_ratio=2, dropout=0.0)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          _encoder_init(jax.random.PRNGKey(0), cfg))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 65, 128), jnp.bfloat16)
    got = jax.jit(lambda x, p: fused_encoder_block(x, p, num_heads=4, group=8))(
        x, params)
    want = jax.jit(lambda x, p: _encoder_apply(p, x, cfg, None, False))(x, params)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_fused_block_saved_bwd_on_chip():
    """Saved-residual megablock backward on Mosaic: grads vs the recompute
    custom_vjp at the deit64 production shape (bf16, ragged 257 tokens,
    192-wide embed) — the shape whose profile motivated this kernel."""
    from vitgan_tpu.config import V2Config
    from vitgan_tpu.models.vitgan_v2 import _encoder_init
    from vitgan_tpu.ops.fused_block import (encoder_block_fused,
                                            encoder_block_fused_saved)

    cfg = V2Config(image_size=64, patch_size=4, embed_dim=192, num_heads=3,
                   mlp_ratio=4, dropout=0.0)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          _encoder_init(jax.random.PRNGKey(0), cfg))
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (16, 257, 192),
                                jnp.bfloat16)
    cot = jax.random.normal(jax.random.PRNGKey(2), x.shape, jnp.bfloat16)

    def loss_saved(x, p):
        return jnp.sum(encoder_block_fused_saved(x, p, 3, 1e-5, 8, False, 2)
                       .astype(jnp.float32) * cot.astype(jnp.float32))

    def loss_rec(x, p):
        return jnp.sum(encoder_block_fused(x, p, 3, 1e-5, 8, False)
                       .astype(jnp.float32) * cot.astype(jnp.float32))

    gs = jax.jit(jax.grad(loss_saved, argnums=(0, 1)))(x, params)
    gr = jax.jit(jax.grad(loss_rec, argnums=(0, 1)))(x, params)
    for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(gs),
                               jax.tree_util.tree_leaves_with_path(gr)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        assert rel < 2e-2, f"{jax.tree_util.keystr(pa)} rel-norm err {rel:.5f}"


def test_fused_block_dropout_saved_bwd_on_chip():
    """Grad parity of encoder_block_fused_dropout_saved (the DEFAULT
    production path on real TPU at 128-512 tokens with V2Config.dropout=0.1)
    vs encoder_block_fused_dropout (recompute backward) at the SAME seed:
    identical in-kernel PRNG streams draw identical masks, so gradients must
    match to kernel-numerics tolerance.  Deit64 production shape (ADVICE r3:
    this variant previously had no parity test anywhere)."""
    from vitgan_tpu.config import V2Config
    from vitgan_tpu.models.vitgan_v2 import _encoder_init
    from vitgan_tpu.ops.fused_block import (encoder_block_fused_dropout,
                                            encoder_block_fused_dropout_saved)

    cfg = V2Config(image_size=64, patch_size=4, embed_dim=192, num_heads=3,
                   mlp_ratio=4, dropout=0.1)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          _encoder_init(jax.random.PRNGKey(0), cfg))
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (16, 257, 192),
                                jnp.bfloat16)
    cot = jax.random.normal(jax.random.PRNGKey(2), x.shape, jnp.bfloat16)
    seed = jnp.asarray(4321, jnp.int32)

    def loss_saved(x, p):
        return jnp.sum(encoder_block_fused_dropout_saved(
            x, p, seed, 0.1, 3, 1e-5, 8, False, 2).astype(jnp.float32)
            * cot.astype(jnp.float32))

    def loss_rec(x, p):
        return jnp.sum(encoder_block_fused_dropout(
            x, p, seed, 0.1, 3, 1e-5, 8, False).astype(jnp.float32)
            * cot.astype(jnp.float32))

    # same seed => identical forwards first (cheap invariant, isolates any
    # PRNG-stream divergence from backward-math differences)
    out_s = jax.jit(lambda x, p: encoder_block_fused_dropout_saved(
        x, p, seed, 0.1, 3, 1e-5, 8, False, 2))(x, params)
    out_r = jax.jit(lambda x, p: encoder_block_fused_dropout(
        x, p, seed, 0.1, 3, 1e-5, 8, False))(x, params)
    np.testing.assert_array_equal(np.asarray(out_s, np.float32),
                                  np.asarray(out_r, np.float32))

    gs = jax.jit(jax.grad(loss_saved, argnums=(0, 1)))(x, params)
    gr = jax.jit(jax.grad(loss_rec, argnums=(0, 1)))(x, params)
    for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(gs),
                               jax.tree_util.tree_leaves_with_path(gr)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        assert rel < 2e-2, f"{jax.tree_util.keystr(pa)} rel-norm err {rel:.5f}"


def test_fused_block_dropout_on_chip():
    """In-kernel hardware-PRNG dropout: the forward equals the XLA reference
    applying the RETURNED masks (exact-recompute-backward invariant), mask
    statistics are right, the same seed reproduces, and grads match the
    masked reference.  TPU-only: pltpu.prng_seed has no interpret lowering."""
    from vitgan_tpu.config import V2Config
    from vitgan_tpu.models.vitgan_v2 import _encoder_init
    from vitgan_tpu.ops.fused_block import (_block_reference_masked,
                                            encoder_block_fused_dropout,
                                            fused_encoder_block)

    cfg = V2Config(image_size=32, patch_size=4, embed_dim=128, num_heads=4,
                   mlp_ratio=2, dropout=0.0)
    params = _encoder_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (16, 65, 128), jnp.float32)
    seed = jnp.asarray(1234, jnp.int32)
    run = jax.jit(lambda x, p, s: fused_encoder_block(
        x, p, num_heads=4, group=8, rate=0.1, seed=s))
    out, m1, m2 = run(x, params, seed)
    want = _block_reference_masked(x, params, m1, m2, 4, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    for m in (m1, m2):
        vals = np.unique(np.asarray(m))
        # every mask value is 0 or 1/keep (float32-rounded, so isclose not
        # exact set membership: np.float32(1/0.9) != the Python double)
        assert all(np.isclose(v, 0.0) or np.isclose(v, 1 / 0.9, rtol=1e-6)
                   for v in vals), vals
        drop_frac = float((np.asarray(m) == 0).mean())
        assert 0.05 < drop_frac < 0.15, drop_frac
    out2, m1b, _ = run(x, params, seed)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m1b))

    cot = jax.random.normal(jax.random.PRNGKey(6), x.shape, jnp.float32)

    def loss_fused(x, p):
        return jnp.sum(encoder_block_fused_dropout(x, p, seed, 0.1, 4, 1e-5,
                                                   8, False) * cot)

    def loss_ref(x, p):
        return jnp.sum(_block_reference_masked(x, p, m1, m2, 4, 1e-5) * cot)

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(x, params)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(x, params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)
