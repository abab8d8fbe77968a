"""Pallas flash-attention parity vs the pure-jax reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitgan_tpu.ops.attention import attention_reference, flash_attention, use_pallas_attention


def _rand_qkv(rng, b=2, h=2, n=80, d=24):
    k1, k2, k3 = jax.random.split(rng, 3)
    return (jax.random.normal(k1, (b, h, n, d)),
            jax.random.normal(k2, (b, h, n, d)),
            jax.random.normal(k3, (b, h, n, d)))


@pytest.mark.parametrize("score_mode", ["dot", "l2", "l2ref"])
def test_flash_matches_reference(rng, score_mode):
    q, k, v = _rand_qkv(rng)
    want = attention_reference(q, k, v, score_mode, scale=24.0)
    got = flash_attention(q, k, v, score_mode, 24.0, block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_flash_nondivisible_seq_and_dim(rng):
    """Sequence 65 (v2 token count), head dim 96 (v1): padding must be transparent."""
    q, k, v = _rand_qkv(rng, b=1, h=2, n=65, d=96)
    want = attention_reference(q, k, v, "dot", scale=96.0)
    got = flash_attention(q, k, v, "dot", 96.0, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_flash_l2_long_seq_blocks(rng):
    q, k, v = _rand_qkv(rng, b=1, h=1, n=300, d=16)
    want = attention_reference(q, k, v, "l2", scale=16.0)
    got = flash_attention(q, k, v, "l2", 16.0, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_flash_gradients_match_reference(rng):
    q, k, v = _rand_qkv(rng, b=1, h=1, n=40, d=16)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, "l2", 16.0, 32, 32, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, "l2", 16.0) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_flash_bf16(rng):
    q, k, v = _rand_qkv(rng, n=64, d=32)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    want = attention_reference(qb, kb, vb, "dot", scale=32.0)
    got = flash_attention(qb, kb, vb, "dot", 32.0, 32, 32, True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )


def test_dispatch_policy():
    assert not use_pallas_attention("never", 4096)
    assert use_pallas_attention("always", 10)
    # on CPU tests, auto is always off
    assert not use_pallas_attention("auto", 4096) or any(
        d.platform == "tpu" for d in jax.devices()
    )


@pytest.mark.parametrize("score_mode", ["dot", "l2"])
@pytest.mark.parametrize("n", [40, 64])  # padded tail and exact-block shapes
def test_fused_backward_matches_two_pass_and_reference(rng, score_mode, n):
    """The single-pass backward must agree with the two-pass kernels AND the
    XLA reference for both score modes, with and without padded rows."""
    from vitgan_tpu.ops.policy import set_policy

    q, k, v = _rand_qkv(rng, b=1, h=2, n=n, d=16)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, score_mode, 16.0, 32, 32, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, score_mode, 16.0) ** 2)

    try:
        set_policy(bwd_fusion="fused")
        g_fused = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        set_policy(bwd_fusion="two_pass")
        g_two = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    finally:
        set_policy(bwd_fusion="auto")
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_fused, g_two):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6, err_msg=f"d{name} fused vs two-pass")
    for name, a, b in zip("qkv", g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-5, err_msg=f"d{name} fused vs reference")


def test_fused_backward_multi_qk_blocks(rng):
    """Several q-blocks AND k-blocks: exercises the scratch accumulation
    across sequential k-block programs."""
    from vitgan_tpu.ops.policy import set_policy

    q, k, v = _rand_qkv(rng, b=1, h=1, n=128, d=16)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, "l2", 16.0, 32, 32, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, "l2", 16.0) ** 2)

    try:
        set_policy(bwd_fusion="fused")
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    finally:
        set_policy(bwd_fusion="auto")
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_default_blocks_whole_sequence_policy():
    """Sequence-adaptive block policy (scripts/bench_flash_blocks.py r3):
    whole-padded-sequence blocks up to 1152 tokens — at hires128's ragged
    N=1025 (CLS token) this pads to 1152 instead of 1536 and runs the
    backward 1.44x faster on v5e; 512/1024 tiling above the VMEM cap."""
    from vitgan_tpu.ops.attention import default_blocks

    assert default_blocks(65) == (128, 128)       # v2: whole (minimum tile)
    assert default_blocks(257) == (384, 384)      # deit64_D: whole
    assert default_blocks(1024) == (1024, 1024)   # hires G: whole
    assert default_blocks(1025) == (1152, 1152)   # hires D: whole, pad 1152
    assert default_blocks(1153) == (512, 512)     # above cap: tile at 512
    assert default_blocks(4096) == (1024, 1024)   # long-seq sweep winner
    # explicit blocks suppress the whole-seq default and clamp to the pad
    assert default_blocks(1025, 512, 512) == (512, 512)
    assert default_blocks(257, 512, None) == (384, 384)
