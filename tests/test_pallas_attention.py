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
