"""Chunked-recompute attention: forward/grad parity with the reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitgan_tpu.ops.attention import attention_chunked, attention_reference


def _qkv(rng, n, d=16):
    k1, k2, k3 = jax.random.split(rng, 3)
    return (jax.random.normal(k1, (1, 2, n, d)),
            jax.random.normal(k2, (1, 2, n, d)),
            jax.random.normal(k3, (1, 2, n, d)))


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["dot", "l2"])
@pytest.mark.parametrize("n", [100, 256, 300])
def test_chunked_forward_parity(rng, mode, n):
    q, k, v = _qkv(rng, n)
    want = attention_reference(q, k, v, mode, 16.0)
    got = attention_chunked(q, k, v, mode, 16.0, chunk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_chunked_grad_parity(rng):
    q, k, v = _qkv(rng, 200)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) ** 2)

    gr = jax.grad(loss(lambda q, k, v: attention_reference(q, k, v, "l2", 16.0)),
                  argnums=(0, 1, 2))(q, k, v)
    gc = jax.grad(loss(lambda q, k, v: attention_chunked(q, k, v, "l2", 16.0, 64)),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6)


@pytest.mark.slow
def test_flash_backward_uses_chunked(rng):
    """flash_attention grads (chunked backward) match reference grads."""
    from vitgan_tpu.ops.attention import flash_attention

    q, k, v = _qkv(rng, 300)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, "dot", 16.0, 128, 128, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, "dot", 16.0) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)
