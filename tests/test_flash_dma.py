"""Double-buffered HBM-streaming flash forward: parity with the VMEM-resident path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vitgan_tpu.ops.attention as A


@pytest.mark.parametrize("mode", ["dot", "l2"])
def test_dma_path_matches_reference(rng, mode, monkeypatch):
    # Force the streaming path by shrinking the VMEM budget.
    monkeypatch.setattr(A, "_KV_VMEM_BUDGET_BYTES", 1)
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (1, 2, 200, 32))
    k = jax.random.normal(k2, (1, 2, 200, 32))
    v = jax.random.normal(k3, (1, 2, 200, 32))
    want = A.attention_reference(q, k, v, mode, 32.0)
    got = A.flash_attention(q, k, v, mode, 32.0, 64, 64, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_dma_path_gradients(rng, monkeypatch):
    monkeypatch.setattr(A, "_KV_VMEM_BUDGET_BYTES", 1)
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (1, 1, 100, 16))
    k = jax.random.normal(k2, (1, 1, 100, 16))
    v = jax.random.normal(k3, (1, 1, 100, 16))

    def loss_f(q, k, v):
        return jnp.sum(A.flash_attention(q, k, v, "dot", 16.0, 64, 64, True) ** 2)

    def loss_r(q, k, v):
        return jnp.sum(A.attention_reference(q, k, v, "dot", 16.0) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)
