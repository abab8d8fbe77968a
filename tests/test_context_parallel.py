"""Context-parallel attention: sequence sharded over the mesh matches the
single-device reference numerics."""

import jax
import numpy as np
import pytest

from vitgan_tpu.config import MeshConfig
from vitgan_tpu.ops.attention import attention_reference
from vitgan_tpu.parallel import make_mesh
from vitgan_tpu.parallel.context_parallel import (cp_attention,
                                                  ring_cp_attention,
                                                  shard_sequence)


@pytest.fixture(scope="module")
def cp_mesh():
    return make_mesh(MeshConfig(model_parallel=4))  # 2 data x 4 model


@pytest.mark.parametrize("mode", ["dot", "l2"])
def test_cp_matches_reference(cp_mesh, rng, mode):
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (2, 2, 64, 16))
    k = jax.random.normal(k2, (2, 2, 64, 16))
    v = jax.random.normal(k3, (2, 2, 64, 16))
    want = attention_reference(q, k, v, mode, 16.0)
    qs, ks, vs = (shard_sequence(x, cp_mesh) for x in (q, k, v))
    got = cp_attention(qs, ks, vs, cp_mesh, axis="model", score_mode=mode, scale=16.0)
    # output sharded on the sequence axis over 'model'
    assert got.sharding.spec == jax.sharding.PartitionSpec(None, None, "model", None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


def test_cp_with_pallas_policy_forced(cp_mesh, rng):
    """Gather-CP calls dispatch_attention with CROSS-attention shapes (local
    q over gathered k): the dispatcher must route those to XLA even when the
    pallas policy would fire (the flash kernel assumes nq == nk — this was a
    live trace-time crash on TPU at >=256 local tokens)."""
    from vitgan_tpu.ops.policy import set_policy, _POLICY

    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (1, 2, 64, 16))
    k = jax.random.normal(k2, (1, 2, 64, 16))
    v = jax.random.normal(k3, (1, 2, 64, 16))
    want = attention_reference(q, k, v, "dot", 16.0)
    old_mode, old_seq = _POLICY["mode"], _POLICY["min_seq_len"]
    set_policy(mode="always", min_seq_len=1)
    try:
        qs, ks, vs = (shard_sequence(x, cp_mesh) for x in (q, k, v))
        got = cp_attention(qs, ks, vs, cp_mesh, axis="model",
                           score_mode="dot", scale=16.0)
    finally:
        set_policy(mode=old_mode, min_seq_len=old_seq)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_cp_rejects_indivisible(cp_mesh, rng):
    q = jax.random.normal(rng, (1, 1, 30, 8))
    with pytest.raises(ValueError):
        cp_attention(q, q, q, cp_mesh)


def test_cp_grads_flow(cp_mesh, rng):
    import jax.numpy as jnp

    q = jax.random.normal(rng, (1, 1, 32, 8))

    def loss(q):
        return jnp.sum(cp_attention(q, q, q, cp_mesh, scale=8.0) ** 2)

    g = jax.grad(loss)(shard_sequence(q, cp_mesh))
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("mode", ["dot", "l2"])
def test_ring_matches_reference(cp_mesh, rng, mode):
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (2, 2, 64, 16))
    k = jax.random.normal(k2, (2, 2, 64, 16))
    v = jax.random.normal(k3, (2, 2, 64, 16))
    want = attention_reference(q, k, v, mode, 16.0)
    qs, ks, vs = (shard_sequence(x, cp_mesh) for x in (q, k, v))
    got = ring_cp_attention(qs, ks, vs, cp_mesh, axis="model",
                            score_mode=mode, scale=16.0)
    assert got.sharding.spec == jax.sharding.PartitionSpec(None, None, "model", None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=3e-6)


def test_ring_matches_gather_cp(cp_mesh, rng):
    """The two CP schedules are interchangeable to numerical precision."""
    q = jax.random.normal(rng, (1, 2, 32, 8))
    qs = shard_sequence(q, cp_mesh)
    a = cp_attention(qs, qs, qs, cp_mesh, scale=8.0)
    b = ring_cp_attention(qs, qs, qs, cp_mesh, scale=8.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=3e-6)


@pytest.mark.slow
def test_ring_grads_match_reference(cp_mesh, rng):
    """Backward through the ring (ppermute transpose + rematerialized blocks)
    agrees with grads of the dense reference."""
    import jax.numpy as jnp

    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (1, 1, 32, 8))
    k = jax.random.normal(k2, (1, 1, 32, 8))
    v = jax.random.normal(k3, (1, 1, 32, 8))

    def loss_ring(q, k, v):
        return jnp.sum(ring_cp_attention(
            shard_sequence(q, cp_mesh), shard_sequence(k, cp_mesh),
            shard_sequence(v, cp_mesh), cp_mesh, scale=8.0) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, "dot", 8.0) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6)


def test_ring_rejects_indivisible(cp_mesh, rng):
    q = jax.random.normal(rng, (1, 1, 30, 8))
    with pytest.raises(ValueError):
        ring_cp_attention(q, q, q, cp_mesh)
