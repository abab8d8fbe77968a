"""Unit tests for core layer primitives: shapes, init statistics, golden math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitgan_tpu.models import layers as L


def test_dense_shapes(rng):
    p = L.torch_linear_init(rng, 16, 32)
    y = L.dense(p, jnp.ones((4, 16)))
    assert y.shape == (4, 32)
    # torch-default init bound 1/sqrt(16) = 0.25
    assert float(jnp.abs(p["w"]).max()) <= 0.25 + 1e-6


def test_trunc_normal_init_stats(rng):
    """torch parity: nn.init.trunc_normal_(std=0.02) truncates at ABSOLUTE
    ±2 (±100σ — effectively untruncated), not ±2σ.  The sample std must be
    ~0.02 (a ±2σ truncation would shrink it to ~0.0176) and normal tails
    beyond 2σ must exist."""
    p = L.trunc_normal_init(rng, 256, 256, std=0.02)
    w = np.asarray(p["w"])
    assert abs(w.std() - 0.02) < 0.0005
    assert np.abs(w).max() <= 2.0  # the torch absolute truncation bound
    assert (np.abs(w) > 0.04).sum() > 1000  # ~4.6% of 65536 draws beyond 2σ
    np.testing.assert_array_equal(np.asarray(p["b"]), 0)

    import torch

    t = torch.nn.init.trunc_normal_(torch.empty(256, 256), std=0.02)
    assert abs(w.std() - float(t.std())) < 0.0005


def test_layer_norm_golden(rng):
    p = L.layer_norm_init(8)
    x = jax.random.normal(rng, (3, 5, 8)) * 4 + 2
    y = L.layer_norm(p, x)
    np.testing.assert_allclose(np.asarray(y.mean(-1)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y.std(-1)), 1, atol=1e-2)


def test_sln_golden(rng):
    p = L.sln_init(rng, 8)
    h = jax.random.normal(rng, (2, 4, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8))
    y = L.sln(p, h, w)
    expected = p["gamma"] * w * L.layer_norm(p["ln"], h) + p["beta"] * w
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected), rtol=1e-6)


def test_siren_init_bounds(rng):
    first = L.siren_init(rng, 100, 50, is_first=True)
    later = L.siren_init(rng, 100, 50, is_first=False, omega_0=30.0)
    assert float(jnp.abs(first["w"]).max()) <= 1 / 100 + 1e-9
    assert float(jnp.abs(later["w"]).max()) <= np.sqrt(6 / 100) / 30.0 + 1e-9
    y = L.siren(first, jnp.ones((2, 100)))
    assert y.shape == (2, 50) and float(jnp.abs(y).max()) <= 1.0


def test_mlp_chain_and_activation(rng):
    p = L.mlp_init(rng, 8, 4, hidden=(16, 16))
    assert len(p["layers"]) == 3
    y = L.mlp(p, jnp.ones((2, 8)), activation="relu")
    assert y.shape == (2, 4)
    # single-linear default: exactly affine
    p1 = L.mlp_init(rng, 8, 4)
    x = jax.random.normal(rng, (5, 8))
    np.testing.assert_allclose(
        np.asarray(L.mlp(p1, x)), np.asarray(L.dense(p1["layers"][0], x)), rtol=1e-6
    )


def test_dropout_train_eval(rng):
    x = jnp.ones((1000,))
    assert np.array_equal(np.asarray(L.dropout(rng, x, 0.5, train=False)), np.asarray(x))
    y = L.dropout(rng, x, 0.5, train=True)
    zeros = float((y == 0).mean())
    assert 0.4 < zeros < 0.6
    # inverted scaling preserves expectation
    assert abs(float(y.mean()) - 1.0) < 0.1


def test_attention_scores_l2_matches_cdist(rng):
    k1, k2 = jax.random.split(rng)
    q = jax.random.normal(k1, (2, 3, 5, 7))
    k = jax.random.normal(k2, (2, 3, 5, 7))
    d2 = np.asarray(attention_scores_ref(q, k))  # squared distances
    got = np.asarray(L.attention_scores(q, k, scale=1.0, score_mode="l2"))
    np.testing.assert_allclose(got, -d2, rtol=1e-4, atol=1e-4)
    # 'l2ref' is +sqrt(d2)
    got_ref = np.asarray(L.attention_scores(q, k, scale=1.0, score_mode="l2ref"))
    np.testing.assert_allclose(got_ref, np.sqrt(d2 + 1e-12), rtol=1e-3, atol=1e-4)


def attention_scores_ref(q, k):
    diff = q[..., :, None, :] - k[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def test_mhsa_shapes_and_determinism(rng):
    p, s = L.mhsa_init(rng, 32, 4)
    x = jax.random.normal(rng, (2, 9, 32))
    y1, _ = L.mhsa(p, s, x)
    y2, _ = L.mhsa(p, s, x)
    assert y1.shape == (2, 9, 32)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_mhsa_is_permutation_equivariant(rng):
    """Self-attention without pos info commutes with token permutation."""
    p, s = L.mhsa_init(rng, 16, 2)
    x = jax.random.normal(rng, (1, 6, 16))
    perm = jnp.array([3, 1, 5, 0, 2, 4])
    y, _ = L.mhsa(p, s, x)
    y_perm, _ = L.mhsa(p, s, x[:, perm])
    np.testing.assert_allclose(np.asarray(y[:, perm]), np.asarray(y_perm), atol=1e-5)


def test_spectral_state_sigma0_exact(rng):
    w = jax.random.normal(rng, (3, 4, 16, 8))
    st = L.spectral_state_init(w, jax.random.PRNGKey(1))
    expected = np.linalg.svd(np.asarray(w), compute_uv=False)[..., 0]
    np.testing.assert_allclose(np.asarray(st["sigma0"]), expected, rtol=1e-5)


def test_spectral_rescale_restores_norm(rng):
    """After rescale, max singular value ~= sigma0 even if W was scaled."""
    w = jax.random.normal(rng, (2, 8, 8))
    st = L.spectral_state_init(w, jax.random.PRNGKey(1))
    w_scaled = w * 3.0
    # converge the power iteration
    w_r, st2 = L.spectral_rescale(w_scaled, st, update=True, iters=50)
    got = np.linalg.svd(np.asarray(w_r), compute_uv=False)[..., 0]
    np.testing.assert_allclose(got, np.asarray(st["sigma0"]), rtol=1e-3)
    # eval mode leaves u untouched
    _, st3 = L.spectral_rescale(w_scaled, st, update=False, iters=1)
    np.testing.assert_array_equal(np.asarray(st3["u"]), np.asarray(st["u"]))


def test_spectral_rescale_gradients_flow(rng):
    w = jax.random.normal(rng, (2, 8, 8))
    st = L.spectral_state_init(w, jax.random.PRNGKey(1))

    def loss(w):
        w_r, _ = L.spectral_rescale(w, st, update=False)
        return jnp.sum(w_r ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


def test_mhsa_spectral_integration(rng):
    p, s = L.mhsa_init(rng, 16, 2, spectral=True)
    assert "isr" in s and s["isr"]["sigma0"].shape == (3, 2)
    x = jax.random.normal(rng, (2, 5, 16))
    y, s2 = L.mhsa(p, s, x, score_mode="l2", update_state=True)
    assert y.shape == (2, 5, 16)
    assert not np.array_equal(np.asarray(s2["isr"]["u"]), np.asarray(s["isr"]["u"]))


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["dot", "l2", "l2ref"])
def test_head_padding_is_exact(rng, mode):
    """Zero-padding head_dim to the 128 lane tile must not change outputs:
    padded q/k dims contribute nothing to dot or L2 scores and the padded
    out-projection rows are zero."""
    from vitgan_tpu.ops import policy

    p, s = L.mhsa_init(rng, 96, 2, head_dim=48, spectral=(mode != "dot"),
                       qkv_bias=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 7, 96))
    old = policy.get_policy()["head_pad"]
    try:
        policy.set_policy(head_pad="never")
        y0, _ = L.mhsa(p, s, x, score_mode=mode)
        policy.set_policy(head_pad="always")
        y1, _ = L.mhsa(p, s, x, score_mode=mode)
    finally:
        policy.set_policy(head_pad=old)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-5, atol=1e-6)


def test_head_pad_amount_policy():
    from vitgan_tpu.ops import policy

    old = policy.get_policy()["head_pad"]
    try:
        policy.set_policy(head_pad="always")
        assert policy.head_pad_amount(108) == 20
        assert policy.head_pad_amount(96) == 32
        assert policy.head_pad_amount(128) == 0
        policy.set_policy(head_pad="never")
        assert policy.head_pad_amount(108) == 0
        policy.set_policy(head_pad="auto")  # auto never pads (measured neutral-to-negative on chip)
        assert policy.head_pad_amount(108) == 0
        assert policy.head_pad_amount(32) == 0
    finally:
        policy.set_policy(head_pad=old)
