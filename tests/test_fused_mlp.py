"""Fused LN+MLP Pallas kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitgan_tpu.ops.fused_mlp import _reference, fused_ln_mlp


def _params(rng, d=96, h=192):
    ks = jax.random.split(rng, 5)
    return dict(
        ln_scale=jnp.ones((d,)) + 0.1 * jax.random.normal(ks[0], (d,)),
        ln_bias=0.1 * jax.random.normal(ks[1], (d,)),
        w1=jax.random.normal(ks[2], (d, h)) * 0.05,
        b1=jnp.zeros((h,)),
        w2=jax.random.normal(ks[3], (h, d)) * 0.05,
        b2=jnp.zeros((d,)),
    )


@pytest.mark.slow
@pytest.mark.parametrize("activation", ["gelu", "relu"])
@pytest.mark.parametrize("residual", [True, False])
def test_fused_matches_reference(rng, activation, residual):
    p = _params(rng)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 37, 96))  # non-divisible rows/dim
    want = _reference(x, p["ln_scale"], p["ln_bias"], p["w1"], p["b1"], p["w2"],
                      p["b2"], activation, 1e-5, residual)
    got = fused_ln_mlp(x, p["ln_scale"], p["ln_bias"], p["w1"], p["b1"], p["w2"],
                       p["b2"], activation, 1e-5, residual, 64, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_fused_gradients(rng):
    p = _params(rng, d=32, h=64)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 10, 32))

    def loss_f(x, w1, w2):
        return jnp.sum(fused_ln_mlp(x, p["ln_scale"], p["ln_bias"], w1, p["b1"], w2,
                                    p["b2"], "gelu", 1e-5, True, 32, True) ** 2)

    def loss_r(x, w1, w2):
        return jnp.sum(_reference(x, p["ln_scale"], p["ln_bias"], w1, p["b1"], w2,
                                  p["b2"], "gelu", 1e-5, True) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(x, p["w1"], p["w2"])
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, p["w1"], p["w2"])
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_fused_bf16(rng):
    p = {k: v.astype(jnp.bfloat16) for k, v in _params(rng, d=128, h=256).items()}
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 128), jnp.bfloat16)
    want = _reference(x, p["ln_scale"], p["ln_bias"], p["w1"], p["b1"], p["w2"],
                      p["b2"], "gelu", 1e-5, True)
    got = fused_ln_mlp(x, p["ln_scale"], p["ln_bias"], p["w1"], p["b1"], p["w2"],
                       p["b2"], "gelu", 1e-5, True, 64, True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)
