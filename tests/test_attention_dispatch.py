"""Model-level parity: mhsa routed through the Pallas kernel (interpret mode)
must match the XLA path exactly enough for training."""

import jax
import numpy as np
import pytest

from vitgan_tpu.models import layers as L
from vitgan_tpu.ops.attention import set_attention_policy


@pytest.fixture(autouse=True)
def reset_policy():
    yield
    set_attention_policy("auto")


@pytest.mark.parametrize("score_mode", ["dot", "l2"])
def test_mhsa_pallas_vs_xla(rng, score_mode):
    p, s = L.mhsa_init(rng, 32, 4)
    x = jax.random.normal(rng, (2, 65, 32))
    set_attention_policy("never")
    want, _ = L.mhsa(p, s, x, score_mode=score_mode)
    set_attention_policy("always")
    got, _ = L.mhsa(p, s, x, score_mode=score_mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_full_model_forward_with_pallas(rng):
    from vitgan_tpu import config as C
    from vitgan_tpu.models import build_gan

    cfg = C.smoke_config("v2")
    gan = build_gan(cfg)
    gvars = gan.generator_init(rng)
    z = gan.sample_latent(jax.random.PRNGKey(1), 2)
    set_attention_policy("never")
    want, _ = gan.generator_apply(gvars, z)
    set_attention_policy("always")
    got, _ = gan.generator_apply(gvars, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)
