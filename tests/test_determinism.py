"""Determinism guards: identical seeds => bit-identical training trajectories
(the TPU-native analogue of the notebook's use_deterministic_algorithms,
ref:cnn/cnn-gan.ipynb cell 3)."""

import jax
import numpy as np

from vitgan_tpu import config as C
from vitgan_tpu.models import build_gan
from vitgan_tpu.train import create_train_state, make_train_step
import pytest


def _run(seed, steps=3):
    cfg = C.smoke_config("v2")
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(seed), gan, cfg)
    step = make_train_step(gan, cfg, donate=False)
    real = jax.random.uniform(jax.random.PRNGKey(99), (8, 32, 32, 3)) * 2 - 1
    losses = []
    for _ in range(steps):
        state, m = step(state, real)
        losses.append(float(m["d_loss"]))
    return losses, state


@pytest.mark.slow
def test_same_seed_same_trajectory():
    l1, s1 = _run(0)
    l2, s2 = _run(0)
    assert l1 == l2
    for a, b in zip(jax.tree.leaves(s1.g_params), jax.tree.leaves(s2.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_different_seed_different_trajectory():
    l1, _ = _run(0, steps=1)
    l2, _ = _run(1, steps=1)
    assert l1 != l2


def test_sampler_determinism():
    cfg = C.smoke_config("v2")
    gan = build_gan(cfg)
    from vitgan_tpu.train import make_sample_fn

    gvars = gan.generator_init(jax.random.PRNGKey(0))
    sample = make_sample_fn(gan, cfg)
    z = gan.sample_latent(jax.random.PRNGKey(1), 2)
    np.testing.assert_array_equal(
        np.asarray(sample(gvars, z)), np.asarray(sample(gvars, z))
    )
