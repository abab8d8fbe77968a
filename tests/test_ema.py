"""Generator EMA: tracked when enabled, used for sampling, absent when off."""

import jax
import numpy as np

from vitgan_tpu import config as C
from vitgan_tpu.models import build_gan
from vitgan_tpu.train import create_train_state, make_train_step


def test_ema_disabled_by_default(rng):
    cfg = C.smoke_config("mlp")
    gan = build_gan(cfg)
    state = create_train_state(rng, gan, cfg)
    assert state.g_ema is None
    # g_vars_ema falls back to live params
    assert state.g_vars_ema["params"] is state.g_params


def test_ema_tracks_params(rng):
    cfg = C.replace(C.smoke_config("mlp"), **{"run.ema_decay": 0.9})
    gan = build_gan(cfg)
    state = create_train_state(rng, gan, cfg)
    assert state.g_ema is not None
    step = make_train_step(gan, cfg, donate=False)
    real = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3)) * 2 - 1
    s1, _ = step(state, real)
    p0 = jax.tree.leaves(state.g_params)[0]
    p1 = jax.tree.leaves(s1.g_params)[0]
    e1 = jax.tree.leaves(s1.g_ema)[0]
    # EMA = 0.9*old + 0.1*new
    np.testing.assert_allclose(
        np.asarray(e1), 0.9 * np.asarray(p0) + 0.1 * np.asarray(p1), rtol=1e-5
    )
    # EMA lags the live params
    assert not np.array_equal(np.asarray(e1), np.asarray(p1))
