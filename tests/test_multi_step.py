"""Scanned multi-step: semantics identical to sequential single steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitgan_tpu import config as C
from vitgan_tpu.models import build_gan
from vitgan_tpu.train import create_train_state, make_train_step
from vitgan_tpu.train.step import make_multi_train_step


@pytest.mark.slow
def test_multi_step_matches_sequential(rng):
    cfg = C.smoke_config("mlp")
    gan = build_gan(cfg)
    state_a = create_train_state(rng, gan, cfg)
    state_b = create_train_state(rng, gan, cfg)
    k = 4
    reals = jax.random.uniform(jax.random.PRNGKey(1), (k, 8, 32, 32, 3)) * 2 - 1

    single = make_train_step(gan, cfg, donate=False)
    seq_metrics = []
    for i in range(k):
        state_a, m = single(state_a, reals[i])
        seq_metrics.append(float(m["d_loss"]))

    multi = make_multi_train_step(gan, cfg, k, donate=False)
    state_b, ms = multi(state_b, reals)

    np.testing.assert_allclose(np.asarray(ms["d_loss"]), seq_metrics, rtol=1e-4)
    assert int(state_b.step) == int(state_a.step) == k
    for a, b in zip(jax.tree.leaves(state_a.g_params), jax.tree.leaves(state_b.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_trainer_with_steps_per_call(tmp_path, rng):
    from vitgan_tpu.train.trainer import Trainer

    cfg = C.replace(
        C.smoke_config("mlp"),
        **{"run.steps_per_call": 2, "run.steps_per_epoch": 5, "run.fid_num_samples": 16,
           "run.checkpoint_every_epochs": 0, "run_name": "multistep"},
    )
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    metrics = tr.fit(epochs=1)
    # 2 scanned calls (4 steps) + 1 remainder step = 5 updates
    assert int(tr.state.step) == 5
    assert np.isfinite(metrics["d_loss"])


@pytest.mark.slow
def test_early_stopping(tmp_path, rng):
    from vitgan_tpu.train.trainer import Trainer

    cfg = C.replace(
        C.smoke_config("mlp"),
        **{"run.early_stop_patience": 1, "run.fid_num_samples": 16,
           "run.checkpoint_every_epochs": 0, "run_name": "early"},
    )
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    # monkeypatch FID to a constant => no improvement => stops after patience
    tr.evaluate_fid = lambda *a, **k: 100.0
    tr.fit(epochs=10)
    assert tr.epoch < 9
