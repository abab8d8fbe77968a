"""LR schedules (OptimConfig.schedule) — the working version of the
reference's dead scheduler lines (ref:src/v2/training.py:215-217)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitgan_tpu import config as C
from vitgan_tpu.train.state import make_lr, make_optimizer


def test_make_lr_shapes():
    const = make_lr(C.OptimConfig())
    assert const == 2e-4
    warm = make_lr(C.OptimConfig(warmup_steps=10))
    assert float(warm(0)) == 0.0
    np.testing.assert_allclose(float(warm(10)), 2e-4, rtol=1e-6)
    cos = make_lr(C.OptimConfig(schedule="cosine", decay_steps=100,
                                min_lr_ratio=0.1))
    np.testing.assert_allclose(float(cos(0)), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(float(cos(100)), 2e-5, rtol=1e-5)
    wc = make_lr(C.OptimConfig(schedule="warmup_cosine", warmup_steps=5,
                               decay_steps=50))
    assert float(wc(0)) == 0.0
    np.testing.assert_allclose(float(wc(5)), 2e-4, rtol=1e-6)
    assert float(wc(50)) < 1e-6
    with pytest.raises(ValueError, match="decay_steps"):
        make_lr(C.OptimConfig(schedule="cosine"))
    with pytest.raises(ValueError, match="unknown schedule"):
        make_lr(C.OptimConfig(schedule="plateau"))


def test_schedule_drives_update_magnitude():
    """SGD step size tracks the schedule exactly (and the count resumes with
    the optimizer state)."""
    cfg = C.OptimConfig(name="sgd", learning_rate=1.0, schedule="cosine",
                        decay_steps=10, min_lr_ratio=0.0)
    tx = make_optimizer(cfg)
    p = {"w": jnp.ones((4,))}
    g = {"w": jnp.ones((4,))}
    s = tx.init(p)
    sched = make_lr(cfg)
    for i in range(5):
        upd, s = tx.update(g, s, p)
        np.testing.assert_allclose(-float(upd["w"][0]), float(sched(i)),
                                   rtol=1e-6)


def test_grad_accum_sgd_semantics():
    """MultiSteps: zero updates for k-1 calls, then the MEAN accumulated
    gradient applies (clip wraps inside, so it clips the large-batch mean)."""
    cfg = C.OptimConfig(name="sgd", learning_rate=1.0, grad_accum=3)
    tx = make_optimizer(cfg)
    p = {"w": jnp.zeros((2,))}
    s = tx.init(p)
    grads = [{"w": jnp.full((2,), g)} for g in (1.0, 2.0, 6.0)]
    outs = []
    for g in grads:
        u, s = tx.update(g, s, p)
        outs.append(float(u["w"][0]))
    assert outs[0] == 0.0 and outs[1] == 0.0
    np.testing.assert_allclose(outs[2], -3.0, rtol=1e-6)  # mean(1,2,6) * lr 1


@pytest.mark.slow
def test_train_step_grad_accum_freezes_then_applies():
    """v2 step with grad_accum=2: params frozen after the first call, updated
    after the second — and checkpointable mid-accumulation (the accumulator
    rides in TrainState)."""
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import create_train_state, make_train_step

    cfg = C.replace(
        C.smoke_config("v2"),
        **{"v2.gen_optim.grad_accum": 2, "v2.disc_optim.grad_accum": 2,
           "v2.dropout": 0.0, "runtime.donate_state": False})
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    real = jax.random.uniform(jax.random.PRNGKey(1),
                              (cfg.model.batch_size, cfg.model.image_size,
                               cfg.model.image_size, cfg.model.channels),
                              minval=-1.0, maxval=1.0)
    step = make_train_step(gan, cfg, donate=False)
    s1, _ = step(state, real)
    for a, b in zip(jax.tree.leaves(s1.g_params), jax.tree.leaves(state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s2, _ = step(s1, real)
    moved = any(not np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(s2.g_params),
                                jax.tree.leaves(s1.g_params)))
    assert moved


@pytest.mark.slow
def test_train_step_with_schedule_runs():
    """Full v2 train step with warmup-cosine on both optimizers."""
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import create_train_state, make_train_step

    cfg = C.replace(
        C.smoke_config("v2"),
        **{"v2.gen_optim.schedule": "warmup_cosine",
           "v2.gen_optim.warmup_steps": 2, "v2.gen_optim.decay_steps": 10,
           "v2.disc_optim.schedule": "cosine", "v2.disc_optim.decay_steps": 10,
           "runtime.donate_state": False})
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    real = jax.random.uniform(jax.random.PRNGKey(1),
                              (cfg.model.batch_size, cfg.model.image_size,
                               cfg.model.image_size, cfg.model.channels),
                              minval=-1.0, maxval=1.0)
    step = make_train_step(gan, cfg, donate=False)
    s1, m1 = step(state, real)
    # warmup step 0: lr 0 -> G params unchanged
    for a, b in zip(jax.tree.leaves(s1.g_params), jax.tree.leaves(state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s2, m2 = step(s1, real)
    # step 1: warmup lr > 0 -> G params move
    moved = any(not np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(s2.g_params),
                                jax.tree.leaves(s1.g_params)))
    assert moved
    assert np.isfinite(float(m2["g_loss"]))

@pytest.mark.slow
def test_grad_accum_ema_gated_on_effective_updates():
    """EMA must not decay on frozen-param accumulation calls — its horizon
    tracks EFFECTIVE updates, matching the large-batch baseline."""
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import create_train_state, make_train_step

    cfg = C.replace(
        C.smoke_config("v2"),
        **{"v2.gen_optim.grad_accum": 2, "v2.disc_optim.grad_accum": 2,
           "v2.dropout": 0.0, "run.ema_decay": 0.9,
           "runtime.donate_state": False})
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    real = jax.random.uniform(jax.random.PRNGKey(1),
                              (cfg.model.batch_size, cfg.model.image_size,
                               cfg.model.image_size, cfg.model.channels),
                              minval=-1.0, maxval=1.0)
    step = make_train_step(gan, cfg, donate=False)
    s1, _ = step(state, real)
    # accumulation-only call: params frozen AND ema untouched
    for a, b in zip(jax.tree.leaves(s1.g_ema), jax.tree.leaves(state.g_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s2, _ = step(s1, real)
    moved = any(not np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(s2.g_ema),
                                jax.tree.leaves(s1.g_ema)))
    assert moved
