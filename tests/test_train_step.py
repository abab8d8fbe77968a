"""Train-step tests: losses' golden values, one jitted step per family, loss
decreases over a few steps, WGAN-GP path, multi-device data parallelism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitgan_tpu import config as C
from vitgan_tpu.models import build_gan
from vitgan_tpu.parallel import shard_batch, shard_pytree_replicated
from vitgan_tpu.train import create_train_state, make_train_step, make_sample_fn
from vitgan_tpu.train import losses as LO


# ---------------------------------------------------------------------------
# Loss golden tests
# ---------------------------------------------------------------------------


def test_bce_with_logits_golden():
    logits = jnp.array([0.0, 2.0, -2.0])
    targets = jnp.array([1.0, 1.0, 0.0])
    # manual: -log(sigmoid(0)), -log(sigmoid(2)), -log(1-sigmoid(-2))
    expected = np.mean([np.log(2.0), np.log1p(np.exp(-2.0)), np.log1p(np.exp(-2.0))])
    np.testing.assert_allclose(float(LO.bce_with_logits(logits, targets)), expected, rtol=1e-6)


def test_bce_matches_torch_formulation():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(64,)).astype(np.float32)
    targets = rng.integers(0, 2, size=(64,)).astype(np.float32)
    ours = float(LO.bce_with_logits(jnp.array(logits), jnp.array(targets)))
    theirs = float(
        torch.nn.functional.binary_cross_entropy_with_logits(
            torch.tensor(logits), torch.tensor(targets)
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_wasserstein_losses():
    real = jnp.array([1.0, 3.0])
    fake = jnp.array([0.0, 2.0])
    assert float(LO.wasserstein_d_loss(real, fake)) == pytest.approx(-1.0)
    assert float(LO.wasserstein_g_loss(fake)) == pytest.approx(-1.0)


def test_gradient_penalty_unit_for_linear_disc(rng):
    """For D(x) = sum(x), grad is all-ones => ||grad|| = sqrt(dim), GP=(sqrt(dim)-1)^2."""
    real = jax.random.normal(rng, (4, 2, 2, 1))
    fake = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 2, 1))
    gp = LO.gradient_penalty(lambda x: jnp.sum(x, axis=(1, 2, 3)), real, fake, rng)
    np.testing.assert_allclose(float(gp), (np.sqrt(4.0) - 1) ** 2, rtol=1e-5)


def test_diversity_loss_zero_for_identical():
    x = jnp.ones((4, 8, 8, 3))
    assert float(LO.diversity_loss(x)) == pytest.approx(0.0)
    x2 = x.at[0].set(-1.0)
    assert float(LO.diversity_loss(x2)) > 0


def test_accuracy_from_logits():
    logits = jnp.array([1.0, -1.0, 2.0, -2.0])
    assert float(LO.accuracy_from_logits(logits, True)) == pytest.approx(0.5)
    assert float(LO.accuracy_from_logits(logits, False)) == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------


@pytest.mark.slow
@pytest.mark.parametrize("family", ["v1", "v2", "dcgan", "cnn", "mlp"])
def test_one_train_step(family, rng):
    cfg = C.smoke_config(family)
    gan = build_gan(cfg)
    state = create_train_state(rng, gan, cfg)
    step = make_train_step(gan, cfg, donate=False)
    m = cfg.model
    real = jax.random.uniform(jax.random.PRNGKey(1), (m.batch_size, m.image_size, m.image_size, m.channels)) * 2 - 1
    new_state, metrics = step(state, real)
    assert int(new_state.step) == 1
    for k in ("d_loss", "g_loss", "d_real_acc", "d_grad_norm"):
        assert np.isfinite(float(metrics[k])), k
    # params actually moved
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.g_params, new_state.g_params)
    assert max(jax.tree.leaves(delta)) > 0


def test_training_reduces_losses(rng):
    """A few steps on a fixed batch should move D toward separating real/fake."""
    cfg = C.smoke_config("mlp")
    gan = build_gan(cfg)
    state = create_train_state(rng, gan, cfg)
    step = make_train_step(gan, cfg, donate=False)
    real = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3)) * 2 - 1
    first = None
    for _ in range(30):
        state, metrics = step(state, real)
        if first is None:
            first = float(metrics["d_loss"])
    assert float(metrics["d_loss"]) < first


@pytest.mark.slow
def test_wgan_gp_step(rng):
    cfg = C.smoke_config("v2")
    cfg = C.replace(cfg, **{"v2.loss": "wgan-gp"})
    gan = build_gan(cfg)
    state = create_train_state(rng, gan, cfg)
    step = make_train_step(gan, cfg, donate=False)
    real = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3)) * 2 - 1
    state, metrics = step(state, real)
    assert np.isfinite(float(metrics["d_loss"])) and np.isfinite(float(metrics["g_loss"]))


def test_r1_penalty_closed_form(rng):
    """For D(x) = a.x (linear), grad_x D = a everywhere => R1 = ||a||^2."""
    real = jax.random.normal(rng, (4, 2, 2, 1))
    a = jnp.arange(1.0, 5.0).reshape(1, 2, 2, 1)
    r1 = LO.r1_penalty(lambda x: jnp.sum(x * a, axis=(1, 2, 3)), real)
    np.testing.assert_allclose(float(r1), float(jnp.sum(a * a)), rtol=1e-5)


@pytest.mark.slow
def test_r1_step_changes_d_update_and_stays_finite(rng):
    cfg = C.smoke_config("v2")
    real = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3)) * 2 - 1

    def run(gamma):
        c = C.replace(cfg, **{"v2.r1_gamma": gamma})
        gan = build_gan(c)
        state = create_train_state(rng, gan, c)
        step = make_train_step(gan, c, donate=False)
        new_state, metrics = step(state, real)
        assert np.isfinite(float(metrics["d_loss"]))
        return jax.tree_util.tree_leaves(new_state.d_params)[0]

    base, reg = run(0.0), run(10.0)
    assert not np.allclose(np.asarray(base), np.asarray(reg))


@pytest.mark.slow
def test_lazy_r1_applies_only_on_interval_steps(rng):
    """r1_interval=k: step 0 (0 % k == 0) is penalized, step 1 computes the
    plain BCE update (same math as r1_gamma=0; compared with a tight
    tolerance, not bitwise — the cond branch and the straight-line program
    are different XLA executables and fusion choices may differ in low-order
    bits)."""
    cfg_plain = C.replace(C.smoke_config("v2"), **{"v2.r1_gamma": 0.0})
    cfg_lazy = C.replace(C.smoke_config("v2"),
                         **{"v2.r1_gamma": 10.0, "v2.r1_interval": 2})
    real = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3)) * 2 - 1

    def d_leaf_after_one_step(cfg, step0):
        gan = build_gan(cfg)
        state = create_train_state(rng, gan, cfg)
        state = state.replace(step=jnp.asarray(step0, jnp.int32))
        new_state, m = make_train_step(gan, cfg, donate=False)(state, real)
        assert np.isfinite(float(m["d_loss"]))
        return np.asarray(jax.tree_util.tree_leaves(new_state.d_params)[0])

    # On-step (step counter 0): penalty active => differs from plain.
    assert not np.allclose(d_leaf_after_one_step(cfg_lazy, 0),
                           d_leaf_after_one_step(cfg_plain, 0))
    # Off-step (step counter 1): the plain BCE update (tight tolerance).
    np.testing.assert_allclose(d_leaf_after_one_step(cfg_lazy, 1),
                               d_leaf_after_one_step(cfg_plain, 1),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_step_data_parallel_matches_single_device(rng, mesh8):
    """Same step, batch sharded over 8 devices vs unsharded: identical result."""
    cfg = C.smoke_config("mlp")
    gan = build_gan(cfg)
    state = create_train_state(rng, gan, cfg)
    step = make_train_step(gan, cfg, donate=False)
    real = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (16, 32, 32, 3)) * 2 - 1
    )
    _, m_single = step(state, jnp.array(real))
    state_r = shard_pytree_replicated(mesh8, state)
    real_sharded = shard_batch(mesh8, real)
    _, m_sharded = step(state_r, real_sharded)
    np.testing.assert_allclose(
        float(m_single["d_loss"]), float(m_sharded["d_loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(m_single["g_loss"]), float(m_sharded["g_loss"]), rtol=1e-4
    )


def test_sample_fn(rng):
    cfg = C.smoke_config("v2")
    gan = build_gan(cfg)
    state = create_train_state(rng, gan, cfg)
    sample = make_sample_fn(gan, cfg)
    z = gan.sample_latent(jax.random.PRNGKey(5), 4)
    imgs = sample(state.g_vars, z)
    assert imgs.shape == (4, 32, 32, 3) and imgs.dtype == jnp.float32
    # deterministic (eval mode, no dropout)
    np.testing.assert_array_equal(np.asarray(imgs), np.asarray(sample(state.g_vars, z)))


@pytest.mark.slow
def test_isr_state_advances_each_step(rng):
    cfg = C.smoke_config("v1")
    gan = build_gan(cfg)
    state = create_train_state(rng, gan, cfg)
    step = make_train_step(gan, cfg, donate=False)
    real = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3)) * 2 - 1
    new_state, _ = step(state, real)
    u0 = np.asarray(state.d_state["blocks"][0]["msha"]["isr"]["u"])
    u1 = np.asarray(new_state.d_state["blocks"][0]["msha"]["isr"]["u"])
    assert not np.array_equal(u0, u1)
    # sigma0 is frozen forever
    np.testing.assert_array_equal(
        np.asarray(state.d_state["blocks"][0]["msha"]["isr"]["sigma0"]),
        np.asarray(new_state.d_state["blocks"][0]["msha"]["isr"]["sigma0"]),
    )


@pytest.mark.slow
def test_disc_steps_extra_critic_iterations(rng):
    """WGAN n_critic (disc_steps): k>1 runs k-1 extra critic updates on fresh
    latents before the final one — the D params must land somewhere different
    from the single-update step, the G update count is unchanged, and the
    step stays finite.  disc_steps=1 shares the exact 11-way key split with
    the pre-knob step (bit-identical; pinned by the determinism suite)."""
    real = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3)) * 2 - 1

    def run(k):
        cfg = C.replace(C.smoke_config("v2"),
                        **{"v2.loss": "wgan-gp", "v2.disc_steps": k})
        gan = build_gan(cfg)
        state = create_train_state(rng, gan, cfg)
        step = make_train_step(gan, cfg, donate=False)
        s2, metrics = step(state, real)
        assert np.isfinite(float(metrics["d_loss"]))
        assert np.isfinite(float(metrics["g_loss"]))
        return s2

    s1, s3 = run(1), run(3)
    d1 = np.asarray(jax.tree_util.tree_leaves(s1.d_params)[0])
    d3 = np.asarray(jax.tree_util.tree_leaves(s3.d_params)[0])
    assert not np.allclose(d1, d3), "extra critic iterations must move D"
    # G stepped exactly once either way: optimizer step counters agree.
    g1 = jax.tree_util.tree_leaves(s1.g_opt)
    g3 = jax.tree_util.tree_leaves(s3.g_opt)
    assert len(g1) == len(g3)
