"""Model-zoo tests: every family builds, forwards with correct shapes/ranges,
is jittable, and matches the reference's structural facts (token counts, etc.)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitgan_tpu import config as C
from vitgan_tpu.models import build_gan, count_params
from vitgan_tpu.models.vitgan_v1 import patch_geometry, extract_overlapping_patches
from vitgan_tpu.models.vitgan_v2 import patchify, unpatchify

FAMILIES = ["v1", "v2", "dcgan", "cnn", "mlp"]


def smoke(family):
    return C.smoke_config(family)


@pytest.mark.slow
@pytest.mark.parametrize("family", FAMILIES)
def test_gan_forward_shapes(family, rng):
    cfg = smoke(family)
    gan = build_gan(cfg)
    gvars = gan.generator_init(rng)
    dvars = gan.discriminator_init(jax.random.PRNGKey(1))
    z = gan.sample_latent(jax.random.PRNGKey(2), 4)
    imgs, _ = gan.generator_apply(gvars, z)
    h, w, c = gan.image_shape
    assert imgs.shape == (4, h, w, c)
    assert float(jnp.abs(imgs).max()) <= 1.0 + 1e-5  # tanh/sin bounded outputs
    logits, _ = gan.discriminator_apply(dvars, imgs)
    assert logits.shape == (4,)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
@pytest.mark.parametrize("family", FAMILIES)
def test_gan_jit_and_determinism(family, rng):
    cfg = smoke(family)
    gan = build_gan(cfg)
    gvars = gan.generator_init(rng)
    z = gan.sample_latent(jax.random.PRNGKey(2), 2)
    fwd = jax.jit(lambda v, z: gan.generator_apply(v, z)[0])
    np.testing.assert_allclose(
        np.asarray(fwd(gvars, z)), np.asarray(gan.generator_apply(gvars, z)[0]),
        rtol=2e-5, atol=2e-6,
    )


@pytest.mark.slow
@pytest.mark.parametrize("family", FAMILIES)
def test_train_mode_with_dropout_runs(family, rng):
    cfg = smoke(family)
    gan = build_gan(cfg)
    gvars = gan.generator_init(rng)
    dvars = gan.discriminator_init(jax.random.PRNGKey(1))
    z = gan.sample_latent(jax.random.PRNGKey(2), 2)
    imgs, gstate = gan.generator_apply(gvars, z, rng=jax.random.PRNGKey(3), train=True)
    logits, dstate = gan.discriminator_apply(
        dvars, imgs, rng=jax.random.PRNGKey(4), train=True, update_state=True
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_v1_patch_geometry_matches_reference():
    """32px, patch 8, overlap 2 => window 12, stride 3, 7x7=49 tokens
    (ref:src/v1/patch_encoder.py:17-27)."""
    window, stride, per_side = patch_geometry(32, 8, 2)
    assert (window, stride, per_side) == (12, 3, 7)


def test_overlapping_patches_content():
    """Patch extraction returns the actual image windows."""
    img = jnp.arange(1 * 8 * 8 * 1, dtype=jnp.float32).reshape(1, 8, 8, 1)
    # patch 2, overlap 1 => window 4, stride (8-4)//2+1 = 3, per_side (8-4)//3+1 = 2
    patches = extract_overlapping_patches(img, 2, 1)
    assert patches.shape == (1, 4, 16)
    manual = np.asarray(img[0, 0:4, 0:4, 0]).reshape(-1)
    np.testing.assert_allclose(np.sort(np.asarray(patches[0, 0])), np.sort(manual))


def test_patchify_roundtrip(rng):
    x = jax.random.normal(rng, (2, 32, 32, 3))
    tokens = patchify(x, 4)
    assert tokens.shape == (2, 64, 48)
    np.testing.assert_array_equal(np.asarray(unpatchify(tokens, 4, 32, 3)), np.asarray(x))


def test_v1_generator_uses_image_size_tokens(rng):
    """v1 generator: one token per output row (ref:src/v1/generator.py:24-26,59-68)."""
    cfg = smoke("v1")
    from vitgan_tpu.models import vitgan_v1 as m

    gv = m.generator_init(rng, cfg.v1)
    assert gv["params"]["embedding"].shape == (cfg.v1.image_size, cfg.v1.generator.hidden_size)
    assert gv["params"]["mapping"]["layers"][0]["w"].shape == (
        cfg.v1.latent_dim, cfg.v1.image_size * cfg.v1.generator.hidden_size)


def test_v1_discriminator_spectral_state(rng):
    cfg = smoke("v1")
    from vitgan_tpu.models import vitgan_v1 as m

    dv = m.discriminator_init(rng, cfg.v1)
    assert len(dv["state"]["blocks"]) == cfg.v1.discriminator.depth
    isr = dv["state"]["blocks"][0]["msha"]["isr"]
    assert isr["sigma0"].shape == (3, cfg.v1.discriminator.transformer.num_heads)
    imgs = jax.random.normal(rng, (2, 32, 32, 3))
    _, new_state = m.discriminator_apply(dv, imgs, cfg.v1, update_state=True)
    u0 = np.asarray(dv["state"]["blocks"][0]["msha"]["isr"]["u"])
    u1 = np.asarray(new_state["blocks"][0]["msha"]["isr"]["u"])
    assert not np.array_equal(u0, u1)


@pytest.mark.slow
def test_v2_default_token_count(rng):
    """Full-size v2: (32/4)^2 = 64 patches + CLS = 65 tokens (ref:src/v2/modules.py:74)."""
    from vitgan_tpu.models.vitgan_v2 import vit_init, vit_encode

    cfg = C.V2Config()
    p = vit_init(rng, cfg, n_classes=10)
    assert p["pos"].shape == (64, cfg.embed_dim)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    enc = vit_encode(p, x, cfg)
    assert enc.shape == (2, 65, cfg.embed_dim)


def test_dcgan_batchnorm_state_updates(rng):
    cfg = smoke("dcgan")
    from vitgan_tpu.models import dcgan as m

    dv = m.discriminator_init(rng, cfg.dcgan)
    imgs = jax.random.normal(rng, (4, 32, 32, 3))
    _, st = m.discriminator_apply(dv, imgs, cfg.dcgan, train=True)
    assert not np.array_equal(np.asarray(st["bn1"]["mean"]),
                              np.asarray(dv["state"]["bn1"]["mean"]))
    # eval: state unchanged
    _, st_eval = m.discriminator_apply(dv, imgs, cfg.dcgan, train=False)
    np.testing.assert_array_equal(np.asarray(st_eval["bn1"]["mean"]),
                                  np.asarray(dv["state"]["bn1"]["mean"]))


def test_count_params_positive(rng):
    cfg = smoke("v2")
    gan = build_gan(cfg)
    n = count_params(gan.generator_init(rng)["params"])
    assert n > 1000


def test_minibatch_std_feature_sees_collapse(rng):
    """The mbstd scalar separates a homogeneous batch from a diverse one, and
    contiguous grouping keeps real/fake stats separate under a concatenated
    [real; fake] forward (train/step.py concat_d)."""
    from vitgan_tpu.models.vitgan_v2 import minibatch_std_feature

    diverse = jax.random.normal(rng, (8, 16))
    collapsed = jnp.broadcast_to(diverse[:1], (8, 16))
    s_div = minibatch_std_feature(diverse, group_size=8)
    s_col = minibatch_std_feature(collapsed, group_size=8)
    assert s_div.shape == (8, 1)
    assert float(s_div[0, 0]) > 0.5
    assert float(s_col[0, 0]) < 1e-3
    # concat case: rows 0..7 real (diverse), rows 8..15 fake (collapsed) —
    # each group's scalar reflects only its own half
    both = jnp.concatenate([diverse, collapsed], axis=0)
    s = minibatch_std_feature(both, group_size=8)
    assert float(s[0, 0]) > 0.5 and float(s[8, 0]) < 1e-3


def test_v2_minibatch_std_discriminator_trains(rng):
    """minibatch_std=True widens the head and the full train step runs."""
    from vitgan_tpu.train import create_train_state
    from vitgan_tpu.train.step import make_train_step

    cfg = C.replace(smoke("v2"), **{"v2.minibatch_std": True})
    gan = build_gan(cfg)
    dvars = gan.discriminator_init(jax.random.PRNGKey(1))
    e = cfg.model.embed_dim
    assert dvars["params"]["head_fc1"]["w"].shape[0] == e + 1
    state = create_train_state(rng, gan, cfg)
    step = make_train_step(gan, cfg, donate=False)
    h, w, c = gan.image_shape
    real = jnp.zeros((cfg.model.batch_size, h, w, c))
    state2, m = step(state, real)
    assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))


def test_g_diversity_changes_bce_g_loss(rng):
    """v2.g_diversity subtracts the diversity bonus from the BCE G loss."""
    from vitgan_tpu.train import create_train_state
    from vitgan_tpu.train.step import make_train_step

    base = smoke("v2")
    h, w, c = base.model.image_size, base.model.image_size, base.model.channels
    real = jax.random.uniform(jax.random.PRNGKey(3),
                              (base.model.batch_size, h, w, c)) * 2 - 1
    losses = {}
    for gd in (False, True):
        cfg = C.replace(base, **{"v2.g_diversity": gd,
                                 "v2.diversity_weight": 0.5})
        gan = build_gan(cfg)
        state = create_train_state(rng, gan, cfg)
        step = make_train_step(gan, cfg, donate=False)
        _, m = step(state, real)
        losses[gd] = float(m["g_loss"])
    # same seed/params, so the two runs differ exactly by the bonus term
    assert losses[True] < losses[False]
