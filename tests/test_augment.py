"""Augmentation kernel tests: shapes, semantics, differentiability, wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitgan_tpu.ops import augment as A


@pytest.fixture
def imgs(rng):
    return jax.random.uniform(rng, (8, 16, 16, 3), minval=-1, maxval=1)


def test_random_flip_only_mirrors(imgs, rng):
    out = A.random_flip(rng, imgs)
    for i in range(8):
        same = np.array_equal(np.asarray(out[i]), np.asarray(imgs[i]))
        mirrored = np.array_equal(np.asarray(out[i]), np.asarray(imgs[i, :, ::-1, :]))
        assert same or mirrored


def test_random_brightness_shift(imgs, rng):
    out = A.random_brightness(rng, imgs)
    deltas = np.asarray(out - imgs)
    # constant shift per sample
    for i in range(8):
        assert deltas[i].std() < 1e-6
        assert abs(deltas[i].mean()) <= 0.5 + 1e-6


def test_random_contrast_preserves_mean(imgs, rng):
    out = A.random_contrast(rng, imgs)
    np.testing.assert_allclose(
        np.asarray(out.mean(axis=(1, 2, 3))), np.asarray(imgs.mean(axis=(1, 2, 3))),
        atol=1e-5,
    )


def test_random_translation_zero_pad(rng):
    x = jnp.ones((4, 8, 8, 3))
    out = A.random_translation(rng, x, ratio=0.25)
    assert out.shape == x.shape
    vals = np.unique(np.asarray(out))
    assert set(vals).issubset({0.0, 1.0})


def test_random_cutout_area(rng):
    x = jnp.ones((4, 16, 16, 1))
    out = A.random_cutout(rng, x, ratio=0.5)
    zeros = np.asarray(out == 0).reshape(4, -1).sum(1)
    np.testing.assert_array_equal(zeros, 64)  # 8x8 window


def test_parse_spec_groups():
    names = A.parse_augment_spec("color,translation")
    assert names == ("brightness", "saturation", "contrast", "translation")
    with pytest.raises(ValueError):
        A.parse_augment_spec("sharpen")


def test_augment_differentiable(imgs, rng):
    def loss(x):
        return jnp.sum(A.apply_augment(rng, x, "color,translation,cutout") ** 2)

    g = jax.grad(loss)(imgs)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_train_step_with_diffaugment(rng):
    from vitgan_tpu import config as C
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.train import create_train_state, make_train_step

    cfg = C.replace(C.smoke_config("mlp"), **{"run.diff_augment": "color,cutout"})
    gan = build_gan(cfg)
    state = create_train_state(rng, gan, cfg)
    step = make_train_step(gan, cfg, donate=False)
    real = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3)) * 2 - 1
    state, metrics = step(state, real)
    assert np.isfinite(float(metrics["d_loss"])) and np.isfinite(float(metrics["g_loss"]))


def test_deit64_and_highres_configs_build():
    from vitgan_tpu import config as C
    from vitgan_tpu.models import build_gan

    c1 = C.deit64_config()
    assert c1.v2.image_size == 64 and c1.run.diff_augment
    c2 = C.highres_config(128)
    assert c2.runtime.remat and c2.v2.depth == 12
    build_gan(c1), build_gan(c2)
    hash(c1), hash(c2)


def test_remat_forward_matches(rng):
    from vitgan_tpu import config as C
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.ops.policy import set_policy

    cfg = C.smoke_config("v2")
    gan = build_gan(cfg)
    gvars = gan.generator_init(rng)
    z = gan.sample_latent(jax.random.PRNGKey(1), 2)
    set_policy(remat=False)
    want, _ = gan.generator_apply(gvars, z)
    try:
        for mode in ("full", "dots", "attn"):
            set_policy(remat=mode)
            got, _ = gan.generator_apply(gvars, z)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-6, err_msg=mode)
    finally:
        set_policy(remat=False)


@pytest.mark.slow
def test_remat_gradients_match(rng):
    """'full'/'dots'/'attn' remat change only what's saved for the backward —
    gradients must be identical to the unremated path."""
    from vitgan_tpu import config as C
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.ops.policy import set_policy

    cfg = C.smoke_config("v2")
    gan = build_gan(cfg)
    gvars = gan.generator_init(rng)
    z = gan.sample_latent(jax.random.PRNGKey(1), 2)

    def loss(params):
        out, _ = gan.generator_apply({**gvars, "params": params}, z)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    set_policy(remat=False)
    want = jax.grad(loss)(gvars["params"])
    try:
        for mode in ("full", "dots", "attn"):
            set_policy(remat=mode)
            got = jax.grad(loss)(gvars["params"])
            for a, b in zip(jax.tree_util.tree_leaves(got),
                            jax.tree_util.tree_leaves(want)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-4, atol=1e-5, err_msg=mode)
    finally:
        set_policy(remat=False)
