"""FID math golden tests, checkpoint save/restore roundtrip, image grids."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitgan_tpu import config as C
from vitgan_tpu.models import build_gan
from vitgan_tpu.train import create_train_state
from vitgan_tpu.train import fid as F
from vitgan_tpu.utils.checkpoint import CheckpointManager
from vitgan_tpu.utils.images import make_grid, save_image_grid


# ---------------------------------------------------------------------------
# Frechet distance math
# ---------------------------------------------------------------------------


def test_frechet_identical_is_zero():
    mu = np.array([1.0, 2.0])
    cov = np.array([[2.0, 0.3], [0.3, 1.0]])
    assert F.frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-8)


def test_frechet_mean_shift_analytic():
    """Equal covariances: FID = ||mu1-mu2||^2."""
    cov = np.eye(3)
    mu1, mu2 = np.zeros(3), np.array([1.0, 2.0, 2.0])
    assert F.frechet_distance(mu1, cov, mu2, cov) == pytest.approx(9.0, rel=1e-9)


def test_frechet_diagonal_analytic():
    """1-D Gaussians: d^2 = (m1-m2)^2 + (s1-s2)^2."""
    got = F.frechet_distance([0.0], [[4.0]], [1.0], [[1.0]])
    assert got == pytest.approx(1.0 + (2.0 - 1.0) ** 2, rel=1e-9)


def test_feature_stats_streaming_matches_batch():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(100, 6))
    st = F.FeatureStats(6)
    for chunk in np.array_split(data, 7):
        st.update(chunk)
    mu, cov = st.moments()
    np.testing.assert_allclose(mu, data.mean(0), rtol=1e-10)
    np.testing.assert_allclose(cov, np.cov(data, rowvar=False), rtol=1e-8)


def test_fid_sensitive_to_distribution_gap():
    """Same-distribution FID << shifted-distribution FID via the random-conv extractor."""
    ex = F.make_random_conv_extractor(channels=3, seed=0)
    rng = np.random.default_rng(1)
    real = rng.integers(100, 156, size=(256, 32, 32, 3), dtype=np.uint8)

    def sample_same(key, n):
        return (rng.integers(100, 156, size=(n, 32, 32, 3)).astype(np.float32) / 127.5) - 1.0

    def sample_far(key, n):
        return np.full((n, 32, 32, 3), -1.0, np.float32)

    batches = lambda: iter([real[i : i + 64] for i in range(0, 256, 64)])  # noqa: E731
    key = jax.random.PRNGKey(0)
    fid_same = F.compute_fid(sample_same, batches(), ex, key, 256, 64)
    fid_far = F.compute_fid(sample_far, batches(), ex, key, 256, 64)
    assert fid_far > 10 * max(fid_same, 1e-6)


def test_to_uint8_roundtrip():
    x = np.array([-1.0, 0.0, 1.0], np.float32).reshape(1, 1, 3, 1)
    np.testing.assert_array_equal(F.to_uint8(x).ravel(), [0, 128, 255])


# ---------------------------------------------------------------------------
# Checkpointing
# ---------------------------------------------------------------------------


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = C.smoke_config("mlp")
    gan = build_gan(cfg)
    state = create_train_state(rng, gan, cfg)
    mgr = CheckpointManager(str(tmp_path), keep=2)
    mgr.save(0, jax.device_get(state), {"epoch": 0})
    restored, meta = mgr.restore(state)
    assert meta["epoch"] == 0
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_retention_and_latest(tmp_path, rng):
    cfg = C.smoke_config("mlp")
    gan = build_gan(cfg)
    state = jax.device_get(create_train_state(rng, gan, cfg))
    mgr = CheckpointManager(str(tmp_path), keep=2)
    for s in (1, 2, 3, 4):
        mgr.save(s, state)
    mgr.wait()  # saves are async; settle before inspecting the directory
    assert mgr.all_steps() == [3, 4]
    assert mgr.latest_step() == 4


def test_checkpoint_retention_never_strands_a_run(tmp_path, rng):
    """Regression: _retain ran right after dispatching the async save, so at
    keep=1 the only durable checkpoint was deleted while the new one was still
    in flight — a crash in that window left nothing restorable."""
    cfg = C.smoke_config("mlp")
    gan = build_gan(cfg)
    state = jax.device_get(create_train_state(rng, gan, cfg))
    mgr = CheckpointManager(str(tmp_path), keep=1)
    mgr.save(1, state)
    mgr.save(2, state)  # step 2 may still be in flight here...
    assert 1 in mgr.all_steps()  # ...so step 1 must still be on disk
    mgr.wait()  # everything durable: trim to exactly keep
    assert mgr.all_steps() == [2]


def test_checkpoint_best(tmp_path, rng):
    cfg = C.smoke_config("mlp")
    gan = build_gan(cfg)
    state = jax.device_get(create_train_state(rng, gan, cfg))
    mgr = CheckpointManager(str(tmp_path))
    mgr.save_best(5, state, "fid", 12.5)
    restored, meta = mgr.restore(state, best=True)
    assert meta["value"] == 12.5 and meta["metric"] == "fid"


# ---------------------------------------------------------------------------
# Image grids
# ---------------------------------------------------------------------------


def test_make_grid_shape():
    imgs = np.zeros((9, 8, 8, 3), np.uint8)
    grid = make_grid(imgs, nrow=3, pad=1)
    assert grid.shape == (3 * 9 + 1, 3 * 9 + 1, 3)


def test_save_image_grid(tmp_path):
    imgs = np.random.default_rng(0).uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
    path = str(tmp_path / "grid.png")
    save_image_grid(path, imgs)
    assert os.path.getsize(path) > 0
