"""On-device FID: moments computed on chip match the host FeatureStats path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitgan_tpu import config as C
from vitgan_tpu.train import fid as F


class _FakeBundle:
    """Generator that always emits a fixed image set (lets us compare FID paths
    on identical pixels)."""

    def __init__(self, fixed_imgs):
        self.fixed = jnp.asarray(fixed_imgs)  # (B, H, W, C) in [-1, 1]

    def sample_latent(self, rng, n):
        return jnp.zeros((n, 4), jnp.float32)

    def generator_apply(self, g_vars, z, **kw):
        return self.fixed[: z.shape[0]], {}


@pytest.mark.slow
def test_on_device_fid_matches_host_math(rng):
    cfg = C.smoke_config("mlp")
    b, n_batches, dim = 8, 2, 64
    rng_np = np.random.default_rng(0)
    dataset = rng_np.integers(0, 256, (64, 16, 16, 3), dtype=np.uint8)
    fake_imgs = rng_np.uniform(-1, 1, (b, 16, 16, 3)).astype(np.float32)

    params = F._random_conv_params(jax.random.PRNGKey(42), 3)
    gan = _FakeBundle(fake_imgs)
    fid_fn = F.make_on_device_fid(gan, cfg, params, b, n_batches, feature_dim=dim)

    real_idx = rng_np.choice(64, size=(n_batches, b), replace=False).astype(np.int32)
    got = fid_fn({}, jax.device_put(dataset), jnp.asarray(real_idx), jax.random.PRNGKey(0))

    # Host reference with the exact same pixels.
    feats = lambda u8: np.asarray(  # noqa: E731
        F.random_conv_features(params, jnp.asarray(u8), dim), np.float64
    )
    rs, fs = F.FeatureStats(dim), F.FeatureStats(dim)
    for row in real_idx:
        rs.update(feats(dataset[row]))
    fake_u8 = F.to_uint8(fake_imgs)
    for _ in range(n_batches):
        fs.update(feats(fake_u8))
    mu_r, cov_r = rs.moments()
    mu_f, cov_f = fs.moments()
    want = F.frechet_distance(mu_r, cov_r, mu_f, cov_f)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_trainer_on_device_fid(tmp_path):
    from vitgan_tpu.parallel import make_mesh
    from vitgan_tpu.train.trainer import Trainer

    mesh = make_mesh(devices=jax.devices()[:1])
    cfg = C.replace(C.smoke_config("mlp"),
                    **{"run.fid_num_samples": 16, "run_name": "odfid"})
    tr = Trainer(cfg, mesh=mesh, run_base=str(tmp_path), fid_extractor="random_conv")
    assert tr._device_dataset is not None
    val = tr.evaluate_fid()
    assert np.isfinite(val) and val >= 0
