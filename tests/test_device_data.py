"""Device-resident dataset training path: parity and trainer integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitgan_tpu import config as C
from vitgan_tpu.models import build_gan
from vitgan_tpu.train import create_train_state, make_train_step
from vitgan_tpu.train.step import make_device_data_train_fn


def test_device_data_matches_host_path(rng):
    cfg = C.smoke_config("mlp")
    gan = build_gan(cfg)
    state_a = create_train_state(rng, gan, cfg)
    state_b = create_train_state(rng, gan, cfg)

    dataset = np.random.default_rng(0).integers(0, 256, (40, 32, 32, 3), dtype=np.uint8)
    idx = np.array([[0, 1, 2, 3, 4, 5, 6, 7], [8, 9, 10, 11, 12, 13, 14, 15]], np.int32)

    single = make_train_step(gan, cfg, donate=False)
    for row in idx:
        real = dataset[row].astype(np.float32) * (2.0 / 255.0) - 1.0
        state_a, m_host = single(state_a, jnp.asarray(real))

    fn = make_device_data_train_fn(gan, cfg, 2, donate=False)
    state_b, ms = fn(state_b, jax.device_put(dataset), jnp.asarray(idx))

    np.testing.assert_allclose(float(ms["d_loss"][-1]), float(m_host["d_loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state_a.g_params), jax.tree.leaves(state_b.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_scan_unroll_is_semantics_preserving(rng):
    """runtime.scan_unroll may change scheduling, never numerics: the unrolled
    scan must produce the same trajectory as the rolled one."""
    cfg1 = C.smoke_config("mlp")
    cfg2 = C.replace(cfg1, **{"runtime.scan_unroll": 2})
    dataset = np.random.default_rng(0).integers(0, 256, (40, 32, 32, 3), dtype=np.uint8)
    idx = np.arange(32, dtype=np.int32).reshape(4, 8)

    outs = []
    for cfg in (cfg1, cfg2):
        gan = build_gan(cfg)
        state = create_train_state(rng, gan, cfg)
        fn = make_device_data_train_fn(gan, cfg, 4, donate=False)
        state, ms = fn(state, jax.device_put(dataset), jnp.asarray(idx))
        outs.append((state, ms))
    (sa, ma), (sb, mb) = outs
    np.testing.assert_allclose(np.asarray(ma["d_loss"]), np.asarray(mb["d_loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(sa.g_params), jax.tree.leaves(sb.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_trainer_on_device_path(tmp_path):
    """Single-device mesh triggers the on-device dataset path, incl. remainder."""
    from vitgan_tpu.parallel import make_mesh
    from vitgan_tpu.train.trainer import Trainer

    mesh = make_mesh(devices=jax.devices()[:1])
    cfg = C.replace(
        C.smoke_config("mlp"),
        **{"run.steps_per_call": 2, "run.steps_per_epoch": 5, "run.fid_num_samples": 16,
           "run.checkpoint_every_epochs": 0, "run_name": "ondev"},
    )
    tr = Trainer(cfg, mesh=mesh, run_base=str(tmp_path), fid_extractor="random_conv")
    assert tr._device_dataset is not None
    metrics = tr.fit(epochs=1)
    assert int(tr.state.step) == 5  # 2+2+1 remainder
    assert np.isfinite(metrics["d_loss"])


@pytest.mark.slow
def test_trainer_partial_batch_falls_back_to_host_path(tmp_path):
    """Regression: drop_last=False with a real partial batch must use the host
    pipeline (the fixed-shape on-device scan would silently drop it)."""
    from vitgan_tpu.parallel import make_mesh
    from vitgan_tpu.train.trainer import Trainer

    mesh = make_mesh(devices=jax.devices()[:1])
    base = C.replace(
        C.smoke_config("mlp"),
        **{"data.synthetic_samples": 20, "data.drop_last": False,
           "run.steps_per_epoch": 0, "run.checkpoint_every_epochs": 0,
           "run.fid_num_samples": 16},
    )
    tr = Trainer(C.replace(base, run_name="partial"), mesh=mesh,
                 run_base=str(tmp_path), fid_extractor="random_conv")
    assert tr._device_dataset is None
    tr.fit(epochs=1)
    assert int(tr.state.step) == 3  # 8 + 8 + the 4-sample partial batch

    even = C.replace(base, **{"data.drop_last": True}, run_name="full")
    tr2 = Trainer(even, mesh=mesh, run_base=str(tmp_path),
                  fid_extractor="random_conv")
    assert tr2._device_dataset is not None


def test_on_device_fid_small_dataset_draws_with_replacement(tmp_path):
    """Regression: choice(replace=False) crashed when batch_size exceeded the
    dataset size in the on-device FID real-index draw."""
    from vitgan_tpu.parallel import make_mesh
    from vitgan_tpu.train.trainer import Trainer

    mesh = make_mesh(devices=jax.devices()[:1])
    cfg = C.replace(
        C.smoke_config("mlp"),
        **{"data.synthetic_samples": 4, "run.checkpoint_every_epochs": 0},
        run_name="tinyfid",
    )
    tr = Trainer(cfg, mesh=mesh, run_base=str(tmp_path),
                 fid_extractor="random_conv")
    assert tr._device_dataset is not None
    assert np.isfinite(tr.evaluate_fid())


def test_trainer_multi_device_uses_host_path(tmp_path, mesh8):
    from vitgan_tpu.train.trainer import Trainer

    cfg = C.replace(C.smoke_config("mlp"), run_name="hostpath")
    tr = Trainer(cfg, mesh=mesh8, run_base=str(tmp_path), fid_extractor="random_conv")
    assert tr._device_dataset is None
