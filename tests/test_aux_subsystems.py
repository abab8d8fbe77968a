"""Aux-subsystem tests: validation path, profiler trace, warm start, multi-host
data slicing, EMA/early-stopping helpers, partial checkpoint load."""

import os

import jax
import numpy as np
import pytest

from vitgan_tpu import config as C
from vitgan_tpu.data.datasets import synthetic_dataset
from vitgan_tpu.data.pipeline import HostDataPipeline
from vitgan_tpu.utils.checkpoint import partial_load
from vitgan_tpu.utils.logging import EarlyStopping, MovingAverage


@pytest.fixture()
def trainer(tmp_path):
    from vitgan_tpu.train.trainer import Trainer

    cfg = C.replace(C.smoke_config("mlp"), run_name="aux")
    return Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")


@pytest.mark.slow
def test_validate(trainer):
    m = trainer.validate(num_batches=2)
    for k in ("val_d_loss_real", "val_d_loss_fake", "val_g_loss", "val_real_acc",
              "val_fake_acc"):
        assert np.isfinite(m[k]), k
    assert 0.0 <= m["val_real_acc"] <= 1.0


@pytest.mark.slow
def test_profile_trace(trainer):
    trace_dir = trainer.profile(n_steps=2)
    assert os.path.isdir(trace_dir)
    files = [os.path.join(dp, f) for dp, _, fs in os.walk(trace_dir) for f in fs]
    assert files, "profiler produced no trace files"


def test_warm_start_discriminator(trainer, rng):
    from vitgan_tpu.models import build_gan

    gan = build_gan(trainer.cfg)
    other = gan.discriminator_init(jax.random.PRNGKey(99))["params"]
    loaded = trainer.warm_start_discriminator(other)
    assert loaded > 0
    got = jax.tree.leaves(trainer.state.d_params)[0]
    want = jax.tree.leaves(other)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_partial_load_shape_mismatch(rng):
    t = {"a": np.zeros((2, 2)), "b": np.zeros((3,))}
    s = {"a": np.ones((2, 2)), "b": np.ones((4,)), "c": np.ones((1,))}
    merged, loaded, total = partial_load(t, s)
    assert loaded == 1 and total == 2
    np.testing.assert_array_equal(merged["a"], 1)
    np.testing.assert_array_equal(merged["b"], 0)  # shape mismatch kept target


def test_multihost_slicing():
    imgs, labels = synthetic_dataset(64, 8, 3)
    shards = []
    for pi in range(4):
        p = HostDataPipeline(imgs, labels, batch_size=16, shuffle=False,
                             process_index=pi, process_count=4)
        x, y = next(iter(p.epoch()))
        assert x.shape[0] == 4  # 16 global / 4 hosts
        shards.append(np.asarray(y))
    # disjoint union = the global batch
    all_labels = np.concatenate(shards)
    np.testing.assert_array_equal(np.sort(all_labels), np.sort(labels[:16]))


def test_moving_average_and_early_stopping():
    ema = MovingAverage(alpha=0.5)
    assert ema.update(10.0) == 10.0
    assert ema.update(0.0) == 5.0
    es = EarlyStopping(patience=2, min_delta=1.0)
    assert not es.step(10.0)
    assert not es.step(9.8)  # within min_delta: bad epoch 1
    assert es.step(9.9)      # bad epoch 2 -> stop


def test_env_manifest_written(tmp_path):
    """Every run dir records its producing environment (utils/manifest.py)."""
    import json

    from vitgan_tpu import config as C
    from vitgan_tpu.train.trainer import Trainer

    cfg = C.replace(C.smoke_config("mlp"), run_name="env1")
    Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    with open(tmp_path / "env1" / "env.json") as f:
        info = json.load(f)
    assert info["jax_version"] and info["backend"] == "cpu"
    assert info["device_count"] == 8  # the virtual test mesh
    assert "process_count" in info and "code_revision" in info
