"""End-to-end trainer smoke tests: fit, artifacts, resume."""

import os

import numpy as np
import pytest

from vitgan_tpu import config as C
from vitgan_tpu.train.trainer import Trainer


@pytest.fixture()
def smoke_cfg():
    return C.replace(
        C.smoke_config("mlp"),
        **{"run.checkpoint_every_epochs": 1, "run.log_every_steps": 1,
           "run.fid_num_samples": 32, "run_name": None},
    )


def test_trainer_fit_and_artifacts(tmp_path, smoke_cfg):
    cfg = C.replace(smoke_cfg, run_name="t1")
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    metrics = tr.fit(epochs=1)
    assert np.isfinite(metrics["d_loss"]) and np.isfinite(metrics["g_loss"])
    assert "fid" in metrics and np.isfinite(metrics["fid"])
    root = os.path.join(str(tmp_path), "t1")
    assert os.path.exists(os.path.join(root, "training.log"))
    assert os.path.exists(os.path.join(root, "images", "epoch_0000.png"))
    assert os.path.exists(os.path.join(root, "input", "real.png"))
    assert os.path.exists(os.path.join(root, "logs", "scalars.jsonl"))
    assert tr.ckpts.latest_step() is not None
    # best-FID checkpoint written
    assert os.path.exists(os.path.join(root, "checkpoints", "best.json"))


def test_trainer_resume(tmp_path, smoke_cfg):
    cfg = C.replace(smoke_cfg, run_name="t2")
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    tr.fit(epochs=1)
    step_before = int(tr.state.step)

    tr2 = Trainer(C.replace(cfg, run_name="t2"), run_base=str(tmp_path),
                  fid_extractor="random_conv")
    tr2.resume()
    assert int(tr2.state.step) == step_before
    # resumed state continues training
    tr2.fit(epochs=tr2.epoch + 1)
    assert int(tr2.state.step) > step_before


def test_trainer_resume_epoch_not_skipped(tmp_path, smoke_cfg):
    """Regression (ADVICE r1): the finally epilogue double-incremented the
    saved epoch, so fit(2) -> resume -> fit(3) silently trained 0 steps."""
    cfg = C.replace(smoke_cfg, run_name="t2b")
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    tr.fit(epochs=2)
    step_before = int(tr.state.step)

    tr2 = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    tr2.resume()
    assert tr2.epoch == 2  # next epoch to run, not 3
    tr2.fit(epochs=3)  # must actually train epoch 2
    assert int(tr2.state.step) > step_before


def test_trainer_early_stop_resume_does_not_repeat_epoch(tmp_path, smoke_cfg):
    """Regression: the early-stop break skipped the `self.epoch = epoch + 1`
    advance, so the epilogue persisted the COMPLETED epoch as next-to-run and
    a later fit() re-trained it."""
    cfg = C.replace(smoke_cfg, run_name="t2c",
                    **{"run.early_stop_patience": 1, "run.fid_every_epochs": 1})
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    tr.fit(epochs=50)  # patience 1 stops within a few epochs on smoke data
    stopped_after = tr.epoch
    assert stopped_after < 50, "early stop never fired; test premise broken"
    step_before = int(tr.state.step)

    tr2 = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    tr2.resume()
    assert tr2.epoch == stopped_after  # next-to-run, not the completed one
    tr2.fit(epochs=stopped_after)  # everything requested is already trained
    assert int(tr2.state.step) == step_before


def test_trainer_resume_best_restores_best_metric(tmp_path, smoke_cfg):
    """Regression: save_best omitted 'best_metric', so resume(best=True) reset
    best tracking to inf and let a worse later model overwrite best/."""
    cfg = C.replace(smoke_cfg, run_name="tbest")
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    tr.fit(epochs=1)
    best = tr.best_metric
    assert np.isfinite(best)

    tr2 = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    tr2.resume(best=True)
    assert tr2.best_metric == pytest.approx(best)
    assert tr2.epoch == 1  # next epoch to run, persisted alongside


def test_trainer_early_stop_min_delta_wired(tmp_path, smoke_cfg):
    """Regression: EarlyStopping hard-coded min_delta=2.0 with no override."""
    cfg = C.replace(smoke_cfg, run_name="tmind",
                    **{"run.early_stop_patience": 2,
                       "run.early_stop_min_delta": 0.25})
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    assert tr._early is not None and tr._early.min_delta == 0.25


def test_trainer_final_grid_labels_completed_epoch(tmp_path, smoke_cfg):
    """Regression: the crash-safe epilogue grid was named after the
    next-to-run epoch, mislabeling the frame and polluting the GIF."""
    cfg = C.replace(smoke_cfg, run_name="tgrid")
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    tr.fit(epochs=1)
    images = os.path.join(str(tmp_path), "tgrid", "images")
    assert os.path.exists(os.path.join(images, "epoch_0000.png"))
    assert not os.path.exists(os.path.join(images, "epoch_0001.png"))


def test_trainer_persists_config(tmp_path, smoke_cfg):
    cfg = C.replace(smoke_cfg, run_name="tcfg")
    Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    loaded = C.load_config(os.path.join(str(tmp_path), "tcfg", "config.json"))
    assert loaded == cfg


def test_trainer_sample(tmp_path, smoke_cfg):
    cfg = C.replace(smoke_cfg, run_name="t3")
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    imgs = tr.sample(4)
    assert imgs.shape == (4, 32, 32, 3)


def _synthetic_epoch_metrics(tr, d_acc):
    """Monkeypatch payload: one 'step' of epoch metrics at a given D accuracy."""
    import jax.numpy as jnp

    def steps(run):
        m = {"d_loss": jnp.asarray(0.01 if d_acc >= 0.98 else 1.3),
             "g_loss": jnp.asarray(3.0),
             "d_real_acc": jnp.asarray(d_acc),
             "d_fake_acc": jnp.asarray(d_acc)}
        tr.state = tr.state.replace(step=tr.state.step + 1)
        yield m, tr.cfg.model.batch_size

    return steps


def test_trainer_collapse_detection_aborts(tmp_path, smoke_cfg):
    """VERDICT r3: sustained D-accuracy≈1 must be flagged (and abort under
    run.collapse_abort) instead of the run quietly training to completion."""
    cfg = C.replace(smoke_cfg, run_name="t_collapse", **{
        "run.collapse_window": 3, "run.collapse_abort": True,
        "run.sample_grid_every_epochs": 0, "run.fid_every_epochs": 0,
        "run.checkpoint_every_epochs": 0})
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    tr._epoch_steps = _synthetic_epoch_metrics(tr, d_acc=1.0)
    tr.fit(epochs=10)
    assert tr.collapsed
    assert tr.epoch == 3  # aborted after the window filled, not at 10
    # collapse is a failed experiment, not a poisoned state: final save runs
    assert tr.ckpts.latest_step() is not None
    # the flag is in the metrics stream for analyzers (soak dynamics verdict)
    import json as _json
    flags = [_json.loads(l) for l in open(
        os.path.join(str(tmp_path), "t_collapse", "logs", "scalars.jsonl"))
        if '"train/collapse"' in l]
    assert flags and flags[-1]["value"] == 1.0


def test_trainer_collapse_detection_healthy_run_untouched(tmp_path, smoke_cfg):
    cfg = C.replace(smoke_cfg, run_name="t_nocollapse", **{
        "run.collapse_window": 3, "run.collapse_abort": True,
        "run.sample_grid_every_epochs": 0, "run.fid_every_epochs": 0,
        "run.checkpoint_every_epochs": 0})
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    tr._epoch_steps = _synthetic_epoch_metrics(tr, d_acc=0.7)
    tr.fit(epochs=5)
    assert not tr.collapsed
    assert tr.epoch == 5


def test_trainer_collapse_window_resets_on_recovery(tmp_path, smoke_cfg):
    """An accuracy dip below the threshold resets the consecutive counter."""
    import jax.numpy as jnp

    cfg = C.replace(smoke_cfg, run_name="t_reset", **{
        "run.collapse_window": 3, "run.collapse_abort": True,
        "run.sample_grid_every_epochs": 0, "run.fid_every_epochs": 0,
        "run.checkpoint_every_epochs": 0})
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    accs = iter([1.0, 1.0, 0.6, 1.0, 1.0, 0.6, 1.0, 1.0])

    def steps(run):
        a = next(accs)
        tr.state = tr.state.replace(step=tr.state.step + 1)
        yield {"d_loss": jnp.asarray(1.0), "g_loss": jnp.asarray(3.0),
               "d_real_acc": jnp.asarray(a), "d_fake_acc": jnp.asarray(a)}, 8

    tr._epoch_steps = steps
    tr.fit(epochs=8)
    assert not tr.collapsed  # never 3 consecutive epochs at >= 0.98
