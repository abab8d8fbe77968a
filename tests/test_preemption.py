"""Graceful SIGTERM preemption: flag semantics + trainer stop-and-resume.

The reference has no preemption story (a SIGTERM kills ref:src/v2/training.py
mid-epoch and loses everything since the last torch.save); here SIGTERM flows
through the trainer's crash-safe checkpoint epilogue (utils/preemption.py).
"""

import os
import signal

import pytest

from vitgan_tpu import config as C
from vitgan_tpu.train.trainer import Trainer
from vitgan_tpu.utils import preemption


def _sigterm_self():
    os.kill(os.getpid(), signal.SIGTERM)


def test_requested_false_outside_scope():
    assert not preemption.requested()


def test_sigterm_sets_flag_and_restores_handler():
    before = signal.getsignal(signal.SIGTERM)
    with preemption.graceful_preemption():
        assert not preemption.requested()
        _sigterm_self()
        assert preemption.requested()
    # scope exit: flag cleared, previous disposition restored
    assert not preemption.requested()
    assert signal.getsignal(signal.SIGTERM) is before


def test_second_sigterm_escalates():
    with preemption.graceful_preemption():
        _sigterm_self()
        with pytest.raises(KeyboardInterrupt):
            _sigterm_self()
        # escalation leaves the flag set so pollers still see the request
        assert preemption.requested()


def test_trainer_preempted_fit_checkpoints_and_resumes(tmp_path):
    cfg = C.replace(
        C.smoke_config("mlp"),
        **{"run.checkpoint_every_epochs": 0, "run.fid_every_epochs": 0,
           "run.fid_num_samples": 32, "run_name": "pre1"},
    )
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    with preemption.graceful_preemption():
        _sigterm_self()  # pending before the first step group: epoch 0 stops early
        tr.fit(epochs=3)
    # The crash-safe epilogue persisted the INTERRUPTED epoch as next-to-run
    # (periodic checkpointing was off — only the preemption save exists).
    step_after = int(tr.state.step)
    assert step_after > 0  # one step group ran before the poll point
    tr2 = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    tr2.resume()
    assert tr2.epoch == 0  # re-runs the interrupted epoch
    assert int(tr2.state.step) == step_after
    tr2.fit(epochs=1)  # and training continues from the restored state
    assert int(tr2.state.step) > step_after


def test_abort_on_nan_skips_poisoned_final_save(tmp_path):
    """Failure detection: non-finite losses abort the run and the epilogue
    must NOT overwrite the latest durable checkpoint with NaN weights."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    cfg = C.replace(
        C.smoke_config("mlp"),
        **{"run.checkpoint_every_epochs": 1, "run.fid_every_epochs": 0,
           "run.fid_num_samples": 32, "run_name": "nan1"},
    )
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    tr.fit(epochs=1)  # one finite epoch -> durable checkpoints exist
    good_step = tr.ckpts.latest_step()
    assert good_step is not None

    tr.state = dataclasses.replace(
        tr.state,
        g_params=jax.tree.map(lambda x: jnp.full_like(x, jnp.nan), tr.state.g_params),
    )
    tr.fit(epochs=2)  # epoch 1 means go NaN -> abort before any save
    assert tr._poisoned
    assert tr.ckpts.latest_step() == good_step  # poisoned state never saved

    tr2 = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    tr2.resume()
    assert all(bool(jnp.isfinite(leaf).all())
               for leaf in jax.tree.leaves(tr2.state.g_params))


def test_shield_defers_escalation():
    """Inside shield() (the checkpoint epilogue) SIGTERM must never raise —
    only record the request for pollers."""
    with preemption.graceful_preemption():
        with preemption.shield():
            _sigterm_self()
            _sigterm_self()  # would escalate to KeyboardInterrupt unshielded
            assert preemption.requested()
        assert preemption.requested()  # still visible after the shield


def test_nested_scope_is_passthrough():
    """An inner graceful_preemption() (sweep wrapping trainer fits) must not
    steal the handler or clear a pending outer request on exit."""
    with preemption.graceful_preemption():
        _sigterm_self()
        with preemption.graceful_preemption():
            assert preemption.requested()
        assert preemption.requested()  # inner exit didn't clear the flag


def test_preempted_exit_still_catches_nan(tmp_path):
    """SIGTERM mid-epoch bypasses the per-epoch loss check; the epilogue's
    host-side finiteness check must still refuse to save NaN weights."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    cfg = C.replace(
        C.smoke_config("mlp"),
        **{"run.checkpoint_every_epochs": 1, "run.fid_every_epochs": 0,
           "run.fid_num_samples": 32, "run_name": "nan2"},
    )
    tr = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    tr.fit(epochs=1)
    good_step = tr.ckpts.latest_step()
    tr.state = dataclasses.replace(
        tr.state,
        d_params=jax.tree.map(lambda x: jnp.full_like(x, jnp.nan), tr.state.d_params),
    )
    with preemption.graceful_preemption():
        _sigterm_self()  # preemption break skips the per-epoch means check
        tr.fit(epochs=2)
    assert tr._poisoned  # caught by the epilogue finiteness check instead
    assert tr.ckpts.latest_step() == good_step
