"""soak_resume.py analyzer: trajectory-continuity logic (VERDICT r2 #6).

The chip soak (SOAK_r03.json) exercises the real kill+resume path; these
tests pin the pure analysis functions — resume-join continuity, strict step
monotonicity (a rollback means a stale checkpoint was restored), and the
harness-known boundary filtering — on synthetic trajectories.
"""

import importlib.util
import os

import pytest

_SOAK = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "soak_resume.py")


@pytest.fixture(scope="module")
def soak():
    spec = importlib.util.spec_from_file_location("soak_resume", _SOAK)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _recs(gs):
    """Per-epoch records: g_loss from the list, a constant d_loss rider."""
    out = []
    for step, v in gs:
        out.append({"tag": "train/g_loss", "step": step, "value": v})
        out.append({"tag": "train/d_loss", "step": step, "value": 1.0})
    return out


def test_continuous_resume_joins(soak):
    # two segments killed mid-run: steps keep rising, losses stay on trend
    g = [(100 * (i + 1), 0.7 + 0.001 * i) for i in range(12)]
    summary, _, bounds = soak.analyze(_recs(g), [4, 8], loss_band=0.5)
    assert bounds == [4, 8]
    assert len(summary["resume_joins"]) == 2
    assert summary["all_joins_continuous"]
    assert summary["steps_strictly_monotone"]
    assert summary["max_rollback_steps"] == 0
    assert summary["logged_epochs"] == 12 and summary["final_step"] == 1200


def test_reinit_spike_flagged(soak):
    # resume that lost the optimizer state: post-resume loss jumps 4x
    g = [(100, 0.7), (200, 0.7), (300, 0.7), (400, 2.9), (500, 2.8), (600, 2.7)]
    summary, _, _ = soak.analyze(_recs(g), [3], loss_band=0.5)
    assert len(summary["resume_joins"]) == 1
    assert not summary["all_joins_continuous"]


def test_step_rollback_detected(soak):
    # stale checkpoint restored: the step sequence goes backwards at the join
    g = [(100, 0.7), (200, 0.7), (300, 0.7), (150, 0.7), (250, 0.7)]
    summary, _, _ = soak.analyze(_recs(g), [3], loss_band=0.5)
    assert not summary["steps_strictly_monotone"]
    assert summary["max_rollback_steps"] == 150


def test_boundary_filtering(soak):
    # boundaries at 0 (nothing before) or >= len (segment added no epochs,
    # e.g. the run completed during an earlier segment's drain) are dropped
    g = [(100, 0.7), (200, 0.7), (300, 0.7)]
    summary, _, bounds = soak.analyze(_recs(g), [0, 3], loss_band=0.5)
    assert bounds == []
    assert summary["resume_joins"] == []


def test_epoch_records_counts_g_loss_lines(soak, tmp_path):
    run = tmp_path / "run"
    (run / "logs").mkdir(parents=True)
    p = run / "logs" / "scalars.jsonl"
    p.write_text(
        '{"tag": "train/g_loss", "step": 1, "value": 0.5}\n'
        '{"tag": "train/d_loss", "step": 1, "value": 0.5}\n'
        '{"tag": "train/g_loss", "step": 2, "value": 0.4}\n'
        '{"tag": "eval/fid", "step": 2, "value": 30.0}\n')
    assert soak.epoch_records(str(run)) == 2
    assert soak.epoch_records(str(tmp_path / "missing")) == 0


def _recs_with_acc(gs, acc):
    """_recs plus per-epoch D-accuracy riders at a constant level."""
    out = _recs(gs)
    for step, _ in gs:
        out.append({"tag": "train/d_real_acc", "step": step, "value": acc})
        out.append({"tag": "train/d_fake_acc", "step": step, "value": acc})
    return out


def test_dynamics_verdict_collapsed(soak):
    """A run whose D accuracy plateaus at ~1.0 is 'collapsed' and NOT ok,
    however clean the resume mechanics were (VERDICT r3 weak #1)."""
    g = [(100 * (i + 1), 10.0 + i) for i in range(12)]
    summary, _, _ = soak.analyze(_recs_with_acc(g, 1.0), [4], loss_band=0.5)
    assert summary["dynamics"]["collapsed"]
    assert summary["dynamics"]["verdict"] == "collapsed"
    assert summary["dynamics"]["d_acc_tail_min"] == 1.0


def test_dynamics_verdict_healthy(soak):
    g = [(100 * (i + 1), 0.7) for i in range(12)]
    summary, _, _ = soak.analyze(_recs_with_acc(g, 0.6), [4], loss_band=0.5)
    assert not summary["dynamics"]["collapsed"]
    assert summary["dynamics"]["verdict"] == "healthy"


def test_dynamics_verdict_trusts_trainer_flag(soak):
    """The trainer's own train/collapse flag also trips the verdict (covers
    runs where the accuracy tail recovered after the trainer aborted)."""
    g = [(100, 0.7), (200, 0.7)]
    recs = _recs_with_acc(g, 0.5)
    recs.append({"tag": "train/collapse", "step": 200, "value": 1.0})
    summary, _, _ = soak.analyze(recs, [], loss_band=0.5)
    assert summary["dynamics"]["collapsed"]


def test_dynamics_verdict_any_flag_counts(soak):
    """A collapse flag ANYWHERE in the trajectory trips the verdict, even if
    the final epoch logged 0.0 again (the detector resets on one accuracy
    wobble) — checking only the LAST flag let a mostly-collapsed soak read
    healthy (round-4 review finding)."""
    g = [(100, 0.7), (200, 0.7), (300, 0.7)]
    recs = _recs_with_acc(g, 0.5)
    recs.append({"tag": "train/collapse", "step": 150, "value": 1.0})
    recs.append({"tag": "train/collapse", "step": 300, "value": 0.0})
    summary, _, _ = soak.analyze(recs, [], loss_band=0.5)
    assert summary["dynamics"]["collapsed"]
    assert summary["dynamics"]["collapse_flag_ever"]


def test_recipe_probe_collapse_is_max_not_tail_mean(tmp_path):
    """recipe_probe's tail_metrics reports the MAX collapse flag over the run:
    a collapse_abort run logs exactly one 1.0 before stopping, which a tail
    mean can never surface (round-4 review finding)."""
    import importlib.util
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "scripts", "recipe_probe.py")
    spec = importlib.util.spec_from_file_location("recipe_probe", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    logs = tmp_path / "logs"
    logs.mkdir()
    recs = [{"tag": "train/d_loss", "step": s, "value": 1.0} for s in range(6)]
    recs += [{"tag": "train/collapse", "step": s, "value": 0.0} for s in range(5)]
    recs.append({"tag": "train/collapse", "step": 5, "value": 1.0})  # abort epoch
    with open(logs / "scalars.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    tail = mod.tail_metrics(str(tmp_path), ["d_loss", "collapse"])
    assert tail["collapse"] == 1.0  # max, not the 0.2 tail mean
    assert tail["d_loss"] == 1.0
