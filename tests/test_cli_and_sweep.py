"""CLI end-to-end (train -> generate) and sweep runner tests (DEV smoke configs)."""

import json
import os

import numpy as np
import pytest

from vitgan_tpu import cli


@pytest.fixture()
def dev_env(tmp_path, monkeypatch):
    monkeypatch.setenv("DEV", "1")
    monkeypatch.setenv("SCRATCH", str(tmp_path))
    return tmp_path


@pytest.mark.slow
def test_cli_train_then_generate(dev_env):
    rc = cli.main([
        "train", "--family", "mlp", "--dataset", "synthetic", "--epochs", "1",
        "--run-name", "clirun",
    ])
    assert rc == 0
    run_dir = os.path.join(str(dev_env), "output", "clirun")
    assert os.path.isdir(os.path.join(run_dir, "checkpoints"))

    rc = cli.main(["generate", "--family", "mlp", "--run-dir", run_dir,
                   "--num-images", "4"])
    assert rc == 0
    assert os.path.getsize(os.path.join(run_dir, "test", "generated_images.png")) > 0


@pytest.mark.slow
def test_cli_generate_nondefault_run(dev_env):
    """Regression (ADVICE r1): generate rebuilt a DEFAULT config instead of the
    run's training config, so any non-default run (e.g. ema_decay>0, whose
    checkpoint tree carries g_ema) crashed on restore with a tree mismatch."""
    rc = cli.main([
        "train", "--family", "mlp", "--dataset", "synthetic", "--epochs", "1",
        "--run-name", "emarun", "--set", "run.ema_decay=0.99",
        "--set", "run.fid_every_epochs=0",
    ])
    assert rc == 0
    run_dir = os.path.join(str(dev_env), "output", "emarun")
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    rc = cli.main(["generate", "--run-dir", run_dir, "--num-images", "4"])
    assert rc == 0
    assert os.path.getsize(os.path.join(run_dir, "test", "generated_images.png")) > 0


def test_cli_set_override(dev_env):
    rc = cli.main([
        "train", "--family", "mlp", "--dataset", "synthetic", "--epochs", "1",
        "--run-name", "ovr", "--set", "run.steps_per_epoch=1",
        "--set", "run.fid_every_epochs=0",
    ])
    assert rc == 0


@pytest.mark.slow
def test_cli_bench(dev_env, capsys):
    rc = cli.main(["bench", "--preset", "mlp", "--scan", "2", "--iters", "1"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] > 0 and rec["unit"] == "images/sec"


@pytest.mark.slow
def test_sweep_runner(dev_env):
    from vitgan_tpu import config as C
    from vitgan_tpu.hpo.sweep import run_sweep, sample_search_space

    rng = np.random.default_rng(0)
    space = sample_search_space(rng)
    assert set(space) == {"gen_lr", "disc_lr", "embed_dim", "num_heads",
                          "batch_size", "loss", "diversity_weight"}
    # lr range stretched to cover the measured weak-D TTUR winner (g 2e-4)
    assert 1e-5 <= space["gen_lr"] <= 3e-4
    assert space["loss"] in ("bce", "wgan-gp")

    base = C.replace(
        C.smoke_config("v2"),
        **{"run.checkpoint_every_epochs": 0, "run.sample_grid_every_epochs": 0,
           "run.fid_num_samples": 16},
    )
    # shrink the search space's heavy knobs via the base smoke config sizes
    import vitgan_tpu.hpo.sweep as S

    def tiny_space(rng):
        return {"gen_lr": 1e-4, "disc_lr": 1e-4, "embed_dim": 32, "num_heads": 2,
                "batch_size": 8}

    orig = S.sample_search_space
    S.sample_search_space = tiny_space
    try:
        best = run_sweep(num_trials=2, epochs_per_trial=1, base_cfg=base,
                         run_base=str(dev_env / "sweeps"))
    finally:
        S.sample_search_space = orig
    assert np.isfinite(best["fid"])
    results = open(str(dev_env / "sweeps" / "sweep_results.jsonl")).read().strip().splitlines()
    assert len(results) == 2
    assert json.load(open(str(dev_env / "sweeps" / "best_config.json")))["trial"] in (0, 1)

    # Out-of-range host offsets fail loudly instead of running zero trials.
    with pytest.raises(ValueError, match="trial_offset"):
        run_sweep(num_trials=2, trial_offset=2, trial_stride=2, base_cfg=base,
                  run_base=str(dev_env / "sweeps"))


def test_finish_sweep_excludes_collapsed(tmp_path):
    """The ranking can never select a collapsed trial over a viable one
    (VERDICT r4 weak #2: the round-4 sweep ranked a d_acc-0.99 collapse
    first on proxy-FID), and an all-collapsed sweep is flagged as such."""
    from vitgan_tpu.hpo.sweep import _finish_sweep

    results = [
        {"trial": 0, "params": {"gen_lr": 1e-4}, "fid": 1.0, "collapsed": True},
        {"trial": 1, "params": {"gen_lr": 2e-4}, "fid": 5.0, "collapsed": False},
        {"trial": 2, "params": {"gen_lr": 3e-4}, "fid": 7.0, "collapsed": False},
    ]
    best = _finish_sweep(results, str(tmp_path))
    assert best["trial"] == 1  # lowest fid AMONG non-collapsed, not overall
    assert best["excluded_collapsed_trials"] == 1
    assert best["all_trials_collapsed"] is False
    # best_config.json carries the same verdict fields
    persisted = json.load(open(str(tmp_path / "best_config.json")))
    assert persisted["trial"] == 1 and not persisted["all_trials_collapsed"]

    only_collapsed = [
        {"trial": 0, "params": {}, "fid": 1.0, "collapsed": True},
        {"trial": 1, "params": {}, "fid": 2.0, "collapsed": True},
    ]
    best2 = _finish_sweep(only_collapsed, str(tmp_path))
    assert best2["all_trials_collapsed"] is True and best2["trial"] == 0

    # legacy records without the collapsed key keep ranking (treated viable)
    legacy = [{"trial": 3, "params": {}, "fid": 4.0}]
    assert _finish_sweep(legacy, str(tmp_path))["trial"] == 3


@pytest.mark.slow
def test_sweep_two_workers_merge_shared_jsonl(dev_env):
    """The process-level trial parallelism Ray provided (ref:src/v2/
    training.py:275): two workers run disjoint --trial-offset slices of the
    SAME seeded sequence against the SAME sweep dir.  Whichever finishes last
    must leave a best_config.json ranked over BOTH workers' trials — i.e.
    _finish_sweep re-reads the shared JSONL instead of ranking only its own
    local results."""
    from vitgan_tpu import config as C
    import vitgan_tpu.hpo.sweep as S
    from vitgan_tpu.hpo.sweep import run_sweep

    base = C.replace(
        C.smoke_config("v2"),
        **{"run.checkpoint_every_epochs": 0, "run.sample_grid_every_epochs": 0,
           "run.fid_num_samples": 16},
    )

    def tiny_space(rng):
        lr = float(rng.uniform(1e-5, 1e-4))  # rng-dependent: per-trial params
        return {"gen_lr": lr, "disc_lr": 1e-4, "embed_dim": 32, "num_heads": 2,
                "batch_size": 8}

    sweep_dir = str(dev_env / "sweeps_2workers")
    orig = S.sample_search_space
    S.sample_search_space = tiny_space
    try:
        # worker A (trials 0, 2) then worker B (trial 1) — B finishes last and
        # must rank A's trials too, not just its own.
        run_sweep(num_trials=3, epochs_per_trial=1, base_cfg=base, seed=11,
                  run_base=sweep_dir, trial_offset=0, trial_stride=2)
        best = run_sweep(num_trials=3, epochs_per_trial=1, base_cfg=base,
                         seed=11, run_base=sweep_dir, trial_offset=1,
                         trial_stride=2)
    finally:
        S.sample_search_space = orig
    lines = [json.loads(l) for l in
             open(sweep_dir + "/sweep_results.jsonl").read().strip().splitlines()]
    assert sorted(r["trial"] for r in lines) == [0, 1, 2]
    disk_best = json.load(open(sweep_dir + "/best_config.json"))
    assert disk_best["trial"] == min(lines, key=lambda r: r["fid"])["trial"]
    assert best["trial"] == disk_best["trial"]  # last worker ranked globally


@pytest.mark.slow
def test_cli_warmup_populates_compile_cache(dev_env, capsys):
    """`warmup` AOT-compiles without running; a repeat hits the persistent
    cache and must be much faster than the cold compile."""
    rc = cli.main(["warmup", "mlp", "--scan", "2"])
    assert rc == 0
    cold = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert cold["compile_seconds"]["mlp"] > 0
    rc = cli.main(["warmup", "mlp", "--scan", "2"])
    assert rc == 0
    warm = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # In-process jit cache + persistent cache: repeat is near-instant.
    assert warm["compile_seconds"]["mlp"] <= cold["compile_seconds"]["mlp"]
    assert os.path.isdir(os.path.join(str(dev_env), "jax_cache"))


def test_cli_warmup_bad_preset(dev_env):
    with pytest.raises(KeyError):
        cli.main(["warmup", "nosuch"])


def test_cli_doctor(tmp_path, monkeypatch, capsys):
    """doctor reports env health and cannot hang on a dead device (the probe
    runs in a subprocess with a timeout)."""
    import json as _json

    from vitgan_tpu.cli import main

    monkeypatch.setenv("SCRATCH", str(tmp_path))
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    rc = main(["doctor", "--device-timeout", "120"])
    out = capsys.readouterr().out
    assert rc == 0
    report = _json.loads(out.strip().split("\n")[-1])
    assert report["devices"]["ok"] and "cpu" in report["devices"]["detail"]
    assert report["torch_interop"]["ok"]


@pytest.mark.slow
def test_sweep_resume_skips_recorded_trials(dev_env):
    """resume=True: trials already in the JSONL are not retrained; the final
    ranking covers old + new; a seed mismatch fails loudly."""
    from vitgan_tpu import config as C
    import vitgan_tpu.hpo.sweep as S
    from vitgan_tpu.hpo.sweep import run_sweep

    base = C.replace(
        C.smoke_config("v2"),
        **{"run.checkpoint_every_epochs": 0, "run.sample_grid_every_epochs": 0,
           "run.fid_num_samples": 16},
    )
    calls = []

    def tiny_space(rng):
        # depends on rng so different seeds draw different params
        lr = float(rng.uniform(1e-5, 1e-4))
        return {"gen_lr": lr, "disc_lr": 1e-4, "embed_dim": 32, "num_heads": 2,
                "batch_size": 8}

    from vitgan_tpu.train import trainer as T

    orig_fit = T.Trainer.fit

    def counting_fit(self, *a, **kw):
        calls.append(1)
        return orig_fit(self, *a, **kw)

    orig = S.sample_search_space
    S.sample_search_space = tiny_space
    T.Trainer.fit = counting_fit
    sweep_dir = str(dev_env / "sweeps_resume")
    try:
        run_sweep(num_trials=2, epochs_per_trial=1, base_cfg=base, seed=7,
                  run_base=sweep_dir)
        assert len(calls) == 2
        best = run_sweep(num_trials=3, epochs_per_trial=1, base_cfg=base, seed=7,
                         run_base=sweep_dir, resume=True)
        assert len(calls) == 3  # only trial 2 trained on resume
        lines = open(sweep_dir + "/sweep_results.jsonl").read().strip().splitlines()
        assert [json.loads(l)["trial"] for l in lines] == [0, 1, 2]
        assert best["trial"] in (0, 1, 2)  # ranking covers recorded + new
        # wrong seed draws different params for recorded indices -> loud error
        with pytest.raises(ValueError, match="resume mismatch"):
            run_sweep(num_trials=3, epochs_per_trial=1, base_cfg=base, seed=8,
                      run_base=sweep_dir, resume=True)
    finally:
        S.sample_search_space = orig
        T.Trainer.fit = orig_fit
