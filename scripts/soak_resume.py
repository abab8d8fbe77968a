"""Preemption/resume soak: a long v2 training run SIGTERM-killed and resumed
mid-run, with the loss/FID trajectory verified continuous across the kills.

Exercises, at scale and on the real chip, the crash-safe intent of the
reference's trainer (ref:src/v2/training.py:248-268 — its `finally` epilogue
was the only recovery story) through this framework's full stack: SIGTERM
preemption handling (utils/preemption.py), orbax full-train-state checkpoints
with keep-N rotation (utils/checkpoint.py), and `train --resume`.

Protocol (VERDICT r2 next-step #6):
  segment 0: fresh `cli train` run, SIGTERM after --kill-after-epochs NEW
             epoch records appear in logs/scalars.jsonl (progress-gated, not
             wall-clock: a kill during import/compile would hit the default
             SIGTERM disposition before the graceful handler exists and
             before any checkpoint — that tests nothing)
  segment 1: `--resume`, SIGTERM again after --kill-after-epochs more
  segment 2: `--resume`, run to natural completion
Then the run's logs/scalars.jsonl is analyzed:
  - the global step must be strictly increasing across the whole trajectory
    (resume restores the preemption-point state — including partial-epoch
    optimizer steps — so even the re-run of an interrupted epoch lands at a
    HIGHER step than any record before the kill; a step going backwards means
    a stale checkpoint was restored),
  - the post-resume losses must be on the pre-kill trend (no re-init spike:
    median of the 5 epoch records after each resume within --loss-band x the
    median of the 5 before the kill) — resume boundaries are taken from the
    harness's own epoch-record counts at each segment end,
  - the checkpoints dir must hold at most keep+1 step checkpoints (rotation).
Writes SOAK json + a trajectory PNG with the resume points marked.

Usage (chip):
  SCRATCH=$HOME/.vitgan_tpu python scripts/soak_resume.py \
      --epochs 120 --kill-after-epochs 35 --out SOAK_r03.json

SOAK_SMOKE=1 shrinks everything to a CPU-sized check of the harness itself.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE = os.environ.get("SOAK_SMOKE") == "1"


def train_cmd(run_name, epochs, resume, extra_sets):
    cmd = [sys.executable, "-m", "vitgan_tpu.cli", "train", "--family", "v2",
           "--dataset", "synthetic", "--epochs", str(epochs),
           "--run-name", run_name]
    for kv in extra_sets:
        cmd += ["--set", kv]
    if resume:
        cmd.append("--resume")
    return cmd


def epoch_records(run_dir):
    """Completed-epoch count: train/g_loss records in the run's scalars.jsonl
    (the trainer writes one per finished epoch; a preempted partial epoch
    writes none)."""
    path = os.path.join(run_dir, "logs", "scalars.jsonl")
    n = 0
    try:
        with open(path) as f:
            for line in f:
                if '"train/g_loss"' in line:
                    n += 1
    except OSError:
        pass
    return n


def run_segment(idx, cmd, kill_after_epochs, run_dir, log_path,
                progress_timeout):
    """Launch a training segment; SIGTERM it once kill_after_epochs NEW epoch
    records have appeared (None = run to completion).  Progress-gated so the
    kill always lands while the graceful handler is installed and at least
    one rotating checkpoint exists (checkpoint_every_epochs=1)."""
    env = dict(os.environ)
    if SMOKE:
        env["JAX_PLATFORMS"] = "cpu"
        env["DEV"] = "1"
    base = epoch_records(run_dir)
    t0 = time.time()
    killed_at = None
    timed_out_waiting = False
    with open(log_path, "w") as lf:
        proc = subprocess.Popen(cmd, cwd=REPO, stdout=lf, stderr=subprocess.STDOUT,
                                env=env)
        if kill_after_epochs is not None:
            while proc.poll() is None:
                if epoch_records(run_dir) - base >= kill_after_epochs:
                    killed_at = time.time() - t0
                    proc.send_signal(signal.SIGTERM)
                    break
                if time.time() - t0 > progress_timeout:
                    # no epoch finished in budget: a soak failure in itself
                    timed_out_waiting = True
                    killed_at = time.time() - t0
                    proc.send_signal(signal.SIGTERM)
                    break
                time.sleep(1 if SMOKE else 5)
        # graceful SIGTERM drain must finish well inside this (preemption.py
        # stops at the next step-group boundary, then the checkpoint epilogue
        # runs); a hang here is itself a soak failure.
        try:
            rc = proc.wait(timeout=1800)
        except subprocess.TimeoutExpired:
            proc.kill()
            rc = -9
    return {"segment": idx, "cmd": " ".join(cmd[2:]), "rc": rc,
            "wall_s": round(time.time() - t0, 1),
            "epochs_at_start": base,
            "sigterm_after_s": round(killed_at, 1) if killed_at else None,
            "progress_timeout": timed_out_waiting}


def load_scalars(run_dir):
    recs = []
    path = os.path.join(run_dir, "logs", "scalars.jsonl")
    with open(path) as f:
        for line in f:
            try:
                recs.append(json.loads(line))
            except ValueError:
                continue  # torn tail line from a kill mid-append
    return recs


def analyze(recs, boundaries, loss_band):
    """Continuity checks over the concatenated per-epoch loss trajectory.
    `boundaries` are record indices where a resumed segment's first epoch
    landed (from the harness's own counts — the step sequence itself stays
    strictly monotone across a correct resume, see module docstring)."""
    g = [(r["step"], r["value"]) for r in recs if r["tag"] == "train/g_loss"]
    d = [(r["step"], r["value"]) for r in recs if r["tag"] == "train/d_loss"]
    steps = [s for s, _ in g]
    boundaries = [b for b in boundaries if 0 < b < len(g)]
    rollbacks = [steps[i - 1] - steps[i] for i in range(1, len(steps))
                 if steps[i] <= steps[i - 1]]
    max_rollback = max(rollbacks, default=0)
    ok_monotone = not rollbacks

    def med(vals):
        v = sorted(vals)
        return v[len(v) // 2] if v else float("nan")

    joins = []
    for i in boundaries:
        pre = [v for _, v in g[max(0, i - 10):i]]
        before = med(pre[-5:])
        after = med([v for _, v in g[i:i + 5]])
        # Tolerance: the relative band OR the pre-kill window's own
        # epoch-to-epoch spread, whichever is larger.  A purely relative
        # band is meaningless when the loss crosses zero (the round-5
        # 400-epoch WGAN soak's second join moved |0.03| on a g_loss of
        # -0.06 in a trajectory wandering +/-0.5 and was flagged); a true
        # re-init spike jumps by the init-loss scale, far beyond local
        # spread (pinned by test_reinit_spike_flagged).
        spread = (max(pre) - min(pre)) if pre else 0.0
        tol = max(loss_band * max(abs(before), 1e-3), spread)
        joins.append({"step_before": steps[i - 1], "step_after": steps[i],
                      "g_loss_before": round(before, 4),
                      "g_loss_after": round(after, 4),
                      "join_tolerance": round(tol, 4),
                      "continuous": bool(abs(after - before) <= tol)})
    # Dynamics verdict (VERDICT r3: the round-3 soak called a collapsed run
    # ok because it only measured resume continuity).  Same criterion as the
    # trainer's collapse detector: mean D accuracy sustained >= 0.98 over the
    # trajectory tail means D has won everything.
    acc_r = [r["value"] for r in recs if r["tag"] == "train/d_real_acc"]
    acc_f = [r["value"] for r in recs if r["tag"] == "train/d_fake_acc"]
    tail = 10
    accs = [0.5 * (a + b) for a, b in zip(acc_r, acc_f)][-tail:]
    collapse_flags = [r["value"] for r in recs if r["tag"] == "train/collapse"]
    # ANY tripped flag counts: the trainer re-logs 0.0 the first epoch the
    # accuracy dips, so checking only the LAST flag would let a run that sat
    # collapsed for most of the soak read healthy after one final-epoch
    # wobble (round-4 review finding — the exact VERDICT-r3 failure again).
    collapsed = bool(accs and min(accs) >= 0.98) or bool(
        collapse_flags and max(collapse_flags) >= 1.0)
    dynamics = {
        "d_acc_tail_min": round(min(accs), 4) if accs else None,
        "d_acc_tail_mean": round(sum(accs) / len(accs), 4) if accs else None,
        "collapse_flag_ever": bool(collapse_flags and max(collapse_flags) >= 1.0),
        "collapsed": collapsed,
        "verdict": "collapsed" if collapsed else "healthy",
    }
    return {
        "logged_epochs": len(steps),
        "final_step": steps[-1] if steps else 0,
        "resume_joins": joins,
        "steps_strictly_monotone": ok_monotone,
        "max_rollback_steps": max_rollback,
        "all_joins_continuous": all(j["continuous"] for j in joins),
        "d_loss_final": round(d[-1][1], 4) if d else None,
        "g_loss_final": round(g[-1][1], 4) if g else None,
        "dynamics": dynamics,
    }, g, boundaries


def plot(g, boundaries, out_png):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xs = list(range(len(g)))  # log-record index: keeps re-run epochs visible
    plt.figure(figsize=(10, 4))
    plt.plot(xs, [v for _, v in g], lw=0.7, label="g_loss")
    for b in boundaries:
        plt.axvline(b, color="red", ls="--", lw=1,
                    label="resume" if b == boundaries[0] else None)
    plt.xlabel("logged epoch records (chronological; epoch re-runs inline)")
    plt.ylabel("generator loss")
    plt.title("Preemption soak: loss trajectory across SIGTERM kills + resumes")
    plt.legend()
    plt.tight_layout()
    plt.savefig(out_png, dpi=110)


def main():
    ap = argparse.ArgumentParser()
    # Kills overshoot by ~1 epoch (the in-flight scanned epoch completes
    # after the gate fires), so total epochs must clear 2*(kill+overshoot).
    ap.add_argument("--epochs", type=int, default=8 if SMOKE else 120)
    ap.add_argument("--kill-after-epochs", type=int, default=1 if SMOKE else 35,
                    help="SIGTERM segments 0/1 after this many NEW completed "
                         "epochs appear in scalars.jsonl")
    ap.add_argument("--progress-timeout", type=float,
                    default=300 if SMOKE else 2400,
                    help="max seconds to wait for the kill gate (covers cold "
                         "XLA compiles); exceeding it fails the soak")
    ap.add_argument("--run-name", default="soak_r03")
    ap.add_argument("--loss-band", type=float, default=0.5,
                    help="relative tolerance for the pre-kill vs post-resume "
                         "median g_loss (GAN losses are noisy)")
    ap.add_argument("--out", default="SOAK_r03.json")
    ap.add_argument("--set", dest="sets", action="append", default=None)
    args = ap.parse_args()

    sets = args.sets or [
        # long-run shape: many small epochs => fine checkpoint granularity
        "run.steps_per_epoch=500", "run.checkpoint_every_epochs=1",
        "run.fid_every_epochs=10", "run.fid_num_samples=256",
        "run.sample_grid_every_epochs=0", "data.synthetic_samples=32000",
    ]
    if SMOKE:
        sets = ["run.checkpoint_every_epochs=1", "run.fid_every_epochs=0",
                "run.sample_grid_every_epochs=0"]

    from vitgan_tpu import config as C  # noqa: E402 (repo path, no jax import)

    run_dir = os.path.join(C.scratch_root(), "output", args.run_name)
    segments = []
    kills = [args.kill_after_epochs, args.kill_after_epochs, None]
    for idx, kill in enumerate(kills):
        cmd = train_cmd(args.run_name, args.epochs, resume=idx > 0,
                        extra_sets=sets)
        log = os.path.join("/tmp", f"soak_seg{idx}.log")
        print(f"soak: segment {idx} starting "
              f"({'SIGTERM after %d new epochs' % kill if kill else 'to completion'})",
              flush=True)
        seg = run_segment(idx, cmd, kill, run_dir, log, args.progress_timeout)
        seg["epochs_at_end"] = epoch_records(run_dir)
        segments.append(seg)
        print(f"soak: segment {idx} done: {seg}", flush=True)
        if seg["rc"] not in (0,):
            print(f"soak: segment {idx} rc={seg['rc']} (see {log})", flush=True)

    recs = load_scalars(run_dir)
    # A resumed segment's first record lands at the previous segment's count.
    resume_boundaries = [s["epochs_at_end"] for s in segments[:-1]]
    summary, g, boundaries = analyze(recs, resume_boundaries, args.loss_band)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    kept = sorted(d for d in os.listdir(ckpt_dir)
                  if d.split("_")[-1].isdigit()) if os.path.isdir(ckpt_dir) else []
    out = {
        "what": "SIGTERM preemption soak: kill+resume x2 mid-run, then run to "
                "completion; trajectory continuity + checkpoint rotation checks",
        "protocol": "crash-safe intent of ref:src/v2/training.py:248-268",
        "segments": segments,
        "analysis": summary,
        "checkpoints_kept": kept,
        "rotation_ok": len(kept) <= 4,  # keep=3 (+1 freshly-written transient)
        "ok": bool(
            all(s["rc"] == 0 for s in segments)
            and not any(s["progress_timeout"] for s in segments)
            and len(summary["resume_joins"]) >= 2
            and summary["all_joins_continuous"]
            and summary["steps_strictly_monotone"]
            and len(kept) <= 4
            # a soak whose model collapsed is NOT ok, however clean the
            # resume mechanics were (VERDICT r3 weak #1)
            and not summary["dynamics"]["collapsed"]
        ),
    }
    png = os.path.splitext(args.out)[0] + "_trajectory.png"
    try:
        plot(g, boundaries, png)
        out["trajectory_png"] = png
    except Exception as e:  # plotting is evidence, not a gate
        out["trajectory_png_error"] = str(e)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in ("ok", "analysis", "rotation_ok")},
                     default=str))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    sys.exit(main())
