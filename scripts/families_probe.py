"""Convergence snapshots for the baseline families (VERDICT r4 next #6).

The reference demonstrably TRAINED its baseline models — the DCGAN notebook
ran its BCE loop end-to-end with checkpoints, a loss plot, and a progress
GIF (ref:cnn/cnn-gan.ipynb cell 12), and idc.py ran its BCE loop with
per-epoch grids and TensorBoard scalars (ref:idc.py:93-137).  Here those
families had throughput rows (75k-219k img/s) and smoke tests but no
recorded "does it learn" run.  At these speeds a couple hundred epochs
costs about a minute per family, so this probe gives every family in the
README table an eval-triple row: train N epochs on the scaled synthetic
set, score FID + KID + precision/recall, and keep the per-epoch grids +
training_progress.gif the trainer writes (the notebook's GIF role).

Usage (chip):  python scripts/families_probe.py --out FAMILIES_r05.json
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Per-family recipes: BCE with the notebook/idc conventions is the measured
# baseline for conv/MLP GANs (the round-4 "every BCE recipe collapses"
# finding is about the ViT families; DCGAN's BCE loop is the reference's
# one demonstrably-working training trail).  Epoch counts sized so each
# family gets a ~1-3 minute budget at its measured throughput.
FAMILIES = {
    "dcgan": {"epochs": 200, "sets": []},
    "cnn": {"epochs": 200, "sets": []},
    "mlp": {"epochs": 300, "sets": []},
}

COMMON = [
    "data.synthetic_samples=50000",
    "run.ema_decay=0.995",
    "run.fid_every_epochs=50",
    "run.fid_num_samples=1024",
    "run.sample_grid_every_epochs=20",
    "run.checkpoint_every_epochs=100",
    "run.collapse_abort=false",  # snapshot run: record dynamics, don't stop
]


def run(cmd, log_path):
    with open(log_path, "w") as lf:
        return subprocess.run(cmd, cwd=REPO, stdout=lf,
                              stderr=subprocess.STDOUT).returncode


def tail_metrics(run_dir, tags, n=5):
    path = os.path.join(run_dir, "logs", "scalars.jsonl")
    vals = {t: [] for t in tags}
    try:
        with open(path) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except ValueError:
                    continue
                t = r.get("tag", "").removeprefix("train/")
                if t in vals:
                    vals[t].append(r["value"])
    except OSError:
        pass
    return {t: (round(sum(v[-n:]) / len(v[-n:]), 4) if v else None)
            for t, v in vals.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval-samples", type=int, default=2048)
    ap.add_argument("--prefix", default="families_r05")
    ap.add_argument("--out", default="FAMILIES_r05.json")
    ap.add_argument("--only", action="append", default=None)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from vitgan_tpu.config import scratch_root

    todo = [f for f in FAMILIES if not args.only or f in args.only]
    results = []
    if os.path.exists(args.out):  # resume: keep families recorded earlier
        with open(args.out) as f:
            results = [r for r in json.load(f).get("results", [])
                       if r["family"] not in todo]
    for fam, spec in FAMILIES.items():
        if fam not in todo:
            continue
        run_name = f"{args.prefix}_{fam}"
        run_dir = os.path.join(scratch_root(), "output", run_name)
        t0 = time.time()
        cmd = [sys.executable, "-m", "vitgan_tpu.cli", "train",
               "--family", fam, "--dataset", "synthetic",
               "--epochs", str(spec["epochs"]), "--run-name", run_name]
        for kv in COMMON + spec["sets"]:
            cmd += ["--set", kv]
        print(f"families: {fam} training ({spec['epochs']} epochs)", flush=True)
        rc = run(cmd, f"/tmp/families_{fam}.log")
        rec = {"family": fam, "epochs": spec["epochs"], "rc": rc,
               "train_wall_s": round(time.time() - t0, 1),
               "run_dir": run_dir,
               "tail": tail_metrics(run_dir, ["d_loss", "g_loss",
                                              "d_real_acc", "d_fake_acc"])}
        if rc == 0:
            ev = run([sys.executable, "-m", "vitgan_tpu.cli", "eval",
                      "--run-dir", run_dir,
                      "--num-samples", str(args.eval_samples)],
                     f"/tmp/families_{fam}_eval.log")
            if ev == 0:
                with open(os.path.join(run_dir, "metrics.json")) as f:
                    m = json.load(f)
                rec["eval"] = {k: m.get(k) for k in
                               ("fid", "kid_mean", "precision", "recall")}
            else:
                rec["eval_rc"] = ev
            rec["gif"] = os.path.exists(
                os.path.join(run_dir, "images", "training_progress.gif"))
        results.append(rec)
        print(f"families: {fam} done: "
              f"{json.dumps({k: rec.get(k) for k in ('eval', 'tail', 'rc')})}",
              flush=True)
        with open(args.out, "w") as f:
            json.dump({"what": "baseline-family convergence snapshots "
                               "(VERDICT r5 #6): train + eval triple + "
                               "progress GIF per family "
                               "(ref:cnn/cnn-gan.ipynb cell 12, idc.py:93-137)",
                       "results": results}, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
