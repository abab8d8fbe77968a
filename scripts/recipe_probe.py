"""Stabilization-recipe probe: train N short runs with different GAN recipes
on the (scaled) synthetic set, then score each with the full eval triple
(FID + KID + precision/recall) and the collapse verdict.

Purpose (VERDICT r3 next-step #1): the framework has every stabilizer knob —
lazy R1, EMA, DiffAugment, per-net optimizers, LR schedules — but no recorded
configuration has ever held GAN equilibrium.  This harness composes the knobs
into candidate recipes and measures which one actually learns the data
distribution, replacing guesswork with the round's own A/B evidence.  The
winning recipe graduates to a long run (the "first converged run" section of
BENCHMARKS.md).

Role-model in the reference: the live per-epoch best-FID loop of
ref:src/v2/training.py:159-226 (which similarly iterated recipes by hand).

Usage (chip):
  python scripts/recipe_probe.py --epochs 40 --samples 50000 --out RECIPES_r04.json
  python scripts/recipe_probe.py --only r1_g1_b0 --epochs 200   # the winner, long
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Shared probe shape: big-enough dataset that memorization is not the easy
# solution (VERDICT r3: the 2,048-image set invites collapse), cheap evals,
# collapse-abort so dead recipes don't burn their full budget.
COMMON = [
    "data.synthetic_samples=50000",
    "run.ema_decay=0.995",
    "run.fid_every_epochs=10",
    "run.fid_num_samples=1024",
    "run.sample_grid_every_epochs=10",
    "run.checkpoint_every_epochs=10",
    "run.collapse_abort=true",
]

# GAN-standard optimizer: Adam(0, 0.99), no weight decay — AdamW(0.9, wd)
# is a classifier recipe, and D momentum is a known destabilizer.
_ADAM0 = [
    "v2.gen_optim.name=adam", "v2.gen_optim.beta1=0.0",
    "v2.gen_optim.beta2=0.99", "v2.gen_optim.weight_decay=0.0",
    "v2.disc_optim.name=adam", "v2.disc_optim.beta1=0.0",
    "v2.disc_optim.beta2=0.99", "v2.disc_optim.weight_decay=0.0",
]


def _lr(g, d):
    return [f"v2.gen_optim.learning_rate={g}", f"v2.disc_optim.learning_rate={d}"]


RECIPES = {
    # reference defaults (the recipe the round-3 soak ran — the collapse
    # control arm; expected to trip collapse_abort)
    "reference_defaults": [],
    # lazy R1 sweep around the StyleGAN2-ADA CIFAR operating point, with the
    # GAN-standard optimizer and DiffAugment
    "r1_g01_b0": _ADAM0 + _lr(2e-4, 2e-4)
    + ["v2.r1_gamma=0.1", "run.diff_augment=color,translation"],
    "r1_g1_b0": _ADAM0 + _lr(2e-4, 2e-4)
    + ["v2.r1_gamma=1.0", "run.diff_augment=color,translation"],
    "r1_g10_b0": _ADAM0 + _lr(2e-4, 2e-4)
    + ["v2.r1_gamma=10.0", "run.diff_augment=color,translation"],
    # TTUR: D learns faster but is R1-regularized
    "r1_g1_ttur": _ADAM0 + _lr(1e-4, 3e-4)
    + ["v2.r1_gamma=1.0", "run.diff_augment=color,translation"],
    # no-DiffAugment ablation of the γ=1 arm
    "r1_g1_noaug": _ADAM0 + _lr(2e-4, 2e-4) + ["v2.r1_gamma=1.0"],
    # WGAN-GP alternative (the reference's dead-path loss, live here)
    "wgan_gp": _ADAM0 + _lr(2e-4, 2e-4)
    + ["v2.loss=wgan-gp", "run.diff_augment=color,translation"],
    # --- round-2 arms: every round-1 BCE recipe measured recall ~0 (mode
    # collapse); these use the structural anti-collapse knobs added in
    # response (minibatch-std D feature, BCE diversity bonus).
    "mbstd_r1": _ADAM0 + _lr(2e-4, 2e-4)
    + ["v2.r1_gamma=0.1", "run.diff_augment=color,translation",
       "v2.minibatch_std=true"],
    "mbstd_div_r1": _ADAM0 + _lr(2e-4, 2e-4)
    + ["v2.r1_gamma=0.1", "run.diff_augment=color,translation",
       "v2.minibatch_std=true", "v2.g_diversity=true"],
    "div_r1": _ADAM0 + _lr(2e-4, 2e-4)
    + ["v2.r1_gamma=0.1", "run.diff_augment=color,translation",
       "v2.g_diversity=true"],
    # wgan_gp was the round-1 winner (precision 0.93 / recall 0.24 — the only
    # recipe with nonzero coverage); minibatch-std should push recall further
    "wgan_mbstd": _ADAM0 + _lr(2e-4, 2e-4)
    + ["v2.loss=wgan-gp", "run.diff_augment=color,translation",
       "v2.minibatch_std=true"],
    # --- round-3 arms: recall-targeted (the 200/400-epoch runs show recall
    # saturating ~0.14-0.19 while precision keeps rising — coverage, not
    # fidelity, is the remaining gap)
    "wgan_div5": _ADAM0 + _lr(2e-4, 2e-4)
    + ["v2.loss=wgan-gp", "run.diff_augment=color,translation",
       "v2.diversity_weight=0.5"],
    "wgan_lat256": _ADAM0 + _lr(2e-4, 2e-4)
    + ["v2.loss=wgan-gp", "run.diff_augment=color,translation",
       "v2.latent_dim=256"],
    "wgan_weakD": _ADAM0 + _lr(2e-4, 1e-4)
    + ["v2.loss=wgan-gp", "run.diff_augment=color,translation"],
    # --- round-4 arms: the weak-D TTUR winner (recall 0.27 @40ep, 0.41
    # @200ep) probed along its own axis — how weak can D go, and does the
    # explicit diversity bonus compose with the TTUR balance?
    "wgan_weakD2": _ADAM0 + _lr(2e-4, 5e-5)
    + ["v2.loss=wgan-gp", "run.diff_augment=color,translation"],
    "wgan_weakD_div5": _ADAM0 + _lr(2e-4, 1e-4)
    + ["v2.loss=wgan-gp", "run.diff_augment=color,translation",
       "v2.diversity_weight=0.5"],
    "wgan_strongG": _ADAM0 + _lr(3e-4, 1e-4)
    + ["v2.loss=wgan-gp", "run.diff_augment=color,translation"],
}


def run(cmd, log_path):
    with open(log_path, "w") as lf:
        return subprocess.run(cmd, cwd=REPO, stdout=lf,
                              stderr=subprocess.STDOUT).returncode


def tail_metrics(run_dir, tags, n=5):
    """Mean of the last n values of each train/<tag> in scalars.jsonl —
    except ``collapse``, which reports the MAX over the whole run: a
    collapse_abort run logs exactly one 1.0 before stopping, so a tail mean
    can never reach the old >=1.0 test (round-4 review finding: every
    actually-collapsed probe read collapsed=False)."""
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
    out = {t: (round(sum(v[-n:]) / len(v[-n:]), 4) if v else None)
           for t, v in vals.items()}
    if vals.get("collapse"):
        out["collapse"] = round(max(vals["collapse"]), 4)
    return out


def probe(name, sets, args):
    run_name = f"{args.prefix}_{name}"
    run_dir = os.path.join(scratch(), "output", run_name)
    t0 = time.time()
    cmd = [sys.executable, "-m", "vitgan_tpu.cli", "train", "--family", "v2",
           "--dataset", "synthetic", "--epochs", str(args.epochs),
           "--run-name", run_name]
    for kv in COMMON + sets:
        cmd += ["--set", kv]
    log = os.path.join("/tmp", f"probe_{name}.log")
    rc = run(cmd, log)
    rec = {"recipe": name, "sets": sets, "rc": rc,
           "train_wall_s": round(time.time() - t0, 1), "log": log}
    rec["tail"] = tail_metrics(
        run_dir, ["d_loss", "g_loss", "d_real_acc", "d_fake_acc", "collapse"])
    rec["collapsed"] = bool((rec["tail"].get("collapse") or 0) >= 1.0)
    if rc == 0:
        ev_log = os.path.join("/tmp", f"probe_{name}_eval.log")
        ev = run([sys.executable, "-m", "vitgan_tpu.cli", "eval",
                  "--run-dir", run_dir,
                  "--num-samples", str(args.eval_samples)], ev_log)
        if ev == 0:
            with open(os.path.join(run_dir, "metrics.json")) as f:
                m = json.load(f)
            rec["eval"] = {k: m.get(k) for k in
                           ("fid", "kid_mean", "precision", "recall")}
        else:
            rec["eval_rc"] = ev
    return rec


def scratch():
    sys.path.insert(0, REPO)
    from vitgan_tpu.config import scratch_root  # canonical SCRATCH contract

    return scratch_root()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--eval-samples", type=int, default=2048)
    ap.add_argument("--prefix", default="probe_r04")
    ap.add_argument("--only", action="append", default=None,
                    help="run only these recipes (repeatable)")
    ap.add_argument("--out", default="RECIPES_r04.json")
    args = ap.parse_args()

    names = args.only or list(RECIPES)
    results = []
    if os.path.exists(args.out):  # resume: keep probes recorded by a prior run
        with open(args.out) as f:
            results = [r for r in json.load(f).get("results", [])
                       if r["recipe"] not in names]
    for name in names:
        print(f"probe: {name} starting", flush=True)
        rec = probe(name, RECIPES[name], args)
        results.append(rec)
        print(f"probe: {name} done: "
              f"{json.dumps({k: rec.get(k) for k in ('collapsed', 'tail', 'eval', 'rc')})}",
              flush=True)
        with open(args.out, "w") as f:  # persist incrementally
            json.dump({"what": "GAN stabilization recipe probes (VERDICT r4 #1)",
                       "epochs": args.epochs, "results": results}, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
