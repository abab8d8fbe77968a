"""Stabilization-recipe probe: train N short runs with different GAN recipes
on the (scaled) synthetic set, then score each with the full eval triple
(FID + KID + precision/recall) and the collapse verdict.

Purpose (VERDICT r3 #1, r5 #1): the framework has every stabilizer knob —
lazy R1, EMA, DiffAugment, per-net optimizers, LR schedules — but knob
settings must be *measured*, not guessed.  This harness composes the knobs
into candidate recipes and measures which one actually learns the data
distribution; the winning recipe graduates to a long run (BENCHMARKS.md
"first converged run" section).

Round 5 generalizes the harness past its hardcoded v2 family (VERDICT r4
"what's missing" #1): ``--family v1`` runs the same probe protocol on the
paper-style ViTGAN (ISR + L2 attention + SLN + SIREN), exercising the hard
v1 modeling parts under real training dynamics.  Recipes are written with
FAMILY-LOGICAL keys (gen_optim.*, disc_optim.*, bare model knobs) and
translated to each family's config paths at launch.

Role-model in the reference: the live per-epoch best-FID loop of
ref:src/v2/training.py:159-226 (which similarly iterated recipes by hand)
and the >=98-epoch v1 training trail (ref:main-v1.py:30).

Usage (chip):
  python scripts/recipe_probe.py --epochs 40 --out RECIPES_r05.json
  python scripts/recipe_probe.py --family v1 --epochs 40 --out RECIPES_V1_r05.json
  python scripts/recipe_probe.py --only wgan_weakD --epochs 200   # winner, long
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
# is a classifier recipe, and D momentum is a known destabilizer.  Keys are
# LOGICAL; ``translate`` maps them onto the family's config paths.
_ADAM0 = [
    "gen_optim.name=adam", "gen_optim.beta1=0.0",
    "gen_optim.beta2=0.99", "gen_optim.weight_decay=0.0",
    "disc_optim.name=adam", "disc_optim.beta1=0.0",
    "disc_optim.beta2=0.99", "disc_optim.weight_decay=0.0",
]


def _lr(g, d):
    return [f"gen_optim.learning_rate={g}", f"disc_optim.learning_rate={d}"]


def translate(family: str, kv: str) -> str:
    """Logical recipe key -> dotted config path for ``family``.

    run.* / data.* pass through (family-generic config sections).  Optimizer
    keys map onto where each family nests them (v2: v2.gen_optim.*; v1:
    v1.generator.optim.* — train/state.py:_optim_cfg resolves both).  Bare
    model knobs (loss, diversity_weight, latent_dim, ...) get the family
    prefix.
    """
    key, _, val = kv.partition("=")
    if key.startswith(("run.", "data.")):
        return kv
    if key.startswith("gen_optim."):
        sub = key[len("gen_optim."):]
        return (f"{family}.generator.optim.{sub}={val}" if family == "v1"
                else f"{family}.gen_optim.{sub}={val}")
    if key.startswith("disc_optim."):
        sub = key[len("disc_optim."):]
        return (f"{family}.discriminator.optim.{sub}={val}" if family == "v1"
                else f"{family}.disc_optim.{sub}={val}")
    return f"{family}.{key}={val}"


# Knobs that only exist on the v2 model; recipes using them are skipped
# (with a recorded reason) for other families.  minibatch-std is a v2
# discriminator-head feature (models/vitgan_v2.py); latent_dim arms assume
# the v2 default 128 (v1's default is already 1024, so "latent 256" would
# SHRINK it — a different experiment, not the same arm).
V2_ONLY_KEYS = ("minibatch_std", "latent_dim")

RECIPES = {
    # reference defaults (the recipe the round-3 soak ran — the collapse
    # control arm; expected to trip collapse_abort)
    "reference_defaults": [],
    # lazy R1 sweep around the StyleGAN2-ADA CIFAR operating point, with the
    # GAN-standard optimizer and DiffAugment
    "r1_g01_b0": _ADAM0 + _lr(2e-4, 2e-4)
    + ["r1_gamma=0.1", "run.diff_augment=color,translation"],
    "r1_g1_b0": _ADAM0 + _lr(2e-4, 2e-4)
    + ["r1_gamma=1.0", "run.diff_augment=color,translation"],
    "r1_g10_b0": _ADAM0 + _lr(2e-4, 2e-4)
    + ["r1_gamma=10.0", "run.diff_augment=color,translation"],
    # TTUR: D learns faster but is R1-regularized
    "r1_g1_ttur": _ADAM0 + _lr(1e-4, 3e-4)
    + ["r1_gamma=1.0", "run.diff_augment=color,translation"],
    # no-DiffAugment ablation of the γ=1 arm
    "r1_g1_noaug": _ADAM0 + _lr(2e-4, 2e-4) + ["r1_gamma=1.0"],
    # WGAN-GP alternative (the reference's dead-path loss, live here)
    "wgan_gp": _ADAM0 + _lr(2e-4, 2e-4)
    + ["loss=wgan-gp", "run.diff_augment=color,translation"],
    # --- round-2 arms: every round-1 BCE recipe measured recall ~0 (mode
    # collapse); these use the structural anti-collapse knobs added in
    # response (minibatch-std D feature, BCE diversity bonus).
    "mbstd_r1": _ADAM0 + _lr(2e-4, 2e-4)
    + ["r1_gamma=0.1", "run.diff_augment=color,translation",
       "minibatch_std=true"],
    "mbstd_div_r1": _ADAM0 + _lr(2e-4, 2e-4)
    + ["r1_gamma=0.1", "run.diff_augment=color,translation",
       "minibatch_std=true", "g_diversity=true"],
    "div_r1": _ADAM0 + _lr(2e-4, 2e-4)
    + ["r1_gamma=0.1", "run.diff_augment=color,translation",
       "g_diversity=true"],
    "wgan_mbstd": _ADAM0 + _lr(2e-4, 2e-4)
    + ["loss=wgan-gp", "run.diff_augment=color,translation",
       "minibatch_std=true"],
    # --- round-3 arms: recall-targeted
    "wgan_div5": _ADAM0 + _lr(2e-4, 2e-4)
    + ["loss=wgan-gp", "run.diff_augment=color,translation",
       "diversity_weight=0.5"],
    "wgan_lat256": _ADAM0 + _lr(2e-4, 2e-4)
    + ["loss=wgan-gp", "run.diff_augment=color,translation",
       "latent_dim=256"],
    "wgan_weakD": _ADAM0 + _lr(2e-4, 1e-4)
    + ["loss=wgan-gp", "run.diff_augment=color,translation"],
    # --- round-4 arms: the weak-D TTUR winner probed along its own axis
    "wgan_weakD2": _ADAM0 + _lr(2e-4, 5e-5)
    + ["loss=wgan-gp", "run.diff_augment=color,translation"],
    # Diversity-WEIGHT sweep on the weak-D balance: under wgan-gp the
    # diversity bonus is always on at the config default 0.1
    # (train/step.py, config.py V2Config.diversity_weight), so this arm is
    # a 0.1 -> 0.5 weight sweep, NOT an off-to-on ablation; wgan_weakD_div0
    # below is the true off control (ADVICE r4 #1).
    "wgan_weakD_div5": _ADAM0 + _lr(2e-4, 1e-4)
    + ["loss=wgan-gp", "run.diff_augment=color,translation",
       "diversity_weight=0.5"],
    "wgan_weakD_div0": _ADAM0 + _lr(2e-4, 1e-4)
    + ["loss=wgan-gp", "run.diff_augment=color,translation",
       "diversity_weight=0.0"],
    "wgan_strongG": _ADAM0 + _lr(3e-4, 1e-4)
    + ["loss=wgan-gp", "run.diff_augment=color,translation"],
    # --- round-5 arms (VERDICT r4 weak #1): the three winning solo arms —
    # weak-D TTUR (recall 0.27@40ep), diversity 0.5 (0.206), latent 256
    # (0.176) — were never composed; these measure the composition.
    "wgan_composed": _ADAM0 + _lr(2e-4, 1e-4)
    + ["loss=wgan-gp", "run.diff_augment=color,translation",
       "diversity_weight=0.5", "latent_dim=256"],
    "wgan_composed_mbstd": _ADAM0 + _lr(2e-4, 1e-4)
    + ["loss=wgan-gp", "run.diff_augment=color,translation",
       "diversity_weight=0.5", "latent_dim=256", "minibatch_std=true"],
    # --- round-5b arm: WGAN n_critic (Arjovsky 2017's standard 5 critic
    # updates per G update).  Motivated by the v1 matrix: every lr-ratio arm
    # sat at precision 1.0 / recall 0 through 200 epochs — a critic-starved
    # equilibrium no lr tweak fixed; disc_steps is the principled lever.
    "wgan_ncritic": _ADAM0 + _lr(2e-4, 2e-4)
    + ["loss=wgan-gp", "run.diff_augment=color,translation",
       "disc_steps=5"],
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


def recipe_supported(family: str, sets) -> str:
    """'' if the recipe runs on ``family``, else the reason it is skipped."""
    if family == "v2":
        return ""
    for kv in sets:
        key = kv.partition("=")[0]
        if key in V2_ONLY_KEYS:
            return f"knob {key} is v2-only (not wired into the {family} model)"
    return ""


def probe(name, sets, args):
    run_name = f"{args.prefix}_{name}"
    run_dir = os.path.join(scratch(), "output", run_name)
    t0 = time.time()
    cmd = [sys.executable, "-m", "vitgan_tpu.cli", "train",
           "--family", args.family,
           "--dataset", "synthetic", "--epochs", str(args.epochs),
           "--run-name", run_name]
    translated = [translate(args.family, kv) for kv in COMMON + sets]
    for kv in translated:
        cmd += ["--set", kv]
    log = os.path.join("/tmp", f"probe_{args.family}_{name}.log")
    rc = run(cmd, log)
    rec = {"recipe": name, "family": args.family, "sets": translated,
           "rc": rc, "train_wall_s": round(time.time() - t0, 1), "log": log}
    rec["tail"] = tail_metrics(
        run_dir, ["d_loss", "g_loss", "d_real_acc", "d_fake_acc", "collapse"])
    rec["collapsed"] = bool((rec["tail"].get("collapse") or 0) >= 1.0)
    if rc == 0:
        ev_log = os.path.join("/tmp", f"probe_{args.family}_{name}_eval.log")
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
    ap.add_argument("--family", default="v2", choices=["v1", "v2"])
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--eval-samples", type=int, default=2048)
    ap.add_argument("--prefix", default=None,
                    help="run-name prefix (default probe_r05[_<family>])")
    ap.add_argument("--only", action="append", default=None,
                    help="run only these recipes (repeatable)")
    ap.add_argument("--out", default="RECIPES_r05.json")
    args = ap.parse_args()
    if args.prefix is None:
        args.prefix = ("probe_r05" if args.family == "v2"
                       else f"probe_r05_{args.family}")

    names = args.only or list(RECIPES)
    results = []
    if os.path.exists(args.out):  # resume: keep probes recorded by a prior run
        with open(args.out) as f:
            results = [r for r in json.load(f).get("results", [])
                       if r["recipe"] not in names]
    for name in names:
        why_not = recipe_supported(args.family, RECIPES[name])
        if why_not:
            print(f"probe: {name} SKIPPED for {args.family}: {why_not}",
                  flush=True)
            results.append({"recipe": name, "family": args.family,
                            "skipped": why_not})
            continue
        print(f"probe: {name} starting", flush=True)
        rec = probe(name, RECIPES[name], args)
        results.append(rec)
        print(f"probe: {name} done: "
              f"{json.dumps({k: rec.get(k) for k in ('collapsed', 'tail', 'eval', 'rc')})}",
              flush=True)
        with open(args.out, "w") as f:  # persist incrementally
            json.dump({"what": "GAN stabilization recipe probes (VERDICT r5 #1/#2)",
                       "family": args.family, "epochs": args.epochs,
                       "results": results}, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
