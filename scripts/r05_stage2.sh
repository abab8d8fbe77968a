#!/bin/bash
# Round-5 stage 2: everything downstream of the probe matrix, serialized on
# the single TPU chip in verdict-priority order (VERDICT r4 next #1/#2/#6/
# #3/#4/#5 + weak #6).  Run after r05_probe_batch.sh completes.
set -x
cd /root/repo

# 0. Patch up the v1 wgan_weakD_div5 eval (the in-batch eval wedged on a
# tunnel hiccup and was killed; the trained run dir is intact).
python - <<'EOF'
import json, os, subprocess, sys
sys.path.insert(0, ".")
from vitgan_tpu.config import scratch_root
rd = os.path.join(scratch_root(), "output", "probe_r05_v1_wgan_weakD_div5")
rc = subprocess.run([sys.executable, "-m", "vitgan_tpu.cli", "eval",
                     "--run-dir", rd, "--num-samples", "2048"]).returncode
if rc == 0:
    with open(os.path.join(rd, "metrics.json")) as f:
        m = json.load(f)
    with open("RECIPES_V1_r05.json") as f:
        d = json.load(f)
    for r in d["results"]:
        if r["recipe"] == "wgan_weakD_div5":
            r["eval"] = {k: m.get(k) for k in ("fid", "kid_mean", "precision", "recall")}
            r.pop("eval_rc", None)
    with open("RECIPES_V1_r05.json", "w") as f:
        json.dump(d, f, indent=2)
EOF

# 1. Graduate a v1 arm to a 200-epoch converged run (VERDICT #1).  The 40-epoch
# matrix tied every non-diverged arm at recall 0 (gp/weakD at precision 1.0,
# weakD2 at 0.55); weak-D TTUR is graduated because it is the one recipe with
# MEASURED long-horizon recall growth on this data (v2: 0.27@40ep -> 0.41@200ep,
# CONVERGED2_r04.json) while plain wgan_gp saturated (LONG400_r04.json) — the
# 200-epoch run tests whether the v1 composition (ISR/L2/SLN/SIREN) shares
# that dynamic or differs (the analysis the verdict asks for either way).
python scripts/recipe_probe.py --family v1 --epochs 200 \
  --only wgan_weakD --prefix converged_v1_r05 --out CONVERGED_V1_r05.json

# 2a. Graduate the composed-v2 winner to 200 epochs (VERDICT #2a).
V2_WIN=$(python scripts/pick_winner.py RECIPES_r05.json --require composed)
if [ -n "$V2_WIN" ]; then
  python scripts/recipe_probe.py --family v2 --epochs 200 \
    --only "$V2_WIN" --prefix converged_v2_r05 --out CONVERGED_V2_r05.json
fi

# 2b + weak#6: 400-epoch weak-D TTUR run (third recall-vs-budget point) WITH
# two mid-run SIGTERMs + resumes — the production recipe finally gets the
# preemption soak.  Probe-protocol data/eval shape for curve comparability.
python scripts/soak_resume.py --epochs 400 --kill-after-epochs 130 \
  --run-name soak_weakd400_r05 --out SOAK_WEAKD400_r05.json \
  --progress-timeout 3600 \
  --set data.synthetic_samples=50000 --set run.ema_decay=0.995 \
  --set run.fid_every_epochs=20 --set run.fid_num_samples=1024 \
  --set run.sample_grid_every_epochs=50 --set run.checkpoint_every_epochs=5 \
  --set v2.loss=wgan-gp --set run.diff_augment=color,translation \
  --set v2.gen_optim.name=adam --set v2.gen_optim.beta1=0.0 \
  --set v2.gen_optim.beta2=0.99 --set v2.gen_optim.weight_decay=0.0 \
  --set v2.gen_optim.learning_rate=2e-4 \
  --set v2.disc_optim.name=adam --set v2.disc_optim.beta1=0.0 \
  --set v2.disc_optim.beta2=0.99 --set v2.disc_optim.weight_decay=0.0 \
  --set v2.disc_optim.learning_rate=1e-4
# probe-protocol eval of the soaked 400-epoch run -> its metrics.json
python -m vitgan_tpu.cli eval \
  --run-dir "$(python -c 'import sys; sys.path.insert(0,"."); from vitgan_tpu.config import scratch_root; import os; print(os.path.join(scratch_root(),"output","soak_weakd400_r05"))')" \
  --num-samples 2048

# 3. Baseline-family convergence snapshots (VERDICT #6).
python scripts/families_probe.py --out FAMILIES_r05.json

# 4. Collapse-aware 2-worker production sweep (VERDICT #3).
python scripts/sweep_2workers.py --out SWEEP_r05.json

# 5. hires256p4 4k-token production step + routing A/B (VERDICT #4).
python scripts/bench_hires256p4.py

# 6. hires op-table (VERDICT #5): flat single-step profile of hires128.
python scripts/profile_step.py hires128 1 40 > HIRES_OPTABLE_r05.json

# 7. (appended mid-run) composed-v2 200-epoch graduation RETRY: the first
# attempt was killed when its compile RPC wedged the axon tunnel (recorded
# rc -9 in the first CONVERGED_V2_r05.json write; this rerun replaces it).
python scripts/recipe_probe.py --family v2 --epochs 200 \
  --only wgan_composed --prefix converged_v2_r05 --out CONVERGED_V2_r05.json

# 8. v1 n_critic probe: the disc_steps knob added in round 5b, probed at
# the WGAN-standard 5 critic updates.
python scripts/recipe_probe.py --family v1 --epochs 40 \
  --only wgan_ncritic --out RECIPES_V1_r05.json
