#!/bin/bash
# Round-5 stage 4: stage-3 continuation after the third tunnel wedge killed
# the soak's segment-2 launch.  Finishes the soak manually, then the rest of
# the queue, cheap-and-high-priority first.
set -x
cd /root/repo

# 1. Soak completion + analysis (VERDICT #2b + weak #6).
timeout --signal=TERM 3600 python scripts/r05_soak_finish.py
timeout --signal=TERM 1200 python -m vitgan_tpu.cli eval \
  --run-dir "$(python -c 'import sys; sys.path.insert(0,"."); from vitgan_tpu.config import scratch_root; import os; print(os.path.join(scratch_root(),"output","soak_weakd400_r05"))')" \
  --num-samples 2048

# 2. VERDICT #6: baseline-family convergence snapshots (cheap, ~10 min).
timeout --signal=TERM 2400 python scripts/families_probe.py --out FAMILIES_r05.json

# 3. VERDICT #2a: composed-v2 200-epoch graduation (retry).
timeout --signal=TERM 3600 python scripts/recipe_probe.py --family v2 \
  --epochs 200 --only wgan_composed --prefix converged_v2_r05 \
  --out CONVERGED_V2_r05.json

# 4. VERDICT #3: collapse-aware 2-worker production sweep.
timeout --signal=TERM 3600 python scripts/sweep_2workers.py --out SWEEP_r05.json

# 5. VERDICT #4: hires256p4 4k-token production step + routing A/B.
timeout --signal=TERM 4800 python scripts/bench_hires256p4.py

# 6. round-5b: v1 n_critic probe (disc_steps=5).
timeout --signal=TERM 2400 python scripts/recipe_probe.py --family v1 \
  --epochs 40 --only wgan_ncritic --out RECIPES_V1_r05.json

# 7. VERDICT #5: hires op-table (flat single-step profile of hires128).
timeout --signal=TERM 1800 python scripts/profile_step.py hires128 1 40 \
  > HIRES_OPTABLE_r05.json
