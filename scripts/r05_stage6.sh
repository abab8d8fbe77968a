#!/bin/bash
# Round-5 stage 6: stage-5 continuation after the guard's negative-delta fix
# (a child exiting took its CPU out of the tree sum and read as a wedge,
# killing healthy harnesses at train->eval transitions).
set -x
cd /root/repo
G="python scripts/wedge_guard.py --"

# 1. VERDICT #2a: composed-v2 200-epoch graduation.
$G python scripts/recipe_probe.py --family v2 --epochs 200 \
  --only wgan_composed --prefix converged_v2_r05 --out CONVERGED_V2_r05.json
sleep 30

# 2. VERDICT #3: collapse-aware 2-worker production sweep.
$G python scripts/sweep_2workers.py --out SWEEP_r05.json
sleep 30

# 3. VERDICT #4: hires256p4 4k-token production step + routing A/B.
$G python scripts/bench_hires256p4.py
sleep 30

# 4. VERDICT #6 remainder: cnn + mlp family snapshots (dcgan recorded;
# families_probe now merges instead of clobbering).
$G python scripts/families_probe.py --only cnn --only mlp --out FAMILIES_r05.json
sleep 30

# 5. round-5b: v1 n_critic probe (disc_steps=5).
$G python scripts/recipe_probe.py --family v1 --epochs 40 \
  --only wgan_ncritic --out RECIPES_V1_r05.json
sleep 30

# 6. VERDICT #5: hires op-table (flat single-step profile of hires128).
$G python scripts/profile_step.py hires128 1 40 > HIRES_OPTABLE_r05.json
