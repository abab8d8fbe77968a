#!/bin/bash
# Round-5 stage 7: endgame order — the hard "Done"-criterion artifacts first
# (SWEEP_r05 for VERDICT #3, the 4k-token A/B for #4, optable for #5, family
# snapshots for #6), then the informative-only runs (composed-200ep tied its
# 40-epoch probe; the recall>=0.6 bar is already met by the 400-epoch soak).
set -x
cd /root/repo
G="python scripts/wedge_guard.py --"

$G python scripts/sweep_2workers.py --out SWEEP_r05.json
sleep 30
$G python scripts/bench_hires256p4.py
sleep 30
$G python scripts/families_probe.py --only cnn --only mlp --out FAMILIES_r05.json
sleep 30
$G python scripts/profile_step.py hires128 1 40 > HIRES_OPTABLE_r05.json
sleep 30
$G python scripts/recipe_probe.py --family v1 --epochs 40 \
  --only wgan_ncritic --out RECIPES_V1_r05.json
sleep 30
$G python scripts/recipe_probe.py --family v2 --epochs 200 \
  --only wgan_composed --prefix converged_v2_r05 --out CONVERGED_V2_r05.json
