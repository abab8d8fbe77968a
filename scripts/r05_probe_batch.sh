#!/bin/bash
# Round-5 probe batch (VERDICT r4 next-round #1 and #2a / ADVICE #2):
# serialized on the single TPU chip.
#  stage 1: v1 paper-ViTGAN probe matrix (BCE control + WGAN arms)
#  stage 2: v2 arms never measured in round 4 (div5 eval, strongG, div0
#           control) + the composed-winner arms.
set -x
cd /root/repo
python scripts/recipe_probe.py --family v1 --epochs 40 \
  --only reference_defaults --only wgan_gp --only wgan_weakD \
  --only wgan_weakD2 --only wgan_strongG --only wgan_weakD_div5 \
  --out RECIPES_V1_r05.json
python scripts/recipe_probe.py --family v2 --epochs 40 \
  --only wgan_weakD_div5 --only wgan_weakD_div0 --only wgan_strongG \
  --only wgan_composed --only wgan_composed_mbstd \
  --out RECIPES_r05.json
