#!/bin/bash
# Round-5 stage 3: the stage-2 queue relaunched after two axon-tunnel wedges
# (a compile RPC hung twice; the wedged client had to be killed by PID before
# the tunnel recovered).  Differences from stage 2: verdict-priority order
# with the soak first, and every item under a hard `timeout` so one wedge
# cannot stall the chip queue — SIGTERM is safe here (cli train checkpoints
# on SIGTERM via the preemption handler; harnesses record rc and move on).
set -x
cd /root/repo

# 1. VERDICT #2b + weak #6: 400-epoch weak-D TTUR with SIGTERM x2 + resume.
timeout --signal=TERM 7200 python scripts/soak_resume.py \
  --epochs 400 --kill-after-epochs 130 \
  --run-name soak_weakd400_r05 --out SOAK_WEAKD400_r05.json \
  --progress-timeout 1500 \
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
timeout --signal=TERM 1200 python -m vitgan_tpu.cli eval \
  --run-dir "$(python -c 'import sys; sys.path.insert(0,"."); from vitgan_tpu.config import scratch_root; import os; print(os.path.join(scratch_root(),"output","soak_weakd400_r05"))')" \
  --num-samples 2048

# 2. VERDICT #2a: composed-v2 200-epoch graduation (retry; first attempt
# was the wedged compile, recorded rc -9).
timeout --signal=TERM 3600 python scripts/recipe_probe.py --family v2 \
  --epochs 200 --only wgan_composed --prefix converged_v2_r05 \
  --out CONVERGED_V2_r05.json

# 3. VERDICT #6: baseline-family convergence snapshots.
timeout --signal=TERM 2400 python scripts/families_probe.py --out FAMILIES_r05.json

# 4. VERDICT #3: collapse-aware 2-worker production sweep.
timeout --signal=TERM 3600 python scripts/sweep_2workers.py --out SWEEP_r05.json

# 5. VERDICT #4: hires256p4 4k-token production step + routing A/B.
timeout --signal=TERM 5400 python scripts/bench_hires256p4.py

# 6. VERDICT #5: hires op-table (flat single-step profile of hires128).
timeout --signal=TERM 1800 python scripts/profile_step.py hires128 1 40 \
  > HIRES_OPTABLE_r05.json

# 7. round-5b: v1 n_critic probe (disc_steps=5).
timeout --signal=TERM 2400 python scripts/recipe_probe.py --family v1 \
  --epochs 40 --only wgan_ncritic --out RECIPES_V1_r05.json
