"""Ray-free hyperparameter sweep runner.

Replaces the reference's Ray Tune HPO (ref:src/v2/training.py:271-294) — whose
search-space keys never matched its Config and so could not run (SURVEY §2.4.11)
— with a working random-search sweep over the same space:

- generator/discriminator lr: loguniform 1e-6 .. 1e-4
- embed_dim in {128, 256, 512}, heads in {4, 8}, batch in {128, 256}
  (ref:src/v2/training.py:277-283)

Trials run sequentially on the local chip (process-level trial parallelism
across hosts/slices is a launcher concern: each host runs a disjoint trial
range via --set sweep indices).  Metric: min FID, matching tune.run(metric=
"fid_score", mode="min") (ref:src/v2/training.py:285-292).
"""

from __future__ import annotations

import json
import math
import os
from typing import Any, Dict, List, Optional

import numpy as np


def sample_search_space(rng: np.random.Generator) -> Dict[str, Any]:
    return {
        "gen_lr": float(10 ** rng.uniform(-6, -4)),
        "disc_lr": float(10 ** rng.uniform(-6, -4)),
        "embed_dim": int(rng.choice([128, 256, 512])),
        "num_heads": int(rng.choice([4, 8])),
        "batch_size": int(rng.choice([128, 256])),
    }


def _trial_config(base, trial: Dict[str, Any]):
    from vitgan_tpu import config as C

    return C.replace(
        base,
        **{
            "v2.embed_dim": trial["embed_dim"],
            "v2.num_heads": trial["num_heads"],
            "v2.batch_size": trial["batch_size"],
            "v2.gen_optim.learning_rate": trial["gen_lr"],
            "v2.disc_optim.learning_rate": trial["disc_lr"],
        },
    )


def run_sweep(num_trials: int = 10, epochs_per_trial: int = 1, seed: int = 0,
              dataset: str = "synthetic", base_cfg=None,
              run_base: Optional[str] = None,
              trial_offset: int = 0, trial_stride: int = 1) -> Dict[str, Any]:
    """Random search; returns the best trial {params, fid}. Results JSONL per trial.

    Multi-host trial parallelism (the role Ray played, SURVEY §2.5): every host
    draws the SAME seeded trial sequence and runs the slice
    ``i % trial_stride == trial_offset``; results land in per-trial JSONL lines
    that a coordinator can merge.
    """
    from vitgan_tpu import config as C
    from vitgan_tpu.train.trainer import Trainer

    if not 0 <= trial_offset < max(1, trial_stride):
        raise ValueError(
            f"trial_offset={trial_offset} out of range for "
            f"trial_stride={trial_stride} (valid: 0..{max(1, trial_stride) - 1}) — "
            "an out-of-range offset would silently run zero trials")
    rng = np.random.default_rng(seed)
    base = base_cfg or C.replace(
        C.ExperimentConfig(family="v2", data=C.DataConfig(dataset=dataset)),
        **{"run.epochs": epochs_per_trial, "run.checkpoint_every_epochs": 0,
           "run.sample_grid_every_epochs": 0},
    )
    results: List[Dict[str, Any]] = []
    out_dir = run_base or os.path.join(C.scratch_root(), "sweeps")
    os.makedirs(out_dir, exist_ok=True)
    log_path = os.path.join(out_dir, "sweep_results.jsonl")
    for i in range(num_trials):
        trial = sample_search_space(rng)  # drawn by every host for determinism
        if i % max(1, trial_stride) != trial_offset:
            continue
        cfg = C.replace(_trial_config(base, trial), run_name=f"trial_{i:03d}")
        trainer = Trainer(cfg, run_base=out_dir, fid_extractor="random_conv")
        metrics = trainer.fit(epochs=epochs_per_trial)
        fid = metrics.get("fid", float("inf"))
        rec = {"trial": i, "params": trial, "fid": fid,
               "metrics": {k: v for k, v in metrics.items() if isinstance(v, float)}}
        results.append(rec)
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
    if not results:
        return {"trial": None, "params": None, "fid": float("inf")}
    best = min(results, key=lambda r: r["fid"] if math.isfinite(r["fid"]) else 1e18)
    with open(os.path.join(out_dir, "best_config.json"), "w") as f:
        json.dump(best, f, indent=2)
    return best
