"""End-to-end trainer throughput at CIFAR-50k scale, metrics/logging ON.

This measures what a user actually gets from ``Trainer.fit`` — scanned
device-resident steps PLUS the per-epoch metric aggregation/pull, logging and
best-tracking — as opposed to bench.py's pure-step ceiling.  The per-epoch
``images_per_sec`` the trainer logs is already synchronous (the metric pull
is the sync point), so this script just runs fit() and reports the logged
values; the first epoch includes XLA compilation and is listed separately.

Usage: SCRATCH=... python scripts/bench_trainer.py [epochs] [n_images] [fid01]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vitgan_tpu.ops.policy import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from vitgan_tpu import config as C  # noqa: E402
from vitgan_tpu.train.trainer import Trainer  # noqa: E402


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    with_fid = len(sys.argv) > 3 and sys.argv[3] == "1"
    cfg = C.ExperimentConfig(family="v2", data=C.DataConfig(dataset="synthetic"))
    cfg = C.replace(cfg, **{
        "run.epochs": epochs,
        "run.fid_every_epochs": 1 if with_fid else 0,
        "run.checkpoint_every_epochs": 0,
        "run.sample_grid_every_epochs": 0,
        "run.log_every_steps": 0,
        "data.synthetic_samples": n_images,
        "run_name": f"bench_trainer_{int(time.time())}",
    })
    trainer = Trainer(cfg)
    t0 = time.perf_counter()
    trainer.fit()
    total = time.perf_counter() - t0

    with open(os.path.join(trainer.dirs.logs, "scalars.jsonl")) as f:
        records = (json.loads(line) for line in f)
        ips = [r["value"] for r in records if r["tag"] == "train/images_per_sec"]
    steady = ips[1:] or ips
    print(json.dumps({
        "metric": "end-to-end Trainer.fit images/sec (per-epoch metric pulls on%s)"
                  % (", FID on" if with_fid else ""),
        "value": round(sum(steady) / len(steady), 1),
        "unit": "images/sec",
        "epochs": epochs,
        "dataset_images": n_images,
        "batch": cfg.model.batch_size,
        "first_epoch_img_per_sec": round(ips[0], 1),
        "per_epoch_img_per_sec": [round(v, 1) for v in ips],
        "total_wall_s": round(total, 1),
    }))


if __name__ == "__main__":
    main()
