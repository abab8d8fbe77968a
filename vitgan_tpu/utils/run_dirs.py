"""Run-directory layout under $SCRATCH.

Parity with the reference's artifact contract:
``$SCRATCH/output/<YYYYmmdd-HHMMSS>/{images,input,noise,checkpoints}``
(ref:src/v2/utils.py:13-20,178-184) and v1's timestamped SAVE_PATH
(ref:src/v1/config.py:7-17).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from vitgan_tpu.config import scratch_root, timestamp


@dataclass(frozen=True)
class RunDirs:
    root: str
    images: str
    input: str
    noise: str
    checkpoints: str
    logs: str

    @property
    def training_log(self) -> str:
        return os.path.join(self.root, "training.log")


def construct_directories(run_name: str | None = None, base: str | None = None) -> RunDirs:
    """Create and return the run-dir tree (ref:src/v2/utils.py:178-184)."""
    base = base or os.path.join(scratch_root(), "output")
    name = run_name or timestamp()
    root = os.path.join(base, name)
    dirs = RunDirs(
        root=root,
        images=os.path.join(root, "images"),
        input=os.path.join(root, "input"),
        noise=os.path.join(root, "noise"),
        checkpoints=os.path.join(root, "checkpoints"),
        logs=os.path.join(root, "logs"),
    )
    for p in (dirs.root, dirs.images, dirs.input, dirs.noise, dirs.checkpoints, dirs.logs):
        os.makedirs(p, exist_ok=True)
    return dirs


def data_dir(dataset: str) -> str:
    """Dataset cache dir: $SCRATCH/data/<name> (ref:src/v1/utils.py:115-124)."""
    p = os.path.join(scratch_root(), "data", dataset)
    os.makedirs(p, exist_ok=True)
    return p


def latest_run(base: str | None = None) -> str | None:
    """Pick the latest timestamped run dir (ref:cnn/cnn-gan.ipynb cell 14 behavior)."""
    base = base or os.path.join(scratch_root(), "output")
    if not os.path.isdir(base):
        return None
    runs = sorted(d for d in os.listdir(base) if os.path.isdir(os.path.join(base, d)))
    return os.path.join(base, runs[-1]) if runs else None


def restore_run(run_dir: str, best: bool = False, overrides: dict | None = None,
                default_cfg=None):
    """Restore a run directory into (cfg, gan, state, meta) — the ONE
    restore sequence shared by ``cli generate``/``cli eval`` and the serving
    path (serve.load_service), so restore-correctness rules (persisted
    config as source of truth; apply_from_runtime BEFORE create_train_state
    so the checkpointed PRNG key shape matches the restore template) live in
    exactly one place."""
    import jax

    from vitgan_tpu import config as C
    from vitgan_tpu.models import build_gan
    from vitgan_tpu.ops.policy import apply_from_runtime
    from vitgan_tpu.train import create_train_state
    from vitgan_tpu.utils.checkpoint import CheckpointManager

    cfg_path = os.path.join(run_dir, "config.json")
    if os.path.exists(cfg_path):
        cfg = C.load_config(cfg_path)
    elif default_cfg is not None:
        cfg = default_cfg
    else:
        cfg = C.ExperimentConfig()
    if overrides:
        cfg = C.replace(cfg, **overrides)
    apply_from_runtime(cfg.runtime)
    gan = build_gan(cfg)
    state = create_train_state(jax.random.PRNGKey(0), gan, cfg)
    mgr = CheckpointManager(os.path.join(run_dir, "checkpoints"))
    state, meta = mgr.restore(state, best=best)
    return cfg, gan, state, meta
