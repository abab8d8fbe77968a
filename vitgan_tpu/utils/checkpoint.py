"""Orbax checkpoint/resume of the FULL train state.

The reference checkpoints only ``{lr, epoch, state_dict}`` every 50 epochs and
on best-criterion (ref:src/v1/gan.py:165-191), losing optimizer moments
(SURVEY §5.4); v2 saves bare state dicts named
``best_model_epoch_<e>_fid_<f>.pth`` (ref:src/v2/training.py:218-226).  Here a
checkpoint is the exact step state — params, model state, both optax states,
PRNG key, step — so resume is bit-identical, plus a small JSON sidecar with
epoch/metric metadata (preserving the best-FID-in-name convention).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Step-indexed checkpoints with keep-N retention and best-metric tracking."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep = keep
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:010d}")

    def save(self, step: int, state: Any, metadata: Optional[Dict[str, Any]] = None) -> str:
        """Async save: returns once the write is dispatched; completion is awaited
        before any subsequent save/restore (training never blocks on IO)."""
        self._ckptr.wait_until_finished()
        # Retention runs BEFORE dispatching the new save, when every listed
        # checkpoint is durable: deleting after dispatch would, at keep=1,
        # remove the only durable checkpoint while the new one is still in
        # flight — a crash there would leave nothing restorable.
        self._retain()
        path = self._path(step)
        self._ckptr.save(path, state, force=True)
        with open(path + ".json", "w") as f:
            json.dump({"step": step, **(metadata or {})}, f)
        return path

    def save_best(self, step: int, state: Any, metric_name: str, metric_value: float,
                  metadata: Optional[Dict[str, Any]] = None) -> str:
        """Best-model checkpoint keyed on a named criterion (ref:src/v1/gan.py:77,136-138)."""
        self._ckptr.wait_until_finished()
        path = os.path.join(self.directory, "best")
        self._ckptr.save(path, state, force=True)
        with open(path + ".json", "w") as f:
            json.dump({"step": step, "metric": metric_name, "value": metric_value,
                       **(metadata or {})}, f)
        return path

    def wait(self) -> None:
        self._ckptr.wait_until_finished()
        # Everything is durable now, so the keep+1-th transient checkpoint
        # (left by retain-before-dispatch in save()) can be trimmed safely.
        self._retain()

    def _retain(self) -> None:
        # Called with no save in flight: keep the newest ``keep`` durable
        # checkpoints (the save about to be dispatched will be keep+1-th
        # transiently, trimmed at the next save once durable).
        steps = self.all_steps()
        steps = steps[: max(0, len(steps) - self.keep)]
        for s in steps:
            p = self._path(s)
            import shutil

            shutil.rmtree(p, ignore_errors=True)
            try:
                os.remove(p + ".json")
            except OSError:
                pass

    def all_steps(self):
        out = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"step_(\d+)", name)
            if m and os.path.isdir(os.path.join(self.directory, name)):
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def restore(self, target: Any, step: Optional[int] = None,
                best: bool = False) -> Tuple[Any, Dict[str, Any]]:
        """Restore into the structure of ``target`` (an abstract or concrete state)."""
        self._ckptr.wait_until_finished()  # an async save may still be in flight
        if best:
            path = os.path.join(self.directory, "best")
        else:
            step = step if step is not None else self.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints under {self.directory}")
            path = self._path(step)
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        state = self._ckptr.restore(path, abstract)
        meta = {}
        if os.path.exists(path + ".json"):
            with open(path + ".json") as f:
                meta = json.load(f)
        return state, meta


def partial_load(target: Any, source: Any) -> Tuple[Any, int, int]:
    """strict=False warm-start: copy every leaf whose path+shape matches.

    The role of the reference's pretrained-ViT discriminator warm start
    (ref:src/v2/modules.py:429-440, load_state_dict(strict=False)).  Returns
    (merged_tree, n_loaded, n_total_target_leaves).
    """
    tpaths = {tuple(str(k) for k in p): v for p, v in
              jax.tree_util.tree_flatten_with_path(target)[0]}
    spaths = {tuple(str(k) for k in p): v for p, v in
              jax.tree_util.tree_flatten_with_path(source)[0]}
    loaded = 0
    merged = {}
    for path, tv in tpaths.items():
        sv = spaths.get(path)
        if sv is not None and getattr(sv, "shape", None) == getattr(tv, "shape", None):
            merged[path] = sv
            loaded += 1
        else:
            merged[path] = tv
    leaves, treedef = jax.tree_util.tree_flatten(target)
    ordered = [merged[tuple(str(k) for k in p)] for p, _ in
               jax.tree_util.tree_flatten_with_path(target)[0]]
    return jax.tree_util.tree_unflatten(treedef, ordered), loaded, len(leaves)
