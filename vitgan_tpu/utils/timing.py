"""Honest device timing.

On the tunneled "axon" TPU platform ``jax.block_until_ready`` can return before
execution completes until a first full host readback has happened (round-1
artifact: it produced a 160x-overstated benchmark).  ``sync_timeit`` therefore
(a) forces a host readback after warmup, which also drops the tunnel client
into synchronous dispatch, and (b) ends the timed region with a host
materialization of the result — the only synchronization point that cannot lie.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import numpy as np


def _readback(tree) -> float:
    """Materialize one scalar that depends on ``tree`` on the host."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(np.asarray(leaf).ravel()[0])


def sync_timeit(fn: Callable, *args, iters: int = 10, warmup: int = 1) -> float:
    """Mean seconds per call of ``fn(*args)``, timed to host readback."""
    out = None
    for _ in range(max(1, warmup)):
        out = fn(*args)
    _readback(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _readback(out)
    return (time.perf_counter() - t0) / iters
