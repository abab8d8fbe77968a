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
    """Materialize one scalar that depends on ``tree`` on the host.

    NOTE: ``np.asarray(leaf)`` transfers the WHOLE first leaf.  That is the
    point for train states (the leaf is a small weight) but poisons timings
    whose result is a large tensor: on this tunnel a 25MB transfer costs
    ~1s, which silently inflates per-iter numbers by transfer/iters.  Use
    ``sync_timeit`` for train-step-like results and ``sync_timeit_scalar``
    for kernels returning big arrays.
    """
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(np.asarray(leaf).ravel()[0])


@jax.jit
def _scalarize(tree):
    """Reduce a pytree to ONE f32 scalar on device (so the host readback that
    forces completion transfers 4 bytes, not the result)."""
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def sync_timeit(fn: Callable, *args, iters: int = 10, warmup: int = 1) -> float:
    """Mean seconds per call of ``fn(*args)``, timed to host readback.

    The end-of-region readback transfers the first result leaf — appropriate
    when that leaf is small (train states, metrics).  For results that ARE
    large tensors use :func:`sync_timeit_scalar`.
    """
    out = None
    for _ in range(max(1, warmup)):
        out = fn(*args)
    _readback(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _readback(out)
    return (time.perf_counter() - t0) / iters


def sync_timeit_scalar(fn: Callable, *args, iters: int = 10, warmup: int = 1) -> float:
    """Mean seconds per call, synchronized through an on-device scalar
    reduction of the result — the host readback that ends the timed region
    moves 4 bytes regardless of result size.  Use for kernel benchmarks
    (attention outputs, gradients) where ``sync_timeit``'s full-leaf readback
    would add transfer time that scales with the result, not the compute."""
    out = None
    for _ in range(max(1, warmup)):
        out = fn(*args)
    float(np.asarray(_scalarize(out)))  # full completion + sync dispatch mode
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(_scalarize(out)))
    return (time.perf_counter() - t0) / iters
