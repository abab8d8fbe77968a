"""Tracing / profiling hooks.

The reference's only timing is wall-clock training-duration prints
(ref:src/v1/gan.py:175-177, ref:src/v2/training.py:266-268 — SURVEY §5.1).
Here: per-step timers with EMA + throughput, and ``jax.profiler`` trace capture
producing TensorBoard/Perfetto-compatible traces of the XLA execution.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


class StepTimer:
    """Wall-clock per-step timing with EMA and images/sec."""

    def __init__(self, ema_alpha: float = 0.9):
        self.alpha = ema_alpha
        self.ema_s: Optional[float] = None
        self.total_s = 0.0
        self.steps = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.total_s += dt
        self.steps += 1
        self.ema_s = dt if self.ema_s is None else self.alpha * self.ema_s + (1 - self.alpha) * dt
        return False

    def images_per_sec(self, batch_size: int) -> float:
        if not self.steps:
            return 0.0
        return batch_size / (self.total_s / self.steps)

    def summary(self, batch_size: int) -> Dict[str, float]:
        return {
            "steps": float(self.steps),
            "mean_step_ms": 1e3 * self.total_s / max(self.steps, 1),
            "ema_step_ms": 1e3 * (self.ema_s or 0.0),
            "images_per_sec": self.images_per_sec(batch_size),
        }


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (host-side annotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield
