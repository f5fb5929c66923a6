"""Lightweight step-time / throughput counters and jax.profiler trace hooks.

The reference has no profiling (SURVEY.md §5); this adds:

- ``StepTimer``: wall-clock EMA of step time plus derived throughput
  (points/sec, steps/sec) for the training loop's progress metrics,
- ``trace``: a context manager around ``jax.profiler`` for capturing device traces
  viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["StepTimer", "trace"]


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._avg: Optional[float] = None
        self._t: Optional[float] = None

    def tick(self) -> Optional[float]:
        """Call once per step; returns the EMA step time in seconds (None on first)."""
        now = time.perf_counter()
        if self._t is not None:
            dt = now - self._t
            self._avg = dt if self._avg is None else self.ema * self._avg + (1 - self.ema) * dt
        self._t = now
        return self._avg

    def throughput(self, items_per_step: int) -> Optional[float]:
        return items_per_step / self._avg if self._avg else None


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('outputs/trace'): step(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
