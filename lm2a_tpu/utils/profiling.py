"""Profiling and step-timing utilities.

The reference's only observability is debug prints in the sampling loop and
per-epoch wall-clock timing (SURVEY.md §5.1). TPU-native equivalents:

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory,
- :class:`StepTimer` — EMA'd step timing with periodic reporting that only
  syncs the device when a report is due,
- :func:`device_memory_stats` — live HBM usage when the backend exposes it.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/jax-trace'): step(...)`` -> profiler trace dir."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with exponential smoothing."""

    def __init__(self, report_every: int = 100, smoothing: float = 0.98):
        self.report_every = report_every
        self.smoothing = smoothing
        self._last: Optional[float] = None
        self._ema: Optional[float] = None
        self.steps = 0

    def tick(self) -> Optional[float]:
        """Call once per step; returns the EMA step time on report steps."""
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self._ema = dt if self._ema is None else (
                self.smoothing * self._ema + (1 - self.smoothing) * dt
            )
        self._last = now
        self.steps += 1
        if self.report_every and self.steps % self.report_every == 0:
            return self._ema
        return None

    @property
    def ema_seconds(self) -> Optional[float]:
        return self._ema


def device_memory_stats(device=None) -> dict:
    import jax

    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }
