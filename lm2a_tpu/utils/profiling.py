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


# Published peak dense-matmul throughput per chip (bf16, no sparsity), used
# to convert measured FLOP/s into model FLOPs utilization (MFU). Keyed by
# substrings of ``device.device_kind``.
_PEAK_BF16_FLOPS = (
    ("v5 lite", 197e12),  # TPU v5e
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v6 lite", 918e12),  # TPU v6e / Trillium
    ("v6e", 918e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def device_peak_flops(device=None) -> Optional[float]:
    """Peak bf16 FLOP/s for the attached chip, or None when unknown (CPU)."""
    import jax

    dev = device or jax.devices()[0]
    kind = (getattr(dev, "device_kind", "") or "").lower()
    if dev.platform not in ("tpu", "axon") and "tpu" not in kind:
        return None
    for tag, peak in _PEAK_BF16_FLOPS:
        if tag in kind:
            return peak
    return None


def compiled_flops(jitted_fn, *args, **kwargs) -> Optional[float]:
    """Total FLOPs of one invocation per XLA cost analysis, or None.

    ``jitted_fn`` must be a ``jax.jit`` wrapper; args are example inputs.
    Cost analysis counts a fused multiply-add as 2 FLOPs (matching the
    marketing peaks above).
    """
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0]
        flops = float(cost.get("flops", -1.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def mfu(total_flops: Optional[float], seconds: float, device=None) -> Optional[float]:
    """Model FLOPs utilization in [0, 1], or None when peak/flops unknown."""
    peak = device_peak_flops(device)
    if not total_flops or not peak or seconds <= 0:
        return None
    return total_flops / seconds / peak
