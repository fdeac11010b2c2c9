"""Motion feature derivation: smoothing + velocity/acceleration.

Vectorized, jit-able equivalents of the reference's per-frame / per-dimension
numpy loops in ``/root/reference/preprocess.py:113-156``:

- Gaussian temporal smoothing (sigma=1.0, radius = max(1, int(3*sigma)),
  zero-padded 'same' convolution, exactly ``np.convolve(..., 'same')``),
- central-difference velocity with one-sided boundaries, scaled by fps,
- central-difference acceleration with one-sided second differences,
- concat [pos, vel, acc] -> (T, 3*D).

These are pure functions usable with numpy arrays on host or jnp arrays under
jit; the hot path (dataset preprocessing over ~1868 clips) runs them batched
on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gaussian_kernel(sigma: float) -> np.ndarray:
    """Normalized Gaussian kernel covering +/- 3 sigma (min radius 1)."""
    radius = max(1, int(3.0 * sigma))
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_smooth(x, sigma: float = 1.0):
    """Zero-padded 'same' Gaussian smoothing along axis 0 of (T, D)."""
    if sigma <= 0:
        return x
    xp = jnp if isinstance(x, jnp.ndarray) else np
    x = xp.asarray(x, dtype=xp.float32)
    k = gaussian_kernel(sigma)
    r = (len(k) - 1) // 2
    xpad = xp.pad(x, ((r, r), (0, 0)))
    # correlation == convolution for a symmetric kernel
    out = xp.zeros_like(x)
    for i in range(len(k)):  # len(k) is small and static (7 for sigma=1)
        out = out + k[i] * xpad[i : i + x.shape[0]]
    return out


def velocity(x, fps: float):
    """Central-difference velocity, one-sided at the boundaries (pos/sec)."""
    xp = jnp if isinstance(x, jnp.ndarray) else np
    T = x.shape[0]
    if T < 2:
        return xp.zeros_like(x)
    dt = 1.0 / float(fps)
    interior = (x[2:] - x[:-2]) / (2.0 * dt)
    first = (x[1:2] - x[0:1]) / dt
    last = (x[T - 1 : T] - x[T - 2 : T - 1]) / dt
    return xp.concatenate([first, interior, last], axis=0)


def acceleration(x, fps: float):
    """Central second difference; one-sided second difference at boundaries."""
    xp = jnp if isinstance(x, jnp.ndarray) else np
    T = x.shape[0]
    if T < 3:
        return xp.zeros_like(x)
    dt2 = (1.0 / float(fps)) ** 2
    interior = (x[2:] - 2.0 * x[1:-1] + x[:-2]) / dt2
    first = (x[2:3] - 2.0 * x[1:2] + x[0:1]) / dt2
    last = (x[T - 1 : T] - 2.0 * x[T - 2 : T - 1] + x[T - 3 : T - 2]) / dt2
    return xp.concatenate([first, interior, last], axis=0)


def motion_features(motion, fps: float = 30.0, sigma: float = 1.0):
    """(T, D) raw pose track -> (T, 3*D) [smoothed, velocity, acceleration]."""
    xp = jnp if isinstance(motion, jnp.ndarray) else np
    sm = gaussian_smooth(motion, sigma=sigma)
    vel = velocity(sm, fps)
    acc = acceleration(sm, fps)
    return xp.concatenate([sm, vel, acc], axis=1).astype(xp.float32)
