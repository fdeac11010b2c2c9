"""Time-axis alignment ops.

Vectorized equivalents of the reference's per-dimension Python loops in
``/root/reference/datasetcode/dataset.py:30-106``:

- ``linear_resample``   == ``resample_mel_linear`` / ``interpolate_seq``
  (per-dim ``np.interp`` over ``linspace(0, T-1, target)``)
- ``match_len``         == ``match_len`` (truncate / repeat-last / interp)

These run both on host (numpy in the data loader) and on device (jnp inside
jitted preprocessing), so they are written against the ``jnp``/``np`` common
API surface and work with either array type.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def linear_resample(arr, target_len: int, time_axis: int = 0):
    """Linear interpolation of ``arr`` along ``time_axis`` to ``target_len``.

    Sample positions are ``linspace(0, T-1, target_len)`` — identical to the
    reference's ``np.interp(x_new, arange(T), col)`` per column, but done as
    one gather + lerp instead of a Python loop over dimensions.
    """
    xp = jnp if isinstance(arr, jnp.ndarray) else np
    arr = xp.asarray(arr)
    T = arr.shape[time_axis]
    if T == target_len:
        return arr.astype(xp.float32)
    arr = xp.moveaxis(arr, time_axis, 0)
    pos = xp.linspace(0.0, T - 1.0, target_len)
    lo = xp.clip(xp.floor(pos).astype(xp.int32), 0, T - 1)
    hi = xp.clip(lo + 1, 0, T - 1)
    frac = (pos - lo).astype(xp.float32)
    if arr.ndim > 1:
        frac = frac.reshape((target_len,) + (1,) * (arr.ndim - 1))
    out = arr[lo] * (1.0 - frac) + arr[hi] * frac
    return xp.moveaxis(out.astype(xp.float32), 0, time_axis)


def match_len(arr, target_len: int, mode: str = "repeat"):
    """Force length ``target_len`` along axis 0.

    ``mode='interp'``: linear resample. ``mode='repeat'``: truncate if longer,
    pad by repeating the last frame if shorter. The reference's repeat path
    has a latent NameError when the input is empty
    (``/root/reference/datasetcode/dataset.py:97-102``); here an empty input
    zero-fills, which is the evident intent of the commented-out lines.
    """
    if arr is None:
        return None
    if mode == "interp":
        return linear_resample(arr, target_len, time_axis=0)
    if mode != "repeat":
        raise ValueError(f"unknown match_len mode {mode!r}")

    xp = jnp if isinstance(arr, jnp.ndarray) else np
    arr = xp.asarray(arr)
    cur = arr.shape[0]
    if cur == target_len:
        return arr.astype(xp.float32)
    if cur > target_len:
        return arr[:target_len].astype(xp.float32)
    if cur == 0:
        return xp.zeros((target_len,) + arr.shape[1:], dtype=xp.float32)
    reps = target_len - cur
    last = xp.repeat(arr[-1:], reps, axis=0)
    return xp.concatenate([arr, last], axis=0).astype(xp.float32)
