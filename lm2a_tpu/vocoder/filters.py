"""Kaiser-windowed sinc anti-aliasing filters and 2x up/down resamplers.

The reference's vocoder (external NVIDIA BigVGAN) wraps every Snake
activation in an anti-aliased 2x-oversample / activate / 2x-decimate
sandwich; its CUDA fused kernel is always disabled in the reference
(``use_cuda_kernel=False`` at ``/root/reference/sometest/testwav.py:43-46``),
so the torch fallback path defines the semantics reproduced here:

- ``kaiser_sinc_filter1d(cutoff, half_width, K)``: Kaiser-beta from the
  standard attenuation formula, windowed sinc, normalized to unit DC gain.
- ``upsample2x``: replicate-pad, zero-stuff, depthwise filter, scale by 2 —
  algebraically identical to the torch grouped conv_transpose formulation
  (the kernel is symmetric so no flip is needed).
- ``downsample2x``: replicate-pad + strided depthwise filter.

Everything is channels-last (B, T, C). TPU lowering note (round 2): the
obvious ``feature_group_count=C`` depthwise-conv formulation is 4.2-7.3x
slower on a v5e than the polyphase form used here (shifted multiply-adds
on the even/odd phases + interleave; measured per stage geometry on the
real chip with ``scripts/profile_vocoder_filters.py``) — the grouped conv
defeats XLA's fusion and the zero-stuff scatter adds whole-array passes,
and these resamplers run 216x per BigVGAN vocode. The filter taps are
compile-time numpy constants, so each phase is a chain of fused
scalar*array adds on the VPU. The ``_*_conv`` fallbacks keep the
torch-shaped formulation for odd kernel sizes and as the A/B reference.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from jax import lax


def kaiser_beta(half_size: int, delta_f: float) -> float:
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        return 0.1102 * (a - 8.7)
    if a >= 21.0:
        return 0.5842 * (a - 21.0) ** 0.4 + 0.07886 * (a - 21.0)
    return 0.0


def kaiser_window(kernel_size: int, beta: float) -> np.ndarray:
    """Symmetric (periodic=False) Kaiser window, matching torch/scipy."""
    n = np.arange(kernel_size, dtype=np.float64)
    alpha = (kernel_size - 1) / 2.0
    arg = beta * np.sqrt(np.maximum(0.0, 1.0 - ((n - alpha) / alpha) ** 2))
    return np.i0(arg) / np.i0(np.float64(beta))


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """(kernel_size,) lowpass FIR; cutoff in cycles/sample, unit DC gain."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    beta = kaiser_beta(half_size, 4.0 * half_width)
    window = kaiser_window(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size, dtype=np.float64) + 0.5
    else:
        time = np.arange(kernel_size, dtype=np.float64) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, dtype=np.float32)
    filt = 2.0 * cutoff * window * np.sinc(2.0 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


def _depthwise(x: jnp.ndarray, filt: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """Depthwise conv of (B, T, C) with a shared (K,) filter per channel."""
    c = x.shape[-1]
    k = filt.shape[0]
    kernel = jnp.broadcast_to(filt.astype(x.dtype).reshape(k, 1, 1), (k, 1, c))
    return lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c,
    )


def upsample2x(x: jnp.ndarray, kernel_size: int = 12) -> jnp.ndarray:
    """(B, T, C) -> (B, 2T, C) anti-aliased 2x upsampling."""
    if kernel_size % 4 == 0:
        # polyphase fast path: with xp = edge-pad(x, K/2-1) and
        # o = (K/2 - 2)/2, the zero-stuff + filter + crop of the conv form
        # (below) reduces to
        #   y[2i]   = 2 * sum_a filt[2a]   * xp[i + a + o]
        #   y[2i+1] = 2 * sum_a filt[2a+1] * xp[i + a + o + 1]
        # (derivation checked numerically vs the conv form in
        # tests/test_vocoder.py and scripts/profile_vocoder_filters.py).
        K = kernel_size
        filt = kaiser_sinc_filter1d(0.25, 0.3, K)
        B, T, C = x.shape
        pad = K // 2 - 1
        o = (K // 2 - 2) // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
        even = sum(
            (2.0 * float(filt[2 * a])) * xp[:, o + a : o + a + T]
            for a in range(K // 2)
        )
        odd = sum(
            (2.0 * float(filt[2 * a + 1])) * xp[:, o + a + 1 : o + a + 1 + T]
            for a in range(K // 2)
        )
        return jnp.stack([even, odd], axis=2).reshape(B, 2 * T, C)
    return _upsample2x_conv(x, kernel_size)


def _upsample2x_conv(x: jnp.ndarray, kernel_size: int = 12) -> jnp.ndarray:
    """Grouped-conv reference formulation (torch-shaped; slow on TPU)."""
    ratio = 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    pad = kernel_size // ratio - 1
    pad_left = pad * ratio + (kernel_size - ratio) // 2
    pad_right = pad * ratio + (kernel_size - ratio + 1) // 2

    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    t = x.shape[1]
    # zero-stuff: insert ratio-1 zeros between samples (== conv_transpose)
    z = jnp.zeros((x.shape[0], (t - 1) * ratio + 1, x.shape[2]), dtype=x.dtype)
    z = z.at[:, ::ratio, :].set(x)
    z = jnp.pad(z, ((0, 0), (kernel_size - 1, kernel_size - 1), (0, 0)))
    y = ratio * _depthwise(z, jnp.asarray(filt))
    return y[:, pad_left : y.shape[1] - pad_right, :]


def downsample2x(x: jnp.ndarray, kernel_size: int = 12) -> jnp.ndarray:
    """(B, 2T, C) -> (B, T, C) anti-aliased 2x decimation."""
    if kernel_size % 2 == 0:
        # polyphase fast path: y[t] = sum_k filt[k] xp[2t + k] splits into
        # even/odd input phases, each a K/2-tap chain of shifted MACs.
        K = kernel_size
        filt = kaiser_sinc_filter1d(0.25, 0.3, K)
        B, T2, C = x.shape
        t_out = (T2 + 1) // 2
        pad_left = K // 2 - 1
        pad_right = K // 2
        xp = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
        n2 = xp.shape[1] // 2 * 2
        ph = xp[:, :n2].reshape(B, n2 // 2, 2, C)
        xe, xo = ph[:, :, 0], ph[:, :, 1]
        if xp.shape[1] % 2:  # odd: the last even-phase sample got dropped
            xe = jnp.concatenate([xe, xp[:, -1:]], axis=1)
        y = sum(
            float(filt[2 * a]) * xe[:, a : a + t_out] for a in range(K // 2)
        ) + sum(
            float(filt[2 * a + 1]) * xo[:, a : a + t_out] for a in range(K // 2)
        )
        return y
    return _downsample2x_conv(x, kernel_size)


def _downsample2x_conv(x: jnp.ndarray, kernel_size: int = 12) -> jnp.ndarray:
    """Grouped-conv reference formulation (torch-shaped; slow on TPU)."""
    ratio = 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return _depthwise(x, jnp.asarray(filt), stride=ratio)
