"""Fused anti-aliased Snake sandwich (up2x -> snake -> down2x) as one Pallas kernel.

This is the TPU-native equivalent of NVIDIA BigVGAN's fused CUDA
anti-alias-activation kernel (the one the reference always disables,
``/root/reference/sometest/testwav.py:43-46``): the whole
``downsample2x(snake(upsample2x(x)))`` chain from ``vocoder/filters.py`` +
``SnakeAlias`` in a single VMEM-resident pass. The XLA polyphase form is
already 2.7-7.4x faster than the grouped-conv form, but it still
materializes the 2T-length phases and every shifted MAC in HBM; the 216
sandwiches per vocode sum to ~130 ms of the 132 ms total. Fusing removes
the intermediate traffic and - by operating on (C, T) tiles with time on
the 128-lane axis - keeps the VPU lanes full at the late stages where
C < 128 (C=24/48/96), which dominate the cost.

Polyphase algebra (K=12 taps f, identical for up and down, unit DC gain):

  up:    y_even[p] = 2 * sum_a f[2a]   * x[p + a - 3]      (x edge-clamped)
         y_odd[p]  = 2 * sum_a f[2a+1] * x[p + a - 2]
  snake: s = y + sin(alpha*y)^2 / (beta + 1e-9)             (per-channel)
  down:  z[t] = sum_a f[2a] * s_odd[t + a - 3]
              + sum_a f[2a+1] * s_even[t + a - 2]
  with the down stage's edge clamp on the INTERLEAVED signal: indices below
  0 read s[0] = s_even[0], indices at/above 2T read s[2T-1] = s_odd[T-1]
  (both phases are overwritten with that single value at the boundaries).

The grid is (B, T/BT); each step sees its T-block plus both neighbor
blocks (three BlockSpecs over the same transposed input) and builds an
H=8 halo, so arbitrary T is supported with edge padding folded in. All
arithmetic is fp32 in VMEM regardless of the storage dtype.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lm2a_tpu.vocoder.filters import kaiser_sinc_filter1d

_K = 12
_H = 8  # input halo per side; covers the +-5/+6 tap reach of up+down
# (C, BT) tile size target; fp32 phases + double-buffered IO blocks put the
# scoped-VMEM cost at ~80 B/elem (196608 elems measured 16.19M = just OOM).
_TARGET_ELEMS = 131_072


def _sandwich_kernel(xl_ref, xc_ref, xr_ref, a_ref, b_ref, o_ref,
                     *, taps, t_true, bt):
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    c = xc_ref.shape[1]
    xl, xc, xr = xl_ref[0], xc_ref[0], xr_ref[0]  # (c, bt)

    left = jnp.where(
        i == 0, jnp.broadcast_to(xc[:, :1], (c, _H)), xl[:, bt - _H:])
    right = jnp.where(
        i == nb - 1, jnp.broadcast_to(xc[:, -1:], (c, _H)), xr[:, :_H])
    xt = jnp.concatenate([left, xc, right], axis=1).astype(jnp.float32)

    # upsample phases over [g0, g0 + L) with g0 = i*bt - 4: local index of
    # global x[q] in xt is q - (i*bt - H), so y_even[g0+j] reads xt[j+a+1]
    # and y_odd[g0+j] reads xt[j+a+2].
    L = bt + 8
    ye = sum((2.0 * taps[2 * a]) * xt[:, 1 + a: 1 + a + L] for a in range(6))
    yo = sum((2.0 * taps[2 * a + 1]) * xt[:, 2 + a: 2 + a + L] for a in range(6))

    # the down stage's edge clamp acts on the interleaved signal: phase
    # index p < 0 -> y[0] = y_even[0] (local j=4, exists only in block 0
    # where the mask can be true); p >= t_true -> y[2T-1] = y_odd[T-1].
    g0 = i * bt - 4
    p = g0 + jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    # boundary values extracted as masked lane reductions (Mosaic has no
    # value-space dynamic_slice): p==0 / p==t_true-1 hit at most one lane;
    # blocks where the mask below is active but the lane is absent are
    # pure-padding blocks whose outputs are cropped by the caller.
    y_first = jnp.sum(jnp.where(p == 0, ye, 0.0), axis=1, keepdims=True)
    y_last = jnp.sum(jnp.where(p == t_true - 1, yo, 0.0), axis=1, keepdims=True)
    ye = jnp.where(p < 0, y_first, jnp.where(p >= t_true, y_last, ye))
    yo = jnp.where(p < 0, y_first, jnp.where(p >= t_true, y_last, yo))

    alpha = a_ref[...].astype(jnp.float32)  # (c, 1)
    beta = b_ref[...].astype(jnp.float32)
    se = ye + jnp.sin(alpha * ye) ** 2 / (beta + 1e-9)
    so = yo + jnp.sin(alpha * yo) ** 2 / (beta + 1e-9)

    z = sum(taps[2 * a] * so[:, 1 + a: 1 + a + bt] for a in range(6)) \
        + sum(taps[2 * a + 1] * se[:, 2 + a: 2 + a + bt] for a in range(6))
    o_ref[0] = z.astype(o_ref.dtype)


def fused_snake_sandwich(
    x: jnp.ndarray,  # (B, T, C)
    alpha: jnp.ndarray,  # (C,)
    beta: jnp.ndarray,  # (C,)
    *,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """downsample2x(snake_{alpha,beta}(upsample2x(x))) in one fused pass."""
    if interpret is None:  # Pallas on TPU, interpreter elsewhere (CPU tests)
        interpret = jax.default_backend() != "tpu"
    b, t, c = x.shape
    bt = max(128, min(16384, (_TARGET_ELEMS // max(c, 1)) // 128 * 128))
    nb = pl.cdiv(t, bt)
    tp = nb * bt

    xt = jnp.swapaxes(x, 1, 2)  # (B, C, T)
    if tp > t:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, tp - t)), mode="edge")
    a2 = alpha.reshape(c, 1).astype(jnp.float32)
    b2 = beta.reshape(c, 1).astype(jnp.float32)

    taps = tuple(float(v) for v in kaiser_sinc_filter1d(0.25, 0.3, _K))
    kernel = partial(_sandwich_kernel, taps=taps, t_true=t, bt=bt)

    blk = lambda im: pl.BlockSpec(  # noqa: E731
        (1, c, bt), im, memory_space=pltpu.VMEM)
    const = pl.BlockSpec((c, 1), lambda bi, i: (0, 0), memory_space=pltpu.VMEM)
    z = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[
            blk(lambda bi, i: (bi, 0, jnp.maximum(i - 1, 0))),
            blk(lambda bi, i: (bi, 0, i)),
            blk(lambda bi, i: (bi, 0, jnp.minimum(i + 1, nb - 1))),
            const,
            const,
        ],
        out_specs=blk(lambda bi, i: (bi, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b, c, tp), x.dtype),
        interpret=interpret,
    )(xt, xt, xt, a2, b2)
    return jnp.swapaxes(z[:, :, :t], 1, 2)
