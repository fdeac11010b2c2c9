"""Fused FiLM-resblock forward as a Pallas TPU kernel.

One ``ResBlockUltimate`` conv chain (lm2a_tpu/models/unet1d.py:110-125,
matching the reference block at /root/reference/models/unet1d_ultimate.py:136-149)
is, to XLA, five kernels with two GroupNorm reduction barriers between them:

    GN1 -> SiLU -> conv3 -> FiLM -> GN2 -> SiLU -> conv3 [-> +skip]

Each barrier materializes the (B, T, C) activation to HBM and re-reads it.
This kernel runs the whole chain per batch row in VMEM: the six k=3 conv
taps are six (T, Cin)x(Cin, Cout) MXU matmuls (a SAME conv3 is the sum of
a down-shifted, centered, and up-shifted matmul), and both GroupNorms are
computed on-chip in fp32 between them (group sums via a (C, G) assignment
matmul — no lane-crossing reshapes). The optional 1x1 skip projection is a
seventh matmul.

Semantics match flax exactly: GN uses eps=1e-5, fast variance
(E[x^2]-E[x]^2) in fp32, per-(T, group) statistics; matmuls run in the
input dtype (bf16 on the serving path) with fp32 accumulation, like XLA's
convs. Dropout is the caller's problem (serving runs deterministic; the
wrapper refuses non-deterministic use).

``fused_resblock_chain`` itself is FORWARD-ONLY (the sampler is the
target); differentiating through it fails loudly. For training,
``fused_resblock_train`` wraps the same forward in a ``jax.custom_vjp``
whose backward is a second Pallas kernel (``_resblock_bwd_kernel``): it
recomputes the forward intermediates in VMEM per batch row and produces
every gradient in one pass, accumulating weight gradients in fp32 across
the batch grid. The backward needs the conv weights (bf16) AND their fp32
gradient accumulators resident at once, so it fuses a smaller geometry set
than the forward — ``resblock_train_fits`` is the gate; C=1024 blocks stay
on XLA (weights 12.6 MB + accumulators 25 MB >> 16 MB VMEM).

VMEM budget at the flagship's largest fusable geometry (Cin=Cout=1024,
T=129): conv weights 2 x 6.3 MB bf16 + activations < 1 MB -> ~14 MB, inside
the ~16 MB/core budget because blocks with a constant index_map are loaded
once, not double-buffered per grid step. Geometries whose weights exceed
``VMEM_WEIGHT_BUDGET`` fall back to XLA (returns None).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# bf16 bytes of conv+skip weights above which we refuse to fuse (leave
# headroom under ~16 MB VMEM for activations and compiler scratch).
VMEM_WEIGHT_BUDGET = 13 * 1024 * 1024

# VMEM modelling for R-row tiling: live fp32 activation copies inside the
# kernel (x + working h + shift temporaries), and the overall budget shared
# between weights and activations.
ACT_LIVE_COPIES = 5
VMEM_TOTAL_BUDGET = 14 * 1024 * 1024
# per-grid-step activation-stack ceiling for the long-T fuse/decline gate
ACT_VMEM_BUDGET = 14 * 1024 * 1024


def pick_rows_per_step(b: int, t: int, cin: int, cout: int,
                       weight_bytes: int) -> int:
    """Largest divisor of ``b`` (<= 8) whose activation tiles fit VMEM next
    to the resident weights. R > 1 batches rows into the conv-tap matmul
    contractions — the cross-batch MXU batching XLA gets for free."""
    act_row = t * max(cin, cout) * 4 * ACT_LIVE_COPIES
    budget = max(0, VMEM_TOTAL_BUDGET - weight_bytes)
    for r in (8, 4, 2, 1):
        if b % r == 0 and r * act_row <= budget:
            return r
    return 1


def _group_matrices(c: int, groups: int, dtype):
    """(C, G) one-hot group-assignment matrix: P[c, g] = 1 iff c in group g."""
    cg = c // groups
    cid = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    gid = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (cid == gid).astype(dtype)


def _gn_silu(h, gamma, beta, p_assign, n_per_group, eps=1e-5):
    """GroupNorm (fast variance, fp32) + SiLU on a (T, C) tile."""
    hf = h.astype(jnp.float32)
    s = jnp.sum(hf, axis=0, keepdims=True)  # (1, C)
    ss = jnp.sum(hf * hf, axis=0, keepdims=True)
    gs = jnp.dot(s, p_assign, preferred_element_type=jnp.float32)  # (1, G)
    gss = jnp.dot(ss, p_assign, preferred_element_type=jnp.float32)
    mean_g = gs / n_per_group
    var_g = gss / n_per_group - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # broadcast back to channels: (1, G) @ (G, C)
    mean_c = jnp.dot(mean_g, p_assign.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd_g, p_assign.T, preferred_element_type=jnp.float32)
    y = (hf - mean_c) * rstd_c * gamma + beta
    return y * jax.nn.sigmoid(y)


def _conv3(h, w_ref, bias, cdtype):
    """SAME conv, kernel 3, as three full-length matmuls + row shifts.

    h: (T, Cin) activation; w_ref: (3, Cin, Cout) taps; bias: (1, Cout).
    out[t] = h[t-1] @ w[0] + h[t] @ w[1] + h[t+1] @ w[2]  (zero-padded).
    """
    hb = h.astype(cdtype)
    z0 = jnp.dot(hb, w_ref[0].astype(cdtype), preferred_element_type=jnp.float32)
    z1 = jnp.dot(hb, w_ref[1].astype(cdtype), preferred_element_type=jnp.float32)
    z2 = jnp.dot(hb, w_ref[2].astype(cdtype), preferred_element_type=jnp.float32)
    zero_row = jnp.zeros_like(z0[:1])
    down = jnp.concatenate([zero_row, z0[:-1]], axis=0)  # h[t-1] taps
    up = jnp.concatenate([z2[1:], zero_row], axis=0)  # h[t+1] taps
    return down + z1 + up + bias


def _gn_silu_rows(h, gamma, beta, p_assign, n_per_group, eps=1e-5):
    """GroupNorm + SiLU on an (R, T, C) tile: per-ROW (T, group) statistics
    (each row is one batch element — R-row tiling must not mix rows)."""
    hf = h.astype(jnp.float32)
    s = jnp.sum(hf, axis=1)  # (R, C)
    ss = jnp.sum(hf * hf, axis=1)
    gs = jnp.dot(s, p_assign, preferred_element_type=jnp.float32)  # (R, G)
    gss = jnp.dot(ss, p_assign, preferred_element_type=jnp.float32)
    mean_g = gs / n_per_group
    var_g = gss / n_per_group - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, p_assign.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd_g, p_assign.T, preferred_element_type=jnp.float32)
    y = (hf - mean_c[:, None, :]) * rstd_c[:, None, :] * gamma + beta
    return y * jax.nn.sigmoid(y)


def _conv3_rows(h, w_ref, bias, cdtype):
    """SAME conv3 on (R, T, Cin), rows UNROLLED as separate (T, Cin) x
    (Cin, Cout) matmuls inside the one grid step.

    Unrolled rather than merged: ``reshape(R*T, C)`` is not layout-free
    when T is not a multiple of the 8-sublane tile (T=516, 129 at flagship
    geometries), and the resulting in-kernel relayout cost the merged
    variant the whole batching win (measured: headline 0.681 -> 0.707 s,
    B=8 chain 4.46 -> 5.11 s). Per-row (516, C) / (129, C) matmuls already
    fill the MXU's 128-row dimension; what R > 1 buys is fewer grid steps
    and one weight residency for several rows. Shifts are per-row by
    construction.
    """
    r = h.shape[0]
    rows = [_conv3(h[i], w_ref, bias, cdtype) for i in range(r)]
    if r == 1:
        return rows[0][None]
    return jnp.stack(rows, axis=0)


def _resblock_kernel(
    x_ref, g1_ref, b1_ref, w1_ref, c1b_ref, fsc_ref, fsh_ref,
    g2_ref, b2_ref, w2_ref, c2b_ref, *rest,
    groups1: int, groups2: int, has_skip: bool, add_residual: bool,
    cdtype,
):
    if has_skip:
        sw_ref, sb_ref = rest[0], rest[1]
        out_refs = rest[2:]
    else:
        sw_ref, sb_ref = None, None
        out_refs = rest

    x = x_ref[...]  # (R, T, Cin)
    r, t, cin = x.shape
    cout = w1_ref.shape[2]

    p1 = _group_matrices(cin, groups1, jnp.float32)
    h = _gn_silu_rows(x, g1_ref[...], b1_ref[...], p1, t * (cin // groups1))
    h = _conv3_rows(h, w1_ref, c1b_ref[...], cdtype)  # (R, T, Cout) fp32

    # FiLM: h * (1 + scale) + shift, per-batch-row vectors (blocks (R, 1, C))
    h = h * (1.0 + fsc_ref[...].astype(jnp.float32)) + fsh_ref[...].astype(
        jnp.float32
    )

    p2 = _group_matrices(cout, groups2, jnp.float32)
    h = _gn_silu_rows(h, g2_ref[...], b2_ref[...], p2, t * (cout // groups2))
    h = _conv3_rows(h, w2_ref, c2b_ref[...], cdtype)

    if has_skip:
        sw = sw_ref[...].astype(cdtype)
        xs = jnp.stack([
            jnp.dot(x[i].astype(cdtype), sw,
                    preferred_element_type=jnp.float32)
            for i in range(r)
        ], axis=0) + sb_ref[...]
    else:
        xs = x.astype(jnp.float32)

    if add_residual:
        out_refs[0][...] = (xs + h).astype(out_refs[0].dtype)
    else:
        out_refs[0][...] = h.astype(out_refs[0].dtype)
        if has_skip:
            out_refs[1][...] = xs.astype(out_refs[1].dtype)


def fused_resblock_chain(
    x: jnp.ndarray,  # (B, T, Cin)
    gn1_scale: jnp.ndarray,  # (Cin,)
    gn1_bias: jnp.ndarray,
    conv1_w: jnp.ndarray,  # (3, Cin, Cout)
    conv1_b: jnp.ndarray,  # (Cout,)
    film_scale: jnp.ndarray,  # (B, Cout)
    film_shift: jnp.ndarray,  # (B, Cout)
    gn2_scale: jnp.ndarray,  # (Cout,)
    gn2_bias: jnp.ndarray,
    conv2_w: jnp.ndarray,  # (3, Cout, Cout)
    conv2_b: jnp.ndarray,
    skip_w: Optional[jnp.ndarray] = None,  # (Cin, Cout) when Cin != Cout
    skip_b: Optional[jnp.ndarray] = None,
    *,
    groups1: int,
    groups2: int,
    add_residual: bool = True,
    interpret: Optional[bool] = None,
    rows_per_step: Optional[int] = None,
):
    """Run the fused resblock conv chain. Returns the block output when
    ``add_residual`` (the no-attention block), else ``h`` — or ``(h, xs)``
    when a skip projection exists — for the caller to attend + add.

    ``rows_per_step`` (auto when None) tiles R batch rows into each grid
    step: the six conv-tap matmuls contract (R*T, Cin) — recovering XLA's
    cross-batch MXU batching that the original one-row grid lost at
    serving batch sizes (round-2 DEVNOTES: B=8 CFG fused 4.90 s vs XLA
    4.53). GroupNorm statistics and conv shifts remain strictly per-row.

    Returns None when the geometry exceeds the VMEM weight budget (caller
    falls back to the XLA path).
    """
    b, t, cin = x.shape
    cout = conv1_w.shape[2]
    has_skip = skip_w is not None
    if interpret is None:  # Pallas on TPU, interpreter elsewhere (CPU tests)
        interpret = jax.default_backend() != "tpu"

    # weights are held in VMEM at the kernel's compute dtype (bf16 when the
    # activations are bf16, else fp32) — budget at the ACTUAL itemsize, or
    # the fp32 path under-counts by 2x and trips a Mosaic VMEM failure
    # instead of the intended XLA fallback
    cdtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    # Long-T gate: even at one row per grid step the kernel holds ~2 live
    # fp32 copies of the (T, Cin/Cout) activations on the VMEM stack; past
    # ~16 MB Mosaic refuses ("scoped vmem limit"). Hit in practice by the
    # single-pass longform path (T = 2584 at the C=1024 up block OOMed at
    # 20.5 MB on chip) — fall back to XLA there.
    if t * (cin + cout) * 4 * 2 > ACT_VMEM_BUDGET:
        return None
    wsize = jnp.dtype(cdtype).itemsize
    weight_bytes = (conv1_w.size + conv2_w.size) * wsize
    if has_skip:
        weight_bytes += skip_w.size * wsize
    if weight_bytes > VMEM_WEIGHT_BUDGET:
        # whole chain over VMEM: run as two pallas calls when each half fits
        # (covers the flagship's 2048->1024 up block, ~23 MB of weights)
        half1 = conv1_w.size * wsize
        half2 = conv2_w.size * wsize + (skip_w.size * wsize if has_skip else 0)
        if max(half1, half2) > VMEM_WEIGHT_BUDGET:
            return None
        return _fused_chain_split(
            x, gn1_scale, gn1_bias, conv1_w, conv1_b, film_scale, film_shift,
            gn2_scale, gn2_bias, conv2_w, conv2_b, skip_w, skip_b,
            groups1=groups1, groups2=groups2, add_residual=add_residual,
            interpret=interpret, rows_per_step=rows_per_step,
        )

    if rows_per_step is not None and b % rows_per_step != 0:
        # grid=(b // r,) would silently drop the trailing b % r rows
        raise ValueError(
            f"rows_per_step={rows_per_step} must divide batch {b}")
    r = rows_per_step or pick_rows_per_step(b, t, cin, cout, weight_bytes)

    def vec(p, c):  # (C,) params as (1, C) fp32 rows
        return p.reshape(1, c).astype(jnp.float32)

    const2 = lambda i: (0, 0)  # noqa: E731
    const3 = lambda i: (0, 0, 0)  # noqa: E731

    in_specs = [
        pl.BlockSpec((r, t, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cin), const2, memory_space=pltpu.VMEM),  # gn1 scale
        pl.BlockSpec((1, cin), const2, memory_space=pltpu.VMEM),  # gn1 bias
        pl.BlockSpec((3, cin, cout), const3, memory_space=pltpu.VMEM),  # w1
        pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),  # b1
        # film vectors as (B, 1, C): an (R, 1, C) block per grid step
        # (TPU requires the trailing block dims to equal the array's)
        pl.BlockSpec((r, 1, cout), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),  # film scale
        pl.BlockSpec((r, 1, cout), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),  # film shift
        pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),  # gn2 scale
        pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),  # gn2 bias
        pl.BlockSpec((3, cout, cout), const3, memory_space=pltpu.VMEM),  # w2
        pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),  # b2
    ]
    args = [
        x,
        vec(gn1_scale, cin), vec(gn1_bias, cin),
        conv1_w.astype(cdtype), vec(conv1_b, cout),
        film_scale.astype(jnp.float32).reshape(b, 1, cout),
        film_shift.astype(jnp.float32).reshape(b, 1, cout),
        vec(gn2_scale, cout), vec(gn2_bias, cout),
        conv2_w.astype(cdtype), vec(conv2_b, cout),
    ]
    if has_skip:
        in_specs += [
            pl.BlockSpec((cin, cout), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),
        ]
        args += [skip_w.astype(cdtype), vec(skip_b, cout)]

    out_spec = pl.BlockSpec((r, t, cout), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    if add_residual or not has_skip:
        out_shape = jax.ShapeDtypeStruct((b, t, cout), x.dtype)
        out_specs = out_spec
    else:
        out_shape = (
            jax.ShapeDtypeStruct((b, t, cout), x.dtype),
            jax.ShapeDtypeStruct((b, t, cout), x.dtype),
        )
        out_specs = (out_spec, out_spec)

    kernel = functools.partial(
        _resblock_kernel,
        groups1=groups1, groups2=groups2,
        has_skip=has_skip, add_residual=add_residual, cdtype=cdtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(b // r,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Split forward for over-VMEM geometries (serving)
# ---------------------------------------------------------------------------
# The flagship's first up-stage block is Cin=2048 -> Cout=1024 at T=129:
# all weights together are ~23 MB bf16, over VMEM, so the single-call kernel
# declines. Each HALF of the chain fits comfortably, so it runs as two
# pallas calls with one fp32 (B, T, Cout) intermediate in HBM — still far
# less traffic than XLA's five kernels with two GroupNorm barriers.


def _half1_kernel(x_ref, g1_ref, b1_ref, w1_ref, c1b_ref, fsc_ref, fsh_ref,
                  out_ref, *, groups1: int, cdtype):
    """GN1 + SiLU + conv3 + FiLM -> f (fp32). (R, T, C) tiles."""
    x = x_ref[...]
    r, t, cin = x.shape
    p1 = _group_matrices(cin, groups1, jnp.float32)
    h = _gn_silu_rows(x, g1_ref[...], b1_ref[...], p1, t * (cin // groups1))
    h = _conv3_rows(h, w1_ref, c1b_ref[...], cdtype)
    h = h * (1.0 + fsc_ref[...].astype(jnp.float32)) + fsh_ref[...].astype(
        jnp.float32)
    out_ref[...] = h.astype(out_ref.dtype)


def _half2_kernel(f_ref, g2_ref, b2_ref, w2_ref, c2b_ref, *rest,
                  groups2: int, has_skip: bool, add_residual: bool, cdtype):
    """GN2 + SiLU + conv3 (+skip projection of x, +residual). (R, T, C)."""
    if has_skip:
        x_ref, sw_ref, sb_ref = rest[0], rest[1], rest[2]
        out_refs = rest[3:]
    else:
        x_ref = rest[0]
        out_refs = rest[1:]

    f = f_ref[...].astype(jnp.float32)
    r, t, cout = f.shape
    p2 = _group_matrices(cout, groups2, jnp.float32)
    h = _gn_silu_rows(f, g2_ref[...], b2_ref[...], p2, t * (cout // groups2))
    h = _conv3_rows(h, w2_ref, c2b_ref[...], cdtype)

    if has_skip:
        x = x_ref[...]
        sw = sw_ref[...].astype(cdtype)
        xs = jnp.stack([
            jnp.dot(x[i].astype(cdtype), sw,
                    preferred_element_type=jnp.float32)
            for i in range(r)
        ], axis=0) + sb_ref[...]
    else:
        xs = x_ref[...].astype(jnp.float32)

    if add_residual:
        out_refs[0][...] = (xs + h).astype(out_refs[0].dtype)
    else:
        out_refs[0][...] = h.astype(out_refs[0].dtype)
        if has_skip:
            out_refs[1][...] = xs.astype(out_refs[1].dtype)


def _fused_chain_split(
    x, gn1_scale, gn1_bias, conv1_w, conv1_b, film_scale, film_shift,
    gn2_scale, gn2_bias, conv2_w, conv2_b, skip_w, skip_b,
    *, groups1: int, groups2: int, add_residual: bool, interpret: bool,
    rows_per_step: Optional[int] = None,
):
    b, t, cin = x.shape
    cout = conv1_w.shape[2]
    has_skip = skip_w is not None
    cdtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    wsize = jnp.dtype(cdtype).itemsize
    half_bytes = max(conv1_w.size * wsize,
                     conv2_w.size * wsize
                     + (skip_w.size * wsize if has_skip else 0))
    if rows_per_step is not None and b % rows_per_step != 0:
        raise ValueError(
            f"rows_per_step={rows_per_step} must divide batch {b}")
    r = rows_per_step or pick_rows_per_step(b, t, cin, cout, half_bytes)

    def vec(p, c):
        return p.reshape(1, c).astype(jnp.float32)

    const2 = lambda i: (0, 0)  # noqa: E731
    const3 = lambda i: (0, 0, 0)  # noqa: E731
    row3 = lambda c: pl.BlockSpec((r, 1, c), lambda i: (i, 0, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    tile = lambda tt, c: pl.BlockSpec((r, tt, c), lambda i: (i, 0, 0),  # noqa: E731
                                      memory_space=pltpu.VMEM)

    f = pl.pallas_call(
        functools.partial(_half1_kernel, groups1=groups1, cdtype=cdtype),
        grid=(b // r,),
        in_specs=[
            tile(t, cin),
            pl.BlockSpec((1, cin), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cin, cout), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),
            row3(cout), row3(cout),
        ],
        out_specs=tile(t, cout),
        out_shape=jax.ShapeDtypeStruct((b, t, cout), jnp.float32),
        interpret=interpret,
    )(
        x, vec(gn1_scale, cin), vec(gn1_bias, cin), conv1_w.astype(cdtype),
        vec(conv1_b, cout),
        film_scale.astype(jnp.float32).reshape(b, 1, cout),
        film_shift.astype(jnp.float32).reshape(b, 1, cout),
    )

    in_specs = [
        tile(t, cout),
        pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, cout, cout), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),
        tile(t, cin),  # x (skip input / identity)
    ]
    args = [f, vec(gn2_scale, cout), vec(gn2_bias, cout),
            conv2_w.astype(cdtype), vec(conv2_b, cout), x]
    if has_skip:
        in_specs += [
            pl.BlockSpec((cin, cout), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),
        ]
        args += [skip_w.astype(cdtype), vec(skip_b, cout)]

    out_spec = tile(t, cout)
    if add_residual or not has_skip:
        out_shape = jax.ShapeDtypeStruct((b, t, cout), x.dtype)
        out_specs = out_spec
    else:
        out_shape = (jax.ShapeDtypeStruct((b, t, cout), x.dtype),
                     jax.ShapeDtypeStruct((b, t, cout), x.dtype))
        out_specs = (out_spec, out_spec)

    return pl.pallas_call(
        functools.partial(_half2_kernel, groups2=groups2, has_skip=has_skip,
                          add_residual=add_residual, cdtype=cdtype),
        grid=(b // r,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Training: fused forward + fused backward via custom_vjp
# ---------------------------------------------------------------------------

# The backward kernel holds bf16 conv weights, fp32 weight-grad accumulators,
# and ~8 live (T, C) fp32 activation arrays at once.
BWD_VMEM_BUDGET = 15 * 1024 * 1024


def resblock_train_fits(t: int, cin: int, cout: int, has_skip: bool,
                        weight_itemsize: int = 2) -> bool:
    """True when the fused-backward geometry fits the VMEM budget.

    ``weight_itemsize``: bytes per weight element at the kernel's compute
    dtype (2 for bf16 activations, 4 for fp32 — the kernels cast weights
    to the activation dtype)."""
    wcount = 3 * cin * cout + 3 * cout * cout + (cin * cout if has_skip else 0)
    # weights at compute dtype + fp32 weight-grad accumulators
    weight_bytes = wcount * weight_itemsize + wcount * 4
    act_bytes = t * max(cin, cout) * 4 * 8
    return weight_bytes + act_bytes <= BWD_VMEM_BUDGET


def _gn_fwd_stats(hf, p_assign, n_per_group, eps=1e-5):
    """GroupNorm statistics on a (T, C) fp32 tile -> (xhat, rstd_c)."""
    s = jnp.sum(hf, axis=0, keepdims=True)
    ss = jnp.sum(hf * hf, axis=0, keepdims=True)
    gs = jnp.dot(s, p_assign, preferred_element_type=jnp.float32)
    gss = jnp.dot(ss, p_assign, preferred_element_type=jnp.float32)
    mean_g = gs / n_per_group
    var_g = gss / n_per_group - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, p_assign.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd_g, p_assign.T, preferred_element_type=jnp.float32)
    return (hf - mean_c) * rstd_c, rstd_c


def _gn_bwd(dy, xhat, rstd_c, gamma, p_assign, n_per_group):
    """GroupNorm input gradient (stats over each row's (T, C/G) group)."""
    dxhat = dy * gamma
    s1 = jnp.sum(dxhat, axis=0, keepdims=True)
    s2 = jnp.sum(dxhat * xhat, axis=0, keepdims=True)
    m1c = jnp.dot(jnp.dot(s1, p_assign) / n_per_group, p_assign.T,
                  preferred_element_type=jnp.float32)
    m2c = jnp.dot(jnp.dot(s2, p_assign) / n_per_group, p_assign.T,
                  preferred_element_type=jnp.float32)
    return rstd_c * (dxhat - m1c - xhat * m2c)


def _silu_bwd(d_out, y, sig):
    """d silu(y)/dy given y and sigmoid(y)."""
    return d_out * (sig * (1.0 + y * (1.0 - sig)))


def _corr3(g, w_ref, cdtype):
    """Input gradient of the SAME conv3: d_in[t] = sum_k g[t+1-k] @ w[k]^T."""
    gb = g.astype(cdtype)
    m0 = jnp.dot(gb, w_ref[0].astype(cdtype).T, preferred_element_type=jnp.float32)
    m1 = jnp.dot(gb, w_ref[1].astype(cdtype).T, preferred_element_type=jnp.float32)
    m2 = jnp.dot(gb, w_ref[2].astype(cdtype).T, preferred_element_type=jnp.float32)
    zero_row = jnp.zeros_like(m0[:1])
    return (jnp.concatenate([m0[1:], zero_row], axis=0) + m1
            + jnp.concatenate([zero_row, m2[:-1]], axis=0))


def _dw3(inp, g, cdtype):
    """Weight gradient of the SAME conv3: dw[k] = sum_t in[t+k-1]^T g[t]."""
    ib = inp.astype(cdtype)
    gb = g.astype(cdtype)
    zero_row = jnp.zeros_like(ib[:1])
    down = jnp.concatenate([zero_row, ib[:-1]], axis=0)  # in[t-1]
    up = jnp.concatenate([ib[1:], zero_row], axis=0)  # in[t+1]
    d0 = jnp.dot(down.T, gb, preferred_element_type=jnp.float32)
    d1 = jnp.dot(ib.T, gb, preferred_element_type=jnp.float32)
    d2 = jnp.dot(up.T, gb, preferred_element_type=jnp.float32)
    return jnp.stack([d0, d1, d2], axis=0)


def _resblock_bwd_kernel(
    x_ref, g1s_ref, g1b_ref, w1_ref, c1b_ref, fsc_ref, fsh_ref,
    g2s_ref, g2b_ref, w2_ref, gh_ref, *rest,
    groups1: int, groups2: int, has_skip: bool, cdtype,
):
    if has_skip:
        sw_ref, gxs_ref = rest[0], rest[1]
        outs = rest[2:]
    else:
        sw_ref = gxs_ref = None
        outs = rest
    (dx_ref, dg1s_ref, dg1b_ref, dw1_ref, db1_ref, dsc_ref, dsh_ref,
     dg2s_ref, dg2b_ref, dw2_ref, db2_ref) = outs[:11]
    if has_skip:
        dsw_ref, dsb_ref = outs[11], outs[12]

    x = x_ref[0]  # (T, Cin)
    t = x.shape[0]
    cin = x.shape[1]
    cout = w1_ref.shape[2]

    # ---- forward recompute (same math as _resblock_kernel) ----
    xf = x.astype(jnp.float32)
    p1 = _group_matrices(cin, groups1, jnp.float32)
    n1 = t * (cin // groups1)
    xhat1, rstd1 = _gn_fwd_stats(xf, p1, n1)
    y1 = xhat1 * g1s_ref[...] + g1b_ref[...]
    sig1 = jax.nn.sigmoid(y1)
    s1 = y1 * sig1
    z1 = _conv3(s1, w1_ref, c1b_ref[...], cdtype)  # (T, Cout) fp32
    sc = fsc_ref[0].astype(jnp.float32)  # (1, Cout)
    f = z1 * (1.0 + sc) + fsh_ref[0].astype(jnp.float32)
    p2 = _group_matrices(cout, groups2, jnp.float32)
    n2 = t * (cout // groups2)
    xhat2, rstd2 = _gn_fwd_stats(f, p2, n2)
    y2 = xhat2 * g2s_ref[...] + g2b_ref[...]
    sig2 = jax.nn.sigmoid(y2)
    s2 = y2 * sig2

    # ---- backward ----
    g = gh_ref[0].astype(jnp.float32)  # d(chain output)
    db2 = jnp.sum(g, axis=0, keepdims=True)
    dw2 = _dw3(s2, g, cdtype)
    d_y2 = _silu_bwd(_corr3(g, w2_ref, cdtype), y2, sig2)
    dg2s = jnp.sum(d_y2 * xhat2, axis=0, keepdims=True)
    dg2b = jnp.sum(d_y2, axis=0, keepdims=True)
    d_f = _gn_bwd(d_y2, xhat2, rstd2, g2s_ref[...], p2, n2)

    dsc_ref[0] = jnp.sum(d_f * z1, axis=0, keepdims=True).astype(dsc_ref.dtype)
    dsh_ref[0] = jnp.sum(d_f, axis=0, keepdims=True).astype(dsh_ref.dtype)
    d_z1 = d_f * (1.0 + sc)

    db1 = jnp.sum(d_z1, axis=0, keepdims=True)
    dw1 = _dw3(s1, d_z1, cdtype)
    d_y1 = _silu_bwd(_corr3(d_z1, w1_ref, cdtype), y1, sig1)
    dg1s = jnp.sum(d_y1 * xhat1, axis=0, keepdims=True)
    dg1b = jnp.sum(d_y1, axis=0, keepdims=True)
    d_x = _gn_bwd(d_y1, xhat1, rstd1, g1s_ref[...], p1, n1)

    if has_skip:
        gx = gxs_ref[0].astype(jnp.float32)
        d_x = d_x + jnp.dot(
            gx.astype(cdtype), sw_ref[...].astype(cdtype).T,
            preferred_element_type=jnp.float32,
        )
        dsw = jnp.dot(x.astype(cdtype).T, gx.astype(cdtype),
                      preferred_element_type=jnp.float32)
        dsb = jnp.sum(gx, axis=0, keepdims=True)
    dx_ref[0] = d_x.astype(dx_ref.dtype)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dg1s_ref[...] = dg1s
        dg1b_ref[...] = dg1b
        dw1_ref[...] = dw1
        db1_ref[...] = db1
        dg2s_ref[...] = dg2s
        dg2b_ref[...] = dg2b
        dw2_ref[...] = dw2
        db2_ref[...] = db2
        if has_skip:
            dsw_ref[...] = dsw
            dsb_ref[...] = dsb

    @pl.when(i != 0)
    def _acc():
        dg1s_ref[...] += dg1s
        dg1b_ref[...] += dg1b
        dw1_ref[...] += dw1
        db1_ref[...] += db1
        dg2s_ref[...] += dg2s
        dg2b_ref[...] += dg2b
        dw2_ref[...] += dw2
        db2_ref[...] += db2
        if has_skip:
            dsw_ref[...] += dsw
            dsb_ref[...] += dsb


def _resblock_bwd_call(
    x, g1s, g1b, w1, b1, sc, sh, g2s, g2b, w2, skip_w, gh, gxs,
    groups1: int, groups2: int, interpret: Optional[bool] = None,
):
    """Invoke the backward kernel; returns the full gradient tuple."""
    b, t, cin = x.shape
    cout = w1.shape[2]
    has_skip = skip_w is not None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cdtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32

    def vec(p, c):
        return p.reshape(1, c).astype(jnp.float32)

    const2 = lambda i: (0, 0)  # noqa: E731
    const3 = lambda i: (0, 0, 0)  # noqa: E731
    row2 = lambda c: pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, t, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cin), const2, memory_space=pltpu.VMEM),  # gn1 scale
        pl.BlockSpec((1, cin), const2, memory_space=pltpu.VMEM),  # gn1 bias
        pl.BlockSpec((3, cin, cout), const3, memory_space=pltpu.VMEM),  # w1
        pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),  # b1
        row2(cout),  # film scale
        row2(cout),  # film shift
        pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),  # gn2 scale
        pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),  # gn2 bias
        pl.BlockSpec((3, cout, cout), const3, memory_space=pltpu.VMEM),  # w2
        pl.BlockSpec((1, t, cout), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),  # gh
    ]
    args = [
        x,
        vec(g1s, cin), vec(g1b, cin),
        w1.astype(cdtype), vec(b1, cout),
        sc.astype(jnp.float32).reshape(b, 1, cout),
        sh.astype(jnp.float32).reshape(b, 1, cout),
        vec(g2s, cout), vec(g2b, cout),
        w2.astype(cdtype),
        gh,
    ]
    if has_skip:
        in_specs += [
            pl.BlockSpec((cin, cout), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [skip_w.astype(cdtype), gxs]

    f32 = jnp.float32
    out_shapes = [
        jax.ShapeDtypeStruct((b, t, cin), x.dtype),  # dx
        jax.ShapeDtypeStruct((1, cin), f32),  # dg1s
        jax.ShapeDtypeStruct((1, cin), f32),  # dg1b
        jax.ShapeDtypeStruct((3, cin, cout), f32),  # dw1
        jax.ShapeDtypeStruct((1, cout), f32),  # db1
        jax.ShapeDtypeStruct((b, 1, cout), f32),  # dsc
        jax.ShapeDtypeStruct((b, 1, cout), f32),  # dsh
        jax.ShapeDtypeStruct((1, cout), f32),  # dg2s
        jax.ShapeDtypeStruct((1, cout), f32),  # dg2b
        jax.ShapeDtypeStruct((3, cout, cout), f32),  # dw2
        jax.ShapeDtypeStruct((1, cout), f32),  # db2
    ]
    out_specs = [
        pl.BlockSpec((1, t, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cin), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cin), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, cin, cout), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),
        row2(cout),
        row2(cout),
        pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, cout, cout), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),
    ]
    if has_skip:
        out_shapes += [
            jax.ShapeDtypeStruct((cin, cout), f32),
            jax.ShapeDtypeStruct((1, cout), f32),
        ]
        out_specs += [
            pl.BlockSpec((cin, cout), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),
        ]

    kernel = functools.partial(
        _resblock_bwd_kernel,
        groups1=groups1, groups2=groups2, has_skip=has_skip, cdtype=cdtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(*args)


def _cast_like(g, primal):
    return g.astype(primal.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _chain_train_noskip(groups1, groups2, x, g1s, g1b, w1, b1, sc, sh,
                        g2s, g2b, w2, b2):
    out = fused_resblock_chain(
        x, g1s, g1b, w1, b1, sc, sh, g2s, g2b, w2, b2,
        groups1=groups1, groups2=groups2, add_residual=False,
    )
    assert out is not None, "geometry must be pre-checked with resblock_train_fits"
    return out


def _chain_train_noskip_fwd(groups1, groups2, x, g1s, g1b, w1, b1, sc, sh,
                            g2s, g2b, w2, b2):
    out = _chain_train_noskip(groups1, groups2, x, g1s, g1b, w1, b1, sc, sh,
                              g2s, g2b, w2, b2)
    return out, (x, g1s, g1b, w1, b1, sc, sh, g2s, g2b, w2, b2)


def _chain_train_noskip_bwd(groups1, groups2, res, gh):
    x, g1s, g1b, w1, b1, sc, sh, g2s, g2b, w2, b2 = res
    (dx, dg1s, dg1b, dw1, db1, dsc, dsh, dg2s, dg2b, dw2, db2) = \
        _resblock_bwd_call(x, g1s, g1b, w1, b1, sc, sh, g2s, g2b, w2,
                           None, gh, None, groups1=groups1, groups2=groups2)
    b, cout = sc.shape[0], w1.shape[2]
    return (
        _cast_like(dx, x),
        _cast_like(dg1s.reshape(g1s.shape), g1s),
        _cast_like(dg1b.reshape(g1b.shape), g1b),
        _cast_like(dw1, w1),
        _cast_like(db1.reshape(b1.shape), b1),
        _cast_like(dsc.reshape(b, cout), sc),
        _cast_like(dsh.reshape(b, cout), sh),
        _cast_like(dg2s.reshape(g2s.shape), g2s),
        _cast_like(dg2b.reshape(g2b.shape), g2b),
        _cast_like(dw2, w2),
        _cast_like(db2.reshape(b2.shape), b2),
    )


_chain_train_noskip.defvjp(_chain_train_noskip_fwd, _chain_train_noskip_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _chain_train_skip(groups1, groups2, x, g1s, g1b, w1, b1, sc, sh,
                      g2s, g2b, w2, b2, sw, sb):
    out = fused_resblock_chain(
        x, g1s, g1b, w1, b1, sc, sh, g2s, g2b, w2, b2, sw, sb,
        groups1=groups1, groups2=groups2, add_residual=False,
    )
    assert out is not None, "geometry must be pre-checked with resblock_train_fits"
    return out  # (h, xs)


def _chain_train_skip_fwd(groups1, groups2, x, g1s, g1b, w1, b1, sc, sh,
                          g2s, g2b, w2, b2, sw, sb):
    out = _chain_train_skip(groups1, groups2, x, g1s, g1b, w1, b1, sc, sh,
                            g2s, g2b, w2, b2, sw, sb)
    return out, (x, g1s, g1b, w1, b1, sc, sh, g2s, g2b, w2, b2, sw, sb)


def _chain_train_skip_bwd(groups1, groups2, res, cot):
    x, g1s, g1b, w1, b1, sc, sh, g2s, g2b, w2, b2, sw, sb = res
    gh, gxs = cot
    (dx, dg1s, dg1b, dw1, db1, dsc, dsh, dg2s, dg2b, dw2, db2, dsw, dsb) = \
        _resblock_bwd_call(x, g1s, g1b, w1, b1, sc, sh, g2s, g2b, w2,
                           sw, gh, gxs, groups1=groups1, groups2=groups2)
    b, cout = sc.shape[0], w1.shape[2]
    return (
        _cast_like(dx, x),
        _cast_like(dg1s.reshape(g1s.shape), g1s),
        _cast_like(dg1b.reshape(g1b.shape), g1b),
        _cast_like(dw1, w1),
        _cast_like(db1.reshape(b1.shape), b1),
        _cast_like(dsc.reshape(b, cout), sc),
        _cast_like(dsh.reshape(b, cout), sh),
        _cast_like(dg2s.reshape(g2s.shape), g2s),
        _cast_like(dg2b.reshape(g2b.shape), g2b),
        _cast_like(dw2, w2),
        _cast_like(db2.reshape(b2.shape), b2),
        _cast_like(dsw, sw),
        _cast_like(dsb.reshape(sb.shape), sb),
    )


_chain_train_skip.defvjp(_chain_train_skip_fwd, _chain_train_skip_bwd)


def fused_resblock_train(
    x, gn1_scale, gn1_bias, conv1_w, conv1_b, film_scale, film_shift,
    gn2_scale, gn2_bias, conv2_w, conv2_b, skip_w=None, skip_b=None,
    *, groups1: int, groups2: int,
):
    """Differentiable fused resblock chain (no residual, no dropout).

    Returns ``h`` (no skip) or ``(h, xs)`` (skip projection present) like
    ``fused_resblock_chain(add_residual=False)`` — or None when the
    backward geometry exceeds the VMEM budget (caller falls back to XLA).
    """
    b, t, cin = x.shape
    cout = conv1_w.shape[2]
    wsize = 2 if x.dtype == jnp.bfloat16 else 4
    if not resblock_train_fits(t, cin, cout, skip_w is not None,
                               weight_itemsize=wsize):
        return None
    if skip_w is None:
        return _chain_train_noskip(
            groups1, groups2, x, gn1_scale, gn1_bias, conv1_w, conv1_b,
            film_scale, film_shift, gn2_scale, gn2_bias, conv2_w, conv2_b,
        )
    return _chain_train_skip(
        groups1, groups2, x, gn1_scale, gn1_bias, conv1_w, conv1_b,
        film_scale, film_shift, gn2_scale, gn2_bias, conv2_w, conv2_b,
        skip_w, skip_b,
    )


def resblock_chain_reference(
    x, gn1_scale, gn1_bias, conv1_w, conv1_b, film_scale, film_shift,
    gn2_scale, gn2_bias, conv2_w, conv2_b, skip_w=None, skip_b=None,
    *, groups1: int, groups2: int, add_residual: bool = True,
):
    """Plain-XLA chain with identical semantics (for tests and fallback)."""

    def gn(h, scale, bias, groups):
        b_, t_, c = h.shape
        hf = h.reshape(b_, t_, groups, c // groups).astype(jnp.float32)
        mean = hf.mean(axis=(1, 3), keepdims=True)
        var = (hf * hf).mean(axis=(1, 3), keepdims=True) - mean * mean
        y = (hf - mean) * jax.lax.rsqrt(var + 1e-5)
        y = y.reshape(b_, t_, c) * scale.reshape(1, 1, c) + bias.reshape(1, 1, c)
        return y

    def conv3(h, w, bias):
        out = jax.lax.conv_general_dilated(
            h.astype(x.dtype), w.astype(x.dtype), (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )
        return out + bias.reshape(1, 1, -1)

    h = gn(x, gn1_scale, gn1_bias, groups1)
    h = h * jax.nn.sigmoid(h)
    h = conv3(h, conv1_w, conv1_b)
    h = h * (1.0 + film_scale[:, None, :]) + film_shift[:, None, :]
    h = gn(h, gn2_scale, gn2_bias, groups2)
    h = h * jax.nn.sigmoid(h)
    h = conv3(h, conv2_w, conv2_b)
    if skip_w is not None:
        xs = (
            jnp.einsum("btc,cd->btd", x.astype(x.dtype), skip_w.astype(x.dtype))
            .astype(jnp.float32) + skip_b.reshape(1, 1, -1)
        )
    else:
        xs = x.astype(jnp.float32)
    if add_residual:
        return (xs + h).astype(x.dtype)
    if skip_w is not None:
        return h.astype(x.dtype), xs.astype(x.dtype)
    return h.astype(x.dtype)
