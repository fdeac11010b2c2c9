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

FORWARD-ONLY: the sampler is the target (the headline 1000-step chain).
Training keeps the XLA path — no VJP is registered, so differentiating
through ``fused_resblock_chain`` fails loudly rather than silently
recomputing.

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

    x = x_ref[0]  # (T, Cin)
    t = x.shape[0]
    cin = x.shape[1]
    cout = w1_ref.shape[2]

    p1 = _group_matrices(cin, groups1, jnp.float32)
    h = _gn_silu(x, g1_ref[...], b1_ref[...], p1, t * (cin // groups1))
    h = _conv3(h, w1_ref, c1b_ref[...], cdtype)  # (T, Cout) fp32

    # FiLM: h * (1 + scale) + shift, per-batch-row vectors (blocks (1, 1, C))
    h = h * (1.0 + fsc_ref[0].astype(jnp.float32)) + fsh_ref[0].astype(
        jnp.float32
    )

    p2 = _group_matrices(cout, groups2, jnp.float32)
    h = _gn_silu(h, g2_ref[...], b2_ref[...], p2, t * (cout // groups2))
    h = _conv3(h, w2_ref, c2b_ref[...], cdtype)

    if has_skip:
        xs = (
            jnp.dot(x.astype(cdtype), sw_ref[...].astype(cdtype),
                    preferred_element_type=jnp.float32)
            + sb_ref[...]
        )
    else:
        xs = x.astype(jnp.float32)

    if add_residual:
        out_refs[0][0] = (xs + h).astype(out_refs[0].dtype)
    else:
        out_refs[0][0] = h.astype(out_refs[0].dtype)
        if has_skip:
            out_refs[1][0] = xs.astype(out_refs[1].dtype)


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
):
    """Run the fused resblock conv chain. Returns the block output when
    ``add_residual`` (the no-attention block), else ``h`` — or ``(h, xs)``
    when a skip projection exists — for the caller to attend + add.

    Returns None when the geometry exceeds the VMEM weight budget (caller
    falls back to the XLA path).
    """
    b, t, cin = x.shape
    cout = conv1_w.shape[2]
    has_skip = skip_w is not None
    if interpret is None:  # Pallas on TPU, interpreter elsewhere (CPU tests)
        interpret = jax.default_backend() != "tpu"

    weight_bytes = (conv1_w.size + conv2_w.size) * 2
    if has_skip:
        weight_bytes += skip_w.size * 2
    if weight_bytes > VMEM_WEIGHT_BUDGET:
        return None

    cdtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32

    def vec(p, c):  # (C,) params as (1, C) fp32 rows
        return p.reshape(1, c).astype(jnp.float32)

    const2 = lambda i: (0, 0)  # noqa: E731
    const3 = lambda i: (0, 0, 0)  # noqa: E731

    in_specs = [
        pl.BlockSpec((1, t, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cin), const2, memory_space=pltpu.VMEM),  # gn1 scale
        pl.BlockSpec((1, cin), const2, memory_space=pltpu.VMEM),  # gn1 bias
        pl.BlockSpec((3, cin, cout), const3, memory_space=pltpu.VMEM),  # w1
        pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),  # b1
        # film vectors as (B, 1, C): a (1, C) sublane/lane block per row
        # (TPU requires the trailing block dims to equal the array's)
        pl.BlockSpec((1, 1, cout), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),  # film scale
        pl.BlockSpec((1, 1, cout), lambda i: (i, 0, 0),
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

    out_spec = pl.BlockSpec((1, t, cout), lambda i: (i, 0, 0),
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
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)


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
