"""Fused attention core as a Pallas TPU kernel.

The denoiser runs two cross-attention branches at every attention site
(9 sites x 2 branches at the flagship configuration). The XLA path
materializes each (B, h, T, S) probability tensor in HBM (T=S=516 -> ~8.5 MB
fp32 per branch per site), which dominates the forward's memory traffic.
This kernel keeps scores/probs in VMEM: for each (batch*head) grid step it
loads q/k/v tiles once, computes masked scores + softmax + the value matmul
entirely on-chip, and writes only the (T, hd) output.

Sizes here are small enough that no inner tiling is needed (516x516 fp32
scores = ~1 MB << 16 MB VMEM), so this is a single-block flash kernel, not a
streaming one. Gradients: a custom VJP recomputes through the plain-XLA
reference implementation (standard rematerialization trade).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def attention_core_reference(q, k, v):
    """Plain-XLA core: softmax(q k^T / sqrt(hd)) v over (B, H, T, hd)."""
    hd = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(hd, dtype=q.dtype)
    )
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, s_valid: int, head_dim: int):
    q = q_ref[0].astype(jnp.float32)  # (Tp, hdp)
    k = k_ref[0].astype(jnp.float32)  # (Sp, hdp)
    v = v_ref[0].astype(jnp.float32)
    # head_dim is the TRUE (unpadded) head dim; zero-padded lanes contribute
    # nothing to the dot products but must not inflate the softmax scale.
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
    # mask padded keys so they get zero probability
    key_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(key_ids < s_valid, scores, -1e30)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    exp = jnp.exp(scores)
    probs = exp / jnp.sum(exp, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        probs, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _attention_pallas(q, k, v, interpret: bool):
    b, h, t, hd = q.shape
    s = k.shape[2]
    tp, sp = _round_up(t, 8), _round_up(s, 8)
    hdp = _round_up(hd, 128)

    def pad(x, tgt_t):
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, tgt_t - x.shape[2]), (0, hdp - hd))
        ).reshape(b * h, tgt_t, hdp)

    qf = pad(q, tp)
    kf = pad(k, sp)
    vf = pad(v, sp)

    kernel = functools.partial(_attention_kernel, s_valid=s, head_dim=hd)
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, tp, hdp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, hdp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, hdp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tp, hdp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tp, hdp), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, tp, hdp)[:, :, :t, :hd]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def attention_core(q, k, v):
    """Fused attention over (B, H, T, hd) q and (B, H, S, hd) k/v.

    Pallas on TPU, interpret mode elsewhere; backward recomputes through the
    XLA reference implementation.
    """
    interpret = jax.default_backend() != "tpu"
    return _attention_pallas(q, k, v, interpret)


def _fwd(q, k, v):
    return attention_core(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(attention_core_reference, q, k, v)
    return vjp(g)


attention_core.defvjp(_fwd, _bwd)
