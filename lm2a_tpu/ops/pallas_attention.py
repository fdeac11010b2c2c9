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

Measured on one v5e chip (chained-scan forwards, bf16, flagship UNet):
at T=516 XLA's attention path wins (1.99 ms vs 2.35 ms full-forward — at
hd=32 XLA's own fusion is already optimal); full-UNet A/B of the streaming
kernel at long T gives XLA/pallas speedups 0.71x / 0.83x / 0.95x / 1.04x at
T = 2048 / 4096 / 8192 / 16384. The kernel is therefore OPT-IN
(``ModelConfig.fused_attention``) at training/serving lengths and
auto-engaged by long-form generation above ``FUSED_ATTENTION_MIN_T``
(~12k frames), where it both wins and — once (B, h, T, T) probabilities
outgrow HBM — is the only path that runs. Keeping matmuls in the input
dtype (bf16) with fp32 accumulation measured neutral at these shapes: the
hd=32 contraction leaves the MXU 4x under-filled either way, so the gap to
XLA below break-even is softmax/rescale VPU work plus grid overhead, not
matmul rate.
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
    """All heads of one batch element in a single block.

    Blocks are (h, Tp, hd) with the TRUE head dim as the lane axis (no 128
    padding — padding the contraction to 128 lanes wasted 4x MXU work for
    the flagship's hd=32 and measured slower than XLA). Scores/probs for all
    heads stay in VMEM; the batched dot_generals keep the MXU fed across the
    head dimension.
    """
    # matmuls stay in the INPUT dtype (bf16 on the serving path) with fp32
    # accumulation — casting operands to fp32 costs ~4x MXU throughput and
    # was the whole gap to XLA in the round-2 A/B. Softmax math runs fp32.
    q = q_ref[0]  # (h, Tp, hd)
    k = k_ref[0]  # (h, Sp, hd)
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))  # (h, Tp, Sp) fp32
    key_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
    scores = jnp.where(key_ids < s_valid, scores, -1e30)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    exp = jnp.exp(scores)
    probs = (exp / jnp.sum(exp, axis=-1, keepdims=True)).astype(v.dtype)
    out = jax.lax.dot_general(
        probs, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (h, Tp, hd) fp32
    o_ref[0] = out.astype(o_ref.dtype)


def _heads_per_block(h: int, tp: int, sp: int) -> int:
    """Largest divisor of h whose score tiles fit the VMEM budget.

    Live fp32 score-sized buffers (scores, shifted, exp, probs) dominate the
    stack; keep ~4 of them under ~8 MB to leave room for q/k/v/out tiles.
    """
    score_bytes = tp * sp * 4
    budget = 8 * 1024 * 1024
    for cand in range(h, 0, -1):
        if h % cand == 0 and 4 * cand * score_bytes <= budget:
            return cand
    return 1


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  s_valid: int, head_dim: int, block_s: int, n_s: int):
    """Streaming flash attention: online softmax over S tiles.

    Grid is (B, head_blocks, T_tiles, S_tiles) with S innermost (sequential
    on TPU), so the (m, l, acc) scratch carries across the S sweep of one
    (batch, heads, T-tile) cell: tile scores never leave VMEM and the
    (T, S) probability matrix is never materialized in HBM — the whole point
    at long S, where the single-block kernel and XLA's fused form both
    overflow VMEM / fusion budgets.
    """
    si = pl.program_id(3)

    @pl.when(si == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # bf16 matmuls + fp32 accumulation (see _attention_kernel note): only
    # the softmax/rescale bookkeeping runs fp32.
    q = q_ref[0]  # (hpb, bt, hd)
    k = k_ref[0]  # (hpb, bs, hd)
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))  # (hpb, bt, bs) fp32
    key_ids = si * block_s + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
    scores = jnp.where(key_ids < s_valid, scores, -1e30)

    m_old = m_ref[:, :, :1]  # (hpb, bt, 1)
    m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
    p = jnp.exp(scores - m_new)
    corr = jnp.exp(m_old - m_new)  # (hpb, bt, 1)
    l_ref[:, :, :1] = corr * l_ref[:, :, :1] + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:, :, :1] = m_new
    acc_ref[:] = corr * acc_ref[:] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    @pl.when(si == n_s - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:, :, :1]).astype(o_ref.dtype)


def _attention_pallas_streaming(q, k, v, interpret: bool,
                                block_t: int = 256, block_s: int = 512):
    b, h, t, hd = q.shape
    s = k.shape[2]
    bt = min(block_t, _round_up(t, 8))
    bs = min(block_s, _round_up(s, 8))
    tp, sp = _round_up(t, bt), _round_up(s, bs)
    # heads per block: scores tile (hpb, bt, bs) fp32 is the big buffer
    hpb = h
    while hpb > 1 and (h % hpb or 4 * hpb * bt * bs * 4 > 8 * 1024 * 1024):
        hpb -= 1
    while h % hpb:
        hpb -= 1
    n_t, n_s = tp // bt, sp // bs

    def pad_t(x, tgt_t):
        return jnp.pad(x, ((0, 0), (0, 0), (0, tgt_t - x.shape[2]), (0, 0)))

    qf, kf, vf = pad_t(q, tp), pad_t(k, sp), pad_t(v, sp)
    kernel = functools.partial(_flash_kernel, s_valid=s, head_dim=hd,
                               block_s=bs, n_s=n_s)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // hpb, n_t, n_s),
        in_specs=[
            pl.BlockSpec((1, hpb, bt, hd), lambda i, j, ti, si: (i, j, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hpb, bs, hd), lambda i, j, ti, si: (i, j, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hpb, bs, hd), lambda i, j, ti, si: (i, j, si, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hpb, bt, hd), lambda i, j, ti, si: (i, j, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, tp, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((hpb, bt, 1), jnp.float32),   # m (running max)
            pltpu.VMEM((hpb, bt, 1), jnp.float32),   # l (running denom)
            pltpu.VMEM((hpb, bt, hd), jnp.float32),  # acc (unnormalized out)
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :, :t, :]


# Above this many key/value rows, stream S tiles with online softmax instead
# of holding the whole (T, S) score block in VMEM. (Kernel-internal choice:
# which Pallas variant runs, NOT whether Pallas beats XLA.)
STREAMING_S_THRESHOLD = 1024

# Measured break-even vs the XLA attention path on one v5e chip (chained-scan
# full-UNet forwards, B=1, bf16, round 2): XLA wins 0.71x/0.83x/0.95x at
# T=2048/4096/8192; the streaming kernel wins 1.04x at T=16384 and is the
# only option once (B, h, T, T) probabilities outgrow HBM. Long-form
# generation auto-engages the kernel above this length (≈2.4 min of audio).
FUSED_ATTENTION_MIN_T = 12288


def _attention_pallas(q, k, v, interpret: bool):
    if k.shape[2] > STREAMING_S_THRESHOLD:
        return _attention_pallas_streaming(q, k, v, interpret)
    return _attention_pallas_single_block(q, k, v, interpret)


def _attention_pallas_single_block(q, k, v, interpret: bool):
    b, h, t, hd = q.shape
    s = k.shape[2]
    tp, sp = _round_up(t, 8), _round_up(s, 8)
    hpb = _heads_per_block(h, tp, sp)

    def pad_t(x, tgt_t):
        return jnp.pad(x, ((0, 0), (0, 0), (0, tgt_t - x.shape[2]), (0, 0)))

    qf, kf, vf = pad_t(q, tp), pad_t(k, sp), pad_t(v, sp)

    kernel = functools.partial(_attention_kernel, s_valid=s, head_dim=hd)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // hpb),
        in_specs=[
            pl.BlockSpec((1, hpb, tp, hd), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hpb, sp, hd), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hpb, sp, hd), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hpb, tp, hd), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, tp, hd), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :, :t, :]


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
