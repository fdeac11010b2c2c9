"""Bucketed multi-ref fused clip+Adan+EMA update kernels (round-3 work).

The flagship train step's optimizer tail is kernel-granularity-bound:
identical clip+Adan+EMA math costs 22.3 ms over the 382-leaf parameter tree
vs 11.2 ms over one pre-flattened vector
(``scripts/profile_opt_granularity.py``), yet every AUTODIFF-side route into
a flat domain loses end-to-end (per-step ravel 51.1 ms, flat carry 46.3 ms —
``training/adan.py:flat_adan``). This module attacks launch overhead from
the post-gradient side instead: the gradient tree is consumed leaf-by-leaf
(no ravel, no autodiff boundary), but MANY leaves share one ``pallas_call``
— each call holds every leaf's (g, p, ema, m, v, n, prev_grad) refs in VMEM
and applies the whole clip-scale + Adan + EMA + decoupled-weight-decay
update elementwise, writing (p, ema, m, v, n, prev_grad) back in place
(input/output aliased). The 382 per-leaf kernel groups collapse into
~O(tens) of calls:

- leaves with <= ``small_max`` elements: bucketed whole-leaf-resident calls,
  bounded by leaves/call and a VMEM byte budget;
- larger leaves: one grid-chunked call each (row-block grid over the leaf
  viewed as 2-D; launch overhead is negligible at their traffic), or the
  plain XLA expressions (``big_backend='xla'``) — both kept so the real chip
  can arbitrate.

The update math is the exact per-element math of
``training.adan.adan(grad_clip=...)`` + the training EMA lerp — the
reference optimizer (``/root/reference/models/adan.py:147-216``) and EMA
(``/root/reference/train.py:176-180``). Moment STORAGE may be bfloat16
(``opt_dtype``); all math is fp32. State layout (separate m/v/n/prev_grad
trees) matches ``AdanState``, so checkpoints interchange with the XLA path.

MEASURED ON THE REAL CHIP AND CLOSED (round 3,
``scripts/profile_opt_backend.py``, interleaved full-step A/B): XLA 39.11
vs pallas-small-buckets 39.10 vs all-pallas 39.7 ms/step — the full train
step is NOT kernel-launch-bound (round 2's isolated-chain granularity
delta does not transfer into the full program), so this stays an opt-in
experiment (``--opt_backend pallas``) with the XLA per-leaf path as the
production default. See DEVNOTES "POST-GRADIENT MULTI-REF OPTIMIZER".
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# bucket sizing: a bucketed call keeps all 13 refs of each member leaf fully
# VMEM-resident. 13 refs x 4 B x total elements must fit the budget with
# headroom for fp32 temporaries.
SMALL_MAX_ELEMS = 1 << 16  # leaves above this get their own grid-chunked call
MAX_LEAVES_PER_BUCKET = 8  # 8 leaves -> 1 + 56 in-refs + 48 out-refs
BUCKET_VMEM_BYTES = 5 << 20
BIG_BLOCK_ELEMS = 1 << 16  # target elements per grid block for big leaves

_N_SCALARS = 8  # [warm, gnorm, lr, c_m, c_v, c_n, denom, ema_decay]


@dataclass(frozen=True)
class OptPlan:
    buckets: Tuple[Tuple[int, ...], ...]
    big: Tuple[int, ...]


def plan_buckets(
    sizes: Sequence[int],
    small_max: int = SMALL_MAX_ELEMS,
    max_leaves: int = MAX_LEAVES_PER_BUCKET,
    vmem_budget: int = BUCKET_VMEM_BYTES,
) -> OptPlan:
    """Greedy size-sorted packing of small leaves into multi-ref buckets."""
    small = sorted(
        (i for i, s in enumerate(sizes) if s <= small_max),
        key=lambda i: sizes[i],
    )
    big = tuple(i for i, s in enumerate(sizes) if s > small_max)
    buckets, cur, cur_bytes = [], [], 0
    for i in small:
        b = 13 * 4 * sizes[i]
        if cur and (len(cur) >= max_leaves or cur_bytes + b > vmem_budget):
            buckets.append(tuple(cur))
            cur, cur_bytes = [], 0
        cur.append(i)
        cur_bytes += b
    if cur:
        buckets.append(tuple(cur))
    return OptPlan(buckets=tuple(buckets), big=big)


def _leaf2d(x: jnp.ndarray) -> jnp.ndarray:
    """Free (contiguous) view of a leaf as >=2-D for TPU tiling."""
    if x.ndim == 1:
        return x.reshape(1, -1)
    if x.ndim == 2:
        return x
    return x.reshape(-1, x.shape[-1])


def _make_kernel(n_leaves: int, b1, b2, b3, eps, clip, store_dtype):
    def kernel(scal, *refs):
        ins, outs = refs[: 7 * n_leaves], refs[7 * n_leaves:]
        warm = scal[0]
        gnorm = scal[1]
        lr = scal[2]
        c_m, c_v, c_n = scal[3], scal[4], scal[5]
        denom = scal[6]
        ema_d = scal[7]
        for i in range(n_leaves):
            g, p, e, m, v, n, pg = ins[i * 7: (i + 1) * 7]
            po, eo, mo, vo, no, pgo = outs[i * 6: (i + 1) * 6]
            gg = g[...].astype(jnp.float32)
            if clip and clip > 0:
                # exact folded-clip expression of adan(grad_clip=...):
                # (g / norm) * clip, applied only when norm >= clip
                gg = jnp.where(gnorm < clip, gg, (gg / gnorm) * clip)
            mm = m[...].astype(jnp.float32)
            vv = v[...].astype(jnp.float32)
            nn = n[...].astype(jnp.float32)
            pgf = pg[...].astype(jnp.float32)
            m2 = mm + warm * ((1.0 - b1) * mm + b1 * gg - mm)
            v2 = vv + warm * ((1.0 - b2) * vv + b2 * (gg - pgf) - vv)
            tgt = (1.0 - b3) * nn + b3 * (gg + (1.0 - b2) * (gg - pgf)) ** 2
            n2 = nn + warm * (tgt - nn)
            raw = lr / (jnp.sqrt(n2 * c_n) + eps) * (
                m2 * c_m + (1.0 - b2) * v2 * c_v
            )
            pf = p[...].astype(jnp.float32)
            # mirrors delta + optax.apply_updates rounding exactly
            pnew = pf + ((pf - raw) / denom - pf)
            po[...] = pnew
            eo[...] = e[...].astype(jnp.float32) * ema_d + pnew * (1.0 - ema_d)
            mo[...] = m2.astype(store_dtype)
            vo[...] = v2.astype(store_dtype)
            no[...] = n2.astype(store_dtype)
            pgo[...] = gg.astype(store_dtype)

    return kernel


def _aliases(n_leaves: int) -> dict:
    """Alias p/ema/m/v/n/pg inputs onto the matching outputs (in-place)."""
    al = {}
    for i in range(n_leaves):
        for k in range(6):  # skip g (input offset 0 within the leaf group)
            al[1 + i * 7 + 1 + k] = i * 6 + k
    return al


def _bucket_call(leaves, scal, store_dtype, statics, interpret):
    """One multi-ref call over whole-resident small leaves.

    ``leaves`` is a list of per-leaf tuples (g, p, ema, m, v, n, pg) as 2-D
    arrays. Returns per-leaf (p, ema, m, v, n, pg).
    """
    b1, b2, b3, eps, clip = statics
    n = len(leaves)
    kernel = _make_kernel(n, b1, b2, b3, eps, clip, store_dtype)
    flat_in, out_shapes = [], []
    for (g, p, e, m, v, nn, pg) in leaves:
        flat_in += [g, p, e, m, v, nn, pg]
        out_shapes += [
            jax.ShapeDtypeStruct(p.shape, jnp.float32),
            jax.ShapeDtypeStruct(e.shape, jnp.float32),
            jax.ShapeDtypeStruct(m.shape, store_dtype),
            jax.ShapeDtypeStruct(v.shape, store_dtype),
            jax.ShapeDtypeStruct(nn.shape, store_dtype),
            jax.ShapeDtypeStruct(pg.shape, store_dtype),
        ]
    out = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (7 * n),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (6 * n),
        input_output_aliases=_aliases(n),
        interpret=interpret,
    )(scal, *flat_in)
    return [tuple(out[i * 6: (i + 1) * 6]) for i in range(n)]


def _big_call(leaf, scal, store_dtype, statics, interpret):
    """Grid-chunked single-leaf call: row-block grid over the 2-D view."""
    b1, b2, b3, eps, clip = statics
    g, p, e, m, v, nn, pg = leaf
    rows, cols = g.shape
    br = max(1, BIG_BLOCK_ELEMS // max(1, cols))
    if br >= 8:
        br -= br % 8  # sublane-aligned row blocks
    br = min(br, rows)
    grid = (pl.cdiv(rows, br),)
    kernel = _make_kernel(1, b1, b2, b3, eps, clip, store_dtype)
    spec = pl.BlockSpec((br, cols), lambda i: (i, 0))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=[
            jax.ShapeDtypeStruct(p.shape, jnp.float32),
            jax.ShapeDtypeStruct(e.shape, jnp.float32),
            jax.ShapeDtypeStruct(m.shape, store_dtype),
            jax.ShapeDtypeStruct(v.shape, store_dtype),
            jax.ShapeDtypeStruct(nn.shape, store_dtype),
            jax.ShapeDtypeStruct(pg.shape, store_dtype),
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 7,
        out_specs=[spec] * 6,
        input_output_aliases=_aliases(1),
        interpret=interpret,
    )(scal, g, p, e, m, v, nn, pg)
    return tuple(out)


def fused_adan_ema_update(
    params,
    ema_params,
    opt_state,  # training.adan.AdanState (separate m/v/n/prev_grad trees)
    grads,
    *,
    lr,  # traced or concrete scalar (schedules resolved by the caller)
    ema_decay: float,
    betas: Tuple[float, float, float] = (0.02, 0.08, 0.01),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    grad_clip: float = 0.0,
    state_dtype=None,
    big_backend: str = "pallas",  # 'pallas' | 'xla' for leaves > small_max
    small_max: int = SMALL_MAX_ELEMS,
    interpret: Optional[bool] = None,
):
    """Apply one fused clip+Adan+EMA step; returns (params, ema, opt_state).

    Per-element math identical to ``adan(grad_clip=...)`` +
    ``optax.apply_updates`` + the EMA tree-lerp; only kernel partitioning
    differs. The global-norm reduction stays in XLA (one tree pass).
    """
    from lm2a_tpu.training.adan import AdanState

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b1, b2, b3 = betas
    store_dtype = jnp.dtype(state_dtype) if state_dtype is not None else jnp.float32
    statics = (b1, b2, b3, eps, grad_clip or 0.0)

    warm = (opt_state.step > 0).astype(jnp.float32)
    gnorm = (
        optax.global_norm(grads) if grad_clip and grad_clip > 0
        else jnp.float32(1.0)
    )
    step = opt_state.step + 1
    sf = step.astype(jnp.float32)
    c_m = 1.0 / (1.0 - (1.0 - b1) ** sf)
    c_v = 1.0 / (1.0 - (1.0 - b2) ** sf)
    c_n = 1.0 / (1.0 - (1.0 - b3) ** sf)
    lr = jnp.asarray(lr, jnp.float32)
    denom = 1.0 + weight_decay * lr
    scal = jnp.stack([
        warm, gnorm.astype(jnp.float32), lr, c_m, c_v, c_n,
        denom.astype(jnp.float32), jnp.float32(ema_decay),
    ])

    g_l, treedef = jax.tree.flatten(grads)
    p_l = treedef.flatten_up_to(params)
    e_l = treedef.flatten_up_to(ema_params)
    m_l = treedef.flatten_up_to(opt_state.m)
    v_l = treedef.flatten_up_to(opt_state.v)
    n_l = treedef.flatten_up_to(opt_state.n)
    pg_l = treedef.flatten_up_to(opt_state.prev_grad)
    nleaves = len(g_l)
    plan = plan_buckets([p.size for p in p_l], small_max=small_max)

    def leaf2d(i):
        return tuple(
            _leaf2d(x) for x in (g_l[i], p_l[i], e_l[i], m_l[i], v_l[i],
                                 n_l[i], pg_l[i])
        )

    results = [None] * nleaves
    for bucket in plan.buckets:
        outs = _bucket_call([leaf2d(i) for i in bucket], scal, store_dtype,
                            statics, interpret)
        for i, o in zip(bucket, outs):
            results[i] = o

    if big_backend == "pallas":
        for i in plan.big:
            results[i] = _big_call(leaf2d(i), scal, store_dtype, statics,
                                   interpret)
    else:  # XLA expressions for the traffic-dominated big leaves
        for i in plan.big:
            g, p, e, m, v, nn, pg = leaf2d(i)
            gg = g.astype(jnp.float32)
            if grad_clip and grad_clip > 0:
                gg = jnp.where(gnorm < grad_clip, gg, (gg / gnorm) * grad_clip)
            mm, vv, nf = (m.astype(jnp.float32), v.astype(jnp.float32),
                          nn.astype(jnp.float32))
            pgf = pg.astype(jnp.float32)
            m2 = mm + warm * ((1.0 - b1) * mm + b1 * gg - mm)
            v2 = vv + warm * ((1.0 - b2) * vv + b2 * (gg - pgf) - vv)
            tgt = (1.0 - b3) * nf + b3 * (gg + (1.0 - b2) * (gg - pgf)) ** 2
            n2 = nf + warm * (tgt - nf)
            raw = lr / (jnp.sqrt(n2 * c_n) + eps) * (
                m2 * c_m + (1.0 - b2) * v2 * c_v
            )
            pnew = p + ((p - raw) / denom - p)
            enew = e * ema_decay + pnew * (1.0 - ema_decay)
            results[i] = (pnew, enew, m2.astype(store_dtype),
                          v2.astype(store_dtype), n2.astype(store_dtype),
                          gg.astype(store_dtype))

    def rebuild(k, ref_leaves):
        return jax.tree.unflatten(
            treedef,
            [results[i][k].reshape(ref_leaves[i].shape)
             for i in range(nleaves)],
        )

    new_params = rebuild(0, p_l)
    new_ema = rebuild(1, e_l)
    new_state = AdanState(
        step=step,
        m=rebuild(2, m_l),
        v=rebuild(3, v_l),
        n=rebuild(4, n_l),
        prev_grad=rebuild(5, pg_l),
    )
    return new_params, new_ema, new_state
