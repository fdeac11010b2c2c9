"""Adan optimizer as an optax GradientTransformation.

Reproduces the exact update of the reference's fused Adan
(``/root/reference/models/adan.py:147-216``; the file defines the class
twice — ``:14`` and ``:127`` — and the second shadows the first, so the
second's math is the behavior reproduced here):

state: first-moment EMA ``m``, grad-difference EMA ``v``, EMA of
``(g + (1-b2)(g - g_prev))^2`` as ``n``, plus ``prev_grad``. Moments stay
zero on the very first step (the reference's ``if step > 0`` guard), so step
1 applies only the ``1/(1 + wd*lr)`` decoupled shrink. Bias corrections are
``1/(1 - (1-b)^step)`` and the parameter update is

    p <- (p - lr / (sqrt(n * c_n) + eps) * (m * c_m + (1-b2) * v * c_v))
         / (1 + wd * lr)

``learning_rate`` may be a float or a ``step -> lr`` schedule (used for the
reference's manual step-decay lists, ``/root/reference/train.py:102-116``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, Callable[[jnp.ndarray], jnp.ndarray]]


class AdanState(NamedTuple):
    step: jnp.ndarray  # completed steps, int32
    m: optax.Updates
    v: optax.Updates
    n: optax.Updates
    prev_grad: optax.Updates


def adan(
    learning_rate: ScalarOrSchedule = 1e-3,
    betas: Tuple[float, float, float] = (0.02, 0.08, 0.01),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    state_dtype: Union[str, jnp.dtype, None] = None,
    grad_clip: float = 0.0,
) -> optax.GradientTransformation:
    """``state_dtype`` sets the STORAGE dtype of the m/v/n/prev_grad trees
    (``None`` = match params, the reference behavior). All update math runs
    in fp32 regardless. ``bfloat16`` halves the optimizer's HBM read+write
    traffic — the fused train step is bandwidth-bound on optimizer state
    after fwd+bwd (``scripts/profile_train_breakdown.py``) — at the cost of
    ~8-bit moment storage; the reference trajectory needs fp32.

    ``grad_clip > 0`` folds global-norm clipping INTO the update: instead of
    ``optax.chain(clip_by_global_norm, adan)`` materializing a scaled copy
    of the whole gradient tree (an extra 2x134M-float HBM pass + one kernel
    per leaf per step), the ``(g / norm) * clip`` scaling happens at each
    read inside Adan's fused elementwise kernels. Bit-identical to the
    chained form: the norm is ``optax.global_norm`` (same reduction order)
    and the per-element scaling is the same expression clip_by_global_norm
    applies.
    """
    b1, b2, b3 = betas
    sd = jnp.dtype(state_dtype) if state_dtype is not None else None

    def store(x):
        return x.astype(sd) if sd is not None else x

    def lr_at(step):
        if callable(learning_rate):
            return learning_rate(step)
        return jnp.asarray(learning_rate, dtype=jnp.float32)

    def zeros_like_state(params):
        return jax.tree.map(
            lambda p: jnp.zeros(p.shape, sd if sd is not None else p.dtype),
            params,
        )

    def init_fn(params):
        return AdanState(
            step=jnp.zeros((), jnp.int32),
            m=zeros_like_state(params),
            v=zeros_like_state(params),
            n=zeros_like_state(params),
            prev_grad=zeros_like_state(params),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("adan requires params (decoupled weight decay)")
        warm = (state.step > 0).astype(jnp.float32)  # moments frozen at step 0

        if grad_clip and grad_clip > 0:
            # same reduction clip_by_global_norm computes; the per-element
            # (g / norm) * clip below matches its rounding order exactly,
            # applied lazily at each read so no scaled tree materializes
            g_norm = optax.global_norm(grads)
            no_clip = g_norm < grad_clip
        else:
            no_clip = None

        def f32(x):
            x = x.astype(jnp.float32)
            return x

        def fg(g):
            g = g.astype(jnp.float32)
            if no_clip is None:
                return g
            return jnp.where(no_clip, g, (g / g_norm) * grad_clip)

        def upd_m(m, g):
            m, g = f32(m), fg(g)
            return m + warm * ((1.0 - b1) * m + b1 * g - m)

        def upd_v(v, g, pg):
            v, g, pg = f32(v), fg(g), f32(pg)
            return v + warm * ((1.0 - b2) * v + b2 * (g - pg) - v)

        def upd_n(n, g, pg):
            n, g, pg = f32(n), fg(g), f32(pg)
            tgt = (1.0 - b3) * n + b3 * (g + (1.0 - b2) * (g - pg)) ** 2
            return n + warm * (tgt - n)

        m = jax.tree.map(upd_m, state.m, grads)
        v = jax.tree.map(upd_v, state.v, grads, state.prev_grad)
        n = jax.tree.map(upd_n, state.n, grads, state.prev_grad)

        step = state.step + 1
        sf = step.astype(jnp.float32)
        c_m = 1.0 / (1.0 - (1.0 - b1) ** sf)
        c_v = 1.0 / (1.0 - (1.0 - b2) ** sf)
        c_n = 1.0 / (1.0 - (1.0 - b3) ** sf)
        lr = lr_at(step)
        denom = 1.0 + weight_decay * lr

        def delta(p, m_, v_, n_):
            raw = lr / (jnp.sqrt(n_ * c_n) + eps) * (m_ * c_m + (1.0 - b2) * v_ * c_v)
            return (p - raw) / denom - p

        updates = jax.tree.map(delta, params, m, v, n)
        new_state = AdanState(
            step=step,
            m=jax.tree.map(store, m),
            v=jax.tree.map(store, v),
            n=jax.tree.map(store, n),
            # prev_grad sees the same (clipped) gradient the moments saw
            prev_grad=jax.tree.map(lambda g: store(fg(g)), grads),
        )
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def flat_adan(
    learning_rate: ScalarOrSchedule = 1e-3,
    betas: Tuple[float, float, float] = (0.02, 0.08, 0.01),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    state_dtype: Union[str, jnp.dtype, None] = None,
    grad_clip: float = 0.0,
) -> optax.GradientTransformation:
    """Adan over ONE raveled parameter vector — MEASURED AND REJECTED for
    the production step; kept as the documented experiment + for optimizer
    research on flat param spaces.

    The hypothesis: per-leaf optimizer kernels dominate the train step's
    optimizer tail on TPU — the flagship's 382-leaf tree costs 22.3 ms/step
    of clip+Adan+EMA where the IDENTICAL math over a single pre-flattened
    134M-element vector costs 11.2 (``scripts/profile_opt_granularity.py``).
    The verdict (real-chip chained scans, `scripts/profile_train_breakdown
    .py` / `profile_flatstate_step.py`): every way of reaching the flat
    domain from a tree-shaped step costs more than the flat domain saves —
      - ravel/unravel around tx.update each step: full step 51.1 ms vs the
        per-leaf 39.2 (the 3x382-piece concat/slice IS the granularity
        problem, repeated three times);
      - flat CARRY (ravel once per K-step dispatch, fwd consumes
        unravel(pflat) views, grads taken w.r.t. the flat vector): 46.3 ms
        vs 40.4 — the unravel slices + the slice-transpose in the backward
        cost ~17 ms/step.
    What survives in production is the cheap four-fifths of the idea:
    ``adan(grad_clip=...)`` folds clipping into the per-leaf kernels
    (no scaled-tree materialization) and ``state_dtype=bfloat16`` halves
    moment traffic. XLA is otherwise optimal for the per-leaf form.

    Identical per-element math to ``optax.chain(clip_by_global_norm, adan)``;
    only the global-norm reduction order differs (different fp rounding in
    the norm). State layout differs from the per-leaf form — checkpoints are
    not interchangeable between forms.
    """
    inner = adan(learning_rate, betas, eps, weight_decay, state_dtype)

    def _ravel(tree):
        return jnp.concatenate([jnp.ravel(x) for x in jax.tree.leaves(tree)])

    def _unravel(vec, tree):
        leaves, treedef = jax.tree.flatten(tree)
        out, pos = [], 0
        for leaf in leaves:
            out.append(jax.lax.slice(vec, (pos,), (pos + leaf.size,))
                       .reshape(leaf.shape))
            pos += leaf.size
        return jax.tree.unflatten(treedef, out)

    def init_fn(params):
        return inner.init({"w": _ravel(params)})

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("flat_adan requires params (weight decay)")
        gflat = _ravel(grads).astype(jnp.float32)
        if grad_clip and grad_clip > 0:
            # optax.clip_by_global_norm semantics on the flat vector:
            # scale only when the norm exceeds the threshold
            norm = jnp.sqrt(jnp.sum(gflat * gflat))
            gflat = jnp.where(norm < grad_clip, gflat,
                              gflat / norm * grad_clip)
        pflat = _ravel(params)
        updates, new_state = inner.update({"w": gflat}, state, {"w": pflat})
        return _unravel(updates["w"], params), new_state

    return optax.GradientTransformation(init_fn, update_fn)


def make_lr_schedule(
    base_lr: float,
    decay_steps: Tuple[int, ...] = (),
    decay_factors: Tuple[float, ...] = (),
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Manual step-decay matching the reference's boundary semantics.

    The reference checks ``step >= D`` AFTER the optimizer step on a
    0-indexed loop counter (``/root/reference/train.py:209-216``), so loop
    steps 0..D (D+1 optimizer steps) run at the pre-decay lr and the decayed
    lr is first applied at loop step D+1 — our 1-indexed current-step D+2.
    ``schedule`` receives the 1-indexed current step (``state.step + 1``).

    Empty lists mean constant LR (the reference's default where empty
    ``--lr_decay_steps`` disables decay).
    """
    if len(decay_steps) != len(decay_factors):
        raise ValueError("decay steps and factors must pair up")
    order = sorted(range(len(decay_steps)), key=lambda i: decay_steps[i])
    steps = jnp.asarray([decay_steps[i] for i in order], dtype=jnp.int32)
    factors = jnp.asarray([decay_factors[i] for i in order], dtype=jnp.float32)

    def schedule(step):
        if len(order) == 0:
            return jnp.asarray(base_lr, dtype=jnp.float32)
        applied = jnp.where(step[None] >= steps + 2, factors, 1.0)
        return jnp.asarray(base_lr, dtype=jnp.float32) * jnp.prod(applied)

    return schedule
