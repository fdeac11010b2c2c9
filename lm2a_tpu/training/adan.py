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
) -> optax.GradientTransformation:
    """``state_dtype`` sets the STORAGE dtype of the m/v/n/prev_grad trees
    (``None`` = match params, the reference behavior). All update math runs
    in fp32 regardless. ``bfloat16`` halves the optimizer's HBM read+write
    traffic — the fused train step is bandwidth-bound on optimizer state
    after fwd+bwd (``scripts/profile_train_breakdown.py``) — at the cost of
    ~8-bit moment storage; the reference trajectory needs fp32.
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

        def f32(x):
            return x.astype(jnp.float32)

        def upd_m(m, g):
            m, g = f32(m), f32(g)
            return m + warm * ((1.0 - b1) * m + b1 * g - m)

        def upd_v(v, g, pg):
            v, g, pg = f32(v), f32(g), f32(pg)
            return v + warm * ((1.0 - b2) * v + b2 * (g - pg) - v)

        def upd_n(n, g, pg):
            n, g, pg = f32(n), f32(g), f32(pg)
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
            prev_grad=jax.tree.map(store, grads),
        )
        return updates, new_state

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
