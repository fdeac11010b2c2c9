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
) -> optax.GradientTransformation:
    b1, b2, b3 = betas

    def lr_at(step):
        if callable(learning_rate):
            return learning_rate(step)
        return jnp.asarray(learning_rate, dtype=jnp.float32)

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdanState(
            step=jnp.zeros((), jnp.int32),
            m=zeros,
            v=jax.tree.map(jnp.zeros_like, params),
            n=jax.tree.map(jnp.zeros_like, params),
            prev_grad=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("adan requires params (decoupled weight decay)")
        warm = (state.step > 0).astype(jnp.float32)  # moments frozen at step 0

        def upd_m(m, g):
            return m + warm * ((1.0 - b1) * m + b1 * g - m)

        def upd_v(v, g, pg):
            return v + warm * ((1.0 - b2) * v + b2 * (g - pg) - v)

        def upd_n(n, g, pg):
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
        new_state = AdanState(step=step, m=m, v=v, n=n, prev_grad=grads)
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
