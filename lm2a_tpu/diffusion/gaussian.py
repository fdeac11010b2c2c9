"""Gaussian diffusion: forward noising, training loss, scan-compiled samplers.

Functional parity with ``/root/reference/models/diffusion.py`` (q_sample,
loss, p_sample/sample) and the inline sampling loop + classifier-free
guidance of ``/root/reference/sample.py:144-223`` — including the
behaviorally load-bearing CFG clamps (eps_diff in [-5, 5], eps in [-10, 10])
and the zeroed-condition unconditional branch.

TPU-first differences from the reference:

- The reverse process is ONE ``lax.scan`` over the step index, so all T
  (default 1000) UNet forwards compile into a single XLA program — no
  Python-loop dispatch overhead, no host sync per step (the reference
  re-dispatches and debug-prints from Python every step).
- CFG batch-doubling happens inside the scanned step, exactly one 2B
  forward per step like the reference's concatenation trick.
- All math takes explicit noise so golden tests can inject reference noise
  tensors (cross-framework RNG streams can't be seed-matched).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from lm2a_tpu.diffusion.schedule import Schedule

ModelFn = Callable[..., jnp.ndarray]
# ModelFn signature: (x (B,T,C), t (B,) int32, motion_f, text_f) -> eps (B,T,C)


def _bcast(coef: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Reshape a (B,)-coefficient for broadcasting against (B, ...)."""
    return coef.reshape(coef.shape + (1,) * (like.ndim - coef.ndim))


def q_sample(
    schedule: Schedule, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Forward process q(x_t | x_0) = sqrt(ab_t) x0 + sqrt(1-ab_t) eps."""
    ab = schedule.alpha_bars[t]
    return _bcast(jnp.sqrt(ab), x0) * x0 + _bcast(jnp.sqrt(1.0 - ab), x0) * noise


def diffusion_loss(
    model_fn: ModelFn,
    schedule: Schedule,
    key: jax.Array,
    x0: jnp.ndarray,
    motion_f: Optional[jnp.ndarray],
    text_f: Optional[jnp.ndarray],
    dataset_mean: float = 0.0,
    dataset_std: float = 1.0,
) -> jnp.ndarray:
    """Epsilon-prediction MSE with uniform timesteps.

    ``x0`` is z-normalized by the dataset statistics inside the loss, as in
    the reference (``models/diffusion.py:52``). Condition dropout for CFG is
    the trainer's responsibility (it owns the PRNG budget).
    """
    b = x0.shape[0]
    kt, kn = jax.random.split(key)
    t = jax.random.randint(kt, (b,), 0, schedule.timesteps)
    noise = jax.random.normal(kn, x0.shape, dtype=x0.dtype)
    x0n = (x0 - dataset_mean) / dataset_std
    x_t = q_sample(schedule, x0n, t, noise)
    pred = model_fn(x_t, t, motion_f, text_f)
    return jnp.mean((noise - pred) ** 2)


def p_sample_step(
    schedule: Schedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,  # (B,) int32
    eps: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """One ancestral DDPM step x_t -> x_{t-1} with explicit noise.

    x_{t-1} = (x_t - beta_t/sqrt(1-ab_t) * eps) / sqrt(alpha_t)
              + sqrt(beta_t) * noise * [t > 0]
    """
    beta = _bcast(schedule.betas[t], x_t)
    alpha = _bcast(schedule.alphas[t], x_t)
    ab = _bcast(schedule.alpha_bars[t], x_t)
    mask = _bcast((t > 0).astype(x_t.dtype), x_t)
    mean = (x_t - beta / jnp.sqrt(1.0 - ab) * eps) / jnp.sqrt(alpha)
    return mean + jnp.sqrt(beta) * noise * mask


def guided_eps(
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    motion_f: Optional[jnp.ndarray],
    text_f: Optional[jnp.ndarray],
    guidance_weight: float,
    uncond_fast: bool = False,
) -> jnp.ndarray:
    """Epsilon prediction with classifier-free guidance.

    For w > 1: one doubled-batch forward over [uncond (zeroed conds), cond],
    eps = eps_u + w * clip(eps_c - eps_u, +-5), clipped to +-10 — the exact
    stabilization of ``/root/reference/sample.py:151-174``.

    ``guidance_weight`` may be a Python float (static: the no-guidance path
    then compiles with no dead doubled batch) or a traced jax scalar (the
    guided program structure is fixed and ONE compiled chain serves every
    weight — the serving path, where each baked-in weight would otherwise
    cost a fresh multi-minute compile through the relay).

    ``uncond_fast=True`` additionally tells the model (via ``uncond_rows``)
    that the first half of the doubled batch has identically-zero conditions,
    letting it constant-fold those rows' cross-attention (exact math, see
    ResBlockUltimate). Requires a model_fn that forwards keyword args.
    """
    # Concrete (non-traced) weights <= 1.0 compile the direct conditional
    # forward with no dead doubled batch. float() rather than isinstance:
    # numpy scalars (np.float32 etc.) are not float subclasses but must take
    # the same static path (ADVICE r2).
    if isinstance(guidance_weight, jax.core.Tracer):
        static_off = False
    else:
        try:
            static_off = float(guidance_weight) <= 1.0
        except (TypeError, ValueError):
            static_off = False
    if static_off or motion_f is None or text_f is None:
        return model_fn(x, t, motion_f, text_f)
    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    m2 = jnp.concatenate([jnp.zeros_like(motion_f), motion_f], axis=0)
    l2 = jnp.concatenate([jnp.zeros_like(text_f), text_f], axis=0)
    if uncond_fast:
        eps2 = model_fn(x2, t2, m2, l2, uncond_rows=x.shape[0])
    else:
        eps2 = model_fn(x2, t2, m2, l2)
    eps_u, eps_c = jnp.split(eps2, 2, axis=0)
    eps_diff = jnp.clip(eps_c - eps_u, -5.0, 5.0)
    return jnp.clip(eps_u + guidance_weight * eps_diff, -10.0, 10.0)


def ddpm_sample(
    model_fn: ModelFn,
    schedule: Schedule,
    key: jax.Array,
    shape: tuple,
    motion_f: Optional[jnp.ndarray] = None,
    text_f: Optional[jnp.ndarray] = None,
    guidance_weight: float = 1.0,
    x_init: Optional[jnp.ndarray] = None,
    noise_seq: Optional[jnp.ndarray] = None,
    collect_stats: bool = False,
    uncond_fast: bool = False,
) -> jnp.ndarray:
    """Full reverse DDPM as a single lax.scan over t = T-1 .. 0.

    ``x_init`` overrides the N(0, 1) start and ``noise_seq`` ((T,) + shape)
    overrides the per-step ancestral noise — both for golden tests with
    injected reference noise. Returns the raw (normalized) sample; callers
    de-normalize with the dataset stats.

    ``collect_stats=True`` additionally returns a (T, 8) array of per-step
    [x min, max, mean, std, eps min, max, mean, std] — the reference's
    per-decile debug telemetry (``/root/reference/sample.py:176-223``)
    gathered inside the compiled scan with zero host syncs instead of
    Python prints every step.
    """
    b = shape[0]
    if x_init is None:
        key, k0 = jax.random.split(key)
        x_init = jax.random.normal(k0, shape, dtype=jnp.float32)

    ts = jnp.arange(schedule.timesteps - 1, -1, -1, dtype=jnp.int32)

    def step(carry, inp):
        x, k = carry
        if noise_seq is None:
            t = inp
            k, kn = jax.random.split(k)
            noise = jax.random.normal(kn, shape, dtype=jnp.float32)
        else:
            t, noise = inp
        tb = jnp.full((b,), t, dtype=jnp.int32)
        eps = guided_eps(model_fn, x, tb, motion_f, text_f, guidance_weight,
                         uncond_fast=uncond_fast)
        x = p_sample_step(schedule, x, tb, eps.astype(x.dtype), noise)
        stats = None
        if collect_stats:
            stats = jnp.stack([
                jnp.min(x), jnp.max(x), jnp.mean(x), jnp.std(x),
                jnp.min(eps), jnp.max(eps), jnp.mean(eps), jnp.std(eps),
            ])
        return (x, k), stats

    xs = ts if noise_seq is None else (ts, noise_seq)
    (x, _), stats = jax.lax.scan(step, (x_init, key), xs)
    if collect_stats:
        return x, stats  # (T, 8): per-step [x min/max/mean/std, eps ...]
    return x


def ddim_time_grid(timesteps: int, num_steps: int):
    """(ts, ts_prev): the evenly spaced DDIM sub-schedule, SINGLE SOURCE for
    the sampler and for distillation (``training/distill.py``). A distilled
    checkpoint is only served correctly if both sides use the identical
    grid — don't fork this rounding."""
    ts = jnp.linspace(timesteps - 1, 0, num_steps).round().astype(jnp.int32)
    ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], dtype=jnp.int32)])
    return ts, ts_prev


def ddim_sample(
    model_fn: ModelFn,
    schedule: Schedule,
    key: jax.Array,
    shape: tuple,
    motion_f: Optional[jnp.ndarray] = None,
    text_f: Optional[jnp.ndarray] = None,
    num_steps: int = 50,
    eta: float = 0.0,
    guidance_weight: float = 1.0,
    x_init: Optional[jnp.ndarray] = None,
    x0_clip: float = 2.0,
    uncond_fast: bool = False,
) -> jnp.ndarray:
    """DDIM sampler over an evenly spaced sub-sequence of the schedule.

    Upgrades the reference's dormant, never-wired ``ddim_sample``
    (``/root/reference/models/diffusion.py:124-165``) into a working
    lax.scan sampler: x0 prediction clamped to +-x0_clip, eta-scaled sigma
    with the t_prev < 0 boundary giving ab_prev = 1 and sigma = 0.
    """
    b = shape[0]
    if x_init is None:
        key, k0 = jax.random.split(key)
        x_init = jax.random.normal(k0, shape, dtype=jnp.float32)

    ts, ts_prev = ddim_time_grid(schedule.timesteps, num_steps)

    def step(carry, inp):
        x, k = carry
        t, t_prev = inp
        tb = jnp.full((b,), t, dtype=jnp.int32)
        eps = guided_eps(model_fn, x, tb, motion_f, text_f, guidance_weight,
                         uncond_fast=uncond_fast)
        eps = eps.astype(x.dtype)

        ab_t = schedule.alpha_bars[t]
        ab_prev = jnp.where(t_prev < 0, 1.0, schedule.alpha_bars[jnp.maximum(t_prev, 0)])

        x0_pred = (x - eps * jnp.sqrt(1.0 - ab_t)) / jnp.sqrt(ab_t)
        x0_pred = jnp.clip(x0_pred, -x0_clip, x0_clip)

        var_ratio = (1.0 - ab_prev) / (1.0 - ab_t) * (1.0 - ab_t / ab_prev)
        sigma = eta * jnp.sqrt(jnp.maximum(var_ratio, 0.0))
        sigma = jnp.where(t_prev < 0, 0.0, sigma)

        k, kn = jax.random.split(k)
        noise = jax.random.normal(kn, shape, dtype=x.dtype)
        noise = jnp.where(t_prev > 0, noise, jnp.zeros_like(noise))

        dir_coeff = jnp.sqrt(jnp.maximum(1.0 - ab_prev - sigma**2, 0.0))
        x = jnp.sqrt(ab_prev) * x0_pred + dir_coeff * eps + sigma * noise
        return (x, k), None

    (x, _), _ = jax.lax.scan(step, (x_init, key), (ts, ts_prev))
    return x


def make_sampler(
    apply_fn,
    schedule: Schedule,
    guidance_weight: float = 1.0,
    method: str = "ddpm",
    **kwargs,
):
    """Bind a flax ``apply_fn`` into a jittable ``sampler(params, key, shape,
    motion_f, text_f)``. ``method`` is 'ddpm' or 'ddim'."""
    sample_impl = {"ddpm": ddpm_sample, "ddim": ddim_sample}[method]

    @partial(jax.jit, static_argnums=(2,))
    def sampler(params, key, shape, motion_f=None, text_f=None):
        def model_fn(x, t, m, l, **kw):
            return apply_fn(params, x, t, m, l, **kw)

        return sample_impl(
            model_fn, schedule, key, shape, motion_f, text_f,
            guidance_weight=guidance_weight, **kwargs,
        )

    return sampler
