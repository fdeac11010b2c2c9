"""Progressive diffusion distillation (Salimans & Ho 2022) for few-step serving.

Round-2 measurement (DEVNOTES): plain DDIM-50 on the reference-recipe
checkpoint costs ~3 dB SNR and mis-calibrated output variance vs the
1000-step DDPM chain. Progressive distillation closes that gap: a STUDENT
initialized from the teacher learns, at each of its N DDIM times, to land in
ONE step exactly where the frozen TEACHER lands in TWO deterministic DDIM
half-steps. Halving stages (1000 -> 500 -> ... -> 50 -> ...) each reuse this
same step. No reference analogue (the reference ships only the 1000-step
ancestral chain, ``/root/reference/sample.py:144``; its ``ddim_sample`` is
dormant) — this is a framework extension gated by
``scripts/fewstep_quality.py``.

Classifier-free guidance is folded INTO the student: the teacher's eps is
the CFG-combined prediction (same ±5/±10 clamps as serving, via
``guided_eps``), so a distilled student samples at that guidance with a
SINGLE forward per step — no doubled batch — which alone halves serving
cost before any step-count reduction.

The student grid matches ``ddim_sample``'s ``linspace(T-1, 0, N)`` exactly,
so a distilled checkpoint is served by the existing sampler with
``method='ddim', ddim_steps=N, guidance_weight=1.0``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from lm2a_tpu.core.config import LM2AConfig
from lm2a_tpu.core.mesh import batch_sharding, replicated
from lm2a_tpu.diffusion.gaussian import guided_eps
from lm2a_tpu.diffusion.schedule import Schedule
from lm2a_tpu.training.train_step import TrainState


def stage_guidance_schedule(num_stages: int, guidance: float):
    """Per-stage teacher CFG weights for progressive distillation.

    The fold happens exactly ONCE: stage 0's teacher is the original model,
    sampled with ``guidance``; every later stage's teacher is the previous
    stage's student, whose eps is ALREADY guided, so re-applying w > 1
    there double-guides and biases the output (measured before the fix:
    +1.1 sigma mean_error on a stage-2 student vs +0.2 on stage 1).
    """
    return [guidance if i == 0 else 1.0 for i in range(num_stages)]


def student_time_grid(timesteps: int, num_student_steps: int):
    """(ts, ts_prev, ts_mid): the student's DDIM grid over the teacher
    schedule — ``gaussian.ddim_time_grid``, THE grid the serving sampler
    uses — plus the teacher's midpoint for each student step."""
    from lm2a_tpu.diffusion.gaussian import ddim_time_grid

    ts, ts_prev = ddim_time_grid(timesteps, num_student_steps)
    ts_mid = (ts + ts_prev) // 2  # floor; t_prev=-1 -> mid=(t-1)//2
    return ts, ts_prev, ts_mid


def _ab(schedule: Schedule, t):
    """alpha_bar at t with the t < 0 boundary meaning "fully denoised"."""
    return jnp.where(t < 0, 1.0, schedule.alpha_bars[jnp.maximum(t, 0)])


def ddim_det_step(x, eps, t, t_prev, schedule: Schedule, x0_clip: float = 2.0):
    """One deterministic (eta=0) DDIM update, same clamped form as
    ``ddim_sample``'s scan body. Shapes: x (B, ...), eps (B, ...), t/t_prev
    (B,) int32 (per-sample times)."""
    ab_t = _ab(schedule, t)
    ab_prev = _ab(schedule, t_prev)
    while ab_t.ndim < x.ndim:
        ab_t, ab_prev = ab_t[..., None], ab_prev[..., None]
    x0_pred = (x - eps * jnp.sqrt(1.0 - ab_t)) / jnp.sqrt(ab_t)
    x0_pred = jnp.clip(x0_pred, -x0_clip, x0_clip)
    return jnp.sqrt(ab_prev) * x0_pred + jnp.sqrt(1.0 - ab_prev) * eps


def _distill_one_step(
    denoiser,
    cond_proj,
    schedule: Schedule,
    cfg: LM2AConfig,
    tx: optax.GradientTransformation,
    num_student_steps: int,
    dataset_mean: float = 0.0,
    dataset_std: float = 1.0,
    guidance_weight: float = 1.0,
    x0_clip: float = 2.0,
    loss_space: str = "x0_snr",
):
    """Build the un-jitted ``step(state, teacher_params, batch, key) ->
    (state, loss)``.

    ``loss_space``: ``"x0_snr"`` regresses x0 with truncated-SNR weighting
    (Salimans & Ho sec. 4); ``"eps"`` is plain eps-MSE on the implied
    one-step eps target. Measured (DEVNOTES): eps wins at the first
    (100-step) stage, x0_snr is required for later stages where eps-MSE
    under-weights the low-SNR steps and mean-biases the student.

    ``state`` holds the STUDENT (initialize it from the teacher's weights);
    ``teacher_params`` is the frozen ``{'unet':…, 'cond_proj':…}`` tree.
    Per batch element: draw a student grid index, noise x0 to x_t, run the
    teacher TWO deterministic DDIM half-steps (t -> mid -> t_prev) with
    CFG-combined eps, convert the landing point into the unique one-step
    eps target, and regress the student's conditional eps on it. EMA and
    optimizer update are identical to the normal train step.
    """
    ema_decay = cfg.train.ema_decay
    ts_g, ts_prev_g, ts_mid_g = student_time_grid(
        schedule.timesteps, num_student_steps
    )

    def eps_fn(params, x, t, motion_f, text_f):
        def model_fn(xx, tt, m, l, **kw):
            return denoiser.apply(
                {"params": params["unet"]}, xx, tt, m, l,
                deterministic=True, **kw,
            )

        return guided_eps(model_fn, x, t, motion_f, text_f, guidance_weight)

    def loss_fn(student_params, teacher_params, batch, key):
        k_idx, k_noise = jax.random.split(key)
        x0 = (batch["mel"] - dataset_mean) / dataset_std
        b = x0.shape[0]

        # teacher conditions from the frozen projection; the student's own
        # projection receives gradients through its eps (it starts as a
        # copy of the teacher's and may adapt)
        motion_f, text_f = cond_proj.apply(
            {"params": teacher_params["cond_proj"]},
            batch["motion"], batch["lyrics"],
        )
        motion_s, text_s = cond_proj.apply(
            {"params": student_params["cond_proj"]},
            batch["motion"], batch["lyrics"],
        )

        idx = jax.random.randint(k_idx, (b,), 0, num_student_steps)
        t, t_prev, t_mid = ts_g[idx], ts_prev_g[idx], ts_mid_g[idx]

        ab_t = _ab(schedule, t)[:, None, None]
        noise = jax.random.normal(k_noise, x0.shape, dtype=x0.dtype)
        x_t = jnp.sqrt(ab_t) * x0 + jnp.sqrt(1.0 - ab_t) * noise

        # frozen teacher: two deterministic half-steps with CFG folded in
        eps_1 = jax.lax.stop_gradient(
            eps_fn(teacher_params, x_t, t, motion_f, text_f)
        ).astype(jnp.float32)
        x_mid = ddim_det_step(x_t.astype(jnp.float32), eps_1, t, t_mid,
                              schedule, x0_clip)
        eps_2 = jax.lax.stop_gradient(
            eps_fn(teacher_params, x_mid, t_mid, motion_f, text_f)
        ).astype(jnp.float32)
        x_tgt = ddim_det_step(x_mid, eps_2, t_mid, t_prev, schedule, x0_clip)

        # one-step target: solve x_tgt = a'' x~0 + s'' eps~ with
        # x_t = a x~0 + s eps~  (a=sqrt(ab), s=sqrt(1-ab))
        a_t, s_t = jnp.sqrt(ab_t), jnp.sqrt(1.0 - ab_t)
        ab_pp = _ab(schedule, t_prev)[:, None, None]
        a_pp, s_pp = jnp.sqrt(ab_pp), jnp.sqrt(1.0 - ab_pp)
        denom = a_pp - (s_pp / s_t) * a_t
        # denom -> 0 only when the student step is a no-op (t_prev == t);
        # the grid never produces that, but guard anyway
        x0_tgt = (x_tgt - (s_pp / s_t) * x_t) / jnp.where(
            jnp.abs(denom) < 1e-6, 1e-6, denom
        )

        # student predicts conditional eps directly (guidance folded in)
        def student_model(xx, tt, m, l, **kw):
            return denoiser.apply(
                {"params": student_params["unet"]}, xx, tt, m, l,
                deterministic=True, **kw,
            )

        eps_student = student_model(x_t, t, motion_s, text_s).astype(jnp.float32)
        # Regress in x0 space with truncated-SNR weighting (Salimans & Ho
        # 2022): plain eps-MSE weights the x0-space error by SNR(t), which
        # is ~4e-5 at t~T — exactly the steps that set a generation's
        # coarse structure from pure noise are near-unsupervised, and
        # students came out mean-biased (+1.1 sigma measured). w =
        # max(SNR, 1) floors the x0 weight at 1 there while staying
        # equal to eps-MSE for SNR > 1.
        if loss_space == "eps":
            eps_tgt = (x_t - a_t * x0_tgt) / s_t
            return jnp.mean(
                (eps_student - jax.lax.stop_gradient(eps_tgt)) ** 2
            )
        x0_student = (x_t - s_t * eps_student) / a_t
        snr = (a_t * a_t) / (s_t * s_t)
        w = jnp.maximum(snr, 1.0)
        diff = x0_student - jax.lax.stop_gradient(x0_tgt)
        loss = jnp.mean(w * diff ** 2)
        if loss_space == "x0_snr_mm":
            # mean-matching term (round 3): distilled-50 students came out
            # with a +0.7 sigma OUTPUT mean bias that the elementwise loss
            # barely sees (a constant offset over 80x516 elements is a tiny
            # fraction of per-element MSE). Penalize the per-sample GLOBAL
            # mean discrepancy, amplified — but NOT SNR-weighted and NOT at
            # full element mass: the first cut (size x w) let low-t steps
            # dominate every gradient and destabilized training (measured:
            # mse 2.5 -> 6.2, bias 0.7 -> 2.1 sigma).
            mdiff = jnp.mean(diff, axis=(1, 2))
            loss = loss + (diff[0].size / 64.0) * jnp.mean(mdiff ** 2)
        return loss

    # the shared grad->Adan->EMA update (train_step.make_update_step) with
    # the teacher threaded through as the builder's extra argument
    from lm2a_tpu.training.train_step import make_update_step

    def loss_builder(params, batch, key, teacher_params):
        return loss_fn(params, teacher_params, batch, key)

    one_step = make_update_step(loss_builder, tx, ema_decay)

    def step_fn(state: TrainState, teacher_params, batch, key):
        return one_step(state, batch, key, teacher_params)

    return step_fn


def make_distill_step(
    denoiser,
    cond_proj,
    schedule: Schedule,
    cfg: LM2AConfig,
    tx: optax.GradientTransformation,
    num_student_steps: int,
    mesh=None,
    dataset_mean: float = 0.0,
    dataset_std: float = 1.0,
    guidance_weight: float = 1.0,
    x0_clip: float = 2.0,
    loss_space: str = "x0_snr",
):
    """Jitted single distill step. ``teacher_params`` is argument 1 and is
    NOT donated — keep it device-resident across calls (a host numpy tree
    here re-marshals ~GBs per dispatch; measured as a page-fault storm that
    made steps take minutes on the 1-core host)."""
    step_fn = _distill_one_step(
        denoiser, cond_proj, schedule, cfg, tx, num_student_steps,
        dataset_mean=dataset_mean, dataset_std=dataset_std,
        guidance_weight=guidance_weight, x0_clip=x0_clip,
        loss_space=loss_space,
    )
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)
    rep, bsh = replicated(mesh), batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, rep, bsh, rep),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )


def make_device_data_multistep_distill(
    denoiser,
    cond_proj,
    schedule: Schedule,
    cfg: LM2AConfig,
    tx: optax.GradientTransformation,
    num_student_steps: int,
    mesh=None,
    dataset_mean: float = 0.0,
    dataset_std: float = 1.0,
    guidance_weight: float = 1.0,
    x0_clip: float = 2.0,
    loss_space: str = "x0_snr",
):
    """K fused distill steps over a DEVICE-RESIDENT dataset.

    ``fn(state, teacher_params, data, idx, base_key, offsets) ->
    (state, losses)`` — the distillation analogue of
    ``train_step.make_device_data_multistep``: ``data`` holds the packed
    (N, T, ·) arrays uploaded to HBM once, ``idx`` is a (K, B) int32
    row-index array (the only per-dispatch payload), ``offsets`` the (K,)
    global-step vector folded into per-step keys. Each scanned step gathers
    its batch with ``jnp.take`` on device and runs the IDENTICAL math to
    ``make_distill_step``. ``state`` is donated; ``teacher_params`` and
    ``data`` are not (they persist across dispatches)."""
    one_step = _distill_one_step(
        denoiser, cond_proj, schedule, cfg, tx, num_student_steps,
        dataset_mean=dataset_mean, dataset_std=dataset_std,
        guidance_weight=guidance_weight, x0_clip=x0_clip,
        loss_space=loss_space,
    )
    bsh = batch_sharding(mesh) if mesh is not None else None

    def multi_fn(state, teacher_params, data, idx, base_key, offsets):
        def body(st, inp):
            idx_k, off = inp
            batch = {k: jnp.take(v, idx_k, axis=0) for k, v in data.items()}
            if bsh is not None:
                batch = {k: jax.lax.with_sharding_constraint(v, bsh)
                         for k, v in batch.items()}
            return one_step(st, teacher_params, batch,
                            jax.random.fold_in(base_key, off))

        return jax.lax.scan(body, state, (idx, offsets))

    if mesh is None:
        return jax.jit(multi_fn, donate_argnums=0)
    rep = replicated(mesh)
    return jax.jit(
        multi_fn,
        in_shardings=(rep, rep, rep, rep, rep, rep),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )
