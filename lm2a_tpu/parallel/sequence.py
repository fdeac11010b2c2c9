"""Sequence-parallel sampling: shard the mel time axis over the model axis.

The reference has no long-context machinery (sequence length is structurally
516; SURVEY.md §5.7), so this is an extension, not a parity item: the models
are written channels-last over a single time axis, which makes sequence
sharding an ANNOTATION rather than a rewrite. Activations are constrained to
``P(None, 'model', None)`` — GSPMD then inserts the halo exchanges for the
k=3/k=4 convolutions and the K/V all-gathers for cross-attention over ICI
automatically (the scaling-book recipe: pick a mesh, annotate, let XLA
insert collectives).

Use when clips outgrow one chip's HBM (e.g. full-song generation at minutes
of mel frames) or to cut per-chip latency at batch 1.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from lm2a_tpu.core.mesh import DATA_AXIS, MODEL_AXIS
from lm2a_tpu.diffusion.gaussian import ddim_sample, ddpm_sample
from lm2a_tpu.diffusion.schedule import Schedule


def make_sequence_sharded_sampler(
    apply_fn,
    schedule: Schedule,
    mesh,
    guidance_weight: float = 1.0,
    method: str = "ddpm",
    **kwargs,
):
    """Bind ``apply_fn`` into a jitted sampler whose (B, T, C) activations
    are sharded along T over the mesh's model axis."""
    seq_sharding = NamedSharding(mesh, P(None, MODEL_AXIS, None))
    sample_impl = {"ddpm": ddpm_sample, "ddim": ddim_sample}[method]

    def constrain(x):
        return jax.lax.with_sharding_constraint(x, seq_sharding)

    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def sampler(params, key, shape, motion_f=None, text_f=None):
        if motion_f is not None:
            motion_f = constrain(motion_f)
        if text_f is not None:
            text_f = constrain(text_f)

        def model_fn(x, t, m, l):
            return apply_fn(params, constrain(x), t, m, l)

        return sample_impl(
            model_fn, schedule, key, shape, motion_f, text_f,
            guidance_weight=guidance_weight, **kwargs,
        )

    def run(params, key, shape, motion_f=None, text_f=None):
        with mesh:
            return sampler(params, key, shape, motion_f, text_f)

    run.jitted = sampler  # for collective audits
    run.mesh = mesh
    return run


def make_sp_train_step(
    denoiser,
    cond_proj,
    schedule,
    cfg,
    tx,
    mesh,
    dataset_mean: float = 0.0,
    dataset_std: float = 1.0,
):
    """Sequence-sharded training step: batch over ``data``, time over ``model``.

    Identical math to ``training.train_step.make_train_step`` (same ``_loss``,
    Adan update, EMA lerp), but every (B, T, .) batch array is sharded
    ``P('data', 'model', None)`` so each device holds 1/(dp*sp) of the
    activations. GSPMD inserts the conv halo exchanges and attention K/V
    gathers along the sequence axis and the gradient reduction over both
    axes. Parameters/optimizer/EMA stay replicated (compose with
    ``parallel.tensor`` for sharded state).

    Use when activation memory is the binding constraint — long-T training
    (full-song sequences, SURVEY §5.7) or large per-device batches.
    """
    from functools import partial

    import optax

    from lm2a_tpu.training.train_step import TrainState, _loss

    ema_decay = cfg.train.ema_decay
    seq_sh = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))
    rep = NamedSharding(mesh, P())

    def step_fn(state, batch, key):
        batch = {k: jax.lax.with_sharding_constraint(v, seq_sh)
                 for k, v in batch.items()}
        loss_fn = partial(
            _loss, denoiser=denoiser, cond_proj=cond_proj, schedule=schedule,
            batch=batch, key=key, cond_drop_prob=cfg.train.cond_drop_prob,
            dataset_mean=dataset_mean, dataset_std=dataset_std, train=True,
        )
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = jax.tree.map(
            lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
            state.ema_params, params,
        )
        return TrainState(step=state.step + 1, params=params,
                          ema_params=ema_params, opt_state=opt_state), loss

    return jax.jit(
        step_fn,
        in_shardings=(rep, seq_sh, rep),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )
