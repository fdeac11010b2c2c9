"""Tensor parallelism: physically shard parameters over the model axis.

Beyond the reference (strictly single-device) and beyond what its workload
needs — this is the scaling extension for models that outgrow one chip's
HBM. Strategy: output-feature sharding for every kernel (column-parallel
everywhere), biases/scales sharded when divisible. GSPMD propagates the
activation shardings and inserts the collectives; semantics are guaranteed
identical to the replicated computation (verified in tests on a virtual
(data, model) mesh).

The memory win is real and immediate: each device holds 1/TP of every
eligible parameter, optimizer moment, and EMA copy (Adan keeps 4 extra
param-sized trees, so at TP=4 a 134M-param model's optimizer state drops
from ~3.2 GB to ~0.8 GB per device).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lm2a_tpu.core.mesh import DATA_AXIS, MODEL_AXIS


# Modules whose INPUT features arrive already sharded from a column-parallel
# producer: conv1 -> (FiLM/GN, both feature-local) -> conv2, and
# q/k/v_proj (head-sharded output) -> attention core -> out_proj. Sharding
# these kernels on the input axis (row-parallel) lets GSPMD keep the
# intermediate activations sharded and emit ONE reduction per pair instead
# of an all-gather at every layer boundary (audited: 444 -> see
# docs/SCALING.md). Their biases stay replicated (added after the reduce).
ROW_PARALLEL_MODULES = frozenset({"conv2", "out_proj"})


def _leaf_spec(path, leaf, tp: int) -> P:
    """Partition rule for one parameter leaf.

    Column-parallel by default (kernels sharded on the OUTPUT-features axis
    when divisible; 1-D bias/scale sharded when divisible), with the
    row-parallel alternation above for consumers of sharded features.
    """
    name = None
    module = None
    names = []
    for entry in reversed(path):
        key = getattr(entry, "key", None) or getattr(entry, "name", None)
        if key is not None:
            names.append(str(key))
    if names:
        name = names[0]
        module = names[1] if len(names) > 1 else None
    shape = np.shape(leaf)
    if not shape:
        return P()
    row = module in ROW_PARALLEL_MODULES
    if name == "kernel" and len(shape) >= 2:
        if row and shape[-2] % tp == 0:
            return P(*([None] * (len(shape) - 2) + [MODEL_AXIS, None]))
        if not row and shape[-1] % tp == 0:
            return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
        return P()
    if len(shape) == 1 and shape[0] % tp == 0 and name in ("bias", "scale") \
            and not row:
        return P(MODEL_AXIS)
    return P()


def tp_shardings(tree: Any, mesh: Mesh):
    """NamedSharding pytree for params/opt-state/EMA under tensor parallelism."""
    tp = mesh.shape[MODEL_AXIS]

    def one(path, leaf):
        if tp <= 1:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _leaf_spec(path, leaf, tp))

    return jax.tree_util.tree_map_with_path(one, tree)


def shard_state_tp(state, mesh: Mesh):
    """Place a TrainState on the mesh with TP param/opt/EMA shardings.

    ALIASING CONTRACT: ``device_put`` is a no-op for leaves whose target
    sharding already matches, so the returned state can share buffers with
    the input. The TP train step donates its input state, which then also
    deletes those shared buffers — treat the INPUT state as consumed once
    the returned state enters a donating step (snapshot anything you still
    need first)."""
    shardings = state_shardings_tp(state, mesh)
    placed = jax.tree.map(jax.device_put, state, shardings)
    return placed, shardings


def state_shardings_tp(state, mesh: Mesh):
    """Sharding pytree matching a TrainState: params/EMA/optimizer moments
    sharded by the TP rule (moments mirror their parameters' shapes so the
    same path rule applies), scalars replicated."""
    rep = NamedSharding(mesh, P())
    return type(state)(
        step=rep,
        params=tp_shardings(state.params, mesh),
        ema_params=tp_shardings(state.ema_params, mesh),
        opt_state=tp_shardings(state.opt_state, mesh),
    )


def make_tp_train_step(denoiser, cond_proj, schedule, cfg, tx, mesh: Mesh,
                       state_template, dataset_mean=0.0, dataset_std=1.0):
    """Data-parallel batch + tensor-parallel parameters in one jitted step.

    ``state_template`` supplies shapes for the sharding pytree. Returns
    (train_step, state_shardings); place the state with ``shard_state_tp``
    (or jax.device_put with the returned shardings) before stepping.
    """
    from functools import partial

    import optax

    from lm2a_tpu.training.train_step import TrainState, _loss

    ema_decay = cfg.train.ema_decay

    def step_fn(state, batch, key):
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

    state_sh = state_shardings_tp(state_template, mesh)
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())
    step = jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh, rep),
        out_shardings=(state_sh, rep),
        donate_argnums=0,
    )
    return step, state_sh


def make_tp_sampler(apply_fn, schedule, mesh: Mesh, params_template,
                    guidance_weight: float = 1.0, method: str = "ddpm",
                    **kwargs):
    """Sampling chain with tensor-parallel parameters.

    Weights stay physically sharded over the model axis during the whole
    reverse chain (each device holds 1/TP of every projection — serving a
    model that outgrows one chip's HBM); activations are replicated over
    ``model`` and GSPMD inserts the per-layer reductions at the row/column
    boundaries. Returns ``run(params, key, shape, motion_f, text_f)``;
    ``params`` must already be placed with the returned shardings (or any
    layout — GSPMD resharding handles mismatches at a cost).
    """
    import functools

    from lm2a_tpu.diffusion.gaussian import ddim_sample, ddpm_sample

    params_sh = tp_shardings(params_template, mesh)
    rep = NamedSharding(mesh, P())
    sample_impl = {"ddpm": ddpm_sample, "ddim": ddim_sample}[method]

    @functools.partial(
        jax.jit, static_argnums=(2,),
        in_shardings=(params_sh, rep, rep, rep),
        out_shardings=rep,
    )
    def sampler(params, key, shape, motion_f, text_f):
        def model_fn(x, t, m, l):
            return apply_fn(params, x, t, m, l)

        return sample_impl(
            model_fn, schedule, key, shape, motion_f, text_f,
            guidance_weight=guidance_weight, **kwargs,
        )

    def run(params, key, shape, motion_f=None, text_f=None):
        with mesh:
            return sampler(params, key, shape, motion_f, text_f)

    run.jitted = sampler  # for collective audits
    run.shardings = params_sh
    return run
