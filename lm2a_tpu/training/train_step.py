"""Data-parallel pjit train/eval steps.

One optimization step == the hot loop of ``/root/reference/train.py:135-218``
(cond projection, shared-mask CFG condition drop, diffusion loss, grad-clip
1.0, Adan update, EMA lerp), compiled into a single XLA program:

- the batch is sharded over the mesh's ``data`` axis; parameters, optimizer
  state and EMA are replicated. GSPMD inserts the gradient psum over ICI —
  the only collective this workload needs (SURVEY.md §5.8);
- bf16 activations stand in for the reference's fp16 AMP + GradScaler
  (no scaler needed: bf16 has fp32's exponent range);
- EMA is a fused tree-lerp inside the same program, not a separate pass.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from lm2a_tpu.core.config import LM2AConfig
from lm2a_tpu.core.mesh import batch_sharding, replicated
from lm2a_tpu.diffusion.gaussian import diffusion_loss
from lm2a_tpu.diffusion.schedule import Schedule
from lm2a_tpu.training.adan import adan, flat_adan, make_lr_schedule


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32
    params: Dict[str, Any]  # {'unet': ..., 'cond_proj': ...}
    ema_params: Dict[str, Any]
    opt_state: Any


def init_train_state(
    denoiser,
    cond_proj,
    cfg: LM2AConfig,
    key: jax.Array,
    seq_len: int = 516,
) -> tuple[TrainState, optax.GradientTransformation]:
    """Initialize parameters and optimizer state on tiny dummy shapes."""
    ku, kp = jax.random.split(key)
    mc = cfg.model
    x = jnp.zeros((1, seq_len, mc.in_dim), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    cond = jnp.zeros((1, seq_len, mc.cond_dim), jnp.float32)
    unet_vars = denoiser.init(ku, x, t, cond, cond)
    proj_vars = cond_proj.init(
        kp,
        jnp.zeros((1, seq_len, mc.motion_dim), jnp.float32),
        jnp.zeros((1, seq_len, mc.text_dim), jnp.float32),
    )
    params = {"unet": unet_vars["params"], "cond_proj": proj_vars["params"]}

    tx = make_optimizer(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=tx.init(params),
    )
    return state, tx


def make_optimizer(cfg: LM2AConfig) -> optax.GradientTransformation:
    tc = cfg.train
    lr = make_lr_schedule(tc.lr, tc.lr_decay_steps, tc.lr_decay_factors)
    state_dtype = None if tc.opt_dtype in ("", "float32") else tc.opt_dtype
    if tc.fused_opt:
        # clip folded into Adan's kernels: bit-identical math to the chain
        # below, one less full pass over the gradient tree per step.
        # (A fully-flat raveled optimizer was measured and REJECTED: the
        # per-step tree<->vector boundary costs more than the flat domain
        # saves — see adan.flat_adan and scripts/profile_flatstate_step.py.)
        return adan(lr, weight_decay=tc.weight_decay, state_dtype=state_dtype,
                    grad_clip=tc.grad_clip or 0.0)
    opt = adan(lr, weight_decay=tc.weight_decay, state_dtype=state_dtype)
    if tc.grad_clip and tc.grad_clip > 0:
        return optax.chain(optax.clip_by_global_norm(tc.grad_clip), opt)
    return opt


def _loss(
    params,
    denoiser,
    cond_proj,
    schedule: Schedule,
    batch,
    key,
    cond_drop_prob: float,
    dataset_mean: float,
    dataset_std: float,
    train: bool,
):
    kdrop, kdiff, kdo = jax.random.split(key, 3)
    motion_f, text_f = cond_proj.apply(
        {"params": params["cond_proj"]}, batch["motion"], batch["lyrics"]
    )
    if train and cond_drop_prob > 0.0:
        b = motion_f.shape[0]
        # one shared Bernoulli mask zeroes BOTH conditions (train.py:148-157)
        keep = 1.0 - jax.random.bernoulli(
            kdrop, cond_drop_prob, (b, 1, 1)
        ).astype(motion_f.dtype)
        motion_f = motion_f * keep
        text_f = text_f * keep

    def model_fn(x, t, m, l):
        return denoiser.apply(
            {"params": params["unet"]},
            x, t, m, l,
            deterministic=not train,
            rngs={"dropout": kdo} if train else None,
        )

    return diffusion_loss(
        model_fn, schedule, kdiff, batch["mel"], motion_f, text_f,
        dataset_mean=dataset_mean, dataset_std=dataset_std,
    )


def make_pallas_opt_fn(cfg: LM2AConfig):
    """Build the bucketed multi-ref Pallas clip+Adan+EMA updater from the
    train config (``ops/pallas_opt.py``). Requires the ``fused_opt`` state
    layout (bare AdanState — no optax chain wrapper)."""
    from lm2a_tpu.ops.pallas_opt import fused_adan_ema_update

    tc = cfg.train
    if not tc.fused_opt:
        raise ValueError("opt_backend='pallas' needs fused_opt=1 "
                         "(bare AdanState layout)")
    sched = make_lr_schedule(tc.lr, tc.lr_decay_steps, tc.lr_decay_factors)
    state_dtype = None if tc.opt_dtype in ("", "float32") else tc.opt_dtype

    def opt_fn(params, ema_params, opt_state, grads):
        return fused_adan_ema_update(
            params, ema_params, opt_state, grads,
            lr=sched(opt_state.step + 1),
            ema_decay=tc.ema_decay,
            weight_decay=tc.weight_decay,
            grad_clip=tc.grad_clip or 0.0,
            state_dtype=state_dtype,
            big_backend=tc.opt_big_backend,
        )

    return opt_fn


def _pallas_opt_from(cfg: LM2AConfig):
    return make_pallas_opt_fn(cfg) if cfg.train.opt_backend == "pallas" else None


def make_update_step(loss_builder, tx: optax.GradientTransformation,
                     ema_decay: float, pallas_opt=None):
    """THE grad → optimizer → EMA update, single-sourced.

    ``loss_builder(params, batch, key, *extra) -> scalar loss``. Returns
    ``one_step(state, batch, key, *extra) -> (state, loss)``. Shared by the
    plain, fused-dispatch, and device-resident train steps and by
    distillation (``training/distill.py``) so a change to the update rule
    cannot silently diverge one dispatch path from the others.

    ``pallas_opt`` (from ``make_pallas_opt_fn``) replaces the
    tx.update → apply_updates → EMA tree-lerp tail with the bucketed
    multi-ref Pallas kernel — same math, ~O(tens) of kernel launches
    instead of ~658 per-leaf fusions.
    """

    def one_step(state: TrainState, batch, key, *extra):
        loss, grads = jax.value_and_grad(loss_builder)(
            state.params, batch, key, *extra
        )
        if pallas_opt is not None:
            params, ema_params, opt_state = pallas_opt(
                state.params, state.ema_params, state.opt_state, grads
            )
        else:
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema_params = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                state.ema_params,
                params,
            )
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            ema_params=ema_params,
            opt_state=opt_state,
        )
        return new_state, loss

    return one_step


def _train_loss_builder(denoiser, cond_proj, schedule, cfg, dataset_mean,
                        dataset_std):
    """The standard training objective as a ``make_update_step`` builder."""

    def loss_builder(params, batch, key):
        return _loss(
            params,
            denoiser=denoiser, cond_proj=cond_proj, schedule=schedule,
            batch=batch, key=key, cond_drop_prob=cfg.train.cond_drop_prob,
            dataset_mean=dataset_mean, dataset_std=dataset_std, train=True,
        )

    return loss_builder


def make_train_step(
    denoiser,
    cond_proj,
    schedule: Schedule,
    cfg: LM2AConfig,
    tx: optax.GradientTransformation,
    mesh=None,
    dataset_mean: float = 0.0,
    dataset_std: float = 1.0,
):
    """Build the jitted train step.

    Returns ``train_step(state, batch, key) -> (state, loss)``. ``batch`` is
    a dict of (B, T, .) arrays: ``mel (B,T,80)``, ``motion (B,T,234)``,
    ``lyrics (B,T,768)``. When ``mesh`` is given, the step is compiled with
    replicated state and batch-sharded data.
    """
    step_fn = make_update_step(
        _train_loss_builder(denoiser, cond_proj, schedule, cfg,
                            dataset_mean, dataset_std),
        tx, cfg.train.ema_decay, pallas_opt=_pallas_opt_from(cfg),
    )

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)
    rep, bsh = replicated(mesh), batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, bsh, rep),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )


def make_multistep_train_step(
    denoiser,
    cond_proj,
    schedule: Schedule,
    cfg: LM2AConfig,
    tx: optax.GradientTransformation,
    mesh=None,
    dataset_mean: float = 0.0,
    dataset_std: float = 1.0,
):
    """K optimizer steps per dispatch: lax.scan over stacked batches.

    ``multistep(state, batches, base_key, offsets) -> (state, losses)`` where
    ``batches`` holds (K, B, T, .) arrays and ``offsets`` is the (K,) int32
    global-step vector used to fold per-step keys. Each scanned step is
    IDENTICAL math to make_train_step's, so K dispatches collapse into one —
    this amortizes host/dispatch latency (hundreds of ms per call through a
    remote-attached device; still worthwhile on local hardware to keep the
    device queue full).
    """
    one_step = make_update_step(
        _train_loss_builder(denoiser, cond_proj, schedule, cfg,
                            dataset_mean, dataset_std),
        tx, cfg.train.ema_decay, pallas_opt=_pallas_opt_from(cfg),
    )

    def multi_fn(state, batches, base_key, offsets):
        def body(st, inp):
            batch, off = inp
            return one_step(st, batch, jax.random.fold_in(base_key, off))

        return jax.lax.scan(body, state, (batches, offsets))

    if mesh is None:
        return jax.jit(multi_fn, donate_argnums=0)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lm2a_tpu.core.mesh import DATA_AXIS

    rep = replicated(mesh)
    ksh = NamedSharding(mesh, P(None, DATA_AXIS))  # (K, B, ...) -> B sharded
    return jax.jit(
        multi_fn,
        in_shardings=(rep, ksh, rep, rep),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )


def make_device_data_multistep(
    denoiser,
    cond_proj,
    schedule: Schedule,
    cfg: LM2AConfig,
    tx: optax.GradientTransformation,
    mesh=None,
    dataset_mean: float = 0.0,
    dataset_std: float = 1.0,
):
    """K fused optimizer steps gathering batches from a DEVICE-RESIDENT dataset.

    ``fn(state, data, idx, base_key, offsets) -> (state, losses)`` where
    ``data`` holds the full packed arrays ((N, T, ·), uploaded to HBM once)
    and ``idx`` is a (K, B) int32 row-index array — the only per-dispatch
    input. Each scanned step gathers its batch with ``jnp.take`` on device
    and runs the IDENTICAL math to ``make_multistep_train_step``.

    Why: with a remote- or PCIe-attached device, streaming K·B rows per
    dispatch makes the input pipeline the wall (measured 2.2 s/step through
    the axon tunnel vs 41.7 ms device compute at bs16). The reference-scale
    dataset (1868 clips ≈ 2.8 GB fp32) fits HBM comfortably, so residency
    turns the per-dispatch transfer into ~KB of indices. No reference
    analogue (the reference streams from 8 loader workers, train.py:58).
    """
    one_step = make_update_step(
        _train_loss_builder(denoiser, cond_proj, schedule, cfg,
                            dataset_mean, dataset_std),
        tx, cfg.train.ema_decay, pallas_opt=_pallas_opt_from(cfg),
    )

    bsh = batch_sharding(mesh) if mesh is not None else None

    def multi_fn(state, data, idx, base_key, offsets):
        def body(st, inp):
            idx_k, off = inp
            batch = {k: jnp.take(v, idx_k, axis=0) for k, v in data.items()}
            if bsh is not None:
                batch = {k: jax.lax.with_sharding_constraint(v, bsh)
                         for k, v in batch.items()}
            return one_step(st, batch, jax.random.fold_in(base_key, off))

        return jax.lax.scan(body, state, (idx, offsets))

    if mesh is None:
        return jax.jit(multi_fn, donate_argnums=0)
    rep = replicated(mesh)
    return jax.jit(
        multi_fn,
        in_shardings=(rep, rep, rep, rep, rep),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )


def make_device_data_eval(
    denoiser,
    cond_proj,
    schedule: Schedule,
    cfg: LM2AConfig,
    mesh=None,
    dataset_mean: float = 0.0,
    dataset_std: float = 1.0,
):
    """Fused validation over a DEVICE-RESIDENT val split.

    ``fn(params, data, idx, base_key, offsets) -> (K,) losses`` where ``data``
    holds the packed val arrays in HBM and ``idx`` is (K, B) int32 row
    indices. Each scanned batch is gathered on device and scored with the
    IDENTICAL math to ``make_eval_step`` (``offsets`` feeds the same
    ``fold_in`` stream the streaming path uses, so both paths produce the
    same numbers). Counterpart of ``make_device_data_multistep`` for the
    reference's per-epoch capped validation pass (train.py:220-247): with a
    remote-attached device, K streamed val batches cost K host->device
    batch transfers; here one dispatch ships only the index array.
    """

    def eval_one(params, batch, key):
        return _loss(
            params, denoiser, cond_proj, schedule, batch, key,
            cond_drop_prob=0.0, dataset_mean=dataset_mean,
            dataset_std=dataset_std, train=False,
        )

    bsh = batch_sharding(mesh) if mesh is not None else None

    def multi_fn(params, data, idx, base_key, offsets):
        def body(carry, inp):
            idx_k, off = inp
            batch = {k: jnp.take(v, idx_k, axis=0) for k, v in data.items()}
            if bsh is not None:
                batch = {k: jax.lax.with_sharding_constraint(v, bsh)
                         for k, v in batch.items()}
            loss = eval_one(params, batch, jax.random.fold_in(base_key, off))
            return carry, loss

        _, losses = jax.lax.scan(body, None, (idx, offsets))
        return losses

    if mesh is None:
        return jax.jit(multi_fn)
    rep = replicated(mesh)
    return jax.jit(
        multi_fn,
        in_shardings=(rep, rep, rep, rep, rep),
        out_shardings=rep,
    )


def make_eval_step(
    denoiser,
    cond_proj,
    schedule: Schedule,
    cfg: LM2AConfig,
    mesh=None,
    dataset_mean: float = 0.0,
    dataset_std: float = 1.0,
):
    """Validation loss (no condition drop, no dropout), jitted + sharded."""

    def step_fn(params, batch, key):
        return _loss(
            params, denoiser, cond_proj, schedule, batch, key,
            cond_drop_prob=0.0, dataset_mean=dataset_mean,
            dataset_std=dataset_std, train=False,
        )

    if mesh is None:
        return jax.jit(step_fn)
    rep, bsh = replicated(mesh), batch_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(rep, bsh, rep), out_shardings=rep)
