"""Training loop: epochs, validation, logging, checkpoint/resume.

The orchestration mirrors ``/root/reference/train.py:53-270`` (per-step CFG
drop + Adan + EMA, per-epoch capped validation pass, CSV/TensorBoard logging,
periodic + final checkpoints) with the deliberate upgrades documented in
SURVEY.md §7: resume actually works, the loss fetch is asynchronous (one
device sync per log interval, not per step), and batches stream through a
device-prefetch pipeline instead of loader workers.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np

from lm2a_tpu.core.config import LM2AConfig
from lm2a_tpu.core.mesh import make_mesh
from lm2a_tpu.data.dataset import (
    BatchIterator,
    MelNpzDataset,
    PackedDataset,
    compute_dataset_stats,
    device_prefetch,
    PACK_META,
)
from lm2a_tpu.diffusion.schedule import make_schedule
from lm2a_tpu.models.factory import build_cond_projection, build_denoiser
from lm2a_tpu.training.adan import make_lr_schedule
from lm2a_tpu.training.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from lm2a_tpu.training.train_step import (
    init_train_state,
    make_eval_step,
    make_multistep_train_step,
    make_train_step,
)
from lm2a_tpu.utils.logging import TrainLogger
from lm2a_tpu.utils.profiling import StepTimer


def _open_dataset(path: str, align_mode: str):
    if os.path.exists(os.path.join(path, PACK_META)):
        return PackedDataset(path)
    return MelNpzDataset(path, align_mode=align_mode)


@dataclass
class TrainResult:
    final_step: int
    final_loss: float
    ckpt_dir: str


def train(
    cfg: LM2AConfig,
    npz_dir: str,
    save_dir: str,
    val_npz_dir: Optional[str] = None,
    dataset_mean: Optional[float] = None,
    dataset_std: Optional[float] = None,
    resume: bool = False,
    mesh=None,
    max_steps: Optional[int] = None,
    use_tensorboard: bool = True,
    profile_dir: Optional[str] = None,
    profile_steps: tuple = (20, 30),
) -> TrainResult:
    multihost = jax.process_count() > 1
    if mesh is None:
        if multihost:
            from lm2a_tpu.core.distributed import make_hybrid_mesh

            mesh = make_hybrid_mesh()
        else:
            mesh = make_mesh()
    tc = cfg.train
    if multihost and (tc.steps_per_call > 1 or tc.device_data):
        # the fused-dispatch / device-resident modes exist to hide
        # PER-DISPATCH overhead on a single host behind a slow link; on a
        # pod the standard prefetched path is already compute-bound
        raise NotImplementedError(
            "steps_per_call>1 / --device_data are single-process modes; "
            "multi-host runs use the standard prefetched path"
        )

    denoiser = build_denoiser(cfg.model, tc.compute_dtype)
    cond_proj = build_cond_projection(cfg.model, tc.compute_dtype)
    schedule = make_schedule(cfg.diffusion)

    if dataset_mean is None or dataset_std is None:
        if os.path.exists(os.path.join(npz_dir, PACK_META)):
            ds_tmp = PackedDataset(npz_dir)
            dataset_mean = float(np.mean(ds_tmp.mel))
            dataset_std = float(np.std(ds_tmp.mel))
        else:
            dataset_mean, dataset_std = compute_dataset_stats(npz_dir)
        print(f"dataset stats: mean={dataset_mean:.6f} std={dataset_std:.6f}")

    ds = _open_dataset(npz_dir, cfg.data.align_mode)
    val_ds = (
        _open_dataset(val_npz_dir, cfg.data.align_mode)
        if val_npz_dir and os.path.isdir(val_npz_dir)
        else None
    )

    key = jax.random.key(tc.seed)
    state, tx = init_train_state(denoiser, cond_proj, cfg, key)
    start_epoch = 0
    if resume:
        path = latest_checkpoint(save_dir)
        if path:
            state, meta = restore_checkpoint(path, state)
            start_epoch = int(meta.get("epoch", 0))
            dataset_mean = float(meta.get("dataset_mean", dataset_mean))
            dataset_std = float(meta.get("dataset_std", dataset_std))
            print(f"resumed from {path} at step {int(state.step)}")

    if multihost:
        # every process built the same state from the same seed (and/or
        # restored the same checkpoint file); promote it to one global
        # replicated array so the sharded step sees a single jax.Array
        from lm2a_tpu.core.distributed import put_replicated

        state = put_replicated(mesh, state)

    train_step = make_train_step(
        denoiser, cond_proj, schedule, cfg, tx, mesh=mesh,
        dataset_mean=dataset_mean, dataset_std=dataset_std,
    )
    multistep = None
    if tc.steps_per_call > 1:
        multistep = make_multistep_train_step(
            denoiser, cond_proj, schedule, cfg, tx, mesh=mesh,
            dataset_mean=dataset_mean, dataset_std=dataset_std,
        )
    devdata_step, device_data = None, None
    if tc.device_data and tc.steps_per_call > 1 and isinstance(ds, PackedDataset):
        # Device-resident dataset: upload the packed arrays to HBM once and
        # ship only (K, B) row indices per dispatch. With a remote/PCIe
        # device the per-dispatch batch transfer dominates the step
        # otherwise (see make_device_data_multistep).
        from lm2a_tpu.core.mesh import replicated as _rep
        from lm2a_tpu.training.train_step import make_device_data_multistep

        devdata_step = make_device_data_multistep(
            denoiser, cond_proj, schedule, cfg, tx, mesh=mesh,
            dataset_mean=dataset_mean, dataset_std=dataset_std,
        )
        rep_sh = _rep(mesh)
        nbytes = sum(a.size * 4 for a in (ds.mel, ds.motion, ds.lyrics))
        print(f"uploading dataset to device ({nbytes / 1e9:.2f} GB) ...")
        t_up = time.time()
        device_data = {
            k: jax.device_put(np.ascontiguousarray(getattr(ds, k)), rep_sh)
            for k in ("mel", "motion", "lyrics")
        }
        jax.block_until_ready(device_data)
        print(f"dataset resident in HBM ({time.time() - t_up:.1f}s)")
    elif tc.device_data:
        print("device_data requested but needs steps_per_call>1 and a "
              "packed dataset; falling back to the streaming path")
    devdata_eval, device_val_data = None, None
    if (devdata_step is not None and val_ds is not None
            and isinstance(val_ds, PackedDataset)):
        # validation gets the same treatment: val split resident in HBM,
        # one dispatch per epoch shipping only row indices
        from lm2a_tpu.core.mesh import replicated as _rep
        from lm2a_tpu.training.train_step import make_device_data_eval

        devdata_eval = make_device_data_eval(
            denoiser, cond_proj, schedule, cfg, mesh=mesh,
            dataset_mean=dataset_mean, dataset_std=dataset_std,
        )
        rep_sh = _rep(mesh)
        device_val_data = {
            k: jax.device_put(np.ascontiguousarray(getattr(val_ds, k)), rep_sh)
            for k in ("mel", "motion", "lyrics")
        }
        jax.block_until_ready(device_val_data)
    eval_step = make_eval_step(
        denoiser, cond_proj, schedule, cfg, mesh=mesh,
        dataset_mean=dataset_mean, dataset_std=dataset_std,
    )
    quality = None
    if tc.quality_every_epochs and val_ds is not None:
        from lm2a_tpu.training.quality import QualityMonitor

        quality = QualityMonitor(
            denoiser, cond_proj, schedule, val_ds,
            n_clips=tc.quality_clips, num_steps=tc.quality_steps,
            guidance=tc.quality_guidance, dataset_mean=dataset_mean,
            dataset_std=dataset_std, mesh=mesh, seed=tc.seed,
        )
    lr_fn = make_lr_schedule(tc.lr, tc.lr_decay_steps, tc.lr_decay_factors)

    from lm2a_tpu.core.distributed import barrier, is_primary

    if is_primary():
        logger = TrainLogger(save_dir, use_tensorboard=use_tensorboard)
    else:
        from lm2a_tpu.utils.logging import NullLogger

        logger = NullLogger()
    # rbg: the hardware-friendly generator — all dropout/CFG-mask/diffusion
    # key derivations inside the step inherit it. ~1.1 ms/step cheaper than
    # threefry at flagship scale (scripts/profile_train_levers.py); opt-in
    # because the random STREAM changes (statistically equivalent, but not
    # reproducible against threefry runs)
    rng_impl = None if tc.rng_impl in ("", "threefry") else tc.rng_impl
    root_key = jax.random.key(tc.seed + 1, impl=rng_impl)
    timer = StepTimer(report_every=max(tc.log_interval * 10, 100))

    step = int(state.step)
    pending_loss = None
    last_loss = float("nan")
    stop = False

    def ckpt(epoch):
        # async_write: only the device->host fetch blocks the loop; the
        # CPU-bound archive write + pruning happen on a background thread.
        # Multi-host: state is replicated, so the primary's addressable
        # shards are the whole tree — only it writes; the barrier keeps
        # secondaries from racing ahead into a kill/resume window.
        if is_primary():
            path = save_checkpoint(
                save_dir, state, cfg, epoch=epoch,
                dataset_mean=dataset_mean, dataset_std=dataset_std,
                keep_last=tc.keep_checkpoints, async_write=True,
                fetch_workers=tc.ckpt_fetch_workers,
            )
            print("saved checkpoint:", path)
        barrier("ckpt")

    mh_put = None
    if multihost:
        # each process loads the full seed-identical global batch, keeps
        # the contiguous rows its devices own, and assembles the global
        # sharded array — the DCN data-axis recipe from docs/SCALING.md
        from lm2a_tpu.core.distributed import (
            local_batch_slice,
            put_global_batch,
        )

        _sl = local_batch_slice(mesh, tc.batch_size)

        def mh_put(batch):
            return put_global_batch(
                mesh,
                {k: np.ascontiguousarray(v[_sl]) for k, v in batch.items()},
            )

    k_fuse = max(1, tc.steps_per_call) if multistep is not None else 1
    put_tagged = None
    sb_stream = None
    if k_fuse > 1 and devdata_step is None:
        from lm2a_tpu.data.dataset import SuperbatchStream

        sb_stream = SuperbatchStream(
            ds, tc.batch_size, k_fuse, base_seed=tc.seed,
            total_epochs=tc.epochs, start_epoch=start_epoch,
        )
    if k_fuse > 1:
        # fused mode staging: superbatches (K, B, T, .) shard the SECOND axis
        # over the data mesh; tail single batches shard the first.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from lm2a_tpu.core.mesh import DATA_AXIS, batch_sharding

        bsh = batch_sharding(mesh)
        ksh = NamedSharding(mesh, P(None, DATA_AXIS))

        def put_tagged(item):
            tag, batch = item
            sh = ksh if tag == "multi" else bsh
            return tag, {
                key: jax.device_put(v, sh) for key, v in batch.items()
            }

    # profiler window: start before the dispatch that crosses
    # profile_steps[0], stop after the one that crosses profile_steps[1] —
    # step-range based so the fused (steps_per_call>1) and device-resident
    # paths are traceable too, not just the per-step path
    prof = {"on": False, "done": False}

    def prof_maybe_start(at_step):
        if (profile_dir is not None and not prof["on"] and not prof["done"]
                and at_step >= profile_steps[0]):
            jax.profiler.start_trace(profile_dir)
            prof["on"] = True

    def prof_maybe_stop(at_step, sync):
        if prof["on"] and not prof["done"] and at_step >= profile_steps[1]:
            if sync is not None:
                jax.block_until_ready(sync)
            jax.profiler.stop_trace()
            prof["done"] = True
            print(f"profiler trace written to {profile_dir}")

    epoch = start_epoch
    for epoch in range(start_epoch, tc.epochs):
        t0 = time.time()
        if devdata_step is not None:
            # device-resident path: same shuffle stream as the superbatch
            # iterator (seed + epoch), but only indices leave the host
            n = len(ds)
            order = np.arange(n)
            rng = np.random.default_rng(tc.seed + epoch)
            rng.shuffle(order)
            group = tc.batch_size * k_fuse
            n_groups = n // group
            for g in range(n_groups):
                idx = order[g * group : (g + 1) * group].astype(np.int32)
                idx = idx.reshape(k_fuse, tc.batch_size)
                offsets = np.arange(step, step + k_fuse, dtype=np.int32)
                prof_maybe_start(step)
                state, losses = devdata_step(
                    state, device_data, idx, root_key, offsets
                )
                pending_loss = losses[-1]
                prof_maybe_stop(step + k_fuse, pending_loss)
                if step // tc.log_interval != (step + k_fuse) // tc.log_interval:
                    last_loss = float(jax.device_get(losses[-1]))
                    logger.log_step(epoch, step + k_fuse - 1, last_loss,
                                    float(lr_fn(np.int32(step))))
                step += k_fuse
                timer.tick()
                if (tc.save_interval and step % tc.save_interval < k_fuse
                        and step >= tc.save_interval):
                    ckpt(epoch)
                if max_steps is not None and step >= max_steps:
                    stop = True
                    break
            # tail batches that don't fill a K-group run single-step
            if not stop:
                tail_start = n_groups * group
                bs = tc.batch_size
                for start in range(tail_start, n - bs + 1, bs):
                    batch = ds.gather(order[start : start + bs])
                    step_key = jax.random.fold_in(root_key, step)
                    state, pending_loss = train_step(state, batch, step_key)
                    step += 1
                    if max_steps is not None and step >= max_steps:
                        stop = True
                        break
        elif k_fuse > 1:
            # fast path: k*bs-row native gathers queued in C++ (readahead
            # crosses epoch boundaries), device-prefetched as one
            # host->device transfer per dispatch
            stream = sb_stream.epoch(epoch)
            for tag, batch in device_prefetch(stream, put_fn=put_tagged):
                if tag == "multi":
                    offsets = np.arange(step, step + k_fuse, dtype=np.int32)
                    prof_maybe_start(step)
                    state, losses = multistep(state, batch, root_key, offsets)
                    pending_loss = losses[-1]
                    prof_maybe_stop(step + k_fuse, pending_loss)
                    if step // tc.log_interval != (step + k_fuse) // tc.log_interval:
                        last_loss = float(jax.device_get(losses[-1]))
                        logger.log_step(epoch, step + k_fuse - 1, last_loss,
                                        float(lr_fn(np.int32(step))))
                    step += k_fuse
                    timer.tick()
                    if (tc.save_interval and step % tc.save_interval < k_fuse
                            and step >= tc.save_interval):
                        ckpt(epoch)
                else:  # tail batches that don't fill a K-group
                    step_key = jax.random.fold_in(root_key, step)
                    state, pending_loss = train_step(state, batch, step_key)
                    step += 1
                if max_steps is not None and step >= max_steps:
                    stop = True
                    break
        else:
            it = BatchIterator(ds, tc.batch_size, shuffle=True, seed=tc.seed + epoch)
            for batch in device_prefetch(it, mesh=mesh, put_fn=mh_put):
                prof_maybe_start(step)
                step_key = jax.random.fold_in(root_key, step)
                state, loss = train_step(state, batch, step_key)
                pending_loss = loss  # async: don't block on the device each step
                prof_maybe_stop(step, pending_loss)

                ema_dt = timer.tick()
                if ema_dt is not None:
                    print(f"step time (ema): {ema_dt * 1e3:.2f} ms")
                if step % tc.log_interval == 0:
                    last_loss = float(jax.device_get(pending_loss))
                    logger.log_step(epoch, step, last_loss,
                                    float(lr_fn(np.int32(step))))
                if tc.save_interval and step % tc.save_interval == 0 and step > 0:
                    ckpt(epoch)
                step += 1
                if max_steps is not None and step >= max_steps:
                    stop = True
                    break

        val_loss = None
        ve = tc.validate_every_epochs
        due_val = bool(ve) and (epoch + 1) % ve == 0
        if val_ds is not None and not stop and due_val:
            if devdata_eval is not None:
                bs = tc.batch_size
                n_val = len(val_ds) // bs
                if tc.val_cap_batches:
                    n_val = min(n_val, tc.val_cap_batches)
                if n_val:
                    vidx = np.arange(n_val * bs, dtype=np.int32).reshape(n_val, bs)
                    # same fold_in stream as the streaming path below
                    voff = 10_000_000 + step + np.arange(n_val, dtype=np.int32)
                    vlosses = devdata_eval(
                        state.params, device_val_data, vidx, root_key, voff
                    )
                    val_loss = float(np.mean(jax.device_get(vlosses)))
                    print(f"epoch {epoch} val loss: {val_loss:.6f} "
                          f"({n_val} batches, device-resident)")
            else:
                vlosses = []
                vit = BatchIterator(val_ds, tc.batch_size, shuffle=False)
                for i, vbatch in enumerate(
                        device_prefetch(vit, mesh=mesh, put_fn=mh_put)):
                    if tc.val_cap_batches and i >= tc.val_cap_batches:
                        break
                    vkey = jax.random.fold_in(root_key, 10_000_000 + step + i)
                    vlosses.append(eval_step(state.params, vbatch, vkey))
                if vlosses:
                    val_loss = float(np.mean(jax.device_get(vlosses)))
                    print(f"epoch {epoch} val loss: {val_loss:.6f} ({len(vlosses)} batches)")

        if (quality is not None and not stop
                and (epoch + 1) % tc.quality_every_epochs == 0):
            logger.log_quality(epoch, step, quality.run(state.ema_params))

        if pending_loss is not None:
            last_loss = float(jax.device_get(pending_loss))
        logger.log_epoch(epoch, step, last_loss, val_loss, time.time() - t0)
        if stop:
            break

    if sb_stream is not None:
        # early stop abandons the stream mid-epoch; wait out its queued
        # native gathers so the dataset's FIFO is clean for later users
        sb_stream.drain()
    # final checkpoint records the NEXT epoch so resume doesn't redo the last
    # one (mid-epoch saves keep the current epoch and re-run the partial
    # epoch). Skipped when the epoch loop never ran (resume at/after the
    # configured epoch count): there is nothing new to record, and saving
    # would bump the epoch counter on every no-op rerun.
    if start_epoch < tc.epochs:
        ckpt(epoch if stop else epoch + 1)
    from lm2a_tpu.training.checkpoint import wait_for_pending_save

    wait_for_pending_save()
    logger.close()
    return TrainResult(final_step=step, final_loss=last_loss, ckpt_dir=save_dir)
