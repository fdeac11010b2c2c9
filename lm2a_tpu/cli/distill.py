"""CLI: distill a trained teacher into a few-step DDIM student.

Framework extension (no reference analogue; the reference hard-codes the
1000-step ancestral chain, ``/root/reference/sample.py:144``). Loads a
teacher checkpoint, initializes the student from it, and distills
(``training/distill.py``). The default is ONE direct stage at the final
grid (``start_steps == student_steps``) with eps loss — the round-4
measured winner: distilled-50 beat same-checkpoint DDIM-100 on
mse/ssim/snr (1.353/0.475/-0.19 vs 1.515/0.411/-0.63, DEVNOTES table).
Progressive halving ladders (``--start_steps 2*N`` or more) are still
available but measured WORSE here: every ladder config produced a
+0.5-0.8 sigma output mean bias at the final stage — stage 2's teacher is
the stage-1 student, so its coarse-grid errors compound into the targets.

The resulting checkpoint serves with no flags (sample/serve default to a
distilled checkpoint's own grid at guidance 1.0 — the CFG fold means a
single forward per step)::

    python -m lm2a_tpu.cli sample --ckpt <out>/ckpt_step_N ...
"""

import argparse


def build_parser(p=None):
    p = p or argparse.ArgumentParser(description=__doc__)
    p.add_argument("--teacher", required=True, help="teacher checkpoint dir")
    p.add_argument("--npz_dir", required=True, help="train split (npz or pack dir)")
    p.add_argument("--save_dir", default="distilled")
    p.add_argument("--student_steps", type=int, default=50,
                   help="final student DDIM step count")
    p.add_argument("--start_steps", type=int, default=None,
                   help="first stage's step count. Default: student_steps — "
                        "ONE direct stage at the final grid (the measured "
                        "round-4 winner; halving ladders compound stage-1 "
                        "errors into a mean bias). Pass 2*student_steps for "
                        "the classic halving ladder")
    p.add_argument("--steps_per_stage", type=int, default=600,
                   help="optimizer steps per stage (600 measured best; "
                        "longer x0_snr stages drift toward near-clean-step "
                        "domination, DEVNOTES round-4 table)")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--steps_per_call", type=int, default=25,
                   help="fused optimizer steps per dispatch (packed datasets "
                        "go device-resident and ship only row indices)")
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--guidance", type=float, default=2.1,
                   help="teacher CFG weight folded into the student")
    p.add_argument("--ema_decay", type=float, default=None,
                   help="EMA decay for the student (default: the teacher "
                        "config's). The teacher's 0.999 absorbs only ~45%% "
                        "of a 600-step stage into the served EMA weights; "
                        "short distill stages want a faster decay (e.g. "
                        "0.99 absorbs >99%%)")
    p.add_argument("--loss_schedule", default="eps",
                   help="per-stage distillation loss, comma list or single "
                        "value broadcast: eps (plain eps-MSE — the round-4 "
                        "winner for direct single-stage distillation) | "
                        "x0_snr (truncated-SNR x0 regression) | x0_snr_mm "
                        "(x0_snr + per-sample mean-matching term)")
    p.add_argument("--lr_decay", default="none", choices=["none", "cosine"],
                   help="cosine: decay lr over the WHOLE run (all stages) to "
                        "lr/100 — later stages train at a lower rate, the "
                        "round-3 'lower stage LR' lever without a second knob")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_interval", type=int, default=0,
                   help="also checkpoint every N optimizer steps WITHIN a "
                        "stage (0 = stage-end only). With the axon tunnel's "
                        "sporadic hangs, mid-stage saves bound the loss of a "
                        "kill to one interval instead of one stage")
    p.add_argument("--resume", action="store_true",
                   help="resume from the newest checkpoint in --save_dir "
                        "(exact continuation on the packed/device-data path: "
                        "the batch-index stream is replayed to the saved "
                        "step). All other flags must match the original run")
    return p


def _find_stage_end(save_dir: str, stage_idx: int, steps_per_stage: int):
    """Newest checkpoint that completed ``stage_idx`` (its student is the
    next stage's teacher)."""
    from lm2a_tpu.training.checkpoint import (
        checkpoint_path,
        list_checkpoints,
        load_metadata,
    )

    best = None
    for s in list_checkpoints(save_dir):
        p = checkpoint_path(save_dir, s)
        prog = load_metadata(p).get("distill_progress") or {}
        if (prog.get("stage_idx") == stage_idx
                and prog.get("done_in_stage", 0) >= steps_per_stage):
            best = p
    return best


def main(args=None):
    args = build_parser().parse_args(args)
    if args.start_steps is not None and args.start_steps < args.student_steps:
        # an empty stage ladder would otherwise surface as a cosine-schedule
        # division by zero / unbound checkpoint path (ADVICE r4)
        raise SystemExit(
            f"--start_steps {args.start_steps} must be >= --student_steps "
            f"{args.student_steps} (stages halve from start_steps down to "
            "student_steps)")

    import jax
    import numpy as np

    from lm2a_tpu.core.config import config_from_dict
    from lm2a_tpu.data.dataset import BatchIterator, device_prefetch
    from lm2a_tpu.diffusion.schedule import make_schedule
    from lm2a_tpu.models.factory import build_cond_projection, build_denoiser
    from lm2a_tpu.training.checkpoint import (
        load_metadata,
        restore_checkpoint,
        save_checkpoint,
    )
    from lm2a_tpu.training.distill import (
        make_distill_step,
        stage_guidance_schedule,
    )
    from lm2a_tpu.training.loop import _open_dataset
    from lm2a_tpu.training.train_step import init_train_state, make_optimizer

    meta = load_metadata(args.teacher)
    cfg = config_from_dict(meta["config"])
    cfg = type(cfg)(model=cfg.model, diffusion=cfg.diffusion,
                    train=type(cfg.train)(
                        batch_size=args.batch_size, lr=args.lr,
                        weight_decay=0.0, seed=args.seed,
                        ema_decay=(args.ema_decay if args.ema_decay
                                   is not None else cfg.train.ema_decay),
                        compute_dtype=cfg.train.compute_dtype),
                    data=cfg.data)
    mean = float(meta.get("dataset_mean", 0.0))
    std = float(meta.get("dataset_std", 1.0))

    denoiser = build_denoiser(cfg.model, cfg.train.compute_dtype)
    cond_proj = build_cond_projection(cfg.model, cfg.train.compute_dtype)
    schedule = make_schedule(cfg.diffusion)

    template, tx = init_train_state(denoiser, cond_proj, cfg, jax.random.key(args.seed))
    if args.lr_decay == "cosine":
        import optax

        from lm2a_tpu.training.adan import adan

        n_stages = 0
        _n = args.start_steps or args.student_steps
        while _n >= args.student_steps:
            n_stages += 1
            if _n == args.student_steps:
                break
            _n = max(_n // 2, args.student_steps)
        total = args.steps_per_stage * n_stages
        lr_sched = optax.cosine_decay_schedule(
            args.lr, decay_steps=total, alpha=0.01)
        tx = adan(lr_sched, weight_decay=0.0,
                  grad_clip=cfg.train.grad_clip or 0.0)
    teacher_state, _ = restore_checkpoint(args.teacher, template)
    # teacher = EMA weights (what serving uses); student starts as a copy.
    # Everything goes device-resident ONCE: a host numpy teacher tree passed
    # into the jitted step re-marshals ~GBs per dispatch (measured: a
    # page-fault storm, minutes/step on the 1-core host).
    import jax.numpy as jnp

    teacher_params = jax.device_put(
        jax.tree.map(np.asarray, teacher_state.ema_params))
    jax.block_until_ready(teacher_params)
    state = type(template)(
        step=template.step,
        params=jax.tree.map(jnp.copy, teacher_params),
        ema_params=jax.tree.map(jnp.copy, teacher_params),
        opt_state=tx.init(teacher_params),
    )
    state = jax.device_put(state)
    del teacher_state

    ds = _open_dataset(args.npz_dir, cfg.data.align_mode)
    start = args.start_steps or args.student_steps
    stages = []
    n = start
    while n >= args.student_steps:
        stages.append(n)
        if n == args.student_steps:
            break
        n = max(n // 2, args.student_steps)

    root = jax.random.key(args.seed + 1)
    gstep = 0
    resume_stage, resume_done = 0, 0
    if args.resume:
        from lm2a_tpu.training.checkpoint import latest_checkpoint

        latest = latest_checkpoint(args.save_dir)
        if latest is None:
            print(f"--resume: no checkpoint under {args.save_dir}; "
                  "starting fresh", flush=True)
        else:
            rmeta = load_metadata(latest)
            prog = rmeta.get("distill_progress")
            if not prog:
                raise SystemExit(
                    f"--resume: {latest} carries no distill_progress "
                    "metadata (pre-resume checkpoint); start a fresh "
                    "--save_dir instead")
            if prog.get("stages") != stages:
                raise SystemExit(
                    f"--resume: checkpoint stages {prog.get('stages')} != "
                    f"requested {stages}; flags must match the original run")
            state, _ = restore_checkpoint(latest, template)
            state = jax.device_put(state)
            jax.block_until_ready(state)
            resume_stage = int(prog["stage_idx"])
            resume_done = int(prog["done_in_stage"])
            gstep = int(prog["gstep"])
            if resume_done >= args.steps_per_stage:  # stage finished: next
                resume_stage += 1
                resume_done = 0
                # the restored student IS the completed stage; it becomes
                # the next stage's teacher
                teacher_params = jax.tree.map(jnp.copy, state.ema_params)
            elif resume_stage > 0:
                prev = _find_stage_end(args.save_dir, resume_stage - 1,
                                       args.steps_per_stage)
                if prev is None:
                    raise SystemExit(
                        f"--resume: stage {resume_stage - 1} end checkpoint "
                        f"not found under {args.save_dir} (needed as the "
                        "resumed stage's teacher)")
                tstate, _ = restore_checkpoint(prev, template)
                teacher_params = jax.device_put(
                    jax.tree.map(np.asarray, tstate.ema_params))
                del tstate
            jax.block_until_ready(teacher_params)
            print(f"resumed {latest}: stage {resume_stage} "
                  f"step {resume_done}/{args.steps_per_stage} "
                  f"(gstep {gstep})", flush=True)
            if resume_stage >= len(stages):
                print("distillation already complete:", latest)
                return
    k_fuse = max(1, args.steps_per_call)
    device_data = None
    if k_fuse > 1 and hasattr(ds, "mel"):
        nbytes = sum(
            np.asarray(getattr(ds, k)).nbytes
            for k in ("mel", "motion", "lyrics"))
        print(f"uploading dataset to device ({nbytes / 1e9:.2f} GB) ...",
              flush=True)
        device_data = {
            k: jax.device_put(np.ascontiguousarray(getattr(ds, k)))
            for k in ("mel", "motion", "lyrics")
        }
        jax.block_until_ready(device_data)

    # If the teacher is itself a distilled student, its eps is ALREADY
    # CFG-folded: every stage here must use w=1.0, and the saved metadata
    # keeps the ORIGINAL folded weight so serving/eval report it correctly.
    teacher_folded = float(meta.get("folded_guidance", 0.0) or 0.0)
    if teacher_folded > 0.0:
        if args.guidance != 1.0:
            print(f"teacher already carries folded guidance "
                  f"{teacher_folded}; ignoring --guidance {args.guidance}",
                  flush=True)
        effective_fold = teacher_folded
        stage_gw = [1.0] * len(stages)
    else:
        effective_fold = args.guidance
        stage_gw = stage_guidance_schedule(len(stages), args.guidance)
    losses_by_stage = [s.strip() for s in args.loss_schedule.split(",")]
    for s in losses_by_stage:
        if s not in ("x0_snr", "x0_snr_mm", "eps"):
            raise SystemExit(f"unknown --loss_schedule entry {s!r}")
    if len(losses_by_stage) == 1:
        losses_by_stage = losses_by_stage * len(stages)
    if len(losses_by_stage) != len(stages):
        raise SystemExit(
            f"--loss_schedule has {len(losses_by_stage)} entries for "
            f"{len(stages)} stages {stages}")

    path = None
    for stage_idx, (stage_n, stage_guidance, stage_loss) in enumerate(
            zip(stages, stage_gw, losses_by_stage)):
        if stage_idx < resume_stage:
            continue
        done = resume_done if stage_idx == resume_stage else 0
        resume_done = 0

        def _save(progress_done, stage_n=stage_n, stage_idx=stage_idx):
            return save_checkpoint(
                args.save_dir, state, cfg, epoch=0, dataset_mean=mean,
                dataset_std=std,
                extra={"distilled_steps": stage_n,
                       "folded_guidance": effective_fold,
                       "teacher": args.teacher,
                       "distill_progress": {
                           "stage_idx": stage_idx,
                           "done_in_stage": int(progress_done),
                           "gstep": int(gstep),
                           "stages": stages,
                       }},
            )

        print(f"stage: student_steps={stage_n}, {args.steps_per_stage} steps,"
              f" teacher guidance {stage_guidance}, loss {stage_loss}",
              flush=True)
        last_save = done
        if device_data is not None:
            from lm2a_tpu.training.distill import (
                make_device_data_multistep_distill,
            )

            multi_fn = make_device_data_multistep_distill(
                denoiser, cond_proj, schedule, cfg, tx,
                num_student_steps=stage_n, dataset_mean=mean,
                dataset_std=std, guidance_weight=stage_guidance,
                loss_space=stage_loss,
            )
            n = len(ds)
            b = cfg.train.batch_size
            rng = np.random.default_rng(args.seed + stage_n)
            # resume: replay the stage's draw sequence up to `done` so the
            # index stream continues exactly where the killed run stopped
            # (saves land on multi_fn boundaries, so the k's line up)
            _d = 0
            while _d < done:
                k = min(k_fuse, args.steps_per_stage - _d)
                rng.integers(0, n, size=(k, b))
                _d += k
            while done < args.steps_per_stage:
                k = min(k_fuse, args.steps_per_stage - done)
                idx = rng.integers(0, n, size=(k, b)).astype(np.int32)
                offsets = np.arange(gstep, gstep + k, dtype=np.int32)
                state, losses = multi_fn(state, teacher_params, device_data,
                                         idx, root, offsets)
                gstep += k
                done += k
                print(f"  [{stage_n}] step {done}/{args.steps_per_stage} "
                      f"loss {float(jax.device_get(losses)[-1]):.6f}",
                      flush=True)
                if (args.save_interval and done < args.steps_per_stage
                        and done - last_save >= args.save_interval):
                    last_save = done
                    print(f"  [{stage_n}] mid-stage checkpoint:"
                          f" {_save(done)}", flush=True)
        else:
            step_fn = make_distill_step(
                denoiser, cond_proj, schedule, cfg, tx,
                num_student_steps=stage_n, dataset_mean=mean,
                dataset_std=std, guidance_weight=stage_guidance,
                loss_space=stage_loss,
            )
            while done < args.steps_per_stage:
                it = BatchIterator(ds, cfg.train.batch_size, shuffle=True,
                                   seed=args.seed + gstep)
                for batch in device_prefetch(it):
                    key = jax.random.fold_in(root, gstep)
                    state, loss = step_fn(state, teacher_params, batch, key)
                    gstep += 1
                    done += 1
                    if done % 100 == 0 or done == args.steps_per_stage:
                        print(f"  [{stage_n}] step {done}/"
                              f"{args.steps_per_stage} loss "
                              f"{float(jax.device_get(loss)):.6f}", flush=True)
                    if (args.save_interval and done < args.steps_per_stage
                            and done - last_save >= args.save_interval):
                        last_save = done
                        print(f"  [{stage_n}] mid-stage checkpoint:"
                              f" {_save(done)}", flush=True)
                    if done >= args.steps_per_stage:
                        break
        # the next stage's teacher is this stage's student (EMA); a
        # device-side copy so donating `state` can't alias the teacher
        teacher_params = jax.tree.map(jnp.copy, state.ema_params)
        jax.block_until_ready(teacher_params)
        path = _save(args.steps_per_stage)
        print(f"stage {stage_n} checkpoint: {path}")
    print("distillation done:", path)


if __name__ == "__main__":
    main()
