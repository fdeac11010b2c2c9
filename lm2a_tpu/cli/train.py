"""CLI: train the diffusion model.

Contract parity with ``/root/reference/train.py:273-306`` (same flags and
defaults: bs 16, lr 2e-4, wd 1e-4, 500 epochs, T 1000, cond 128, base 256,
mults 1,2,4, time-emb 256, EMA 0.999, grad-clip 1.0, optional step-decay
lists), with the deliberate upgrades: ``--resume`` actually resumes (the
reference ignored ``--ckpt``), ``--arch`` selects ultimate/v1, and mixed
precision is bf16 (``--amp`` kept as an accepted no-op alias for drop-in
script compatibility).
"""

import argparse


def build_parser(p=None):
    p = p or argparse.ArgumentParser(description=__doc__)
    p.add_argument("--npz_dir", required=True, help="train split npz dir (or pack dir)")
    p.add_argument("--val_npz_dir", default=None)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--save_dir", default="checkpoints")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in save_dir")
    p.add_argument("--save_interval", type=int, default=1000)
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--cond_dim", type=int, default=128)
    p.add_argument("--base_dim", type=int, default=256)
    p.add_argument("--dim_mults", default="1,2,4")
    p.add_argument("--time_emb_dim", type=int, default=256)
    p.add_argument("--num_res_blocks", type=int, default=2)
    p.add_argument("--mid_blocks", type=int, default=3)
    p.add_argument("--attn_heads", type=int, default=8)
    p.add_argument("--arch", default="ultimate", choices=["ultimate", "v1"])
    p.add_argument("--dataset_mean", type=float, default=None)
    p.add_argument("--dataset_std", type=float, default=None)
    p.add_argument("--val_cap_batches", type=int, default=20)
    p.add_argument("--validate_every_epochs", type=float, default=0.5,
                   help="validate when (epoch+1) %% N == 0; the reference "
                        "default 0.5 means every epoch")
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--cond_drop_prob", type=float, default=0.2)
    p.add_argument("--lr_decay_steps", type=str, default="")
    p.add_argument("--lr_decay_factors", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--opt_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="storage dtype of the Adan moment trees (math stays "
                        "fp32); bfloat16 halves optimizer HBM traffic on the "
                        "bandwidth-bound fused step")
    p.add_argument("--rng", dest="rng_impl", default="threefry",
                   choices=["threefry", "rbg"],
                   help="PRNG for the training key stream; rbg is the TPU "
                        "hardware generator (~3%% faster steps, different "
                        "random stream)")
    p.add_argument("--fused_opt", type=int, default=1, choices=[0, 1],
                   help="fold grad-clip into Adan's kernels (bit-identical "
                        "math, one less gradient-tree pass per step). 0 = "
                        "chained clip+Adan (round-1 opt-state layout; "
                        "required to resume checkpoints written with 0)")
    p.add_argument("--opt_backend", default="xla",
                   choices=["xla", "pallas"],
                   help="optimizer+EMA update kernels: 'pallas' runs the "
                        "bucketed multi-ref fused update (many leaves per "
                        "kernel launch; same math and state layout)")
    p.add_argument("--opt_big_backend", default="pallas",
                   choices=["pallas", "xla"],
                   help="kernel for leaves too big to bucket when "
                        "--opt_backend pallas")
    p.add_argument("--amp", action="store_true",
                   help="accepted for reference-script compatibility "
                        "(bf16 is the TPU mixed-precision default)")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="fuse K optimizer steps into one dispatch (lax.scan)")
    p.add_argument("--keep_checkpoints", type=int, default=0,
                   help="prune to newest N checkpoints (0 = keep all)")
    p.add_argument("--ckpt_fetch_workers", type=int, default=0,
                   help="concurrent device->host transfers per checkpoint "
                        "save (<=1 = one batched fetch); wins only where "
                        "transfer streams parallelize (not this relay)")
    p.add_argument("--device_data", action="store_true",
                   help="upload the packed dataset to device memory once and "
                        "dispatch only batch indices (needs steps_per_call>1)")
    p.add_argument("--fused_resblock_grad", action="store_true",
                   help="route fitting residual blocks through the fused "
                        "Pallas forward+backward kernels during training "
                        "(ops/pallas_resblock.py)")
    p.add_argument("--max_steps", type=int, default=None, help="debug cap")
    p.add_argument("--no_tensorboard", action="store_true")
    p.add_argument("--quality_every_epochs", type=int, default=0,
                   help="every N epochs, DDIM-generate fixed val clips from "
                        "the EMA weights and log mel metrics (0 = off)")
    p.add_argument("--quality_clips", type=int, default=4)
    p.add_argument("--quality_steps", type=int, default=50)
    p.add_argument("--quality_guidance", type=float, default=2.1)
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port "
                        "(or LM2A_COORDINATOR env); enables "
                        "jax.distributed.initialize")
    p.add_argument("--num_processes", type=int, default=None,
                   help="multi-host: total process count")
    p.add_argument("--process_id", type=int, default=None,
                   help="multi-host: this process's id")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="model-axis size of the mesh (tensor/sequence "
                        "parallel width); must divide the local device "
                        "count on multi-host runs")
    return p


def config_from_args(args):
    from lm2a_tpu.core.config import (
        DiffusionConfig,
        LM2AConfig,
        ModelConfig,
        TrainConfig,
    )

    decay_steps = tuple(map(int, args.lr_decay_steps.split(","))) \
        if args.lr_decay_steps.strip() else ()
    decay_factors = tuple(map(float, args.lr_decay_factors.split(","))) \
        if args.lr_decay_factors.strip() else ()
    return LM2AConfig(
        model=ModelConfig(
            arch=args.arch,
            base_dim=args.base_dim,
            dim_mults=tuple(map(int, args.dim_mults.split(","))),
            cond_dim=args.cond_dim,
            time_emb_dim=args.time_emb_dim,
            num_res_blocks=args.num_res_blocks,
            mid_blocks=args.mid_blocks,
            attn_heads=args.attn_heads,
            fused_resblock_grad=args.fused_resblock_grad,
        ),
        diffusion=DiffusionConfig(timesteps=args.timesteps),
        train=TrainConfig(
            batch_size=args.batch_size,
            lr=args.lr,
            weight_decay=args.weight_decay,
            epochs=args.epochs,
            ema_decay=args.ema_decay,
            grad_clip=args.grad_clip,
            cond_drop_prob=args.cond_drop_prob,
            save_interval=args.save_interval,
            log_interval=args.log_interval,
            val_cap_batches=args.val_cap_batches,
            validate_every_epochs=args.validate_every_epochs,
            seed=args.seed,
            lr_decay_steps=decay_steps,
            lr_decay_factors=decay_factors,
            compute_dtype=args.compute_dtype,
            opt_dtype=args.opt_dtype,
            rng_impl=args.rng_impl,
            fused_opt=bool(args.fused_opt),
            opt_backend=args.opt_backend,
            opt_big_backend=args.opt_big_backend,
            steps_per_call=args.steps_per_call,
            keep_checkpoints=args.keep_checkpoints,
            ckpt_fetch_workers=args.ckpt_fetch_workers,
            device_data=args.device_data,
            quality_every_epochs=args.quality_every_epochs,
            quality_clips=args.quality_clips,
            quality_steps=args.quality_steps,
            quality_guidance=args.quality_guidance,
        ),
    )


def main(args=None):
    args = build_parser().parse_args(args)
    cfg = config_from_args(args)
    # join the multi-process runtime BEFORE any jax device use
    from lm2a_tpu.core.distributed import init_distributed, make_hybrid_mesh

    distributed = init_distributed(
        args.coordinator, args.num_processes, args.process_id
    )
    from lm2a_tpu.training import train

    import jax

    if distributed:
        print(f"process {jax.process_index()}/{jax.process_count()}: "
              f"{jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")
    mesh = (
        make_hybrid_mesh(model=args.model_parallel)
        if distributed or args.model_parallel > 1
        else None
    )
    print("train config:", cfg)
    res = train(
        cfg, args.npz_dir, args.save_dir,
        val_npz_dir=args.val_npz_dir,
        dataset_mean=args.dataset_mean, dataset_std=args.dataset_std,
        resume=args.resume, max_steps=args.max_steps,
        use_tensorboard=not args.no_tensorboard,
        mesh=mesh,
    )
    print(f"training done: step={res.final_step} loss={res.final_loss:.6f} "
          f"checkpoints in {res.ckpt_dir}")


if __name__ == "__main__":
    main()
