#!/usr/bin/env python3
"""Training-throughput frontier: bs x steps_per_call sweep on the real chip.

Round-4 VERDICT #3: the optimizer+EMA tail (~18.7 ms at bs16 after the
bf16-moments win) is batch-size-invariant, so larger batches amortize it
directly — the cheapest MFU lever never measured. This sweep runs the
PRODUCTION device-data multistep path (`make_device_data_multistep`, the
config any real training run here uses per DEVNOTES) at bs in {16, 32, 64}
and reports ms/step, trained mel frames/s/chip, and effective MFU
(fwd+bwd FLOPs from XLA cost analysis of the unfused step at that bs,
over the measured full-step time).

Measurement discipline (DEVNOTES): one fused K-step chain per timed region,
ended with a value fetch; distinct base keys per rep so the relay can't
dedupe; first-rep numbers discarded (fresh-executable trap); best of the
remaining reps.

Usage: profile_train_frontier.py [--bs 16,32,64] [--k 50] [--reps 3]
       [--t 516]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bs", default="16,32,64")
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--t", type=int, default=516)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n_data", type=int, default=256,
                    help="device-resident dataset rows (gathered per step)")
    ap.add_argument("--opt_dtype", default="bfloat16",
                    help="production default (DEVNOTES: 36.2 vs 39.2 ms)")
    args = ap.parse_args()

    from lm2a_tpu.core.config import (
        DiffusionConfig,
        LM2AConfig,
        ModelConfig,
        TrainConfig,
    )
    from lm2a_tpu.diffusion.schedule import make_schedule
    from lm2a_tpu.models.factory import build_cond_projection, build_denoiser
    from lm2a_tpu.training.train_step import (
        _train_loss_builder,
        init_train_state,
        make_device_data_multistep,
        make_optimizer,
    )
    from lm2a_tpu.utils.profiling import compiled_flops, device_peak_flops

    dev = jax.devices()[0]
    peak = device_peak_flops(dev)
    print(f"device {dev.device_kind}, peak {peak:.3g} FLOP/s", file=sys.stderr)

    T = args.t
    rng = np.random.default_rng(0)
    data = {
        "mel": jax.device_put(
            rng.normal(size=(args.n_data, T, 80)).astype(np.float32)),
        "motion": jax.device_put(
            rng.normal(size=(args.n_data, T, 234)).astype(np.float32)),
        "lyrics": jax.device_put(
            rng.normal(size=(args.n_data, T, 768)).astype(np.float32)),
    }
    jax.block_until_ready(data)

    rows = []
    for bs in [int(b) for b in args.bs.split(",")]:
        cfg = LM2AConfig(
            model=ModelConfig(),
            diffusion=DiffusionConfig(),
            train=TrainConfig(batch_size=bs, opt_dtype=args.opt_dtype,
                              steps_per_call=args.k),
        )
        denoiser = build_denoiser(cfg.model, cfg.train.compute_dtype)
        cond_proj = build_cond_projection(cfg.model, cfg.train.compute_dtype)
        schedule = make_schedule(cfg.diffusion)
        state, tx = init_train_state(denoiser, cond_proj, cfg,
                                     jax.random.key(0), seq_len=T)
        multi = make_device_data_multistep(
            denoiser, cond_proj, schedule, cfg, tx)

        # fwd+bwd FLOPs of ONE step at this bs (cost analysis on the value-
        # and-grad of the loss; optimizer/EMA FLOPs are negligible and XLA's
        # counting of them is unreliable). "Effective MFU" = these FLOPs over
        # the FULL measured step time — the number that says how much of the
        # chip the whole training loop converts into model FLOPs.
        loss_fn = _train_loss_builder(denoiser, cond_proj, schedule, cfg,
                                      0.0, 1.0)
        vg = jax.jit(lambda p, b, k: jax.value_and_grad(loss_fn)(p, b, k))
        batch_avals = {
            k: jax.ShapeDtypeStruct((bs,) + v.shape[1:], v.dtype)
            for k, v in data.items()
        }
        step_flops = compiled_flops(vg, state.params, batch_avals,
                                    jax.random.key(1))

        idx = rng.integers(0, args.n_data, size=(args.k, bs)).astype(np.int32)
        offsets = np.arange(args.k, dtype=np.int32)
        # warm/compile
        t0 = time.perf_counter()
        state, losses = multi(state, data, jax.device_put(idx),
                              jax.random.key(2), jax.device_put(offsets))
        float(jnp.abs(losses).sum())
        print(f"bs{bs}: compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

        times = []
        for rep in range(args.reps):
            idx = rng.integers(0, args.n_data,
                               size=(args.k, bs)).astype(np.int32)
            t0 = time.perf_counter()
            state, losses = multi(state, data, jax.device_put(idx),
                                  jax.random.key(10 + rep),
                                  jax.device_put(offsets))
            float(jnp.abs(losses).sum())
            times.append(time.perf_counter() - t0)
        best = min(times[1:]) if len(times) > 1 else times[0]
        ms_step = best / args.k * 1e3
        frames = bs * T / (best / args.k)
        mfu = step_flops / (best / args.k) / peak if step_flops and peak else None
        row = {"bs": bs, "k": args.k, "ms_per_step": round(ms_step, 2),
               "frames_per_sec": round(frames),
               "fwdbwd_flops": step_flops,
               "eff_mfu": round(mfu, 4) if mfu else None,
               "times": [round(t / args.k * 1e3, 2) for t in times]}
        rows.append(row)
        print(f"bs{bs}: {ms_step:.1f} ms/step, {frames:,.0f} frames/s, "
              f"eff MFU {mfu:.1%} (times {row['times']} ms)", file=sys.stderr)

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
