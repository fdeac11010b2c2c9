#!/usr/bin/env python3
"""Serving-batch frontier: B in {1, 8, 16, 32} sampling chains on the chip.

Round-4 VERDICT #4: the serving-batch frontier stopped at B=8 (926
frames/s/chip, 69.4% MFU) with B=16/32 never measured — if frames/s/chip
keeps climbing, the throughput headline is understated; if it collapses
(HBM pressure from the (2B, T, C) CFG activations), that cliff belongs on
record. Runs the SAME sampler configuration as bench.py (folded attention,
fused-resblock gate applies automatically at <=2 rows only) for DDPM-1000
and DDIM-50 chains per batch size; reports s/chain, mel frames/s/chip, MFU
(executed-FLOP accounting on the unfused forward, like bench.py).

Discipline: value-fetch sync, distinct keys per rep, first rep discarded.

Usage: profile_serving_frontier.py [--batches 1,8,16,32] [--reps 3]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", default="1,8,16,32")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--methods", default="ddpm1000,ddim50")
    args = ap.parse_args()

    from lm2a_tpu.core.config import DiffusionConfig, ModelConfig
    from lm2a_tpu.diffusion import make_sampler, make_schedule
    from lm2a_tpu.models.factory import build_denoiser
    from lm2a_tpu.utils.profiling import compiled_flops, device_peak_flops

    dev = jax.devices()[0]
    peak = device_peak_flops(dev)
    print(f"device {dev.device_kind}", file=sys.stderr)

    T, guidance = 516, 2.1
    cfg = ModelConfig(fused_resblock=True, folded_attention=True)
    denoiser = build_denoiser(cfg, "bfloat16")
    schedule = make_schedule(DiffusionConfig(timesteps=1000))
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    motion1 = jax.random.normal(k1, (1, T, cfg.cond_dim), jnp.float32)
    text1 = jax.random.normal(k2, (1, T, cfg.cond_dim), jnp.float32)
    params = jax.jit(denoiser.init)(
        k3, jnp.zeros((1, T, cfg.in_dim)), jnp.zeros((1,), jnp.int32),
        motion1, text1)
    jax.block_until_ready(params)

    # FLOP counting on the unfused forward (cost analysis can't see inside
    # Pallas kernels; identical math)
    denoiser_count = build_denoiser(
        dataclasses.replace(cfg, fused_resblock=False), "bfloat16")

    methods = args.methods.split(",")
    rows = []
    for b in [int(x) for x in args.batches.split(",")]:
        mf = jnp.broadcast_to(motion1, (b, T, cfg.cond_dim))
        tf = jnp.broadcast_to(text1, (b, T, cfg.cond_dim))
        fwd = jax.jit(lambda p, x, t, m, l: denoiser_count.apply(
            p, x, t, m, l, uncond_rows=b))
        step_flops = compiled_flops(
            fwd, params,
            jax.ShapeDtypeStruct((2 * b, T, cfg.in_dim), jnp.float32),
            jax.ShapeDtypeStruct((2 * b,), jnp.int32),
            jax.ShapeDtypeStruct((2 * b, T, cfg.cond_dim), jnp.float32),
            jax.ShapeDtypeStruct((2 * b, T, cfg.cond_dim), jnp.float32),
        )
        for mth in methods:
            if mth == "ddpm1000":
                sampler = make_sampler(
                    denoiser.apply, schedule, guidance_weight=guidance,
                    uncond_fast=True)
                nsteps = 1000
            elif mth == "ddim50":
                sampler = make_sampler(
                    denoiser.apply, schedule, guidance_weight=guidance,
                    uncond_fast=True, method="ddim", num_steps=50)
                nsteps = 50
            else:
                raise SystemExit(f"unknown method {mth}")
            shape = (b, T, cfg.in_dim)
            try:
                t0 = time.perf_counter()
                out = sampler(params, jax.random.key(100 + b), shape, mf, tf)
                float(jnp.abs(out).sum())
                print(f"B={b} {mth}: compile+first "
                      f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
                times = []
                for rep in range(args.reps):
                    t0 = time.perf_counter()
                    out = sampler(params,
                                  jax.random.key(200 + 10 * b + rep),
                                  shape, mf, tf)
                    float(jnp.abs(out).sum())
                    times.append(time.perf_counter() - t0)
                best = min(times[1:]) if len(times) > 1 else times[0]
            except Exception as e:
                rows.append({"b": b, "method": mth,
                             "error": f"{type(e).__name__}: {e}"})
                print(f"B={b} {mth}: FAILED {type(e).__name__}: {e}",
                      file=sys.stderr)
                continue
            frames = b * T / best
            mfu = (step_flops * nsteps / best / peak
                   if step_flops and peak else None)
            row = {"b": b, "method": mth, "s_per_chain": round(best, 3),
                   "frames_per_sec": round(frames, 1),
                   "mfu": round(mfu, 4) if mfu else None,
                   "times": [round(t, 3) for t in times]}
            rows.append(row)
            print(f"B={b} {mth}: {best:.3f} s/chain, {frames:,.0f} "
                  f"frames/s/chip, MFU {mfu:.1%} times={row['times']}",
                  file=sys.stderr)

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
