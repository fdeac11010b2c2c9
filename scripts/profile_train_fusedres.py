"""A/B: training step with fused Pallas resblock fwd+bwd vs plain XLA.

Measures the flagship train step (bs16, T=516, bf16, fwd+bwd+Adan+EMA) as a
K-step fused lax.scan chain on device-resident synthetic data — the exact
production dispatch shape (`make_device_data_multistep`). Chained scans are
the only honest timing through the axon tunnel (DEVNOTES.md).

Usage: python scripts/profile_train_fusedres.py [K] [reps]
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from lm2a_tpu.core.config import LM2AConfig  # noqa: E402
from lm2a_tpu.diffusion.schedule import make_schedule  # noqa: E402
from lm2a_tpu.models.factory import build_cond_projection, build_denoiser  # noqa: E402
from lm2a_tpu.training.train_step import (  # noqa: E402
    init_train_state,
    make_device_data_multistep,
)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 50
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
B, T, N = 16, 516, 64


def build(fused_grad: bool):
    cfg = LM2AConfig()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, fused_resblock_grad=fused_grad)
    )
    denoiser = build_denoiser(cfg.model, cfg.train.compute_dtype)
    cond_proj = build_cond_projection(cfg.model, cfg.train.compute_dtype)
    schedule = make_schedule(cfg.diffusion)
    state, tx = init_train_state(denoiser, cond_proj, cfg, jax.random.PRNGKey(0))
    fn = make_device_data_multistep(denoiser, cond_proj, schedule, cfg, tx)
    return cfg, state, fn


def synth_data(key):
    km, ko, kl = jax.random.split(key, 3)
    return {
        "mel": jax.random.normal(km, (N, T, 80), jnp.float32),
        "motion": jax.random.normal(ko, (N, T, 234), jnp.float32),
        "lyrics": jax.random.normal(kl, (N, T, 768), jnp.float32),
    }


def run(fused_grad: bool):
    cfg, state, fn = build(fused_grad)
    data = synth_data(jax.random.PRNGKey(1))
    idx = jax.random.randint(jax.random.PRNGKey(2), (K, B), 0, N)
    offsets = jnp.arange(K, dtype=jnp.int32)
    # warm up / compile (distinct key so the relay can't dedupe across A/B)
    base = jax.random.PRNGKey(100 + int(fused_grad))
    t0 = time.perf_counter()
    state, losses = fn(state, data, idx, base, offsets)
    losses.block_until_ready()
    print(f"fused_grad={fused_grad}: compile+first {time.perf_counter()-t0:.1f}s "
          f"loss[0]={float(losses[0]):.4f}", file=sys.stderr)
    times = []
    for r in range(REPS):
        key = jax.random.PRNGKey(1000 * (1 + int(fused_grad)) + r)
        t0 = time.perf_counter()
        state, losses = fn(state, data, idx, key, offsets + (r + 1) * K)
        losses.block_until_ready()
        times.append(time.perf_counter() - t0)
    ms = sorted(times)[len(times) // 2] / K * 1e3
    print(f"fused_grad={fused_grad}: {ms:.2f} ms/step (median of {REPS} "
          f"chains of K={K})", file=sys.stderr)
    return ms


def main():
    print(f"platform={jax.devices()[0].platform} K={K}", file=sys.stderr)
    xla = run(False)
    fused = run(True)
    print(f"XLA {xla:.2f} ms/step | fused-res-grad {fused:.2f} ms/step | "
          f"speedup {xla / fused:.3f}x")


if __name__ == "__main__":
    main()
