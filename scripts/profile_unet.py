#!/usr/bin/env python3
"""Microbenchmark the flagship UNet forward under a chained lax.scan.

A chained scan (x -> fwd(x)) forces truly sequential execution, which is the
honest per-step cost on this tunnel-attached device (independent dispatches
can overlap/batch). Usage: ``python scripts/profile_unet.py [config ...]``
with configs from: flagship, nocond, heads4, nomid, base128.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lm2a_tpu.core.config import ModelConfig  # noqa: E402
from lm2a_tpu.models.factory import build_denoiser  # noqa: E402

B, T = 2, 516
CONFIGS = {
    "flagship": (ModelConfig(), True),
    "fusedres": (ModelConfig(fused_resblock=True), True),
    "nocond": (ModelConfig(), False),
    "heads4": (ModelConfig(attn_heads=4), True),
    "nomid": (ModelConfig(mid_blocks=0), True),
    "base128": (ModelConfig(base_dim=128), True),
}


def bench(name: str, steps: int = int(os.environ.get("PROFILE_STEPS", "30"))):
    cfg, cond = CONFIGS[name]
    den = build_denoiser(cfg, "bfloat16")
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (B, T, 80), jnp.float32)
    tt = jnp.full((B,), 500, jnp.int32)
    m = jax.random.normal(key, (B, T, cfg.cond_dim), jnp.float32) if cond else None
    l = jax.random.normal(key, (B, T, cfg.cond_dim), jnp.float32) if cond else None
    params = jax.jit(den.init)(key, x0, tt, m, l)

    @jax.jit
    def chained(params, x):
        def step(h, _):
            out = den.apply(params, h, tt, m, l)
            return out.astype(h.dtype), None

        return jax.lax.scan(step, x, None, length=steps)[0]

    o = chained(params, x0)
    o.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = chained(params, x0)
        o.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / steps)
    print(f"{name:12s} {best * 1e3:7.3f} ms/forward (B={B}, T={T})")
    return best


if __name__ == "__main__":
    names = sys.argv[1:] or ["flagship", "nocond"]
    for n in names:
        bench(n)
