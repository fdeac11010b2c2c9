#!/usr/bin/env python3
"""A/B the streaming flash-attention kernel at long sequence lengths.

The flagship UNet's cross-attention has S == T (per-frame conditions), so
single-pass full-song generation (minutes of mel frames; ``parallel/
sequence.py``, SURVEY §5.7) scales the score matrix quadratically: at
T=4096 the XLA path materializes 9 sites x 2 branches of (B, 4, T', S')
probabilities in HBM, while the Pallas streaming kernel
(``ops/pallas_attention.py``) keeps them in VMEM with an online softmax.

Chained-scan protocol (DEVNOTES measurement discipline): the UNet forward
is iterated inside one lax.scan with a data dependency, distinct PRNG
inputs per variant. Usage::

    python scripts/profile_longform_attention.py [T ...]   # default 2048 4096
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

B = 1


def bench(t_len: int, fused: bool, steps: int = 10) -> float:
    cfg = ModelConfig(fused_attention=fused)
    den = build_denoiser(cfg, "bfloat16")
    key = jax.random.key(17 + t_len + fused)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, (B, t_len, 80), jnp.float32)
    tt = jnp.full((B,), 500, jnp.int32)
    m = jax.random.normal(k2, (B, t_len, cfg.cond_dim), jnp.float32)
    l = jax.random.normal(k3, (B, t_len, cfg.cond_dim), jnp.float32)
    params = jax.jit(den.init)(jax.random.key(0), x0, tt, m, l)
    jax.block_until_ready(params)

    @jax.jit
    def chained(params, x):
        def step(h, _):
            out = den.apply(params, h, tt, m, l)
            return out.astype(h.dtype), None

        h, _ = jax.lax.scan(step, x, None, length=steps)
        return h

    t0 = time.perf_counter()
    out = chained(params, x0)
    out.block_until_ready()
    print(f"  T={t_len} fused={fused}: compile+first {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    best = float("inf")
    for i in range(3):
        xi = jax.random.normal(jax.random.key(100 + i), x0.shape, jnp.float32)
        t0 = time.perf_counter()
        out = chained(params, xi)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def main():
    lens = [int(a) for a in sys.argv[1:]] or [2048, 4096]
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    for t_len in lens:
        res = {}
        for fused in (False, True):
            try:
                res[fused] = bench(t_len, fused=fused)
            except Exception as e:  # e.g. XLA path OOMs at very long T
                print(f"  T={t_len} fused={fused}: FAILED "
                      f"({type(e).__name__}: {str(e)[:200]})",
                      file=sys.stderr, flush=True)
                res[fused] = None
        xla, pal = res[False], res[True]
        fmt = lambda v: f"{v*1e3:.2f} ms/fwd" if v else "FAILED"
        ratio = f"speedup {xla/pal:.2f}x" if xla and pal else ""
        print(f"T={t_len}: XLA {fmt(xla)}  pallas-streaming {fmt(pal)}  "
              f"{ratio}", flush=True)


if __name__ == "__main__":
    main()
