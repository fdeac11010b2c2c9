"""Ablation breakdown of the serving CFG step (chained, real TPU).

Each row: the flagship denoiser forward exactly as the uncond_fast sampler
runs it — 2 rows (cond + folded-uncond) — chained under lax.scan.

Measured round 2 (PROFILE_STEPS=1000, v5e):

    full (fused, fold)              0.788 ms/step
    + folded attention              0.698 ms/step
    no uncond fold                  0.975 ms/step
    unfused resblock                0.846 ms/step
    no conditions (no attn)         0.467 ms/step
    mid_blocks=0                    0.586 ms/step
    pallas attention                0.818 ms/step
    attention+cond share: 0.322 ms (41% of step)

With the cond K/V projections hoisted by XLA (scripts/audit_sampler_licm.py)
that 41% is Q projections, score/AV einsums, softmax, and out/fuse
projections across the 9 attention sites.
"""
import os
import sys
import time
import dataclasses as dc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lm2a_tpu.core.config import ModelConfig  # noqa: E402
from lm2a_tpu.models.factory import build_denoiser  # noqa: E402

T = 516
STEPS = int(os.environ.get("PROFILE_STEPS", "100"))


def bench(name, cfg, cond=True, uncond_rows=1, rows=2):
    den = build_denoiser(cfg, "bfloat16")
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (rows, T, 80), jnp.float32)
    tt = jnp.full((rows,), 500, jnp.int32)
    m = jax.random.normal(key, (rows, T, cfg.cond_dim), jnp.float32) if cond else None
    l = jax.random.normal(key, (rows, T, cfg.cond_dim), jnp.float32) if cond else None
    ur = uncond_rows if cond else 0
    params = jax.jit(den.init)(key, x0, tt, m, l)

    @jax.jit
    def chained(params, x):
        def step(h, _):
            out = den.apply(params, h, tt, m, l, uncond_rows=ur)
            return out.astype(h.dtype), None
        return jax.lax.scan(step, x, None, length=STEPS)[0]

    float(jnp.abs(chained(params, x0)).sum())  # warm
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        float(jnp.abs(chained(params, x0 * (1 + 1e-4 * i))).sum())
        best = min(best, time.perf_counter() - t0)
    ms = best / STEPS * 1e3
    print(f"{name:<28} {ms:8.3f} ms/step", flush=True)
    return ms


def main():
    base = ModelConfig(fused_resblock=True)
    full = bench("full (fused, fold)", base)
    bench("+ folded attention", dc.replace(base, folded_attention=True))
    bench("no uncond fold", base, uncond_rows=0)
    bench("unfused resblock", dc.replace(base, fused_resblock=False))
    noc = bench("no conditions (no attn)", base, cond=False)
    bench("mid_blocks=0", dc.replace(base, mid_blocks=0))
    bench("pallas attention", dc.replace(base, fused_attention=True))
    print(f"attention+cond share: {full - noc:.3f} ms "
          f"({(full - noc) / full:.0%} of step)")


if __name__ == "__main__":
    main()
