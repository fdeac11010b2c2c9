"""A/B the fused Pallas snake sandwich vs the XLA polyphase form.

Per-stage (single sandwich, chained scan, real v5e, bf16 storage,
2026-08-18 — `fused_snake_sandwich` vs upsample2x/snake/downsample2x):

        T     C      xla   pallas  speedup
     2064   768    0.557    0.341    1.63x
     8256   384    1.855    0.533    3.48x
    16512   192    3.223    0.510    6.32x
    33024    96    6.197    0.606   10.22x
    66048    48   11.647    0.878   13.26x
   132096    24   23.607    1.799   13.12x

End-to-end BigVGAN vocode of a 6 s clip (1, 516, 80), bf16, chained x20:
XLA polyphase 112.4 ms -> fused Pallas 91.9 ms (1.22x; the convs that the
kernel does not cover now dominate). Numerics: the kernel is bit-exact vs
the XLA path at every stage geometry on-chip in fp32 (max err 0.0), incl.
inputs scaled x1000. The full random-init generator shows O(0.2) output
diffs in EITHER comparison — a 1e-6 input perturbation moves the output
by 0.20 (chaotic at random init) — so e2e diffs are benign reordering
amplification, not kernel error.

Usage: python scripts/profile_sandwich_fused.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lm2a_tpu.vocoder import BIGVGAN_22KHZ_80BAND, BigVGANGenerator
from lm2a_tpu.vocoder.filters import downsample2x, upsample2x
from lm2a_tpu.vocoder.pallas_sandwich import fused_snake_sandwich


def s_xla(x, a, b):
    y = upsample2x(x)
    y = y + jnp.sin(a * y) ** 2 / (b + 1e-9)
    return downsample2x(y)


def chain_time(fn, x, a, b, iters):
    def body(carry, _):
        return fn(carry, a, b) * 0.999 + x * 0.001, None

    f = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    float(jnp.abs(f(x)).sum())
    t0 = time.perf_counter()
    float(jnp.abs(f(x * 1.0001)).sum())
    return (time.perf_counter() - t0) / iters * 1e3


def per_stage():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 516, 24)), jnp.float32)
    a = jnp.asarray(rng.uniform(0.3, 2.0, (24,)), jnp.float32)
    b = jnp.asarray(rng.uniform(0.3, 2.0, (24,)), jnp.float32)
    err = float(jnp.abs(fused_snake_sandwich(x, a, b) - s_xla(x, a, b)).max())
    print(f"on-chip max err (fp32): {err:.2e}", file=sys.stderr)

    geoms = [(2064, 768), (8256, 384), (16512, 192), (33024, 96),
             (66048, 48), (132096, 24)]
    print(f"{'T':>7} {'C':>5} {'xla':>8} {'pallas':>8} {'speedup':>8}")
    for T, C in geoms:
        xx = jnp.asarray(rng.standard_normal((1, T, C)), jnp.bfloat16)
        aa = jnp.asarray(rng.uniform(0.5, 2.0, (C,)), jnp.bfloat16)
        bb = jnp.asarray(rng.uniform(0.5, 2.0, (C,)), jnp.bfloat16)
        it = max(20, min(3000, 3_000_000 // T))
        t_x = chain_time(s_xla, xx, aa, bb, it)
        t_p = chain_time(fused_snake_sandwich, xx, aa, bb, it)
        print(f"{T:>7} {C:>5} {t_x:>8.3f} {t_p:>8.3f} {t_x/t_p:>7.2f}x",
              flush=True)


def vocode_e2e(fused, iters=20):
    voc = BigVGANGenerator(cfg=BIGVGAN_22KHZ_80BAND, fused_sandwich=fused,
                           dtype=jnp.bfloat16)
    mel = jax.random.normal(jax.random.key(11), (1, 516, 80), jnp.float32)
    vparams = jax.jit(voc.init)(jax.random.key(12), mel)

    @jax.jit
    def chain(p, m0):
        def step(m, _):
            w = voc.apply(p, m)
            return m + jnp.sum(w).astype(m.dtype) * 1e-30, ()
        m, _ = jax.lax.scan(step, m0, None, length=iters)
        return m

    float(jnp.abs(chain(vparams, mel)).sum())
    t0 = time.perf_counter()
    float(jnp.abs(chain(vparams, mel * 1.001)).sum())
    return (time.perf_counter() - t0) / iters


def main():
    per_stage()
    t_x = vocode_e2e(False)
    t_p = vocode_e2e(True)
    print(f"e2e vocode 6s clip: xla {t_x*1e3:.1f} ms, "
          f"fused {t_p*1e3:.1f} ms ({t_x/t_p:.2f}x)")


if __name__ == "__main__":
    main()
