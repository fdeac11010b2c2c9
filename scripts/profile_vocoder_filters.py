"""A/B the anti-aliased 2x resamplers: grouped-conv vs polyphase MACs.

The BigVGAN snake sandwich (up2x -> snake -> down2x) runs 216 times per
vocode; round-2 measurement put the whole vocoder at 630 ms for a 6 s clip
(~0.9 TFLOP of real conv work => should be ~25-30 ms). Hypothesis
(confirmed): the `feature_group_count=C` depthwise convs and the
zero-stuff scatter lower poorly on TPU. This script measures the polyphase
fast path now used by `upsample2x`/`downsample2x` against the retained
`_*_conv` reference formulation at each stage geometry, chained-scan
discipline per DEVNOTES.

Measured on the real v5e (2026-08, 200-3000 chained iters/geometry):

    T       C    conv ms   poly ms  speedup
    2064    768    2.490     0.376    6.62x
    8256    384    3.071     0.652    4.71x
    16512   192    3.169     0.749    4.23x
    33024    96    5.592     0.850    6.58x
    66048    48   10.802     1.641    6.58x
    132096   24   24.020     3.302    7.27x

Usage: python scripts/profile_vocoder_filters.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lm2a_tpu.vocoder.filters import (
    _downsample2x_conv, _upsample2x_conv, downsample2x, upsample2x,
)


def sandwich_conv(x, alpha):
    y = _upsample2x_conv(x)
    y = y + jnp.sin(alpha * y) ** 2
    return _downsample2x_conv(y)


def sandwich_poly(x, alpha):
    y = upsample2x(x)
    y = y + jnp.sin(alpha * y) ** 2
    return downsample2x(y)


def check_numerics():
    # On TPU the grouped convs run at default (reduced) precision while the
    # polyphase MACs are exact fp32, so tolerate conv rounding there.
    atol = 1e-5 if jax.default_backend() == "cpu" else 2e-2
    rng = np.random.default_rng(0)
    for T in (37, 64, 516):
        x = jnp.asarray(rng.standard_normal((2, T, 8)), jnp.float32)
        np.testing.assert_allclose(
            upsample2x(x), _upsample2x_conv(x), rtol=0, atol=atol)
        up = _upsample2x_conv(x)
        np.testing.assert_allclose(
            downsample2x(up), _downsample2x_conv(up), rtol=0, atol=atol)
    print(f"numerics: polyphase == grouped-conv (atol {atol})", file=sys.stderr)


def chain_time(fn, x, alpha, iters):
    def body(carry, _):
        y = fn(carry, alpha)
        return y * 0.999 + x * 0.001, None

    f = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    float(jnp.abs(f(x)).sum())  # warm + compile
    t0 = time.perf_counter()
    float(jnp.abs(f(x * 1.0001)).sum())  # distinct input, value-fetch sync
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    check_numerics()
    # stage geometries of BIGVGAN_22KHZ_80BAND for a 516-frame clip
    geoms = [(2064, 768), (8256, 384), (16512, 192), (33024, 96),
             (66048, 48), (132096, 24)]
    rng = np.random.default_rng(1)
    print(f"{'T':>7} {'C':>5} {'conv ms':>9} {'poly ms':>9} {'speedup':>8}")
    for T, C in geoms:
        x = jnp.asarray(rng.standard_normal((1, T, C)), jnp.bfloat16)
        alpha = jnp.asarray(rng.uniform(0.5, 2.0, (C,)), jnp.bfloat16)
        it = max(20, min(iters, 3_000_000 // T))
        t_conv = chain_time(sandwich_conv, x, alpha, it)
        t_poly = chain_time(sandwich_poly, x, alpha, it)
        print(f"{T:>7} {C:>5} {t_conv:>9.3f} {t_poly:>9.3f} {t_conv/t_poly:>7.2f}x")


if __name__ == "__main__":
    main()
