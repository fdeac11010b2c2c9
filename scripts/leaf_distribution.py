#!/usr/bin/env python3
"""Dump the flagship train-state leaf-size distribution (shapes only, via
eval_shape) — sizing data for the bucketed multi-ref optimizer kernel
(``ops/pallas_opt.py``). Round-3 VERDICT #1."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from lm2a_tpu.core.config import LM2AConfig  # noqa: E402
from lm2a_tpu.models.factory import (  # noqa: E402
    build_cond_projection,
    build_denoiser,
)


def main():
    cfg = LM2AConfig()
    denoiser = build_denoiser(cfg.model)
    cond_proj = build_cond_projection(cfg.model)
    mc = cfg.model

    def init():
        ku, kp = jax.random.split(jax.random.key(0))
        u = denoiser.init(ku, jnp.zeros((1, 516, mc.in_dim)),
                          jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, 516, mc.cond_dim)),
                          jnp.zeros((1, 516, mc.cond_dim)))
        p = cond_proj.init(kp, jnp.zeros((1, 516, mc.motion_dim)),
                           jnp.zeros((1, 516, mc.text_dim)))
        return {"unet": u["params"], "cond_proj": p["params"]}

    shapes = jax.eval_shape(init)
    leaves = jax.tree.leaves(shapes)
    sizes = np.array(sorted(x.size for x in leaves))
    total = sizes.sum()
    print(f"leaves: {len(sizes)}  total params: {total/1e6:.1f}M")
    for hi in (1024, 8192, 65536, 262144, 1048576, 4194304, 1 << 62):
        sel = sizes[sizes <= hi]
        prev = 0 if hi == 1024 else lo
        band = sel[sel > prev] if hi != 1024 else sel
        if len(band):
            print(f"  <= {hi:>9}: {len(band):4d} leaves, "
                  f"{band.sum()/1e6:8.2f}M params "
                  f"({100*band.sum()/total:5.1f}%)")
        lo = hi
    print("top 12 leaves:", sizes[-12:].tolist())


if __name__ == "__main__":
    main()
