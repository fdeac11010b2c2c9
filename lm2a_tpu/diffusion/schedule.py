"""DDPM noise schedule tables.

Linear beta schedule 1e-4 -> 0.02 over T steps, alpha cumulative products —
the convention of ``/root/reference/models/diffusion.py:14-18``. The tables
are a small pytree of device arrays that rides along into jitted samplers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from lm2a_tpu.core.config import DiffusionConfig


class Schedule(NamedTuple):
    betas: jnp.ndarray  # (T,)
    alphas: jnp.ndarray  # (T,)
    alpha_bars: jnp.ndarray  # (T,)

    @property
    def timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(cfg: DiffusionConfig = DiffusionConfig()) -> Schedule:
    betas = jnp.linspace(cfg.beta_start, cfg.beta_end, cfg.timesteps, dtype=jnp.float32)
    alphas = 1.0 - betas
    alpha_bars = jnp.cumprod(alphas)
    return Schedule(betas=betas, alphas=alphas, alpha_bars=alpha_bars)
