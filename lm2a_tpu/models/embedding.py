"""Timestep embeddings and condition projections.

Functional parity with ``/root/reference/models/embedding.py:19-55``:
- ``SinusoidalTimeEmbed``: classic log-spaced sin/cos positional embedding,
- ``TimestepEmbedding``: sinusoid -> Dense -> SiLU,
- ``CondProjection``: motion (234) -> cond_dim, lyrics (768) -> cond_dim.

All modules are channels-last and take ``dtype`` (activation/compute dtype,
bf16 on TPU) with fp32 parameters.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def sinusoidal_time_embed(t: jnp.ndarray, dim: int, dtype: Dtype = jnp.float32):
    """(B,) timesteps -> (B, dim) sin/cos embedding.

    Frequencies are ``exp(-log(10000) * i / (dim/2 - 1))`` — the same
    half-split convention as the reference (first half sin, second half cos).
    """
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1))
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    return emb.astype(dtype)


class TimestepEmbedding(nn.Module):
    """Sinusoid -> Dense(dim) -> SiLU."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = sinusoidal_time_embed(t, self.dim, dtype=self.dtype)
        emb = nn.Dense(self.dim, dtype=self.dtype, name="proj")(emb)
        return nn.silu(emb)


class CondProjection(nn.Module):
    """Project raw motion / lyrics features to a shared conditioning width.

    Trained jointly with the denoiser and checkpointed as a separate
    parameter collection, mirroring the reference's standalone module.
    """

    motion_dim: int = 78 * 3
    text_dim: int = 768
    out_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, motion: jnp.ndarray, lyrics: jnp.ndarray):
        motion_f = nn.Dense(self.out_dim, dtype=self.dtype, name="motion_proj")(
            motion.astype(self.dtype)
        )
        text_f = nn.Dense(self.out_dim, dtype=self.dtype, name="text_proj")(
            lyrics.astype(self.dtype)
        )
        return motion_f, text_f
