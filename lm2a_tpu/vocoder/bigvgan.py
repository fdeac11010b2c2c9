"""BigVGAN generator in flax: mel (B, T, 80) -> waveform (B, 256*T).

The reference vocodes with NVIDIA's pretrained ``bigvgan_22khz_80band``
(``/root/reference/sometest/testwav.py:43-48``, ``newwav.py:70-73``) — an
external torch repo with an optional CUDA kernel the reference always
disables. This is a ground-up JAX implementation of that generator family:

- conv_pre (k7) -> N upsample stages (transposed conv, rate r_i) each
  followed by |K| parallel AMP blocks averaged together -> anti-aliased
  post activation -> conv_post (k7) -> tanh.
- AMPBlock1: for each dilation d: x += c2(act(c1(act(x)))) where c1 is
  dilated, c2 is dilation-1, and every activation is the anti-aliased
  Snake/SnakeBeta sandwich (2x upsample -> snake -> 2x downsample) from
  ``lm2a_tpu.vocoder.filters``.
- Snake:     x + sin^2(a x) / a          (per-channel a)
  SnakeBeta:  x + sin^2(a x) / b          (per-channel a, b)
  with optional log-scale parameterization (a = exp(p)).

Weight-norm folding and torch layout conversion live in
``lm2a_tpu.vocoder.convert`` so published NVIDIA checkpoints load directly.
Everything is channels-last; the transposed convs and k7/k11 dilated convs
lower to MXU-tiled XLA convolutions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from lm2a_tpu.vocoder.filters import downsample2x, upsample2x

Dtype = Any


@dataclass(frozen=True)
class VocoderConfig:
    num_mels: int = 80
    upsample_rates: Tuple[int, ...] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5),
    )
    resblock_type: str = "1"  # '1' = AMPBlock1 (two convs/dilation), '2' = one
    activation: str = "snakebeta"  # 'snake' | 'snakebeta'
    snake_logscale: bool = True
    sample_rate: int = 22050
    # NVIDIA v2 checkpoints ship with bias-less conv_post and clamp instead of
    # tanh at the output (use_bias_at_final / use_tanh_at_final = False in
    # their config.json); v1 uses bias + tanh.
    use_bias_at_final: bool = True
    use_tanh_at_final: bool = True

    @property
    def hop(self) -> int:
        h = 1
        for r in self.upsample_rates:
            h *= r
        return h


# nvidia/bigvgan_22khz_80band (the checkpoint the reference loads)
BIGVGAN_22KHZ_80BAND = VocoderConfig()
# nvidia/bigvgan_base_22khz_80band
BIGVGAN_BASE_22KHZ_80BAND = VocoderConfig(
    upsample_rates=(8, 8, 2, 2),
    upsample_kernel_sizes=(16, 16, 4, 4),
    upsample_initial_channel=512,
)
# nvidia/bigvgan_v2_24khz_100band_256x
BIGVGAN_V2_24KHZ_100BAND = VocoderConfig(
    num_mels=100,
    sample_rate=24000,
    use_bias_at_final=False,
    use_tanh_at_final=False,
)
# nvidia/bigvgan_v2_44khz_128band_512x
BIGVGAN_V2_44KHZ_128BAND = VocoderConfig(
    num_mels=128,
    sample_rate=44100,
    upsample_rates=(8, 4, 2, 2, 2, 2),
    upsample_kernel_sizes=(16, 8, 4, 4, 4, 4),
    use_bias_at_final=False,
    use_tanh_at_final=False,
)


class SnakeAlias(nn.Module):
    """Anti-aliased Snake/SnakeBeta: up2x -> snake -> down2x.

    With ``fused`` the whole sandwich runs as one Pallas kernel
    (``vocoder/pallas_sandwich.py``) — the TPU equivalent of NVIDIA's fused
    CUDA anti-alias activation; identical numerics, serving-speed win.
    """

    channels: int
    beta: bool = True
    logscale: bool = True
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = nn.initializers.zeros if self.logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        beta = (
            self.param("beta", init, (self.channels,)) if self.beta else alpha
        )
        if self.logscale:
            alpha, beta = jnp.exp(alpha), jnp.exp(beta)

        if self.fused:
            from lm2a_tpu.vocoder.pallas_sandwich import fused_snake_sandwich

            return fused_snake_sandwich(x, alpha, beta)

        alpha = alpha.astype(x.dtype)
        beta = beta.astype(x.dtype)
        x = upsample2x(x)
        x = x + jnp.sin(alpha * x) ** 2 / (beta + 1e-9)
        return downsample2x(x)


def _conv(features, kernel, dilation=1, name=None, dtype=jnp.float32):
    pad = (kernel * dilation - dilation) // 2
    return nn.Conv(
        features, (kernel,), kernel_dilation=(dilation,),
        padding=[(pad, pad)], dtype=dtype, name=name,
    )


class AMPBlock1(nn.Module):
    """Anti-aliased multi-periodicity residual block (BigVGAN resblock '1')."""

    channels: int
    kernel: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)
    beta: bool = True
    logscale: bool = True
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            xt = SnakeAlias(
                self.channels, beta=self.beta, logscale=self.logscale,
                fused=self.fused, dtype=self.dtype, name=f"act1_{i}",
            )(x)
            xt = _conv(self.channels, self.kernel, d, f"conv1_{i}", self.dtype)(xt)
            xt = SnakeAlias(
                self.channels, beta=self.beta, logscale=self.logscale,
                fused=self.fused, dtype=self.dtype, name=f"act2_{i}",
            )(xt)
            xt = _conv(self.channels, self.kernel, 1, f"conv2_{i}", self.dtype)(xt)
            x = x + xt
        return x


class AMPBlock2(nn.Module):
    """Lighter residual block (BigVGAN resblock '2'): one conv per dilation."""

    channels: int
    kernel: int = 3
    dilations: Tuple[int, ...] = (1, 3)
    beta: bool = True
    logscale: bool = True
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            xt = SnakeAlias(
                self.channels, beta=self.beta, logscale=self.logscale,
                fused=self.fused, dtype=self.dtype, name=f"act_{i}",
            )(x)
            xt = _conv(self.channels, self.kernel, d, f"conv_{i}", self.dtype)(xt)
            x = x + xt
        return x


class BigVGANGenerator(nn.Module):
    """(B, T, num_mels) log-mel -> (B, hop*T) waveform in [-1, 1]."""

    cfg: VocoderConfig = field(default_factory=VocoderConfig)
    fused_sandwich: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        beta = c.activation == "snakebeta"
        x = nn.Conv(
            c.upsample_initial_channel, (7,), padding=[(3, 3)],
            dtype=self.dtype, name="conv_pre",
        )(mel.astype(self.dtype))

        ch = c.upsample_initial_channel
        for i, (r, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch = ch // 2
            # torch ConvTranspose1d(k, stride=r, padding=(k-r)//2): T -> r*T.
            # flax padding (k - r - (k-r)//2 handled via SAME-like arithmetic):
            # low = high = k - 1 - (k - r) // 2 keeps length r*T for even k-r.
            p = k - 1 - (k - r) // 2
            x = nn.ConvTranspose(
                ch, (k,), strides=(r,), padding=[(p, p)],
                dtype=self.dtype, name=f"up_{i}",
            )(x)
            block_cls = AMPBlock1 if c.resblock_type == "1" else AMPBlock2
            acc = None
            for j, (rk, dil) in enumerate(
                zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)
            ):
                y = block_cls(
                    ch, rk, tuple(dil), beta=beta, logscale=c.snake_logscale,
                    fused=self.fused_sandwich, dtype=self.dtype,
                    name=f"resblock_{i}_{j}",
                )(x)
                acc = y if acc is None else acc + y
            x = acc / len(c.resblock_kernel_sizes)

        x = SnakeAlias(
            ch, beta=beta, logscale=c.snake_logscale,
            fused=self.fused_sandwich, dtype=self.dtype,
            name="activation_post",
        )(x)
        x = nn.Conv(
            1, (7,), padding=[(3, 3)], use_bias=c.use_bias_at_final,
            dtype=self.dtype, name="conv_post",
        )(x)
        x = x.astype(jnp.float32)
        x = jnp.tanh(x) if c.use_tanh_at_final else jnp.clip(x, -1.0, 1.0)
        return x[..., 0]
