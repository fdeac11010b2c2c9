"""1-D UNet denoisers, channels-last (B, T, C).

Two architectures, selected by ``ModelConfig.arch``:

- ``UNet1DUltimate`` — the production denoiser. Parity target:
  ``/root/reference/models/unet1d_ultimate.py:273-426``. FiLM timestep
  modulation, sparse cross-attention (last block of each down stage, first
  block of each up stage, every mid block), stride-2 conv downsampling,
  linear-interpolation (align-corners) + conv upsampling, GroupNorm+SiLU+1x1
  output head.
- ``UNet1D`` — the v1 baseline the reference keeps but comments out of its
  entry points (``/root/reference/models/unet1d.py:15-154``): additive
  timestep projection, cross-attention in every residual block, transposed-
  conv upsampling, asymmetric up-path channel growth. Here it is a config
  flag, not a dead import.

TPU notes: channels-last convs lower to MXU-tiled ``conv_general_dilated``
(NHC/HIO); the mel-bin axis (80 -> base_dim multiples) rides the 128-lane
dimension. All control flow is static; the whole forward is one XLA program.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from lm2a_tpu.models.attention import CrossAttentionFusion
from lm2a_tpu.models.embedding import TimestepEmbedding

Dtype = Any

# Serving-path fused resblock batch-row ceiling. Measured across three
# kernel variants on the real chip (round 3, DEVNOTES "R-row tiling"):
# the fused kernel WINS the 1-2 row serving forwards (R=2 unrolled rows:
# headline 0.681 -> 0.673 s/chain, 74.3% MFU) but at B=8 CFG (16 rows)
# every variant loses to XLA's cross-batch conv batching (XLA 4.46 s vs
# fused-serial 4.90 / fused-merged 5.11 / fused-unrolled 4.79) — merged
# row tiles pay a non-layout-free (R*T, C) reshape at T % 8 != 0, and
# unrolled rows still cannot match XLA's single batched GEMM per conv.
FUSED_RESBLOCK_MAX_B = 2


def default_num_groups(channels: int) -> int:
    """Largest of (8, 4, 2, 1) dividing ``channels``."""
    for g in (8, 4, 2, 1):
        if channels % g == 0:
            return g
    return 1


def _group_norm(channels: int, dtype, name: str):
    # torch GroupNorm uses eps=1e-5 (flax default is 1e-6) — keep parity.
    return nn.GroupNorm(
        num_groups=default_num_groups(channels), epsilon=1e-5, dtype=dtype, name=name
    )


def upsample_linear_2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, C) -> (B, 2T, C) linear interpolation with align_corners=True.

    Output sample i sits at input position ``i * (T-1) / (2T-1)`` — matching
    ``F.interpolate(mode='linear', align_corners=True)``. One gather + lerp.
    """
    T = x.shape[1]
    out_t = 2 * T
    pos = jnp.arange(out_t, dtype=jnp.float32) * ((T - 1) / (out_t - 1))
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 1)
    hi = jnp.clip(lo + 1, 0, T - 1)
    frac = (pos - lo.astype(jnp.float32)).astype(x.dtype)[None, :, None]
    return x[:, lo, :] * (1.0 - frac) + x[:, hi, :] * frac


def _fix_time_len(h: jnp.ndarray, target_t: int) -> jnp.ndarray:
    """Zero-pad or truncate the time axis to ``target_t`` (static shapes)."""
    t = h.shape[1]
    if t == target_t:
        return h
    if t < target_t:
        return jnp.pad(h, ((0, 0), (0, target_t - t), (0, 0)))
    return h[:, :target_t, :]


class FiLM(nn.Module):
    """SiLU -> Dense(2C) producing per-channel (scale, shift) from t_emb."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        stats = nn.Dense(2 * self.out_channels, dtype=self.dtype, name="to_scale_shift")(
            nn.silu(t_emb)
        )
        scale, shift = jnp.split(stats, 2, axis=-1)
        return scale[:, None, :], shift[:, None, :]  # broadcast over time


class ResBlockUltimate(nn.Module):
    """GN-SiLU-conv3 -> FiLM -> GN-SiLU-conv3 -> dropout -> [cross-attn] + skip.

    ``uncond_rows`` (static) marks the first N batch rows as CFG-unconditional
    (identically-zero conditions). For those rows cross-attention collapses
    analytically: every K/V row equals the projection-bias chain, softmax is
    uniform, and the site's output is a per-channel constant independent of
    the query — so it is computed once at (T=1, S=1) from the same parameters
    and broadcast, skipping the (N, T, S) attention entirely. Exact math,
    ~half the attention cost of a doubled-batch CFG forward.
    """

    out_channels: int
    cond_dim: int = 128
    use_attn: bool = False
    num_heads: int = 4
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    fused_attention: bool = False
    # Serving-only: folded attention linear algebra (merged Q matmul,
    # branch-stacked cores, out/fuse projections collapsed into one matmul
    # whose weight products XLA hoists out of the sampling scan). Same
    # parameters, same math up to float reassociation.
    folded_attention: bool = False
    # Serving-only: run GN+SiLU+conv3+FiLM+GN+SiLU+conv3 (+1x1 skip) as one
    # Pallas kernel (ops/pallas_resblock.py). Engages only when bound params
    # exist (apply, not init) and deterministic=True; training and oversized
    # geometries keep the XLA path.
    fused_resblock: bool = False
    # Training: same fused forward plus a fused Pallas backward (custom VJP,
    # ops/pallas_resblock.py:fused_resblock_train). Only geometries whose
    # weights + fp32 grad accumulators fit VMEM engage; the rest stay XLA.
    fused_resblock_grad: bool = False

    def _fused_chain(self, x, t_emb, train: bool = False):
        """Fused conv-chain forward, or None when the kernel declines."""
        from lm2a_tpu.ops.pallas_resblock import (
            fused_resblock_chain, fused_resblock_train,
        )

        p = self.variables["params"]
        if "film" not in p:
            return None  # t_emb-less call: stay on the XLA path
        in_ch = x.shape[-1]
        dt = self.dtype
        # FiLM vectors, same dtype math as the FiLM module's Dense
        fk = p["film"]["to_scale_shift"]["kernel"].astype(dt)
        fb = p["film"]["to_scale_shift"]["bias"].astype(dt)
        stats = nn.silu(t_emb.astype(dt)) @ fk + fb
        scale, shift = jnp.split(stats, 2, axis=-1)
        has_skip = in_ch != self.out_channels
        args = (
            x.astype(dt),
            p["gn1"]["scale"], p["gn1"]["bias"],
            p["conv1"]["kernel"], p["conv1"]["bias"],
            scale, shift,
            p["gn2"]["scale"], p["gn2"]["bias"],
            p["conv2"]["kernel"], p["conv2"]["bias"],
            p["skip"]["kernel"][0] if has_skip else None,
            p["skip"]["bias"] if has_skip else None,
        )
        groups = dict(
            groups1=default_num_groups(in_ch),
            groups2=default_num_groups(self.out_channels),
        )
        if train:
            return fused_resblock_train(*args, **groups)
        return fused_resblock_chain(
            *args, **groups, add_residual=not self.use_attn,
        )

    @nn.compact
    def __call__(self, x, t_emb, motion_f=None, text_f=None, deterministic=True,
                 uncond_rows=0):
        in_ch = x.shape[-1]

        fused = None
        if (
            self.fused_resblock
            and deterministic
            and t_emb is not None
            and not self.is_initializing()
            # R-row tiling batches rows into the kernel's MXU contractions;
            # ceiling kept as a safety valve for untested huge batches
            and x.shape[0] <= FUSED_RESBLOCK_MAX_B
        ):
            fused = self._fused_chain(x, t_emb)
        if fused is not None:
            if not self.use_attn:
                return fused  # residual already added in-kernel
            # pre-attention variant: h to attend, xs to add afterwards
            h, x = (fused if in_ch != self.out_channels
                    else (fused, x.astype(self.dtype)))
            return self._attend_and_add(h, x, motion_f, text_f, uncond_rows)

        if (
            self.fused_resblock_grad
            and fused is None
            and t_emb is not None
            and not self.is_initializing()
        ):
            res = self._fused_chain(x, t_emb, train=True)
            if res is not None:  # geometry fits the fused-backward budget
                if in_ch != self.out_channels:
                    h, xs = res
                else:
                    h, xs = res, x.astype(self.dtype)
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
                if self.use_attn and motion_f is not None and text_f is not None:
                    h = self._attention(h, motion_f, text_f, uncond_rows)
                return xs + h

        h = _group_norm(in_ch, self.dtype, "gn1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3,), padding="SAME", dtype=self.dtype, name="conv1")(h)

        if t_emb is not None:
            scale, shift = FiLM(self.out_channels, dtype=self.dtype, name="film")(t_emb)
            h = h * (1.0 + scale) + shift

        h = _group_norm(self.out_channels, self.dtype, "gn2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3,), padding="SAME", dtype=self.dtype, name="conv2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)

        if self.use_attn and motion_f is not None and text_f is not None:
            h = self._attention(h, motion_f, text_f, uncond_rows)

        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1,), dtype=self.dtype, name="skip")(x)
        return x + h

    def _attention(self, h, motion_f, text_f, uncond_rows):
        attn = CrossAttentionFusion(
            mel_dim=self.out_channels,
            cond_dim=self.cond_dim,
            num_heads=self.num_heads,
            dtype=self.dtype,
            fused=self.fused_attention,
            folded=self.folded_attention,
            name="cross_attn",
        )
        if uncond_rows:
            bu, t_len = uncond_rows, h.shape[1]
            # same module instance -> shared params; (1,1) shapes make the
            # constant: uniform softmax over one bias-valued K/V row
            const = attn(
                jnp.zeros((1, 1, self.out_channels), h.dtype),
                jnp.zeros((1, 1, motion_f.shape[-1]), motion_f.dtype),
                jnp.zeros((1, 1, text_f.shape[-1]), text_f.dtype),
            )
            h_cond = attn(h[bu:], motion_f[bu:], text_f[bu:])
            return jnp.concatenate(
                [jnp.broadcast_to(const, (bu, t_len, self.out_channels)),
                 h_cond],
                axis=0,
            )
        return attn(h, motion_f, text_f)

    def _attend_and_add(self, h, xs, motion_f, text_f, uncond_rows):
        """Post-fused-chain tail: attention (when conditions exist) + skip."""
        if motion_f is not None and text_f is not None:
            h = self._attention(h, motion_f, text_f, uncond_rows)
        return xs + h


class UNet1DUltimate(nn.Module):
    """Production epsilon-prediction UNet over (B, T, in_dim) mels."""

    in_dim: int = 80
    base_dim: int = 256
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    cond_dim: int = 128
    time_emb_dim: int = 256
    num_res_blocks: int = 2
    mid_blocks: int = 3
    attn_heads: int = 8
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    fused_attention: bool = False
    # serving-only folded attention algebra (see ResBlockUltimate)
    folded_attention: bool = False
    # serving-only fused resblock kernel (see ResBlockUltimate.fused_resblock)
    fused_resblock: bool = False
    # training-path fused resblock with Pallas backward (custom VJP)
    fused_resblock_grad: bool = False
    # rematerialize residual blocks in the backward pass (trade FLOPs for
    # activation memory; enables larger batches/sequences)
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, in_dim)
        t: jnp.ndarray,  # (B,)
        motion_f: Optional[jnp.ndarray] = None,  # (B, T, cond_dim)
        text_f: Optional[jnp.ndarray] = None,  # (B, T, cond_dim)
        *,
        deterministic: bool = True,
        uncond_rows: int = 0,  # first N rows are CFG-unconditional (static)
    ) -> jnp.ndarray:
        x = x.astype(self.dtype)
        t_emb = TimestepEmbedding(self.time_emb_dim, dtype=self.dtype, name="time_embedding")(t)

        h = nn.Conv(self.base_dim, (1,), dtype=self.dtype, name="in_proj")(x)
        dims = [self.base_dim * m for m in self.dim_mults]

        block_cls = ResBlockUltimate
        if self.remat:
            # arg indices 5/6 == `deterministic`/`uncond_rows` (self=0),
            # static Python values
            block_cls = nn.remat(ResBlockUltimate, static_argnums=(5, 6))

        def block(out_ch, use_attn, name):
            return block_cls(
                out_channels=out_ch,
                cond_dim=self.cond_dim,
                use_attn=use_attn,
                num_heads=self.attn_heads,
                dropout=self.dropout,
                dtype=self.dtype,
                fused_attention=self.fused_attention,
                folded_attention=self.folded_attention,
                fused_resblock=self.fused_resblock,
                fused_resblock_grad=self.fused_resblock_grad,
                name=name,
            )

        # Down path: attention only on the last block of each stage.
        skips = []
        for i, dim in enumerate(dims):
            for b in range(self.num_res_blocks):
                use_attn = b == self.num_res_blocks - 1
                h = block(dim, use_attn, f"down_{i}_block_{b}")(
                    h, t_emb, motion_f, text_f, deterministic, uncond_rows
                )
            skips.append(h)
            h = nn.Conv(
                dim, (4,), strides=(2,), padding=[(1, 1)], dtype=self.dtype,
                name=f"down_{i}_downsample",
            )(h)

        # Mid: every block attends.
        for b in range(self.mid_blocks):
            h = block(dims[-1], True, f"mid_block_{b}")(
                h, t_emb, motion_f, text_f, deterministic, uncond_rows
            )

        # Up path: attention on the first (post-concat) block of each stage.
        for i, dim in enumerate(reversed(dims)):
            h = upsample_linear_2x_align_corners(h)
            h = nn.Conv(dim, (3,), padding="SAME", dtype=self.dtype, name=f"up_{i}_upsample")(h)
            skip = skips.pop()
            h = _fix_time_len(h, skip.shape[1])
            h = jnp.concatenate([h, skip], axis=-1)
            for b in range(self.num_res_blocks):
                h = block(dim, b == 0, f"up_{i}_block_{b}")(
                    h, t_emb, motion_f, text_f, deterministic, uncond_rows
                )

        h = _group_norm(h.shape[-1], self.dtype, "out_gn")(h)
        h = nn.silu(h)
        out = nn.Conv(self.in_dim, (1,), dtype=self.dtype, name="out_proj")(h)
        return out.astype(jnp.float32)


class ResBlockV1(nn.Module):
    """v1 block: additive timestep projection, unconditional cross-attn."""

    channels: int
    cond_dim: int = 128
    num_heads: int = 4
    dtype: Dtype = jnp.float32
    fused_attention: bool = False
    folded_attention: bool = False

    @nn.compact
    def __call__(self, x, t_emb, motion_f, text_f, uncond_rows=0):
        h = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3,), padding="SAME", dtype=self.dtype, name="conv1")(h)
        h = h + nn.Dense(self.channels, dtype=self.dtype, name="time_proj")(t_emb)[:, None, :]
        h = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3,), padding="SAME", dtype=self.dtype, name="conv2")(h)
        attn = CrossAttentionFusion(
            mel_dim=self.channels, cond_dim=self.cond_dim,
            num_heads=self.num_heads, dtype=self.dtype,
            fused=self.fused_attention, folded=self.folded_attention,
            name="cross_attn",
        )
        if uncond_rows:
            # see ResBlockUltimate: zero conditions make the attention output
            # a query-independent constant, shared-params (1,1) evaluation
            bu, t_len = uncond_rows, h.shape[1]
            const = attn(
                jnp.zeros((1, 1, self.channels), h.dtype),
                jnp.zeros((1, 1, motion_f.shape[-1]), motion_f.dtype),
                jnp.zeros((1, 1, text_f.shape[-1]), text_f.dtype),
            )
            h = jnp.concatenate(
                [jnp.broadcast_to(const, (bu, t_len, self.channels)),
                 attn(h[bu:], motion_f[bu:], text_f[bu:])],
                axis=0,
            )
        else:
            h = attn(h, motion_f, text_f)
        return x + h


class UNet1D(nn.Module):
    """v1 baseline UNet (every block attends; transposed-conv upsampling)."""

    in_dim: int = 80
    base_dim: int = 128
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    cond_dim: int = 128
    time_emb_dim: int = 256
    attn_heads: int = 4
    dtype: Dtype = jnp.float32
    fused_attention: bool = False
    # serving-only folded attention algebra (see CrossAttentionFusion)
    folded_attention: bool = False

    @nn.compact
    def __call__(self, x, t, motion_f=None, text_f=None, *, deterministic=True,
                 uncond_rows=0):
        x = x.astype(self.dtype)
        t_emb = TimestepEmbedding(self.time_emb_dim, dtype=self.dtype, name="time_embedding")(t)
        h = nn.Conv(self.base_dim, (1,), dtype=self.dtype, name="input_proj")(x)

        dims = [self.base_dim * m for m in self.dim_mults]
        prev_dim = self.base_dim
        skips = []
        skip_channels = []
        for i, dim in enumerate(dims):
            h = ResBlockV1(
                prev_dim, cond_dim=self.cond_dim, num_heads=self.attn_heads,
                dtype=self.dtype, fused_attention=self.fused_attention,
                folded_attention=self.folded_attention,
                name=f"down_{i}_res",
            )(h, t_emb, motion_f, text_f, uncond_rows)
            skips.append(h)
            skip_channels.append(prev_dim)
            h = nn.Conv(
                dim, (4,), strides=(2,), padding=[(1, 1)], dtype=self.dtype,
                name=f"down_{i}_downsample",
            )(h)
            prev_dim = dim

        h = ResBlockV1(
            prev_dim, cond_dim=self.cond_dim, num_heads=self.attn_heads,
            dtype=self.dtype, fused_attention=self.fused_attention,
            folded_attention=self.folded_attention,
            name="mid_res",
        )(h, t_emb, motion_f, text_f, uncond_rows)

        for i, (dim, skip_ch) in enumerate(zip(reversed(dims), reversed(skip_channels))):
            # padding (2,2) == torch ConvTranspose1d(k=4, s=2, p=1): T -> 2T
            h = nn.ConvTranspose(
                dim, (4,), strides=(2,), padding=[(2, 2)], dtype=self.dtype,
                name=f"up_{i}_upconv",
            )(h)
            skip = skips.pop()
            h = _fix_time_len(h, skip.shape[1])
            h = jnp.concatenate([h, skip], axis=-1)
            h = ResBlockV1(
                dim + skip_ch, cond_dim=self.cond_dim, num_heads=self.attn_heads,
                dtype=self.dtype, fused_attention=self.fused_attention,
                folded_attention=self.folded_attention,
                name=f"up_{i}_res",
            )(h, t_emb, motion_f, text_f, uncond_rows)
            prev_dim = dim + skip_ch

        return nn.Conv(self.in_dim, (1,), dtype=self.dtype, name="out_proj")(h).astype(
            jnp.float32
        )
