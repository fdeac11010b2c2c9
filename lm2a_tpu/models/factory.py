"""Model factory: build denoiser + condition projection from a ModelConfig.

Centralizes what the reference duplicates as literals in
``/root/reference/train.py:77-86`` and ``/root/reference/sample.py:27-36``.
"""

from __future__ import annotations

from lm2a_tpu.core.config import ModelConfig
from lm2a_tpu.core.precision import dtype_from_str
from lm2a_tpu.models.embedding import CondProjection
from lm2a_tpu.models.unet1d import UNet1D, UNet1DUltimate


def build_denoiser(cfg: ModelConfig, compute_dtype: str = "float32"):
    dtype = dtype_from_str(compute_dtype) if isinstance(compute_dtype, str) else compute_dtype
    if cfg.arch == "ultimate":
        return UNet1DUltimate(
            in_dim=cfg.in_dim,
            base_dim=cfg.base_dim,
            dim_mults=cfg.dim_mults,
            cond_dim=cfg.cond_dim,
            time_emb_dim=cfg.time_emb_dim,
            num_res_blocks=cfg.num_res_blocks,
            mid_blocks=cfg.mid_blocks,
            attn_heads=cfg.attn_heads,
            dropout=cfg.dropout,
            dtype=dtype,
            fused_attention=cfg.fused_attention,
            folded_attention=cfg.folded_attention,
            fused_resblock=cfg.fused_resblock,
            fused_resblock_grad=cfg.fused_resblock_grad,
            remat=cfg.remat,
        )
    if cfg.arch == "v1":
        return UNet1D(
            in_dim=cfg.in_dim,
            base_dim=cfg.base_dim,
            dim_mults=cfg.dim_mults,
            cond_dim=cfg.cond_dim,
            time_emb_dim=cfg.time_emb_dim,
            attn_heads=cfg.attn_heads,
            dtype=dtype,
            fused_attention=cfg.fused_attention,
            folded_attention=cfg.folded_attention,
        )
    raise ValueError(f"unknown arch {cfg.arch!r}; use 'ultimate' or 'v1'")


def build_cond_projection(cfg: ModelConfig, compute_dtype: str = "float32"):
    dtype = dtype_from_str(compute_dtype) if isinstance(compute_dtype, str) else compute_dtype
    return CondProjection(
        motion_dim=cfg.motion_dim,
        text_dim=cfg.text_dim,
        out_dim=cfg.cond_dim,
        dtype=dtype,
    )


def param_count(params) -> int:
    import jax

    return sum(x.size for x in jax.tree.leaves(params))
