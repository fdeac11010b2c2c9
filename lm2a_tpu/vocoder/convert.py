"""Convert NVIDIA BigVGAN torch checkpoints to lm2a_tpu flax params.

Accepts generator state dicts either with weight-norm factors
(``weight_g``/``weight_v``, as published) or already folded (after
``remove_weight_norm()``, which the reference always calls —
``/root/reference/sometest/testwav.py:47``). Weight-norm is folded here:
``w = g * v / ||v||`` with the norm over all dims except dim 0 (torch's
default ``dim=0`` convention).

Layouts: Conv1d (Cout, Cin, K) -> (K, Cin, Cout); ConvTranspose1d
(Cin, Cout, K) -> (K, Cin, Cout) spatially flipped (see the conv-transpose
parity test in tests/test_models.py).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from lm2a_tpu.vocoder.bigvgan import VocoderConfig


def _fold_weight_norm(sd: Dict[str, np.ndarray], prefix: str) -> np.ndarray:
    if f"{prefix}.weight" in sd:
        return np.asarray(sd[f"{prefix}.weight"])
    g = np.asarray(sd[f"{prefix}.weight_g"])
    v = np.asarray(sd[f"{prefix}.weight_v"])
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _conv(sd, prefix, bias: bool = True):
    w = _fold_weight_norm(sd, prefix)
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
    if bias:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _conv_transpose(sd, prefix):
    w = _fold_weight_norm(sd, prefix)  # (Cin, Cout, K)
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 0, 1)[::-1]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _snake(sd, prefix, beta: bool):
    out = {"alpha": np.asarray(sd[f"{prefix}.alpha"]).reshape(-1)}
    if beta:
        out["beta"] = np.asarray(sd[f"{prefix}.beta"]).reshape(-1)
    return out


def convert_bigvgan(sd: Dict[str, np.ndarray], cfg: VocoderConfig) -> Dict:
    """NVIDIA BigVGAN generator state dict -> flax ``{'params': ...}``."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    beta = cfg.activation == "snakebeta"
    p: Dict = {
        "conv_pre": _conv(sd, "conv_pre"),
        "conv_post": _conv(sd, "conv_post", bias=cfg.use_bias_at_final),
        "activation_post": _snake(sd, "activation_post.act", beta),
    }
    nk = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        p[f"up_{i}"] = _conv_transpose(sd, f"ups.{i}.0")
        for j in range(nk):
            rb = f"resblocks.{i * nk + j}"
            blk: Dict = {}
            for m in range(len(cfg.resblock_dilation_sizes[j])):
                if cfg.resblock_type == "1":
                    blk[f"conv1_{m}"] = _conv(sd, f"{rb}.convs1.{m}")
                    blk[f"conv2_{m}"] = _conv(sd, f"{rb}.convs2.{m}")
                    blk[f"act1_{m}"] = _snake(sd, f"{rb}.activations.{2 * m}.act", beta)
                    blk[f"act2_{m}"] = _snake(sd, f"{rb}.activations.{2 * m + 1}.act", beta)
                else:  # resblock '2': convs named 'convs', one activation each
                    blk[f"conv_{m}"] = _conv(sd, f"{rb}.convs.{m}")
                    blk[f"act_{m}"] = _snake(sd, f"{rb}.activations.{m}.act", beta)
            p[f"resblock_{i}_{j}"] = blk
    return {"params": p}


def load_bigvgan_torch(path: str, cfg: VocoderConfig) -> Dict:
    """Load an NVIDIA BigVGAN ``bigvgan_*.pt`` / ``g_*`` checkpoint file."""
    import torch

    ck = torch.load(path, map_location="cpu", weights_only=False)
    sd = ck.get("generator", ck)  # official ckpts nest under 'generator'
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return convert_bigvgan(sd, cfg)
