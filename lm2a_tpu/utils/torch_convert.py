"""Convert reference PyTorch checkpoints to lm2a_tpu flax parameter trees.

Lets users of the reference repo bring their trained checkpoints
(``torch.save`` dicts with keys ``unet / cond_proj / ema_unet /
ema_cond_proj / dataset_mean / dataset_std``; see
``/root/reference/train.py:194-205``) straight into this framework.

Input is a flat ``{qualified_name: np.ndarray}`` state dict (call
``{k: v.numpy() for k, v in sd.items()}`` on the torch side, or load with
``torch.load`` via :func:`load_torch_checkpoint`). No torch import happens
here unless you use the loader.

Layout rules (torch -> flax):
- Linear   (out, in)        -> Dense kernel (in, out)            : ``W.T``
- Conv1d   (Cout, Cin, K)   -> Conv kernel (K, Cin, Cout)        : transpose(2, 1, 0)
- GroupNorm weight/bias     -> scale/bias
- nn.MultiheadAttention in_proj_weight (3E, E) -> q/k/v Dense kernels
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from lm2a_tpu.core.config import ModelConfig


def _dense(sd, prefix):
    return {
        "kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
        "bias": sd[f"{prefix}.bias"],
    }


def _conv(sd, prefix):
    return {
        "kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].transpose(2, 1, 0)),
        "bias": sd[f"{prefix}.bias"],
    }


def _groupnorm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _mha(sd, prefix):
    w = sd[f"{prefix}.in_proj_weight"]
    b = sd[f"{prefix}.in_proj_bias"]
    e = w.shape[1]
    out = {}
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[name] = {
            "kernel": np.ascontiguousarray(w[i * e : (i + 1) * e].T),
            "bias": b[i * e : (i + 1) * e],
        }
    out["out_proj"] = _dense(sd, f"{prefix}.out_proj")
    return out


def _cross_attn(sd, prefix):
    return {
        "motion_kv_proj": _dense(sd, f"{prefix}.motion_kv_proj"),
        "text_kv_proj": _dense(sd, f"{prefix}.text_kv_proj"),
        "fuse_proj": _dense(sd, f"{prefix}.fuse_proj"),
        "attn_motion": _mha(sd, f"{prefix}.attn_motion"),
        "attn_text": _mha(sd, f"{prefix}.attn_text"),
    }


def _resblock_ultimate(sd, prefix, has_attn, has_skip):
    out = {
        "gn1": _groupnorm(sd, f"{prefix}.gn1"),
        "gn2": _groupnorm(sd, f"{prefix}.gn2"),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
        "film": {"to_scale_shift": _dense(sd, f"{prefix}.film.net.1")},
    }
    if has_attn:
        out["cross_attn"] = _cross_attn(sd, f"{prefix}.cross_attn")
    if has_skip:
        out["skip"] = _conv(sd, f"{prefix}.skip")
    return out


def convert_unet_ultimate(
    sd: Dict[str, np.ndarray], cfg: ModelConfig
) -> Dict:
    """Reference ``UNet1D_ultimate.state_dict()`` -> flax ``{'params': ...}``."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: Dict = {}
    p["time_embedding"] = {"proj": _dense(sd, "time_embedding.time_mlp.1")}
    p["in_proj"] = _conv(sd, "in_proj")

    dims = [cfg.base_dim * m for m in cfg.dim_mults]
    prev = cfg.base_dim
    for i, dim in enumerate(dims):
        for b in range(cfg.num_res_blocks):
            has_attn = b == cfg.num_res_blocks - 1
            p[f"down_{i}_block_{b}"] = _resblock_ultimate(
                sd, f"downs.{i}.blocks.{b}", has_attn, has_skip=prev != dim
            )
            prev = dim
        p[f"down_{i}_downsample"] = _conv(sd, f"downs.{i}.down.conv")

    for b in range(cfg.mid_blocks):
        p[f"mid_block_{b}"] = _resblock_ultimate(
            sd, f"mid.blocks.{b}", has_attn=True, has_skip=False
        )

    for i, dim in enumerate(reversed(dims)):
        p[f"up_{i}_upsample"] = _conv(sd, f"ups.{i}.up.conv")
        for b in range(cfg.num_res_blocks):
            # first block concats the skip: in = 2*dim != dim -> has 1x1 skip
            p[f"up_{i}_block_{b}"] = _resblock_ultimate(
                sd, f"ups.{i}.blocks.{b}", has_attn=b == 0, has_skip=b == 0
            )

    p["out_gn"] = _groupnorm(sd, "out_proj.0")
    p["out_proj"] = _conv(sd, "out_proj.2")
    return {"params": p}


def convert_cond_projection(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference ``CondProjection.state_dict()`` -> flax params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    return {
        "params": {
            "motion_proj": _dense(sd, "motion_proj"),
            "text_proj": _dense(sd, "text_proj"),
        }
    }


def load_torch_checkpoint(path: str, cfg: ModelConfig, prefer_ema: bool = True):
    """Load a reference ``torch.save`` checkpoint file into flax params.

    Returns ``(unet_params, cond_proj_params, meta)`` where ``meta`` carries
    ``dataset_mean`` / ``dataset_std`` / ``step`` / ``epoch`` when present.
    Mirrors the EMA-preferred loading of ``/root/reference/sample.py:79-102``.
    """
    import torch  # local import; torch is optional at runtime

    ck = torch.load(path, map_location="cpu", weights_only=False)
    unet_key = "ema_unet" if prefer_ema and "ema_unet" in ck else "unet"
    proj_key = (
        "ema_cond_proj" if prefer_ema and "ema_cond_proj" in ck else "cond_proj"
    )
    unet_sd = {k: v.detach().cpu().numpy() for k, v in ck[unet_key].items()}
    proj_sd = {k: v.detach().cpu().numpy() for k, v in ck[proj_key].items()}
    meta = {
        k: ck.get(k)
        for k in ("dataset_mean", "dataset_std", "step", "epoch", "timesteps",
                  "guidance_weight")
        if k in ck
    }
    return convert_unet_ultimate(unet_sd, cfg), convert_cond_projection(proj_sd), meta
