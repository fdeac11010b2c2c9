"""Configuration dataclasses — the single source of truth for hyperparameters.

The reference duplicates its architecture hyperparameters as literals across
entry points (``/root/reference/train.py:77-86`` vs
``/root/reference/sample.py:27-36``), which must agree by hand. Here every
entry point consumes one serializable config object that also travels inside
checkpoints, so sampling can never be built with a mismatched architecture.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class MelConfig:
    """Mel-spectrogram convention (matches BigVGAN's ``get_mel_spectrogram``).

    Defaults mirror the reference's ``default_bigvgan_hparams``
    (``/root/reference/preprocess.py:26-38``): n_fft=1024, 80 mels, 22.05 kHz,
    hop 256, win 1024, fmin 0, fmax None (-> sr/2).
    """

    n_fft: int = 1024
    num_mels: int = 80
    sample_rate: int = 22050
    hop_size: int = 256
    win_size: int = 1024
    fmin: float = 0.0
    fmax: Optional[float] = None  # None -> sr / 2


@dataclass(frozen=True)
class ModelConfig:
    """Denoiser architecture.

    Defaults match the reference's production configuration
    (``/root/reference/train.py:77-86``): UNet1D_ultimate, base 256,
    mults (1,2,4), cond 128, time-emb 256, 2 res blocks/stage, 3 mid blocks,
    8 attention heads. ``arch='v1'`` selects the simpler baseline UNet
    (``/root/reference/models/unet1d.py``) as a config flag rather than a
    second code path at the call sites.
    """

    arch: str = "ultimate"  # "ultimate" | "v1"
    in_dim: int = 80
    base_dim: int = 256
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    cond_dim: int = 128
    time_emb_dim: int = 256
    num_res_blocks: int = 2
    mid_blocks: int = 3
    attn_heads: int = 8
    dropout: float = 0.1
    motion_dim: int = 78 * 3  # pose(72)+Th(3)+Rh(3), x3 for [pos, vel, acc]
    text_dim: int = 768  # RoBERTa-base hidden size
    # Route attention cores through the Pallas flash kernel (VMEM-resident
    # scores); numerically equivalent to the XLA path within fp tolerance.
    fused_attention: bool = False
    # Serving-only: fold the cross-attention linear algebra — merged Q
    # matmul, branch-stacked score/AV einsums, and the per-branch out_proj +
    # concat + fuse_proj collapsed into one matmul whose weight products are
    # scan-invariant (XLA hoists them out of the sampling loop). Same
    # parameters and math up to float reassociation; inert during init.
    folded_attention: bool = False
    # Serving-only fused resblock kernel (ops/pallas_resblock.py): the whole
    # GN+SiLU+conv3+FiLM+GN+SiLU+conv3 chain in one Pallas call per block.
    # Inert during init/training (those keep the XLA path).
    fused_resblock: bool = False
    # Training: fused resblock forward + fused Pallas backward (custom VJP).
    # Engages only on geometries whose weights + fp32 grad accumulators fit
    # VMEM (C<=512 chains at flagship shapes); larger blocks stay on XLA.
    fused_resblock_grad: bool = False
    # Rematerialize residual blocks in the backward pass (activation-memory
    # vs FLOPs trade; use for larger batches or longer sequences).
    remat: bool = False


@dataclass(frozen=True)
class DiffusionConfig:
    """DDPM schedule (``/root/reference/models/diffusion.py:14``)."""

    timesteps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 0.02


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (``/root/reference/train.py:273-306``)."""

    batch_size: int = 16
    lr: float = 2e-4
    weight_decay: float = 1e-4
    epochs: int = 500
    ema_decay: float = 0.999
    grad_clip: float = 1.0
    cond_drop_prob: float = 0.2  # classifier-free guidance drop
    save_interval: int = 1000
    log_interval: int = 10
    val_cap_batches: int = 20
    # reference default 0.5: any integer (epoch+1) % 0.5 == 0 -> every epoch;
    # values >= 1 validate every N epochs (reference train.py:222,293)
    validate_every_epochs: float = 0.5
    seed: int = 0
    # "" disables LR decay (reference semantics)
    lr_decay_steps: Tuple[int, ...] = ()
    lr_decay_factors: Tuple[float, ...] = ()
    # bf16 activations on TPU replace the reference's fp16 AMP+GradScaler
    compute_dtype: str = "bfloat16"
    # storage dtype of the Adan moment/prev-grad trees (math stays fp32).
    # "bfloat16" halves the optimizer's HBM traffic — the train step is
    # optimizer-bandwidth-bound after fwd+bwd (profile_train_breakdown.py);
    # fp32 default preserves the reference's exact optimizer trajectory
    opt_dtype: str = "float32"
    # PRNG implementation for the training key stream: "threefry" (default,
    # reproducible reference-quality streams) or "rbg" (TPU-hardware
    # generator, ~1.1 ms/step cheaper at flagship scale; different stream)
    rng_impl: str = "threefry"
    # fold global-norm clipping into Adan's per-leaf kernels instead of
    # optax.chain(clip_by_global_norm, adan): bit-identical math, one less
    # full pass over the gradient tree per step. Opt-state layout drops the
    # chain's tuple wrapper — resume checkpoints with the same flag they
    # were written with (False = round-1 layout)
    fused_opt: bool = True
    # "xla": per-leaf optimizer+EMA fusions (658 kernels at flagship scale);
    # "pallas": bucketed multi-ref Pallas clip+Adan+EMA update — the
    # gradient tree is consumed leaf-by-leaf but many leaves share one
    # kernel launch (ops/pallas_opt.py). Same math, same AdanState layout
    # (checkpoints interchange); requires fused_opt=1
    opt_backend: str = "xla"
    # kernel choice for leaves too big to bucket (traffic-dominated):
    # "pallas" grid-chunked call per leaf, or "xla" plain expressions
    opt_big_backend: str = "pallas"
    # optimizer steps fused into one dispatch via lax.scan (1 = classic loop);
    # amortizes host/dispatch latency, at the cost of coarser logging
    steps_per_call: int = 1
    # prune to the newest N checkpoints (0 = keep all, reference behavior)
    keep_checkpoints: int = 0
    # concurrent device->host leaf transfers during checkpoint saves
    # (<=1 = one batched fetch). Measured neutral through the axon relay
    # (scripts/profile_ckpt_fetch.py); for hosts where transfer streams
    # actually parallelize
    ckpt_fetch_workers: int = 0
    # upload the packed dataset to HBM once and dispatch only batch indices
    # (needs steps_per_call > 1 and a packed dataset that fits device memory)
    device_data: bool = False
    # on-the-fly quality telemetry: every N epochs, DDIM-generate fixed
    # validation clips from the EMA weights and log mel metrics
    # (0 = off; framework extension, the reference measures only post-hoc)
    quality_every_epochs: int = 0
    quality_clips: int = 4
    quality_steps: int = 50
    quality_guidance: float = 2.1


@dataclass(frozen=True)
class DataConfig:
    """Clip geometry (``/root/reference/sometest/testnpz.py:58-75``)."""

    sequence_seconds: float = 6.0
    fps: int = 30
    align_mode: str = "interp"  # 'interp' | 'repeat'


@dataclass(frozen=True)
class LM2AConfig:
    """Top-level bundle stored in checkpoints and passed between CLIs."""

    mel: MelConfig = field(default_factory=MelConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)


def _to_jsonable(obj):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {k: _to_jsonable(v) for k, v in dataclasses.asdict(obj).items()}
    if isinstance(obj, tuple):
        return list(obj)
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    return obj


def config_to_dict(cfg: LM2AConfig) -> dict:
    return _to_jsonable(cfg)


def config_to_json(cfg: LM2AConfig) -> str:
    return json.dumps(config_to_dict(cfg), indent=2, sort_keys=True)


_SUBCONFIGS = {
    "mel": MelConfig,
    "model": ModelConfig,
    "diffusion": DiffusionConfig,
    "train": TrainConfig,
    "data": DataConfig,
}

_TUPLE_FIELDS = {"dim_mults", "lr_decay_steps", "lr_decay_factors"}


def _from_dict(cls, d: dict):
    kwargs = {}
    names = {f.name for f in dataclasses.fields(cls)}
    for k, v in d.items():
        if k not in names:
            continue  # forward compatibility: ignore unknown keys
        kwargs[k] = tuple(v) if k in _TUPLE_FIELDS and v is not None else v
    return cls(**kwargs)


def config_from_dict(d: dict) -> LM2AConfig:
    parts = {}
    for name, cls in _SUBCONFIGS.items():
        sub = d.get(name, {})
        parts[name] = _from_dict(cls, sub) if isinstance(sub, dict) else cls()
    return LM2AConfig(**parts)


def config_from_json(s: str) -> LM2AConfig:
    return config_from_dict(json.loads(s))
