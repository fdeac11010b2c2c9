from lm2a_tpu.models.attention import CrossAttentionFusion, MultiheadAttention
from lm2a_tpu.models.embedding import (
    CondProjection,
    TimestepEmbedding,
    sinusoidal_time_embed,
)
from lm2a_tpu.models.factory import build_cond_projection, build_denoiser, param_count
from lm2a_tpu.models.unet1d import (
    UNet1D,
    UNet1DUltimate,
    default_num_groups,
    upsample_linear_2x_align_corners,
)

__all__ = [
    "CrossAttentionFusion",
    "MultiheadAttention",
    "CondProjection",
    "TimestepEmbedding",
    "sinusoidal_time_embed",
    "build_cond_projection",
    "build_denoiser",
    "param_count",
    "UNet1D",
    "UNet1DUltimate",
    "default_num_groups",
    "upsample_linear_2x_align_corners",
]
