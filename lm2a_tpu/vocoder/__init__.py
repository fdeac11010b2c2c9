from lm2a_tpu.vocoder.bigvgan import (
    BIGVGAN_22KHZ_80BAND,
    BIGVGAN_BASE_22KHZ_80BAND,
    BIGVGAN_V2_24KHZ_100BAND,
    BIGVGAN_V2_44KHZ_128BAND,
    AMPBlock1,
    AMPBlock2,
    BigVGANGenerator,
    SnakeAlias,
    VocoderConfig,
)
from lm2a_tpu.vocoder.convert import convert_bigvgan, load_bigvgan_torch
from lm2a_tpu.vocoder.filters import (
    downsample2x,
    kaiser_sinc_filter1d,
    upsample2x,
)
from lm2a_tpu.vocoder.vocode import Vocoder, batch_npz_to_wav, npz_to_wav

__all__ = [
    "BIGVGAN_22KHZ_80BAND",
    "BIGVGAN_BASE_22KHZ_80BAND",
    "BIGVGAN_V2_24KHZ_100BAND",
    "BIGVGAN_V2_44KHZ_128BAND",
    "AMPBlock1",
    "AMPBlock2",
    "BigVGANGenerator",
    "SnakeAlias",
    "VocoderConfig",
    "convert_bigvgan",
    "load_bigvgan_torch",
    "downsample2x",
    "kaiser_sinc_filter1d",
    "upsample2x",
    "Vocoder",
    "batch_npz_to_wav",
    "npz_to_wav",
]
