from lm2a_tpu.ops.mel import (
    frame_count,
    hann_window_periodic,
    mel_spectrogram,
    mel_spectrogram_jit,
    slaney_mel_filterbank,
    stft_magnitude,
)
from lm2a_tpu.ops.moments import RunningMoments
from lm2a_tpu.ops.pallas_attention import attention_core, attention_core_reference
from lm2a_tpu.ops.motion import (
    acceleration,
    gaussian_kernel,
    gaussian_smooth,
    motion_features,
    velocity,
)
from lm2a_tpu.ops.resample import linear_resample, match_len

__all__ = [
    "frame_count",
    "hann_window_periodic",
    "mel_spectrogram",
    "mel_spectrogram_jit",
    "slaney_mel_filterbank",
    "stft_magnitude",
    "RunningMoments",
    "attention_core",
    "attention_core_reference",
    "acceleration",
    "gaussian_kernel",
    "gaussian_smooth",
    "motion_features",
    "velocity",
    "linear_resample",
    "match_len",
]
