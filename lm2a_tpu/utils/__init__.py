from lm2a_tpu.utils.audio import read_wav, resample_poly, write_wav
from lm2a_tpu.utils.logging import TrainLogger
from lm2a_tpu.utils.profiling import StepTimer, device_memory_stats, trace

__all__ = [
    "read_wav",
    "resample_poly",
    "write_wav",
    "TrainLogger",
    "StepTimer",
    "device_memory_stats",
    "trace",
]
