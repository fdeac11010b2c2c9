from lm2a_tpu.inference.sample import (
    FALLBACK_MEL_MEAN,
    FALLBACK_MEL_STD,
    LoadedModels,
    generate_mel,
    load_models,
    sample_from_npz,
)

__all__ = [
    "FALLBACK_MEL_MEAN",
    "FALLBACK_MEL_STD",
    "LoadedModels",
    "generate_mel",
    "load_models",
    "sample_from_npz",
]
