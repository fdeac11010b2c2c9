from lm2a_tpu.core.config import (
    DataConfig,
    DiffusionConfig,
    LM2AConfig,
    MelConfig,
    ModelConfig,
    TrainConfig,
    config_from_dict,
    config_from_json,
    config_to_dict,
    config_to_json,
)
from lm2a_tpu.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from lm2a_tpu.core.precision import dtype_from_str

__all__ = [
    "DataConfig",
    "DiffusionConfig",
    "LM2AConfig",
    "MelConfig",
    "ModelConfig",
    "TrainConfig",
    "config_from_dict",
    "config_from_json",
    "config_to_dict",
    "config_to_json",
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
    "dtype_from_str",
]
