"""Parallelism surface.

The reference is strictly single-device (SURVEY.md §2.3): no
torch.distributed, no NCCL, nothing to port. The TPU-native parallelism
story lives in :mod:`lm2a_tpu.core.mesh` (a ``(data, model)`` mesh with
batch-axis sharding; GSPMD inserts the gradient psum over ICI) and
:mod:`lm2a_tpu.training.train_step` (the sharded train/eval steps). This
package re-exports that surface under the conventional name and is the
landing spot for TP/SP extensions (the models are written over a named time
axis so sequence sharding is an annotation, not a rewrite).
"""

from lm2a_tpu.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
]
