"""Parallelism surface.

The reference is strictly single-device (SURVEY.md §2.3): no
torch.distributed, no NCCL, nothing to port. The TPU-native parallelism
story lives in :mod:`lm2a_tpu.core.mesh` (a ``(data, model)`` mesh with
batch-axis sharding; GSPMD inserts the gradient psum over ICI) and
:mod:`lm2a_tpu.training.train_step` (the sharded train/eval steps). This
package re-exports that surface under the conventional name and is the
home of the TP (tensor.py: output-feature param sharding) and SP
(sequence.py: time-axis activation sharding) extensions.
"""

from lm2a_tpu.parallel.sequence import make_sequence_sharded_sampler
from lm2a_tpu.parallel.tensor import (
    make_tp_sampler,
    make_tp_train_step,
    shard_state_tp,
    state_shardings_tp,
    tp_shardings,
)
from lm2a_tpu.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "make_sequence_sharded_sampler",
    "make_tp_sampler",
    "make_tp_train_step",
    "shard_state_tp",
    "state_shardings_tp",
    "tp_shardings",
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
]
