"""Device mesh and sharding helpers.

The reference is strictly single-process/single-GPU (no torch.distributed
anywhere; see ``/root/reference/train.py:54``). The TPU build makes the device
mesh a first-class object: a 1-D ``data`` axis for data parallelism over ICI
by default, with room for a ``model`` axis so tensor/sequence sharding is an
extension rather than a rewrite.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    With ``model=1`` (the default) this is a pure data-parallel mesh — the
    only parallelism the reference workload needs (SURVEY.md §2.3) — but the
    axis is always present so shardings written against it stay valid when
    model parallelism is enabled.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dimension across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, schedules, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays on device, batch-sharded on ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
