"""Multi-host (multi-process) execution layer.

The reference is strictly single-process (no ``torch.distributed`` anywhere,
``/root/reference/train.py:54``); this module is the TPU-pod extension
sketched in docs/SCALING.md: ``jax.distributed.initialize()`` before mesh
construction, the ``data`` axis crossing DCN (gradient psums are
latency-tolerant), ``model`` staying inside a slice (halo exchanges are
not).

Design: every process loads the full (seed-identical) global batch from its
local dataset copy, keeps only the rows its addressable devices own, and
assembles the global sharded array with
``jax.make_array_from_process_local_data``.  With ``process_count() == 1``
every helper degrades to the single-process fast path, so the training loop
has exactly one code path.

Verified by a REAL two-process run (CPU collectives over the distributed
runtime) in ``tests/test_multihost.py``: 2 procs x 2 virtual devices == one
4-device process, identical losses.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from lm2a_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh

_ENV_COORD = "LM2A_COORDINATOR"
_ENV_NPROC = "LM2A_NUM_PROCESSES"
_ENV_PID = "LM2A_PROCESS_ID"


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the multi-process runtime. Call BEFORE any other jax use.

    Explicit arguments win; otherwise ``LM2A_COORDINATOR`` /
    ``LM2A_NUM_PROCESSES`` / ``LM2A_PROCESS_ID`` env vars; otherwise (on a
    TPU pod slice) jax's own auto-detection. Returns True when a
    multi-process runtime was initialized, False for the single-process
    no-op (no coordinator configured anywhere).
    """
    coordinator = coordinator or os.environ.get(_ENV_COORD)
    if num_processes is None and os.environ.get(_ENV_NPROC):
        num_processes = int(os.environ[_ENV_NPROC])
    if process_id is None and os.environ.get(_ENV_PID):
        process_id = int(os.environ[_ENV_PID])
    if coordinator is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_primary() -> bool:
    """True on the process that owns logging/checkpoint writes."""
    return jax.process_index() == 0


def barrier(name: str = "lm2a") -> None:
    """Block until every process reaches this point (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def make_hybrid_mesh(model: int = 1) -> "jax.sharding.Mesh":
    """(data, model) mesh over ALL processes' devices.

    Multi-process: ``mesh_utils.create_hybrid_device_mesh`` puts the
    process granularity on the leading (data) axis, so data parallelism
    crosses DCN while the model axis stays inside one process's ICI
    domain. Single-process: identical to ``make_mesh``.
    """
    if jax.process_count() == 1:
        return make_mesh(model=model)
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    slices = {getattr(d, "slice_index", 0) for d in jax.devices()}
    if len(slices) > 1:
        # multi-slice pod: DCN runs between slices; ICI spans each slice
        per_granule = jax.device_count() // len(slices)
        dcn = len(slices)
        process_is_granule = False
    else:
        # single slice or CPU simulation: the process is the DCN granule
        per_granule = jax.local_device_count()
        dcn = jax.process_count()
        process_is_granule = True
    if per_granule % model != 0:
        raise ValueError(
            f"model={model} must divide the per-granule device count "
            f"{per_granule}: the model axis cannot cross DCN (halo "
            "exchanges / TP reductions are latency-sensitive)"
        )
    devices = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(per_granule // model, model),
        dcn_mesh_shape=(dcn, 1),
        process_is_granule=process_is_granule,
    )
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def local_batch_slice(mesh, global_batch_size: int) -> slice:
    """The contiguous row range of a ``P('data')``-sharded global batch
    owned by THIS process's devices.

    Derived from the sharding's own device->index map (not assumed from the
    process id), so any mesh layout is either handled correctly or rejected
    loudly.
    """
    sh = batch_sharding(mesh)
    index_map = sh.devices_indices_map((global_batch_size,))
    pid = jax.process_index()
    lows, highs = [], []
    for dev, idx in index_map.items():
        if dev.process_index != pid:
            continue
        sl = idx[0]
        lows.append(0 if sl.start is None else sl.start)
        highs.append(global_batch_size if sl.stop is None else sl.stop)
    lo, hi = min(lows), max(highs)
    # devices within one row-shard repeat the same slice (model axis);
    # the distinct slices must tile [lo, hi) exactly
    distinct = sorted(set(zip(lows, highs)))
    run = lo
    for l, h in distinct:
        if l != run:
            raise ValueError(
                f"process {pid} owns non-contiguous batch rows {distinct}; "
                "use make_hybrid_mesh() so each process's rows are "
                "contiguous"
            )
        run = h
    return slice(lo, hi)


def put_global_batch(mesh, local_batch):
    """Assemble the global batch-sharded arrays from this process's rows.

    ``local_batch`` holds ONLY the rows from :func:`local_batch_slice`.
    Single-process this is a plain sharded ``device_put``.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), local_batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local_batch,
    )


def put_replicated(mesh, tree):
    """Replicate a (seed-identical on every process) host tree globally."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    host = jax.tree.map(np.asarray, tree)
    if jax.process_count() == 1:
        return jax.device_put(host, rep)
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        host, mesh, P()
    )
