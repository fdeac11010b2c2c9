"""Checkpointing with real resume.

The reference saves whole-model ``torch.save`` dicts every 1000 steps
(``/root/reference/train.py:192-206``) but deliberately nulls any ``--ckpt``
and never resumes (``train.py:130-133``). Here checkpoints carry the full
TrainState (params, EMA, optimizer state, step), the config, and the dataset
statistics — and resume actually works.

Layout:
    <dir>/ckpt_step_<n>/state.npz   flattened state tree (uncompressed)
    <dir>/ckpt_step_<n>.meta.json   config + stats + epoch

Format note: the state is written as ONE uncompressed ``np.savez`` archive
keyed by ``jax.tree_util.keystr`` paths, after a single batched
``jax.device_get`` of the whole tree. Orbax's default zarr writer compresses
every chunk on the host CPU — measured ~0.6 MB/s for the flagship's 3.2 GB
TrainState on this image's single core (an hour per save); the raw format
writes at disk speed and the device->host fetch becomes the floor.
Restoring falls back to orbax for checkpoints written before this format.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Optional, Tuple

import jax
import numpy as np

from lm2a_tpu.core.config import LM2AConfig, config_from_dict, config_to_dict

_STEP_RE = re.compile(r"^ckpt_step_(\d+)$")
_STATE_FILE = "state.npz"


def checkpoint_path(ckpt_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), f"ckpt_step_{step}")


def fetch_tree(state, workers: int = 0):
    """Device->host fetch of a pytree, optionally with concurrent per-leaf
    transfers.

    ``workers <= 1`` is one batched ``jax.device_get`` (the round-1
    behavior). ``workers > 1`` fetches leaves through a thread pool,
    overlapping independent transfer streams. Measured on this image's
    axon relay it is throughput-NEUTRAL (the relay / 1-core host is the
    ceiling — ``scripts/profile_ckpt_fetch.py``, DEVNOTES); the knob
    targets real hosts where PCIe/NIC streams and deserialization do
    parallelize. PJRT transfers are thread-safe; leaves stay in tree
    order.
    """
    if workers is None or workers <= 1:
        return jax.device_get(state)
    from concurrent.futures import ThreadPoolExecutor

    flat, treedef = jax.tree_util.tree_flatten(state)
    with ThreadPoolExecutor(max_workers=workers) as ex:
        leaves = list(ex.map(jax.device_get, flat))
    return jax.tree_util.tree_unflatten(treedef, leaves)


_pending_write: Optional["threading.Thread"] = None  # noqa: F821


def wait_for_pending_save() -> None:
    """Block until an in-flight async checkpoint write has finished."""
    global _pending_write
    if _pending_write is not None:
        _pending_write.join()
        _pending_write = None


def save_checkpoint(
    ckpt_dir: str,
    state,
    cfg: LM2AConfig,
    *,
    epoch: int = 0,
    dataset_mean: float = 0.0,
    dataset_std: float = 1.0,
    extra: Optional[dict] = None,
    keep_last: int = 0,
    async_write: bool = False,
    fetch_workers: int = 0,
) -> str:
    """Save; with ``keep_last > 0`` prune all but the newest N checkpoints
    (0 keeps everything — the reference's accumulate-forever behavior).

    ``async_write=True`` returns as soon as the device->host fetch completes
    and does the (CPU-bound) archive write + retention pruning on a
    background thread. The fetch itself must stay on the caller's thread:
    the train step donates its input state, so a backgrounded fetch could
    read donated-away device buffers. The tmp-dir/rename protocol keeps a
    crash mid-write from ever exposing a partial checkpoint, and
    ``wait_for_pending_save`` (called at the start of the next save and at
    loop exit) serializes writers.
    """
    import threading

    global _pending_write
    os.makedirs(ckpt_dir, exist_ok=True)
    wait_for_pending_save()
    # the fetch is the save's dominant cost through a remote device;
    # fetch_workers > 1 overlaps per-leaf transfers where streams
    # parallelize (see fetch_tree)
    host_state = fetch_tree(state, fetch_workers)
    step = int(host_state.step)
    path = checkpoint_path(ckpt_dir, step)
    flat, _ = jax.tree_util.tree_flatten_with_path(host_state)

    def _npz_safe(a):
        # np.savez writes ml_dtypes arrays (bf16 optimizer state with
        # --opt_dtype bfloat16) as raw void bytes and load returns '|V2';
        # store the bit pattern as uint16 instead — restore_checkpoint
        # views it back through the template's dtype.
        a = np.asarray(a)
        if a.dtype.kind not in "biufc":  # bfloat16 etc.
            return a.view(np.uint16) if a.dtype.itemsize == 2 else a
        return a

    arrays = {jax.tree_util.keystr(kp): _npz_safe(leaf) for kp, leaf in flat}
    meta = {
        "step": step,
        "epoch": epoch,
        "dataset_mean": float(dataset_mean),
        "dataset_std": float(dataset_std),
        "config": config_to_dict(cfg),
    }
    if extra:
        meta.update(extra)

    def _write():
        tmp = path + ".tmp-write"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        np.savez(os.path.join(tmp, _STATE_FILE), **arrays)
        shutil.rmtree(path, ignore_errors=True)
        os.rename(tmp, path)
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, indent=2)
        if keep_last and keep_last > 0:
            for old_step in list_checkpoints(ckpt_dir)[:-keep_last]:
                old = checkpoint_path(ckpt_dir, old_step)
                shutil.rmtree(old, ignore_errors=True)
                try:
                    os.remove(old + ".meta.json")
                except OSError:
                    pass

    if async_write:
        _pending_write = threading.Thread(target=_write, daemon=True)
        _pending_write.start()
    else:
        _write()
    return path


def list_checkpoints(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    steps = []
    for name in os.listdir(ckpt_dir):
        m = _STEP_RE.match(name)
        if m and os.path.isdir(os.path.join(ckpt_dir, name)):
            steps.append(int(m.group(1)))
    return sorted(steps)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    steps = list_checkpoints(ckpt_dir)
    return checkpoint_path(ckpt_dir, steps[-1]) if steps else None


def load_metadata(path: str) -> dict:
    with open(path + ".meta.json") as f:
        return json.load(f)


def restore_checkpoint(path: str, state_template) -> Tuple[Any, dict]:
    """Restore (TrainState, metadata). ``state_template`` supplies the tree
    structure/shapes (an initialized TrainState works)."""
    path = os.path.abspath(path)
    npz = os.path.join(path, _STATE_FILE)
    if os.path.exists(npz):
        with np.load(npz) as z:
            flat, treedef = jax.tree_util.tree_flatten_with_path(state_template)
            leaves = []
            for kp, tmpl in flat:
                arr = z[jax.tree_util.keystr(kp)]
                if arr.shape != tuple(np.shape(tmpl)):
                    raise ValueError(
                        f"checkpoint leaf {jax.tree_util.keystr(kp)} has shape "
                        f"{arr.shape}, template expects {np.shape(tmpl)}"
                    )
                tdt = np.dtype(getattr(tmpl, "dtype", arr.dtype))
                if arr.dtype != tdt and arr.dtype.itemsize == tdt.itemsize:
                    # bf16 state was stored as its uint16 bit pattern
                    arr = arr.view(tdt)
                leaves.append(arr)
            state = jax.tree_util.tree_unflatten(treedef, leaves)
    else:  # orbax fallback for checkpoints written before the npz format
        import orbax.checkpoint as ocp

        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(path, abstract)
    meta = load_metadata(path) if os.path.exists(path + ".meta.json") else {}
    return state, meta


def config_from_checkpoint(path: str) -> LM2AConfig:
    return config_from_dict(load_metadata(path)["config"])
