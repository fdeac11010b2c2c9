"""Dataset reading and batching.

Replaces the reference's torch ``MelDataset`` + 8-worker ``DataLoader``
(``/root/reference/datasetcode/dataset.py:109-187``, ``train.py:58``) with a
TPU-idiomatic two-tier design:

1. :class:`MelNpzDataset` — per-file npz reader with the same alignment
   contract: everything is aligned to the mel time axis (T = mel.shape[1],
   516 for canonical clips); mel is transposed to (T, 80); motion/lyrics are
   linearly interpolated ('interp', the reference default) or repeat-padded.
2. :func:`pack_dataset` / :class:`PackedDataset` — a one-time pack of a
   split into flat memory-mapped ``.npy`` arrays. Epochs then cost one fancy
   index per batch — no per-step decompression, no worker processes (the
   decompress-per-epoch work the reference pays 8 workers for disappears).

:class:`BatchIterator` yields stacked numpy batches (shuffled, seeded,
drop-remainder for static shapes) and :func:`device_prefetch` overlaps the
host->device copy of batch k+1 with the compute of batch k.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from lm2a_tpu.data.schema import load_sample, normalize_mel_layout
from lm2a_tpu.ops.resample import match_len

_EXCLUDE = {"motion_stats.npz"}


def list_npz(npz_dir: str) -> List[str]:
    files = sorted(
        f for f in os.listdir(npz_dir) if f.endswith(".npz") and f not in _EXCLUDE
    )
    return [os.path.join(npz_dir, f) for f in files]


class MelNpzDataset:
    """Aligned per-sample access over a directory of npz shards."""

    def __init__(self, npz_dir: str, align_mode: str = "interp"):
        self.npz_dir = npz_dir
        self.files = list_npz(npz_dir)
        self.align_mode = align_mode

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> Dict:
        s = load_sample(self.files[idx])
        mel = normalize_mel_layout(s.mel)
        T = mel.shape[1]
        mel_out = np.ascontiguousarray(mel.T)  # (T, 80) channels-last
        motion = match_len(s.motion, T, mode=self.align_mode)
        lyrics = match_len(s.lyrics, T, mode=self.align_mode)
        return {
            "mel": mel_out.astype(np.float32),
            "motion": motion.astype(np.float32),
            "lyrics": lyrics.astype(np.float32),
            "sr": s.sr,
            "hop_length": s.hop_length,
            "path": self.files[idx],
        }


PACK_META = "pack_meta.json"


def pack_dataset(npz_dir: str, out_dir: str, align_mode: str = "interp") -> str:
    """One-time pack of a split into mmap-able flat arrays.

    Writes ``mel.npy (N,T,80)``, ``motion.npy (N,T,234)``,
    ``lyrics.npy (N,T,768)`` plus ``pack_meta.json`` with the file list.
    """
    ds = MelNpzDataset(npz_dir, align_mode=align_mode)
    if len(ds) == 0:
        raise ValueError(f"no npz files in {npz_dir}")
    os.makedirs(out_dir, exist_ok=True)
    first = ds[0]
    n = len(ds)
    arrays = {}
    for key in ("mel", "motion", "lyrics"):
        shape = (n,) + first[key].shape
        arrays[key] = np.lib.format.open_memmap(
            os.path.join(out_dir, f"{key}.npy"), mode="w+", dtype=np.float32,
            shape=shape,
        )
    for i in range(n):
        item = ds[i]
        for key in ("mel", "motion", "lyrics"):
            arrays[key][i] = item[key]
    for a in arrays.values():
        a.flush()
    meta = {
        "num_samples": n,
        "files": [os.path.basename(f) for f in ds.files],
        "sr": int(first["sr"]),
        "hop_length": int(first["hop_length"]),
        "align_mode": align_mode,
    }
    with open(os.path.join(out_dir, PACK_META), "w") as f:
        json.dump(meta, f)
    return out_dir


class PackedDataset:
    """Memory-mapped packed split; batches are one fancy-index per array.

    When the native C++ gatherer (``native/lm2a_loader.cc``) builds, batch
    assembly moves off the Python thread: the BatchIterator pipelines a
    submit/wait double-buffer so batch k+1 is gathered while batch k trains.
    """

    def __init__(self, pack_dir: str, use_native: bool = True):
        self.pack_dir = pack_dir
        with open(os.path.join(pack_dir, PACK_META)) as f:
            self.meta = json.load(f)
        self.mel = np.load(os.path.join(pack_dir, "mel.npy"), mmap_mode="r")
        self.motion = np.load(os.path.join(pack_dir, "motion.npy"), mmap_mode="r")
        self.lyrics = np.load(os.path.join(pack_dir, "lyrics.npy"), mmap_mode="r")
        self._native = None
        if use_native:
            try:
                from lm2a_tpu.data.native_loader import NativeGather, native_available

                if native_available():
                    self._native = NativeGather(pack_dir)
            except Exception:
                self._native = None

    @property
    def native(self):
        return self._native

    def __len__(self) -> int:
        return self.mel.shape[0]

    def gather(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        if self._native is not None:
            return self._native.gather(np.asarray(idx))
        return {
            "mel": np.asarray(self.mel[idx]),
            "motion": np.asarray(self.motion[idx]),
            "lyrics": np.asarray(self.lyrics[idx]),
        }


class BatchIterator:
    """Seeded, shuffled, drop-remainder batches with static shapes.

    Works over either a :class:`PackedDataset` (fast path) or a
    :class:`MelNpzDataset` (stacks per-file reads).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        self.epoch += 1
        bs = self.batch_size
        starts = list(range(0, n - bs + 1, bs))
        native = (
            self.dataset.native
            if isinstance(self.dataset, PackedDataset)
            else None
        )
        if native is not None and starts:
            # pipeline: the C++ worker gathers batch k+1 while k is consumed
            native.submit(order[starts[0] : starts[0] + bs])
            try:
                for i, start in enumerate(starts):
                    out = native.wait()
                    if i + 1 < len(starts):
                        nxt = starts[i + 1]
                        native.submit(order[nxt : nxt + bs])
                    yield out
            finally:
                # abandoned mid-epoch (consumer broke out): drain the
                # in-flight request so the dataset's shared FIFO stays
                # aligned — otherwise the NEXT iteration over this dataset
                # would receive this epoch's stale batch as its first
                while native.pending:
                    native.wait()
            return
        for start in starts:
            idx = order[start : start + bs]
            if isinstance(self.dataset, PackedDataset):
                yield self.dataset.gather(idx)
            else:
                items = [self.dataset[int(i)] for i in idx]
                yield {
                    k: np.stack([it[k] for it in items])
                    for k in ("mel", "motion", "lyrics")
                }


def superbatch_iterator(
    dataset, batch_size: int, k: int, shuffle: bool = True, seed: int = 0
) -> Iterator[tuple]:
    """Epoch stream for the fused K-step dispatch mode.

    Yields ``("multi", {key: (K, B, T, .)})`` for each full group of K
    batches — gathered as ONE k*bs-row native submit/wait (the C++ worker
    assembles group g+1 while group g trains) and reshaped for
    ``make_multistep_train_step`` — then ``("single", {key: (B, T, .)})``
    for the tail batches that don't fill a group. Replaces the synchronous
    Python-thread K-stacking the fused mode previously paid per dispatch.
    """
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        rng = np.random.default_rng(seed)
        rng.shuffle(order)
    bs = batch_size
    group = bs * k
    n_groups = n // group
    tail_start = n_groups * group
    tail_starts = list(range(tail_start, n - bs + 1, bs))

    def reshape_multi(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        return {
            key: flat[key].reshape((k, bs) + flat[key].shape[1:])
            for key in ("mel", "motion", "lyrics")
        }

    packed = isinstance(dataset, PackedDataset)
    native = dataset.native if packed else None

    if native is not None and n_groups:
        # pipeline: the C++ worker gathers group g+1 while g is consumed
        native.submit(order[:group])
        try:
            for g in range(n_groups):
                flat = native.wait()
                if g + 1 < n_groups:
                    native.submit(order[(g + 1) * group : (g + 2) * group])
                yield "multi", reshape_multi(flat)
        finally:
            # keep the dataset's FIFO aligned if the consumer broke out
            while native.pending:
                native.wait()
    else:
        for g in range(n_groups):
            idx = order[g * group : (g + 1) * group]
            if packed:
                flat = dataset.gather(idx)
            else:
                items = [dataset[int(i)] for i in idx]
                flat = {
                    key: np.stack([it[key] for it in items])
                    for key in ("mel", "motion", "lyrics")
                }
            yield "multi", reshape_multi(flat)

    for start in tail_starts:
        idx = order[start : start + bs]
        if packed:
            yield "single", dataset.gather(idx)
        else:
            items = [dataset[int(i)] for i in idx]
            yield "single", {
                key: np.stack([it[key] for it in items])
                for key in ("mel", "motion", "lyrics")
            }


class SuperbatchStream:
    """Cross-epoch pipelined superbatch source for the fused K-step mode.

    Same per-epoch batch stream as :func:`superbatch_iterator` (identical
    seeded permutations), but the stream object outlives epochs: up to
    ``depth`` group gathers stay queued in the native C++ worker AT ALL
    TIMES, including across epoch boundaries — while the tail of epoch e
    trains (and while validation/checkpointing run between epochs), the
    first groups of epoch e+1 are already being assembled. Previously
    every epoch started with a cold synchronous gather.

    Falls back to :func:`superbatch_iterator` when the dataset has no
    native gatherer (no readahead, same batches).
    """

    def __init__(self, dataset, batch_size: int, k: int, base_seed: int = 0,
                 shuffle: bool = True, total_epochs: Optional[int] = None,
                 start_epoch: int = 0, depth: int = 2):
        self.ds = dataset
        self.bs = batch_size
        self.k = k
        self.base_seed = base_seed
        self.shuffle = shuffle
        self.total_epochs = total_epochs
        self.depth = depth
        self.native = getattr(dataset, "native", None)
        n = len(dataset)
        self.group = batch_size * k
        self.n_groups = n // self.group
        self._orders: Dict[int, np.ndarray] = {}
        # next (epoch, group) the native queue should gather
        self._cursor: Optional[tuple] = (
            (start_epoch, 0) if self.n_groups else None
        )
        self._next_epoch = start_epoch

    def _order(self, epoch: int) -> np.ndarray:
        if epoch not in self._orders:
            order = np.arange(len(self.ds))
            if self.shuffle:
                np.random.default_rng(self.base_seed + epoch).shuffle(order)
            # keep only the frontier epochs cached
            for e in [e for e in self._orders if e < epoch - 1]:
                del self._orders[e]
            self._orders[epoch] = order
        return self._orders[epoch]

    def _advance_cursor(self):
        e, g = self._cursor
        g += 1
        if g >= self.n_groups:
            e, g = e + 1, 0
        self._cursor = None if (
            self.total_epochs is not None and e >= self.total_epochs
        ) else (e, g)

    def _fill_queue(self):
        while (self._cursor is not None
               and self.native.pending < self.depth):
            e, g = self._cursor
            order = self._order(e)
            self.native.submit(order[g * self.group:(g + 1) * self.group])
            self._advance_cursor()

    def drain(self) -> None:
        """Retire the stream: wait out every queued native gather so the
        dataset's shared FIFO is clean for any later consumer. Call when
        abandoning the stream before ``total_epochs`` (early stop)."""
        if self.native is not None:
            while self.native.pending:
                self.native.wait()
        self._cursor = None

    def epoch(self, epoch: int) -> Iterator[tuple]:
        """Yield epoch ``epoch``'s ("multi"/"single", batch) stream.

        Epochs must be consumed in order and to exhaustion (the queue
        gathers ahead on that assumption — abandoning mid-epoch is fine
        only if the stream is then retired with :meth:`drain`, which the
        training loop does on early stop)."""
        if epoch != self._next_epoch:
            raise ValueError(
                f"epochs must be consumed in order: expected "
                f"{self._next_epoch}, got {epoch}"
            )
        self._next_epoch = epoch + 1
        order = self._order(epoch)
        bs, group = self.bs, self.group
        n = len(self.ds)
        k = self.k

        def reshape_multi(flat):
            return {
                key: flat[key].reshape((k, bs) + flat[key].shape[1:])
                for key in ("mel", "motion", "lyrics")
            }

        if self.native is not None and self.n_groups:
            self._fill_queue()
            for _ in range(self.n_groups):
                flat = self.native.wait()
                self._fill_queue()
                yield "multi", reshape_multi(flat)
            for start in range(self.n_groups * group, n - bs + 1, bs):
                yield "single", self.ds.gather(order[start:start + bs])
        else:
            yield from superbatch_iterator(
                self.ds, bs, k, shuffle=self.shuffle,
                seed=self.base_seed + epoch,
            )


def device_prefetch(iterator, mesh=None, depth: int = 2, put_fn=None):
    """Overlap host->device transfer with compute.

    A small background thread stages the next batch onto device (sharded over
    the mesh's data axis when given) while the current one is being consumed —
    the role DataLoader workers + pin_memory play in the reference.
    ``put_fn`` overrides the staging transform (used by the fused-dispatch
    mode, whose items are tagged and shard on a different axis).
    """
    import jax

    from lm2a_tpu.core.mesh import batch_sharding

    sharding = batch_sharding(mesh) if mesh is not None else None

    def put(batch):
        if put_fn is not None:
            return put_fn(batch)
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    sem = threading.Semaphore(depth)
    done = object()
    out: List = []
    lock = threading.Condition()
    stop = threading.Event()

    def producer():
        # hold the epoch generator so an abandoning consumer can have it
        # closed from THIS thread (closing a generator that another thread
        # is executing raises ValueError)
        it = iter(iterator)
        try:
            for batch in it:
                sem.acquire()
                if stop.is_set():
                    return
                staged = put(batch)
                with lock:
                    out.append(staged)
                    lock.notify()
            with lock:
                out.append(done)
                lock.notify()
        except BaseException as e:  # propagate instead of hanging the consumer
            with lock:
                out.append(e)
                lock.notify()
        finally:
            if stop.is_set():
                # consumer abandoned us mid-epoch: run the source's cleanup
                # (e.g. BatchIterator drains its in-flight native gather)
                close = getattr(it, "close", None)
                if close is not None:
                    close()

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            with lock:
                while not out:
                    lock.wait()
                item = out.pop(0)
            if item is done:
                return
            if isinstance(item, BaseException):
                raise item
            sem.release()
            yield item
    finally:
        # consumer broke out (or finished): unblock and retire the producer
        # so it can't sit on sem.acquire() forever pinning staged batches
        stop.set()
        sem.release()
        t.join(timeout=60.0)


def compute_dataset_stats(npz_dir: str, cap_files: Optional[int] = None):
    """Global mel mean/std over a split (``/root/reference/train.py:29-50``).

    Uses a streaming accumulator instead of concatenating every mel in RAM.
    """
    from lm2a_tpu.ops.moments import RunningMoments

    files = list_npz(npz_dir)
    if cap_files is not None:
        files = files[:cap_files]
    rm = RunningMoments()
    for path in files:
        try:
            d = np.load(path, allow_pickle=True)
            mel = normalize_mel_layout(d["mel"])
        except Exception:
            continue
        rm.update(mel.reshape(-1, 1))
    if rm.count == 0:
        raise RuntimeError(f"no mel data found in {npz_dir}")
    # population std (ddof=0) to match numpy's default arr.std()
    std = float(np.sqrt(rm.m2[0] / rm.count))
    return float(rm.mean[0]), std
