"""ctypes bindings for the native batch gatherer (native/lm2a_loader.cc).

Compiled lazily with g++ on first use and cached next to the source; when the
toolchain or build is unavailable everything falls back to the numpy path in
``lm2a_tpu.data.dataset`` — the native loader is an accelerator, not a
dependency.
"""

from __future__ import annotations

import collections
import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "lm2a_loader.cc")
_LIB = os.path.join(os.path.dirname(_SRC), "liblm2a_loader.so")
_BUILD_LOCK = threading.Lock()
_lib_handle = None
_build_failed = False


def _build() -> Optional[str]:
    src = os.path.abspath(_SRC)
    lib = os.path.abspath(_LIB)
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             "-o", lib, src],
            check=True, capture_output=True, text=True,
        )
        return lib
    except Exception as e:
        print(f"native loader build failed ({e}); using numpy fallback")
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib_handle, _build_failed
    if _lib_handle is not None:
        return _lib_handle
    if _build_failed:
        return None
    with _BUILD_LOCK:
        if _lib_handle is not None:
            return _lib_handle
        lib_path = _build()
        if lib_path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(lib_path)
        lib.lm2a_loader_open.restype = ctypes.c_void_p
        lib.lm2a_loader_open.argtypes = [ctypes.c_char_p] * 3
        lib.lm2a_loader_rows.restype = ctypes.c_int64
        lib.lm2a_loader_rows.argtypes = [ctypes.c_void_p]
        lib.lm2a_loader_row_elems.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
        ptr_f = ctypes.POINTER(ctypes.c_float)
        ptr_i = ctypes.POINTER(ctypes.c_int64)
        for fn in ("lm2a_loader_gather", "lm2a_loader_submit"):
            f = getattr(lib, fn)
            f.restype = ctypes.c_int
            f.argtypes = [ctypes.c_void_p, ptr_i, ctypes.c_int64,
                          ptr_f, ptr_f, ptr_f]
        lib.lm2a_loader_wait.restype = ctypes.c_int
        lib.lm2a_loader_wait.argtypes = [ctypes.c_void_p]
        lib.lm2a_loader_close.argtypes = [ctypes.c_void_p]
        _lib_handle = lib
        return lib


def native_available() -> bool:
    return _load() is not None


class NativeGather:
    """Batch gatherer over a packed split directory (mel/motion/lyrics.npy).

    ``gather(idx)`` is synchronous; ``submit(idx)`` + ``wait()`` overlap
    batch assembly with computation. Up to 4 requests may be queued
    (FIFO); ``wait()`` returns the oldest submitted batch, so readahead
    can cross epoch boundaries.
    """

    def __init__(self, pack_dir: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        paths = [os.path.join(pack_dir, f"{k}.npy").encode()
                 for k in ("mel", "motion", "lyrics")]
        self._h = lib.lm2a_loader_open(*paths)
        if not self._h:
            raise RuntimeError(f"failed to open packed arrays in {pack_dir}")
        self.rows = int(lib.lm2a_loader_rows(self._h))
        dims = (ctypes.c_int64 * 3)()
        lib.lm2a_loader_row_elems(self._h, dims)
        self._row_elems = tuple(int(d) for d in dims)
        # recover trailing shapes from the .npy headers via numpy (cheap)
        self.shapes = {}
        for k in ("mel", "motion", "lyrics"):
            arr = np.load(os.path.join(pack_dir, f"{k}.npy"), mmap_mode="r")
            self.shapes[k] = tuple(arr.shape[1:])
        self._pending = collections.deque()

    @property
    def pending(self) -> int:
        """Number of submitted-but-not-waited requests."""
        return len(self._pending)

    def _alloc(self, n: int) -> Dict[str, np.ndarray]:
        return {
            k: np.empty((n,) + self.shapes[k], dtype=np.float32)
            for k in ("mel", "motion", "lyrics")
        }

    @staticmethod
    def _ptrs(out: Dict[str, np.ndarray]):
        ptr_f = ctypes.POINTER(ctypes.c_float)
        return [out[k].ctypes.data_as(ptr_f) for k in ("mel", "motion", "lyrics")]

    def gather(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        idx = np.ascontiguousarray(idx, dtype=np.int64)
        out = self._alloc(len(idx))
        rc = self._lib.lm2a_loader_gather(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx), *self._ptrs(out),
        )
        if rc != 0:
            raise IndexError(f"native gather failed (rc={rc})")
        return out

    def submit(self, idx: np.ndarray) -> None:
        idx = np.ascontiguousarray(idx, dtype=np.int64)
        out = self._alloc(len(idx))
        rc = self._lib.lm2a_loader_submit(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx), *self._ptrs(out),
        )
        if rc != 0:
            raise RuntimeError(f"native submit failed (rc={rc})")
        self._pending.append((idx, out))  # keep buffers alive for the worker

    def wait(self) -> Dict[str, np.ndarray]:
        """Return the OLDEST submitted batch (FIFO), blocking until its
        gather has fully completed."""
        if not self._pending:
            raise RuntimeError("no submitted request")
        self._lib.lm2a_loader_wait(self._h)
        _, out = self._pending.popleft()
        return out

    def close(self) -> None:
        if self._h:
            while self._pending:
                self._lib.lm2a_loader_wait(self._h)
                self._pending.popleft()
            self._lib.lm2a_loader_close(self._h)
            self._h = None

    def __del__(self):  # noqa: D105
        try:
            self.close()
        except Exception:
            pass
