"""ctypes bindings for the native (C++) data-loading runtime.

See native/dataloader.cc — a libjpeg batch decoder, a raw .npy reader, and
an asynchronous ring-buffer prefetcher, all GIL-free.  This replaces the
reference's Python DataLoader worker pool (reference train.py:101-122) on
the host side of the training pipeline.

Builds on demand via tools/build_native.sh; every entry point degrades
gracefully (raises ImportError) when no C++ toolchain is present so the
pure-Python reader remains the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO_PATH = os.path.join(_REPO, "build", "libs2l_dataloader.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        script = os.path.join(_REPO, "tools", "build_native.sh")
        try:
            subprocess.run([script], check=True, capture_output=True)
        except Exception as e:  # no toolchain → pure-Python fallback
            raise ImportError(f"native loader unavailable: {e}")
    lib = ctypes.CDLL(_SO_PATH)
    lib.s2l_decode_jpeg_batch.restype = ctypes.c_int
    lib.s2l_read_npy_batch.restype = ctypes.c_int
    lib.s2l_loader_create.restype = ctypes.c_void_p
    lib.s2l_loader_pop.restype = ctypes.c_int
    lib.s2l_loader_errors.restype = ctypes.c_long
    _lib = lib
    return lib


def decode_jpeg_batch(paths: Sequence[str], height: int, width: int,
                      n_threads: int = 8) -> np.ndarray:
    """Decode JPEGs (all height×width RGB) to [N, H, W, 3] float32 [0,1]."""
    lib = _load()
    n = len(paths)
    out = np.empty((n, height, width, 3), np.float32)
    joined = "\n".join(paths).encode()
    fails = lib.s2l_decode_jpeg_batch(
        joined, n, height, width, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if fails:
        raise IOError(f"{fails}/{n} JPEG decodes failed")
    return out


def read_npy_batch(paths: Sequence[str], shape: Tuple[int, ...],
                   n_threads: int = 8) -> np.ndarray:
    """Read float32 C-order .npy files of identical ``shape``."""
    lib = _load()
    n = len(paths)
    elems = int(np.prod(shape))
    out = np.empty((n,) + tuple(shape), np.float32)
    joined = "\n".join(paths).encode()
    fails = lib.s2l_read_npy_batch(
        joined, n, elems, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if fails:
        raise IOError(f"{fails}/{n} npy reads failed")
    return out


class SamplePrefetcher:
    """Asynchronous per-sample prefetcher over fixed file groups.

    Each sample is a fixed list of files (JPEGs at known geometry and/or
    float32 .npy blobs).  Worker threads decode ahead into a bounded ring;
    ``pop`` returns the next sample's flat float32 buffer in epoch order.
    """

    def __init__(self, sample_files: List[List[str]],
                 specs: List[Tuple[str, Tuple[int, ...]]],
                 n_slots: int = 16, n_threads: int = 4):
        """specs: per file-position ('jpeg', (h, w)) or ('npy', shape)."""
        self._lib = _load()
        self.n_samples = len(sample_files)
        self.n_files = len(specs)
        kinds, hs, ws, elems = [], [], [], []
        for kind, shape in specs:
            if kind == "jpeg":
                kinds.append(0)
                hs.append(shape[0])
                ws.append(shape[1])
                elems.append(shape[0] * shape[1] * 3)
            else:
                kinds.append(1)
                hs.append(0)
                ws.append(0)
                elems.append(int(np.prod(shape)))
        self.specs = specs
        self.sample_floats = int(sum(elems))
        joined = "\n".join("\n".join(fs) for fs in sample_files).encode()
        self._handle = self._lib.s2l_loader_create(
            self.n_samples, self.n_files, joined,
            (ctypes.c_int * self.n_files)(*kinds),
            (ctypes.c_int * self.n_files)(*hs),
            (ctypes.c_int * self.n_files)(*ws),
            (ctypes.c_int64 * self.n_files)(*elems),
            n_slots, n_threads)
        self._elems = elems
        self.n_threads = n_threads

    def start_epoch(self, order: Sequence[int]):
        arr = (ctypes.c_int * len(order))(*[int(i) for i in order])
        self._lib.s2l_loader_start(ctypes.c_void_p(self._handle), arr,
                                   len(order), self.n_threads)

    def pop(self) -> Optional[Tuple[int, List[np.ndarray]]]:
        """Next sample: (sample_index, [array per file spec]) or None."""
        buf = np.empty(self.sample_floats, np.float32)
        idx = self._lib.s2l_loader_pop(
            ctypes.c_void_p(self._handle),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if idx < 0:
            return None
        arrays = []
        off = 0
        for (kind, shape), n in zip(self.specs, self._elems):
            full_shape = (shape[0], shape[1], 3) if kind == "jpeg" else shape
            arrays.append(buf[off:off + n].reshape(full_shape).copy())
            off += n
        return idx, arrays

    @property
    def errors(self) -> int:
        return int(self._lib.s2l_loader_errors(ctypes.c_void_p(self._handle)))

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.s2l_loader_destroy(ctypes.c_void_p(self._handle))
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
