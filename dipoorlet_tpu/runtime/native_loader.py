"""ctypes binding for the native C++ batch loader (native/dataloader.cpp).

Builds the shared library on first use (g++ -O2 -pthread); falls back to
the pure-numpy path in data.py when a toolchain is unavailable."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "dataloader.cpp")
_LIB = os.path.join(_ROOT, "native", "libdipoorlet_dataloader.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _build():
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread", _SRC, "-o", _LIB],
        check=True, capture_output=True)


def get_lib():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or \
                    os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.dl_load_batch.restype = ctypes.c_int
            lib.dl_load_batch.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int]
            lib.dl_prefetch_start.restype = ctypes.c_void_p
            lib.dl_prefetch_start.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
            lib.dl_prefetch_next.restype = ctypes.c_int64
            lib.dl_prefetch_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
            lib.dl_prefetch_free.restype = None
            lib.dl_prefetch_free.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _failed = True
    return _lib


def load_batch_native(input_dir: str, name: str, shape, indices) -> np.ndarray:
    """Returns (B, *shape) float32, or None if the native path is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(indices)
    sample_elems = int(np.prod(shape))
    out = np.empty((n, sample_elems), dtype=np.float32)
    idx = np.asarray(indices, dtype=np.int64)
    rc = lib.dl_load_batch(
        input_dir.encode(), name.encode(),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, sample_elems * 4,
        out.ctypes.data_as(ctypes.c_void_p), 8)
    if rc != 0:
        raise FileNotFoundError(
            f"native loader failed (rc={rc}) for {input_dir}/{name} indices {indices[:3]}...")
    return out.reshape((n,) + tuple(shape))


class NativePrefetcher:
    """Async double-buffered batch stream for one input tensor."""

    def __init__(self, input_dir: str, name: str, shape, indices, batch_size: int):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self.lib = lib
        self.shape = tuple(shape)
        self.sample_elems = int(np.prod(shape))
        self.batch_size = batch_size
        idx = np.asarray(indices, dtype=np.int64)
        self._idx_keepalive = idx
        self.handle = lib.dl_prefetch_start(
            input_dir.encode(), name.encode(),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(idx),
            batch_size, self.sample_elems * 4, 8)

    def __iter__(self):
        return self

    def __next__(self):
        out = np.empty((self.batch_size, self.sample_elems), dtype=np.float32)
        got = self.lib.dl_prefetch_next(self.handle, out.ctypes.data_as(ctypes.c_void_p))
        if got == 0:
            raise StopIteration
        if got < 0:
            raise IOError(f"native prefetch failed rc={got}")
        return out[:got].reshape((got,) + self.shape)

    def close(self):
        if self.handle:
            self.lib.dl_prefetch_free(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
