"""ctypes bindings for the native (C++) trajectory prefetcher.

The training loop's host side is single-threaded Python; reading trajectory files
synchronously between jitted steps stalls the accelerator. ``native/trajloader.cc``
runs a small pthread worker pool that reads raw float32 trajectory files ahead of the
consumer; this module builds it on first use (g++) and exposes a prefetching fetch
function for ``TrajectoryLoader``. Falls back to synchronous numpy loading when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["NativePrefetcher", "native_available", "build_library"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "trajloader.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libtrajloader.so")
_lock = threading.Lock()
_lib_handle: Optional[ctypes.CDLL] = None


def build_library(force: bool = False) -> Optional[str]:
    """Compile the shared library if needed. Returns its path or None on failure."""
    if os.path.exists(_LIB) and not force:
        return _LIB
    if not os.path.exists(_SRC):
        return None
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-pthread", "-o", _LIB, _SRC],
            check=True,
            capture_output=True,
        )
        return _LIB
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib_handle
    with _lock:
        if _lib_handle is not None:
            return _lib_handle
        path = build_library()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.trajloader_create.restype = ctypes.c_void_p
        lib.trajloader_create.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.trajloader_destroy.argtypes = [ctypes.c_void_p]
        lib.trajloader_submit.restype = ctypes.c_int64
        lib.trajloader_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.trajloader_fetch.restype = ctypes.c_int64
        lib.trajloader_fetch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        _lib_handle = lib
        return lib


def native_available() -> bool:
    return _load() is not None


class NativePrefetcher:
    """Prefetching reader of raw float32 trajectory files.

    Files are the ``.raw`` companions the TrajectoryCache writes next to its npz
    archives: a flat float32 dump of the trajectory array (shape comes from the
    caller, which knows the dataset layout).
    """

    def __init__(self, num_threads: int = 2, max_inflight: int = 16):
        lib = _load()
        if lib is None:
            raise RuntimeError("native trajloader unavailable (no compiler?)")
        self._lib = lib
        self._h = lib.trajloader_create(num_threads, max_inflight)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.trajloader_destroy(self._h)
        except Exception:
            pass

    def submit(self, path: str) -> int:
        return int(self._lib.trajloader_submit(self._h, path.encode()))

    def fetch(self, ticket: int, shape: Tuple[int, ...]) -> np.ndarray:
        out = np.empty(int(np.prod(shape)), dtype=np.float32)
        n = self._lib.trajloader_fetch(
            self._h, ticket, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size
        )
        if n < 0:
            raise IOError(f"native fetch failed (code {n})")
        if n != out.size:
            raise IOError(f"size mismatch: file has {n} floats, expected {out.size}")
        return out.reshape(shape)

    def load_batch(self, paths: Sequence[str], shape: Tuple[int, ...]) -> np.ndarray:
        """Submit all, then gather — the worker pool overlaps the reads."""
        tickets = [self.submit(p) for p in paths]
        return np.stack([self.fetch(t, shape) for t in tickets])
