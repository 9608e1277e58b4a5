"""ctypes bindings + auto-build for the native async file loader.

Compiles native/async_loader.cpp on first use (g++, cached next to the source)
and exposes `AsyncLoader` for IO/compute overlap; `prefetch_npz` wraps it for
the Memory replay path. Falls back to a Python thread pool when no compiler is
available, keeping the public surface identical.
"""

from __future__ import annotations

import ctypes
import io
import os
import subprocess
import threading
from typing import Dict, List, Optional

import numpy as np

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))
_SRC = os.path.join(_NATIVE_DIR, "async_loader.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libasync_loader.so")

_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-pthread",
                     "-o", _LIB, _SRC],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.al_create.restype = ctypes.c_void_p
            lib.al_create.argtypes = [ctypes.c_int]
            lib.al_destroy.argtypes = [ctypes.c_void_p]
            lib.al_submit.restype = ctypes.c_int64
            lib.al_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.al_poll.restype = ctypes.c_int
            lib.al_poll.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            lib.al_size.restype = ctypes.c_int64
            lib.al_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            lib.al_take.restype = ctypes.c_int64
            lib.al_take.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_void_p, ctypes.c_int64]
            _lib = lib
        except Exception:
            _build_failed = True
        return _lib


class AsyncLoader:
    """Prefetch whole files off-thread; `take()` returns the bytes.

    Uses the C++ thread pool when available, else Python threads."""

    def __init__(self, n_threads: int = 4):
        self._lib = _load_lib()
        self.native = self._lib is not None
        if self.native:
            self._handle = self._lib.al_create(n_threads)
        else:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(n_threads)
            self._futures: Dict[int, object] = {}
            self._next = 1

    def submit(self, path: str) -> int:
        if self.native:
            return int(self._lib.al_submit(self._handle, path.encode()))
        jid = self._next
        self._next += 1
        self._futures[jid] = self._pool.submit(
            lambda p: open(p, "rb").read(), path)
        return jid

    def take(self, job_id: int) -> bytes:
        if self.native:
            # Spin on poll, then copy out
            while True:
                size = self._lib.al_size(self._handle, job_id)
                state = self._lib.al_poll(self._handle, job_id)
                if state == 1:
                    size = self._lib.al_size(self._handle, job_id)
                    buf = ctypes.create_string_buffer(size)
                    n = self._lib.al_take(self._handle, job_id, buf, size)
                    if n < 0:
                        raise IOError(f"native load failed for job {job_id}")
                    return buf.raw[:n]
                if state == -1:
                    raise IOError(f"native load failed for job {job_id}")
        fut = self._futures.pop(job_id)
        return fut.result()

    def close(self):
        if self.native:
            if getattr(self, "_handle", None):
                self._lib.al_destroy(self._handle)
                self._handle = None
        else:
            self._pool.shutdown()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def prefetch_npz(loader: AsyncLoader, paths: List[str]) -> List[int]:
    """Queue a batch of npz files; pair with `take_npz`."""
    return [loader.submit(p) for p in paths]


def take_npz(loader: AsyncLoader, job_id: int) -> Dict[str, np.ndarray]:
    raw = loader.take(job_id)
    with np.load(io.BytesIO(raw)) as z:
        return {k: z[k] for k in z.files}
