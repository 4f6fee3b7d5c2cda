"""ctypes binding for the native thread-pool .npy writer
(native/fastio.cpp) with transparent build-on-first-use and a pure-numpy
fallback when no compiler/.so is available.

Python owns the .npy format (numpy.lib.format builds the header bytes);
the C++ pool just writes header+payload atomically (tmp + rename) on
worker threads. Used by the runner's incremental flush so hundreds of
per-baseline sample files per write interval don't serialize on the host
thread (reference overwrite-all contract: pspec.py:625-638).
"""
import ctypes
import io
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "build" / "libhydra_fastio.so"
_lib = None
_lib_tried = False


def _load_lib():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not _SO_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
    except OSError:
        return None
    lib.fastio_create.restype = ctypes.c_void_p
    lib.fastio_create.argtypes = [ctypes.c_int]
    lib.fastio_submit.restype = ctypes.c_int
    lib.fastio_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.c_void_p, ctypes.c_uint64,
        ctypes.c_void_p, ctypes.c_uint64,
    ]
    lib.fastio_wait.restype = ctypes.c_longlong
    lib.fastio_wait.argtypes = [ctypes.c_void_p]
    lib.fastio_write_seconds.restype = ctypes.c_double
    lib.fastio_write_seconds.argtypes = [ctypes.c_void_p]
    lib.fastio_destroy.restype = None
    lib.fastio_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def _npy_header_full(arr: np.ndarray) -> bytes:
    """Complete .npy header bytes (magic + version + header struct) via
    numpy's own format helpers — guaranteed np.load-compatible."""
    buf = io.BytesIO()
    np.lib.format.write_array_header_1_0(
        buf, np.lib.format.header_data_from_array_1_0(arr)
    )
    out = buf.getvalue()
    magic = np.lib.format.magic(1, 0)
    # numpy >= 2.x writes the magic inside write_array_header_1_0; older
    # versions expect the caller to prepend it
    return out if out.startswith(b"\x93NUMPY") else magic + out


class AsyncNpyWriter:
    """Thread-pool writer: ``save()`` queues, ``wait()`` barriers.
    Falls back to synchronous np.save when the native library is
    unavailable (``is_native`` False)."""

    def __init__(self, nthreads: Optional[int] = None):
        self._lib = _load_lib()
        self._pool = None
        if self._lib is not None:
            n = nthreads or min(8, os.cpu_count() or 1)
            self._pool = ctypes.c_void_p(self._lib.fastio_create(n))

    @property
    def is_native(self) -> bool:
        return self._pool is not None

    def save(self, path, arr):
        arr = np.ascontiguousarray(np.asarray(arr))
        if self._pool is None:
            np.save(path, arr)
            return
        header = _npy_header_full(arr)
        # fastio_submit copies both buffers before returning, so `arr` and
        # `header` only need to stay alive for this call
        self._lib.fastio_submit(
            self._pool, str(path).encode(),
            header, len(header),
            ctypes.c_void_p(arr.ctypes.data), arr.nbytes,
        )

    def wait(self) -> int:
        """Drain the queue; returns the number of failed writes so far."""
        if self._pool is None:
            return 0
        return int(self._lib.fastio_wait(self._pool))

    def write_seconds(self) -> float:
        if self._pool is None:
            return 0.0
        return float(self._lib.fastio_write_seconds(self._pool))

    def close(self):
        if self._pool is not None:
            self._lib.fastio_wait(self._pool)
            self._lib.fastio_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
