"""ctypes bindings for the native streaming shard loader (csrc/shardloader.cpp).

The native library provides threaded asynchronous pread-based file reads so
spectral-shard streaming overlaps host I/O with device compute (the
reference's wall clock is dominated by disk reads,
doc/ecckd_documentation.tex:225-228).  Falls back to pure-Python file reads
when the library cannot be built (``NativeLoader.available`` is False).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from .. import logs

_LIB_NAME = "libshardloader.so"
_lib: Optional[ctypes.CDLL] = None
_build_attempted = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        _LIB_NAME)


def _build() -> bool:
    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "csrc",
        "shardloader.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-pthread",
             "-shared", "-o", _lib_path(), src],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logs.detail(f"Native shard loader build failed: {e}")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building on demand) the native library, or None."""
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not os.path.exists(_lib_path()):
        if _build_attempted:
            return None
        _build_attempted = True
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_lib_path())
    except OSError:
        return None
    lib.sl_open.restype = ctypes.c_void_p
    lib.sl_open.argtypes = [ctypes.c_char_p]
    lib.sl_size.restype = ctypes.c_int64
    lib.sl_size.argtypes = [ctypes.c_void_p]
    lib.sl_read.restype = ctypes.c_int64
    lib.sl_read.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                            ctypes.c_int64, ctypes.c_void_p]
    lib.sl_close.argtypes = [ctypes.c_void_p]
    lib.sl_pool_create.restype = ctypes.c_void_p
    lib.sl_pool_create.argtypes = [ctypes.c_int]
    lib.sl_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.sl_pool_submit.restype = ctypes.c_int
    lib.sl_pool_submit.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_int]
    lib.sl_pool_wait.restype = ctypes.c_int64
    lib.sl_pool_wait.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                 ctypes.c_void_p, ctypes.c_int64]
    _lib = lib
    return _lib


class NativeFile:
    """A file handle usable with synchronous or pooled async reads."""

    def __init__(self, path: str):
        self.path = path
        self._lib = get_lib()
        self._handle = None
        self._py_file = None
        if self._lib is not None:
            self._handle = self._lib.sl_open(path.encode())
        if self._handle is None:
            self._py_file = open(path, "rb")

    @property
    def native(self) -> bool:
        return self._handle is not None

    @property
    def size(self) -> int:
        if self.native:
            return int(self._lib.sl_size(self._handle))
        import os as _os
        return _os.fstat(self._py_file.fileno()).st_size

    def read(self, offset: int, size: int) -> np.ndarray:
        buf = np.empty(size, np.uint8)
        if self.native:
            n = self._lib.sl_read(
                self._handle, offset, size,
                buf.ctypes.data_as(ctypes.c_void_p))
        else:
            self._py_file.seek(offset)
            data = self._py_file.read(size)
            n = len(data)
            buf[:n] = np.frombuffer(data, np.uint8)
        if n < 0:
            raise IOError(f"read failed on {self.path}")
        return buf[:n]

    def close(self):
        if self._handle is not None:
            self._lib.sl_close(self._handle)
            self._handle = None
        if self._py_file is not None:
            self._py_file.close()
            self._py_file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class PrefetchPool:
    """Asynchronous read pool: submit chunk k+1 while processing chunk k.

    Falls back to synchronous reads when the native library is unavailable.
    """

    def __init__(self, nthreads: int = 4):
        self._lib = get_lib()
        self._pool = (self._lib.sl_pool_create(nthreads)
                      if self._lib is not None else None)
        self._pending = {}

    @property
    def native(self) -> bool:
        return self._pool is not None

    def submit(self, f: NativeFile, offset: int, size: int, tag: int):
        if self.native and f.native:
            rc = self._lib.sl_pool_submit(self._pool, f._handle, offset,
                                          size, tag)
            if rc != 0:
                raise IOError("sl_pool_submit failed")
            self._pending[tag] = size
        else:
            # Synchronous fallback: read immediately, store
            self._pending[tag] = f.read(offset, size)

    def wait(self, tag: int) -> np.ndarray:
        pending = self._pending.pop(tag)
        if self.native and isinstance(pending, int):
            buf = np.empty(pending, np.uint8)
            n = self._lib.sl_pool_wait(self._pool, tag,
                                       buf.ctypes.data_as(ctypes.c_void_p),
                                       pending)
            if n < 0:
                raise IOError("async read failed")
            return buf[:n]
        return pending

    def close(self):
        if self._pool is not None:
            self._lib.sl_pool_destroy(self._pool)
            self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
