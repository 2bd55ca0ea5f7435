"""ctypes bindings for the native block loader (native/sdr_loader.cpp).

Builds the shared library on first use with g++ (cached beside the
source); falls back cleanly if no toolchain is available — callers can
always use the pure-Python sources in io/files.py / io/net.py instead.

The loader is the performance path for live/recorded ingestion: a C++
producer thread fills page-aligned block buffers in a bounded ring with no
GIL involvement (the RTLSDRStream.hs async-reader analog), and the Python
side only wraps each filled buffer as a numpy view and hands it to
``jax.device_put``.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

__all__ = ["NativeLoader", "native_file_source", "native_udp_source",
           "build_native", "native_available"]

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "sdr_loader.cpp"
_LIB = _SRC.with_suffix(".so")
_lock = threading.Lock()
_lib = None


def build_native(force: bool = False) -> Optional[Path]:
    """Compile native/sdr_loader.cpp -> .so (cached).  None on failure."""
    if _LIB.exists() and not force and \
            _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", "-pthread",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, text=True, timeout=120)
        return _LIB
    except (OSError, subprocess.SubprocessError):
        return None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        path = build_native()
        if path is None:
            return None
        lib = ctypes.CDLL(str(path))
        lib.loader_open_file.restype = ctypes.c_void_p
        lib.loader_open_file.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                         ctypes.c_int, ctypes.c_int]
        lib.loader_open_udp.restype = ctypes.c_void_p
        lib.loader_open_udp.argtypes = [ctypes.c_int, ctypes.c_uint64,
                                        ctypes.c_int]
        lib.loader_pop.restype = ctypes.c_int
        lib.loader_pop.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                                   ctypes.POINTER(ctypes.c_uint64),
                                   ctypes.c_double]
        lib.loader_release.argtypes = [ctypes.c_void_p]
        lib.loader_dropped.restype = ctypes.c_int64
        lib.loader_dropped.argtypes = [ctypes.c_void_p]
        lib.loader_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def native_available() -> bool:
    return _load() is not None


class NativeLoader:
    """Iterator over blocks produced by the native ring."""

    def __init__(self, handle, lib, block: int, dtype):
        self._h = handle
        self._lib = lib
        self.block = block
        self.dtype = np.dtype(dtype)
        self._closed = False

    @property
    def dropped(self) -> int:
        """Blocks dropped because the consumer fell behind (UDP only)."""
        return int(self._lib.loader_dropped(self._h))

    def __iter__(self) -> Iterator[np.ndarray]:
        nbytes = self.block * self.dtype.itemsize
        ptr = ctypes.POINTER(ctypes.c_uint8)()
        got = ctypes.c_uint64()
        while True:
            slot = self._lib.loader_pop(self._h, ctypes.byref(ptr),
                                        ctypes.byref(got), -1.0)
            if slot < 0:
                break
            try:
                buf = np.ctypeslib.as_array(ptr, shape=(nbytes,))
                # one copy out of the ring (device_put would copy anyway);
                # the slot can then be refilled immediately
                yield np.frombuffer(buf.tobytes(), dtype=self.dtype)
            finally:
                self._lib.loader_release(self._h)
        self.close()

    def close(self):
        if not self._closed:
            self._closed = True
            self._lib.loader_close(self._h)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def native_file_source(path, block: int, dtype=np.uint8, n_buffers: int = 4,
                       repeat: bool = False) -> NativeLoader:
    """Native-threaded file block source (see module docstring)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (no g++?)")
    nbytes = block * np.dtype(dtype).itemsize
    h = lib.loader_open_file(str(path).encode(), nbytes, n_buffers,
                             int(repeat))
    if not h:
        raise OSError(f"loader_open_file failed for {path}")
    return NativeLoader(h, lib, block, dtype)


def native_udp_source(port: int, block: int, dtype=np.uint8,
                      n_buffers: int = 8) -> NativeLoader:
    """Native-threaded UDP block source (drops with count on overrun)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (no g++?)")
    nbytes = block * np.dtype(dtype).itemsize
    h = lib.loader_open_udp(port, nbytes, n_buffers)
    if not h:
        raise OSError(f"loader_open_udp failed on port {port}")
    return NativeLoader(h, lib, block, dtype)
