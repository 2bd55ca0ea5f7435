"""Block (de)serialization.

Reference: hs_sources/SDR/Serialize.hs — slow cereal-based encoders
(44-66) and the fast path that just casts the vector's bytes (70-75), plus
Handle pipes (78-83).  numpy arrays already expose their bytes, so the
fast path is ``tobytes``/``frombuffer``; the framed variant adds a tiny
header so streams of blocks survive reblocking/truncation on byte
channels (something the reference's raw casts cannot detect).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

__all__ = ["to_bytes", "from_bytes", "write_framed", "read_framed",
           "frame_blocks", "unframe_blocks"]

_MAGIC = b"SDRB"
_DTYPES = {0: np.uint8, 1: np.int16, 2: np.float32, 3: np.complex64,
           4: np.float64, 5: np.int32}
_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


def to_bytes(block) -> bytes:
    """Raw little-endian sample bytes (the cast fast path,
    Serialize.hs:70-75)."""
    return np.ascontiguousarray(np.asarray(block)).tobytes()


def from_bytes(data: bytes, dtype) -> np.ndarray:
    return np.frombuffer(data, dtype=dtype)


def frame_blocks(block) -> bytes:
    """One block with a 12-byte header: magic, dtype code, item count."""
    b = np.ascontiguousarray(np.asarray(block))
    code = _CODES[b.dtype]
    return _MAGIC + struct.pack("<II", code, b.size) + b.tobytes()


def unframe_blocks(stream) -> Iterator[np.ndarray]:
    """Parse a byte stream (file-like) of framed blocks."""
    while True:
        hdr = stream.read(12)
        if len(hdr) < 12:
            return
        if hdr[:4] != _MAGIC:
            raise ValueError("bad frame magic")
        code, count = struct.unpack("<II", hdr[4:])
        dtype = np.dtype(_DTYPES[code])
        payload = stream.read(count * dtype.itemsize)
        if len(payload) < count * dtype.itemsize:
            return  # truncated trailing frame
        yield np.frombuffer(payload, dtype=dtype)


def write_framed(path, blocks) -> int:
    """Write an iterable of blocks as framed stream; returns block count
    (the toHandle pipe, Serialize.hs:78-80)."""
    n = 0
    with open(path, "wb") as fh:
        for b in blocks:
            fh.write(frame_blocks(b))
            n += 1
    return n


def read_framed(path) -> Iterator[np.ndarray]:
    """Iterate framed blocks from a file (the fromHandle pipe,
    Serialize.hs:81-83)."""
    with open(path, "rb") as fh:
        yield from unframe_blocks(fh)
