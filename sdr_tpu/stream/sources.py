"""Synthetic block producers and host-side stream combinators.

Reference parity:
  * ``stream_string`` / ``stream_random`` — bit producers encoding 1/0 as
    float +-1 (SDR/Util.hs:288-323), used for transmit testing.
  * ``fork`` / ``combine`` / ``devnull`` / ``print_sink`` — the pipe
    topology/instrumentation combinators (SDR/PipeUtils.hs:16-37).  In the
    host drive loop these operate on block iterators; on-device fan-out is
    just using an output twice inside one jitted step, so these exist for
    the I/O boundary only.
  * ``tone`` / ``noise`` / ``fm_mod`` — signal generators the reference
    leaves to hardware; needed here for synthetic benchmarks and tests.
"""

from __future__ import annotations

import itertools
from typing import Iterable, Iterator

import numpy as np

__all__ = ["stream_string", "stream_random", "fork", "combine", "devnull",
           "print_sink", "tone", "noise", "fm_mod"]


def stream_string(data: bytes, block: int) -> Iterator[np.ndarray]:
    """Endlessly stream the bits of ``data`` (LSB-first per byte) as float
    blocks of +-1.  Reference: ``streamString`` (Util.hs:288-308)."""
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                         bitorder="little").astype(np.float32) * 2 - 1
    pos = 0
    n = len(bits)
    if n == 0:
        raise ValueError("empty bit string")
    while True:
        out = np.empty(block, dtype=np.float32)
        filled = 0
        while filled < block:
            take = min(block - filled, n - pos)
            out[filled:filled + take] = bits[pos:pos + take]
            filled += take
            pos = (pos + take) % n
        yield out


def stream_random(block: int, seed: int = 0) -> Iterator[np.ndarray]:
    """Endless random bit blocks as float +-1.  Reference: ``streamRandom``
    (Util.hs:311-323)."""
    rng = np.random.default_rng(seed)
    while True:
        yield (rng.integers(0, 2, block).astype(np.float32) * 2 - 1)


def fork(blocks: Iterable, *consumers):
    """Drive several consumers from one producer — ``fork``/``combine``
    (PipeUtils.hs:16-29).  Each consumer is a callable taking a block."""
    for blk in blocks:
        for c in consumers:
            c(blk)


combine = fork  # the reference's combine is fork seen from the consumer side


def devnull(blocks: Iterable) -> int:
    """Consume and discard; returns block count (PipeUtils.hs:36-37)."""
    n = 0
    for _ in blocks:
        n += 1
    return n


def print_sink(blocks: Iterable, limit: int = 10):
    """Print blocks to stdout (PipeUtils.hs:32-33)."""
    for blk in itertools.islice(blocks, limit):
        print(np.asarray(blk))


# --- generators ---

def tone(freq: float, n: int, fs: float = 1.0, amplitude: float = 1.0,
         dtype=np.complex64):
    """Complex tone at ``freq`` Hz sampled at ``fs``."""
    t = np.arange(n) / fs
    return (amplitude * np.exp(2j * np.pi * freq * t)).astype(dtype)


def noise(n: int, scale: float = 1.0, seed: int = 0, complex_: bool = True):
    rng = np.random.default_rng(seed)
    if complex_:
        return (scale * (rng.normal(size=n) + 1j * rng.normal(size=n))
                / np.sqrt(2)).astype(np.complex64)
    return (scale * rng.normal(size=n)).astype(np.float32)


def fm_mod(audio: np.ndarray, deviation: float, fs: float,
           amplitude: float = 0.9) -> np.ndarray:
    """FM-modulate an audio signal to complex baseband (test/bench vector
    generation; the inverse of ops.demod.fm_demod)."""
    phase = 2 * np.pi * deviation * np.cumsum(audio) / fs
    return (amplitude * np.exp(1j * phase)).astype(np.complex64)
