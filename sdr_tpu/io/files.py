"""Recorded-signal file sources and sinks.

The reference streams vectors to/from Handles with cast-based zero-copy
serialization (SDR/Serialize.hs:70-83) and ingests live radios via an async
callback thread (SDR/RTLSDRStream.hs).  On a TPU host the equivalents are:
memory-mapped block readers feeding ``jax.device_put`` (recorded IQ files in
the common SDR raw formats) and block writers, plus a WAV sink standing in
for the PulseAudio consumer (SDR/Pulse.hs — no audio device on a TPU host).
"""

from __future__ import annotations

import wave
from typing import Iterator, Optional

import numpy as np

__all__ = [
    "iq_file_source",
    "read_iq_file",
    "write_iq_file",
    "block_sink",
    "wav_sink",
    "IQ_DTYPES",
]

# raw interleaved formats used by common SDR hardware/tools
IQ_DTYPES = {
    "u8": np.uint8,      # RTL-SDR native
    "i16": np.int16,     # BladeRF native
    "f32": np.float32,   # GNU Radio float IQ
    "c64": np.complex64,
}


def read_iq_file(path, fmt: str = "u8", count: int = -1, offset: int = 0):
    """Read a whole raw IQ recording as a flat array of ``fmt`` items."""
    dtype = IQ_DTYPES[fmt]
    return np.fromfile(path, dtype=dtype, count=count, offset=offset)


def iq_file_source(path, block: int, fmt: str = "u8",
                   repeat: bool = False) -> Iterator[np.ndarray]:
    """Yield fixed-size blocks from a raw IQ file via mmap (zero host copy
    until device_put) — the recorded-file analog of ``sdrStream``
    (RTLSDRStream.hs:54-68).  Drops the trailing partial block."""
    dtype = IQ_DTYPES[fmt]
    data = np.memmap(path, dtype=dtype, mode="r")
    n = (len(data) // block) * block
    if n == 0:
        return
    while True:
        for i in range(0, n, block):
            yield np.asarray(data[i:i + block])
        if not repeat:
            return


def write_iq_file(path, x, fmt: Optional[str] = None) -> None:
    """Write an array as a raw IQ file (dtype taken from ``fmt`` or x)."""
    x = np.asarray(x)
    if fmt is not None:
        x = x.astype(IQ_DTYPES[fmt])
    x.tofile(path)


def block_sink(path, fmt: Optional[str] = None):
    """A consumer: call with blocks to append to a raw file.

    Returns (write, close).  The file analog of the reference's pipe
    consumers (Serialize.hs:78-83)."""
    fh = open(path, "wb")

    def write(block):
        b = np.asarray(block)
        if fmt is not None:
            b = b.astype(IQ_DTYPES[fmt])
        b.tofile(fh)

    return write, fh.close


def wav_sink(path, sample_rate: int = 48000):
    """A consumer writing mono 16-bit WAV — the headless stand-in for the
    reference's PulseAudio sink (Pulse.hs:18-33, 48 kHz mono float there).

    Returns (write, close); ``write`` takes float blocks in [-1, 1].
    """
    wf = wave.open(str(path), "wb")
    wf.setnchannels(1)
    wf.setsampwidth(2)
    wf.setframerate(sample_rate)

    def write(block):
        b = np.asarray(block, dtype=np.float64)
        pcm = np.clip(np.round(b * 32767), -32768, 32767).astype("<i2")
        wf.writeframes(pcm.tobytes())

    return write, wf.close
