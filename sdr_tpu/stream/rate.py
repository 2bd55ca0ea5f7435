"""Throughput metering — the ``rate`` pipe (SDR/PipeUtils.hs:40-55).

A passthrough wrapper for host drive loops that reports samples/second from
wall-clock deltas, plus a small context-manager timer used by bench.py.
Device work is asynchronous, so the meter blocks on the output block
(``block_until_ready``) before timestamping — otherwise it would measure
dispatch, not compute.
"""

from __future__ import annotations

import time
from typing import Iterable

import jax

__all__ = ["rate", "Timer"]


def rate(blocks: Iterable, samples_per_block: int, every: int = 10,
         sink=print):
    """Passthrough generator printing the streaming rate every ``every``
    blocks, like the reference's ``rate`` pipe."""
    start = time.perf_counter()
    for i, blk in enumerate(blocks, start=1):
        if hasattr(blk, "block_until_ready"):
            blk.block_until_ready()
        if i % every == 0:
            dt = time.perf_counter() - start
            sink(f"{i * samples_per_block / dt:.3e} samples/sec")
        yield blk


class Timer:
    """Context manager measuring wall time with device sync on exit."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        (jax.device_put(0.0) + 0).block_until_ready()
        self.seconds = time.perf_counter() - self.start
        return False
