"""Device-mesh construction helpers.

The north-star topology (SURVEY.md §2.3): a 2-D mesh {channel, time} —
independent channels (the DP analog) × time-block shards of one stream with
halo exchange (the SP/CP analog).  The reference has no equivalent (single
process); this is where the new framework's scaling lives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "time_mesh", "channel_time_mesh", "P",
           "NamedSharding"]


def make_mesh(shape: Sequence[int], names: Sequence[str],
              devices=None) -> Mesh:
    """Mesh over the first prod(shape) devices (defaults to all)."""
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(shape))
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(shape), tuple(names))


def time_mesh(n: Optional[int] = None) -> Mesh:
    """1-D mesh over the time axis."""
    devs = jax.devices()
    n = n if n is not None else len(devs)
    return make_mesh((n,), ("t",), devs)


def channel_time_mesh(n_channel: int, n_time: int) -> Mesh:
    """2-D {channel, time} mesh — channels outermost so each channel's halo
    exchanges ride neighboring devices on the inner (time) axis."""
    return make_mesh((n_channel, n_time), ("c", "t"))
