"""Device <-> host transfer helpers.

Some TPU runtimes (the axon-tunneled chip this framework is developed
against) cannot transfer complex64 buffers to the host — and a failed
attempt poisons the client process.  ``to_host`` transfers any array
safely by splitting complex into two float planes on device and
recombining in numpy.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["to_host"]


def to_host(x) -> np.ndarray:
    """np.asarray(x), routing complex arrays via planar f32 transfers."""
    if isinstance(x, np.ndarray):
        return x
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        re = np.asarray(jnp.real(x))
        im = np.asarray(jnp.imag(x))
        return re + 1j * im
    return np.asarray(x)
