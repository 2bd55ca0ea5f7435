"""Device <-> host transfer helpers.

Some TPU runtimes (the axon-tunneled chip this framework is developed
against) cannot transfer complex64 buffers in EITHER direction — and a
failed attempt poisons the client process.  On-device complex math is
fine; only buffer transfers break.  ``to_host``/``from_host`` route
complex through planar float32 transfers (split on one side, recombined
on the other).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["to_host", "from_host"]


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


def from_host(x, device=None):
    """device_put, routing complex arrays as two f32 planes recombined
    on-device (complex never crosses the transfer boundary)."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        re = jax.device_put(np.ascontiguousarray(x.real.astype(np.float32)),
                            device)
        im = jax.device_put(np.ascontiguousarray(x.imag.astype(np.float32)),
                            device)
        return jax.jit(jax.lax.complex)(re, im)
    return jax.device_put(x, device)
