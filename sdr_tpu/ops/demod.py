"""Demodulation.

FM: reference SDR/Demod.hs:20-46 — per-sample ``phase(x[n] * conj(x[n-1]))``
with the previous sample carried across blocks.  The reference runs this as
a sequential stream fold; on TPU it is a pure shift-and-multiply (the
"recurrence" only reads one sample back, so it vectorizes exactly).

AM: envelope detection ``|x|`` (the reference has no dedicated AM module;
its airband config composes mixer + magnitude + audio filter — BASELINE
config #4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["fm_demod", "am_demod"]


def fm_demod(x, last=None):
    """FM demodulate a complex block: y[n] = angle(x[n] * conj(x[n-1])).

    ``last`` is the final sample of the previous block (the carry the
    reference threads through its pipe, Demod.hs:39-46).  Defaults to 0+0j,
    matching the reference's initial state — ``phase 0 == 0`` in Haskell and
    ``jnp.angle(0) == 0`` here, so the very first output is 0.

    Returns ``(y, new_last)``; ``new_last = x[..., -1]``.
    """
    if last is None:
        last = jnp.zeros(x.shape[:-1], dtype=x.dtype)
    prev = jnp.concatenate(
        [jnp.asarray(last)[..., None], x[..., :-1]], axis=-1)
    y = jnp.angle(x * jnp.conj(prev))
    return y, x[..., -1]


def am_demod(x):
    """AM envelope: y[n] = |x[n]|.  Stateless."""
    return jnp.abs(x)
