"""Stateful per-sample recurrences: DC blocker and AGC.

DC blocker — reference c_sources/filter.c:152-161 (``dcBlocker``), an IIR:

    y[n] = x[n] - x[n-1] + alpha * y[n-1],  alpha = 0.997

carrying ``(lastSample, lastOutput)`` across blocks (Filter.hs:729-739).
The recurrence is *linear*, so instead of a sequential loop we evaluate it
exactly with a first-order linear associative scan
(``jax.lax.associative_scan`` over the composition of maps
``y -> a*y + b``) — O(log n) depth on the VPU instead of O(n).

AGC — reference SDR/Util.hs:329-348 (``agc``/``agcPipe``):

    corrected[n] = x[n] * g[n]
    g[n+1]       = g[n] + mu * (reference - |corrected[n]|)

This recurrence is *nonlinear* in g (|x[n]|*g appears inside), so it cannot
be reformulated associatively; it stays a ``lax.scan`` — fine, because AGC
runs at audio rate, off the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["dc_blocker", "agc", "linear_scan"]


def linear_scan(a, b, y0):
    """Exact evaluation of y[n] = a[n]*y[n-1] + b[n] with y[-1] = y0.

    Uses the associative composition (a2, b2)∘(a1, b1) = (a1*a2, a2*b1+b2)
    over the affine maps, evaluated with ``jax.lax.associative_scan``.
    Shapes: a, b: [..., N]; y0: [...].
    """
    b = jnp.asarray(b)
    a = jnp.asarray(a)
    b = b.at[..., 0].add(a[..., 0] * y0)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, bl * ar + br

    _, y = jax.lax.associative_scan(combine, (a, b), axis=-1)
    return y


def dc_blocker(x, last_sample=0.0, last_output=0.0, alpha=0.997):
    """DC blocking filter; returns (y, (new_last_sample, new_last_output)).

    Reference: filter.c:152-161.  First-order difference feeding a leaky
    integrator.  Implemented as u[n] = x[n]-x[n-1] then the linear scan
    y[n] = alpha*y[n-1] + u[n], computed exactly via associative scan.
    """
    x = jnp.asarray(x, dtype=jnp.float32)
    last_sample = jnp.asarray(last_sample, dtype=jnp.float32)
    last_output = jnp.asarray(last_output, dtype=jnp.float32)
    prev = jnp.concatenate(
        [jnp.broadcast_to(last_sample[..., None], x.shape[:-1] + (1,)),
         x[..., :-1]], axis=-1)
    u = x - prev
    a = jnp.full_like(x, alpha)
    y = linear_scan(a, u, last_output)
    return y, (x[..., -1], y[..., -1])


def agc(x, mu, reference, state=1.0):
    """Automatic gain control; returns (y, final_state).

    Reference: Util.hs:329-341.  state starts at 1 (Util.hs:348).
    Complex input; gain is real.
    """
    state = jnp.asarray(state, dtype=jnp.float32)
    mu = jnp.asarray(mu, dtype=jnp.float32)
    reference = jnp.asarray(reference, dtype=jnp.float32)

    def step(g, s):
        corrected = s * g
        g_next = g + mu * (reference - jnp.abs(corrected))
        return g_next, corrected

    # scan over the last axis; move it to front.
    xt = jnp.moveaxis(x, -1, 0)
    final, yt = jax.lax.scan(step, jnp.broadcast_to(state, x.shape[:-1]), xt)
    return jnp.moveaxis(yt, 0, -1), final
