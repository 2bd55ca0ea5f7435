"""Halo exchange primitives for time-sharded streams.

The direct generalization of the reference's cross-buffer protocol
(SDR/Filter.hs:600-611, FilterInternal.hs:397-423): an operator that needs
``H`` samples of history at a block seam gets them from the *left neighbor
shard* over ICI via ``jax.lax.ppermute`` instead of from a retained
previous buffer.  Shard 0 receives zeros — identical to the streaming
runtime's zero-padded warmup, so sharded output == single-device streamed
output exactly.

All functions here must be called inside ``shard_map`` with a named mesh
axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["left_halo", "right_shift_scalar", "exclusive_affine_prefix"]


def _shift_right_perm(n: int):
    """Permutation sending shard i -> i+1 (shard 0 receives zeros)."""
    return [(i, i + 1) for i in range(n - 1)]


def left_halo(x, h: int, axis_name: str):
    """Return the last ``h`` samples of the left neighbor's block.

    ``x``: this shard's local block [..., n].  Result: [..., h]; zeros on
    shard 0.  (ppermute zero-fills shards that receive no message.)
    """
    n_shards = jax.lax.axis_size(axis_name)
    tail = x[..., x.shape[-1] - h:]
    if n_shards == 1:
        return jnp.zeros_like(tail)
    return jax.lax.ppermute(tail, axis_name, _shift_right_perm(n_shards))


def right_shift_scalar(v, axis_name: str):
    """Send a per-shard value to the right neighbor (shard 0 gets zeros)."""
    n_shards = jax.lax.axis_size(axis_name)
    if n_shards == 1:
        return jnp.zeros_like(v)
    return jax.lax.ppermute(v, axis_name, _shift_right_perm(n_shards))


def exclusive_affine_prefix(a, b, axis_name: str):
    """Exclusive prefix-composition of per-shard affine maps y -> a*y + b.

    Used to time-shard first-order linear recurrences (the DC blocker)
    *exactly*: each shard locally reduces its block to one affine map
    (a_d, b_d); this returns, per shard, the composition of all maps to its
    left, i.e. the recurrence state entering the shard (identity map on
    shard 0).  Implemented with one all_gather of two scalars per shard —
    O(devices) tiny values over ICI, negligible next to the sample data.
    """
    idx = jax.lax.axis_index(axis_name)
    As = jax.lax.all_gather(a, axis_name)   # [n_shards, ...]
    Bs = jax.lax.all_gather(b, axis_name)
    n = As.shape[0]
    mask = (jnp.arange(n) < idx)
    # compose left-to-right: (A, B) := (A*a_i, B*a_i + b_i) for i < idx
    def step(carry, ab):
        A, B = carry
        ai, bi, m = ab
        ai = jnp.where(m, ai, jnp.ones_like(ai))
        bi = jnp.where(m, bi, jnp.zeros_like(bi))
        return (A * ai, B * ai + bi), None

    (A, B), _ = jax.lax.scan(step, (jnp.ones_like(a), jnp.zeros_like(b)),
                             (As, Bs, mask))
    return A, B
