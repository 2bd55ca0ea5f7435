"""Pallas TPU kernel for strided FIR (filter + decimator).

The L0 replacement for c_sources/filter.c and c_sources/decimate.c: where
the reference hand-schedules SSE/AVX dot products over a sliding window,
this kernel tiles outputs onto the MXU as a banded matmul held in VMEM.

Formulation (see ops/fir.py for the derivation): outputs are tiled
[8 sublanes x 128 lanes] per grid step; for output tile p

    O[r, q] = sum_m  XW[r*128 + m] * B[m, q]

with XW the input window for the tile and B the static banded coefficient
matrix B[q + j, q] = taps[j].  Decimating variants (factor > 1) first split
the input into ``factor`` polyphase components host-side so each sub-band
stays dense (the MXU analog of decimate.c's strided loads), then sum the
per-component banded matmuls as one wide MXU contraction.

Why a kernel at all, when XLA's conv lowers to the MXU already: the banded
form reads each input sample once into VMEM and reuses it across the 8
sublane windows (no im2col materialization in HBM), and the halo between
output tiles is read through a second BlockSpec view of the same input
instead of a copy — keeping the op at HBM-bandwidth speed-of-light for
tap counts into the hundreds.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fir_strided"]

LANE = 128
SUB = 8
TILE = LANE * SUB  # outputs per grid step


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _banded(taps: np.ndarray, width: int) -> np.ndarray:
    """B[m, q] = taps[m - q], zero-padded to [width, LANE]."""
    K = taps.shape[0]
    B = np.zeros((width, LANE), dtype=np.float32)
    for q in range(LANE):
        B[q: q + K, q] = taps
    return B


def _kernel(nsub: int, mp: int, x_ref, xn_ref, b_ref, o_ref):
    """One output tile: gather 8 overlapping row-windows per polyphase
    component, single MXU matmul against the stacked banded matrix.

    x_ref/xn_ref: [nsub, TILE] current + next input tile (halo source)
    b_ref: [nsub * mp, LANE] stacked banded matrices
    o_ref: [SUB, LANE] output tile
    """
    xw = jnp.concatenate([x_ref[...], xn_ref[...]], axis=-1)  # [nsub, 2*TILE]
    rows = []
    for s in range(nsub):
        for r in range(SUB):
            rows.append(jax.lax.dynamic_slice(xw, (s, r * LANE), (1, mp)))
    # [SUB, nsub*mp]: row r holds component s's window at columns s*mp:...
    X = jnp.concatenate(
        [jnp.concatenate(rows[s * SUB:(s + 1) * SUB], axis=0)
         for s in range(nsub)], axis=1)
    o_ref[...] = jnp.dot(X, b_ref[...], preferred_element_type=jnp.float32)


def _fir_pallas_1d(taps_np: np.ndarray, x, num: int, factor: int,
                   interpret: bool):
    """x: [N] float32 -> [num] float32; taps_np static (trace-time)."""
    K = taps_np.shape[0]
    f = factor
    P = -(-num // TILE)

    if f == 1:
        Kr = K
        comps = x[None, :]                      # [1, N]
    else:
        Kr = -(-K // f)
        n_in = x.shape[-1]
        need = _round_up(n_in, f)
        if need > n_in:
            x = jnp.pad(x, (0, need - n_in))
        comps = x.reshape(-1, f).T              # [f, N/f]
    nsub = comps.shape[0]
    mp = _round_up(LANE - 1 + Kr, LANE)
    if mp > TILE:
        raise ValueError(f"{K} taps at factor {f} exceed kernel tile")

    # stacked banded matrices, one per polyphase component
    bs = []
    for r in range(nsub):
        tr = np.zeros(Kr, dtype=np.float32)
        sub = taps_np[r::f]
        tr[: sub.shape[0]] = sub
        bs.append(_banded(tr, mp))
    B = jnp.asarray(np.concatenate(bs, axis=0))  # [nsub*mp, LANE]

    # pad components so block p+1 always exists
    need = (P + 1) * TILE
    comps = jnp.pad(comps, ((0, 0), (0, max(0, need - comps.shape[-1]))))

    out = pl.pallas_call(
        functools.partial(_kernel, nsub, mp),
        grid=(P,),
        in_specs=[
            pl.BlockSpec((nsub, TILE), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nsub, TILE), lambda p: (0, p + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B.shape[0], LANE), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUB, LANE), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P * SUB, LANE), jnp.float32),
        interpret=interpret,
    )(comps, comps, B)
    return out.reshape(P * TILE)[:num]


def fir_strided(taps, x, num: int, factor: int = 1, *,
                interpret: bool | None = None):
    """Strided FIR via the Pallas banded-matmul kernel.

    Matches ``ops.fir.fir_decimate`` semantics:
    y[i] = sum_j taps[j] * x[..., i*factor + j].  Real float32 data
    (complex callers go through ops/fir.py's real-batch view).
    ``interpret`` defaults to True on the CPU backend (CI) and False on
    TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    taps_np = np.asarray(taps, dtype=np.float32)
    x = jnp.asarray(x, dtype=jnp.float32)
    fn = functools.partial(_apply_1d, taps_np, num=num, factor=factor,
                           interpret=interpret)
    lead = x.shape[:-1]
    if lead:
        flat = x.reshape((-1, x.shape[-1]))
        y = jax.vmap(fn)(flat)
        return y.reshape(lead + (num,))
    return fn(x)


def _apply_1d(taps_np, x, num, factor, interpret):
    return _fir_pallas_1d(taps_np, x, num, factor, interpret)
