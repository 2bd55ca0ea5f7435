"""Pallas TPU kernel for strided FIR (filter + decimator).

The L0 replacement for c_sources/filter.c and c_sources/decimate.c: where
the reference hand-schedules SSE/AVX dot products over a sliding window,
this kernel tiles outputs onto the MXU as *lane-aligned* banded matmuls
held in VMEM.

Formulation: view the input as 128-lane rows ``x2[r, l] = x[128 r + l]``.
The 128 outputs of row r (output o = 128 r + q) are

    y2[r, q] = sum_j taps[j] x[128 r + q + j]
             = sum_t ( x2[r + t] @ B_t )[q],
    B_t[l, q] = taps[128 t + l - q]   (zero outside 0 <= . < K)

i.e. a sum of ``nt = ceil((K + 127)/128)`` ordinary [ROWS,128] x [128,128]
matmuls over *aligned* row windows — no gathers, no unaligned slices; the
only non-matmul work is one sublane-shifted view per t.  Decimation by f
first splits the input into f polyphase components host-side (the MXU
analog of decimate.c's strided loads) and sums the per-component banded
matmuls.

Each grid step emits ROWS*128 outputs; the inter-tile halo rows are read
through a second BlockSpec view of the same input, so every input sample
is fetched into VMEM once per t (<= nt times total) and the kernel stays
at HBM bandwidth for tap counts into the hundreds.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fir_strided"]

LANE = 128
ROWS = 256          # output rows per grid step (ROWS*LANE outputs)
HALO = 8            # halo rows per component (supports K/f up to 7*128+1)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _band_blocks(taps: np.ndarray, nt: int, shift: int = 0) -> np.ndarray:
    """Stacked [nt*128, 128] band: B[t*128 + l, q] = taps[128t + l - q - shift].

    ``shift`` folds a static sub-row input origin into the band (output o
    reads x[shift + o + j]) — the zero-copy alternative to slicing the
    input, which XLA would materialize as a full copy."""
    K = taps.shape[0]
    B = np.zeros((nt * LANE, LANE), dtype=np.float32)
    for q in range(LANE):
        B[shift + q: shift + q + K, q] = taps
    return B


def _kernel(f: int, nt: int, precision, x_ref, h_ref, b_ref, o_ref):
    """x_ref: [f, ROWS, 128] aligned rows; h_ref: [f, HALO, 128] halo rows;
    b_ref: [f*nt*128, 128] bands; o_ref: [ROWS, 128]."""
    acc = jnp.zeros((ROWS, LANE), dtype=jnp.float32)
    for s in range(f):
        xfull = jnp.concatenate([x_ref[s], h_ref[s]], axis=0)
        for t in range(nt):
            blk = (s * nt + t) * LANE
            acc = acc + jnp.dot(xfull[t: t + ROWS, :],
                                b_ref[blk: blk + LANE, :],
                                precision=precision,
                                preferred_element_type=jnp.float32)
    o_ref[...] = acc


def _fir_pallas_1d(taps_np: np.ndarray, x, num: int, factor: int,
                   interpret: bool, start: int = 0):
    """x: [N] float32 -> [num] float32; taps_np static at trace time.

    ``start`` (unit stride only): static input origin folded into the
    band as a row shift — output o reads x[start + o + j] without
    slicing the input (a non-start-aligned slice is a full HBM copy).
    Requires 0 <= start < 128 (the streaming seam's rebase offsets are
    always sub-row)."""
    K = taps_np.shape[0]
    f = factor
    P = -(-num // (ROWS * LANE))

    if f == 1:
        comps = x[None, :]
        Kf = K + start
        sub_taps = [taps_np]
    else:
        Kf = -(-K // f)
        n_in = x.shape[-1]
        need = _round_up(n_in, f)
        if need > n_in:
            x = jnp.pad(x, (0, need - n_in))
        comps = x.reshape(-1, f).T              # [f, N/f]
        sub_taps = []
        for r in range(f):
            tr = np.zeros(Kf, dtype=np.float32)
            sub = taps_np[r::f]
            tr[: sub.shape[0]] = sub
            sub_taps.append(tr)
    nt = -(-(LANE + Kf - 1) // LANE)
    if nt > HALO:
        raise ValueError(f"{K} taps at factor {f} exceed kernel halo")

    B = jnp.asarray(np.concatenate(
        [_band_blocks(t, nt, shift=start) for t in sub_taps],
        axis=0))                               # [f*nt*128, 128]

    # rows layout [f, T, 128]; need T >= (P+... main rows P*ROWS plus halo
    rows_needed = P * ROWS + HALO
    need = rows_needed * LANE
    if comps.shape[-1] < need:
        comps = jnp.pad(comps, ((0, 0), (0, need - comps.shape[-1])))
    else:
        comps = comps[..., :need]
    x2 = comps.reshape(comps.shape[0], rows_needed, LANE)

    from sdr_tpu.utils.device import fir_precision
    out = pl.pallas_call(
        functools.partial(_kernel, comps.shape[0], nt, fir_precision()),
        grid=(P,),
        in_specs=[
            pl.BlockSpec((x2.shape[0], ROWS, LANE), lambda p: (0, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((x2.shape[0], HALO, LANE),
                         lambda p: (0, (p + 1) * (ROWS // HALO), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B.shape[0], LANE), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, LANE), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P * ROWS, LANE), jnp.float32),
        interpret=interpret,
    )(x2, x2, B)
    return out.reshape(P * ROWS * LANE)[:num]


def fir_strided(taps, x, num: int, factor: int = 1, *,
                interpret: bool | None = None, start: int = 0):
    """Strided FIR via the Pallas aligned banded-matmul kernel.

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
    if start and (factor != 1 or not 0 <= start < LANE):
        # strided or beyond-one-row origins: explicit slice fallback
        x = x[..., start:]
        start = 0
    fn = functools.partial(_apply_1d, taps_np, num=num, factor=factor,
                           interpret=interpret, start=start)
    lead = x.shape[:-1]
    if lead:
        flat = x.reshape((-1, x.shape[-1]))
        y = jax.vmap(fn)(flat)
        return y.reshape(lead + (num,))
    return fn(x)


def _apply_1d(taps_np, x, num, factor, interpret, start=0):
    return _fir_pallas_1d(taps_np, x, num, factor, interpret, start)
