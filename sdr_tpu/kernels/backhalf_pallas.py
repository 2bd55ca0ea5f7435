"""Pallas TPU kernel: fused rational resample + audio FIR + gain.

The FM chain's back half — 3/10 polyphase resample (k31) -> 64-tap audio
FIR -> volume scale (reference resample.c:34-87 -> filter.c:60 ->
scale.c:15 as separate pipe stages) — as ONE kernel: the resampled
intermediate lives only in VMEM, so the only HBM traffic is one read of
the demod plane (plus a ~40% halo re-read) and one write of the audio
output.

**MEASURED NEGATIVE RESULT (r5, kept for the record).**  At the chain's
32x10 MiB stage shapes this kernel measures 2.19-2.40 ms (tile 64-256
and whole-P all within 10%, scratch-ref and in-register-value stage
coupling equivalent) against 1.01 ms for the unfused pair
[resample_band Pallas kernel] -> [fir_pallas audio kernel with the gain
folded into its taps] — probe record /tmp/probe3 r5, committed in
docs/DESIGN.md.  The binding term is the in-kernel second stage: its
Ge-extended stage-1 band (+33% MACs), the cross-tile slices feeding the
stage-2 dots, and the serialization between the two stages cost more
than the ~50 MB intermediate round trip they save.  The streaming op
(stream.ops.ResampleFirScale) therefore executes the unfused pair by
default and routes here only with ``fused=True``.

Formulation (both stages are the lane-aligned banded matmuls of
kernels/resample_pallas.py and kernels/fir_pallas.py):

* stage 1 — resample band, EXTENDED: each input row ``xm[p, s] =
  x[p*S + s]`` (S = G*D/I, a lane multiple, free reshape) produces
  ``Ge = G + round_up(Kf - 1, 128)`` resample outputs instead of G: the
  extra outputs are the lookahead the audio FIR needs past the row
  boundary, recomputed per row (~1/3 extra stage-1 MACs) so the grid
  stays embarrassingly parallel — a sequential carry would serialize
  rows, and a second HBM pass would cost more than the recompute;
* stage 2 — audio band over the VMEM scratch: ``y[p*G + g] =
  gain * sum_j taps_f[j] * yr[p, g + j]`` as per-column-tile banded
  matmuls ``[tile, ~128+Kf] x [~128+Kf, 128]``, with the gain folded
  into the band (scale.c for free).

Semantics (the streaming op builds block alignment on top):

    yr[g] = sum_k T[o_g, k] * x[start + i_g + k]      (closed-form phase)
    y[m]  = gain * sum_j taps_f[j] * yr[m + j],        m in [0, num)

Halo reads past a row's own stride come from the one-row-shifted view
``xm[1:, :HALO]`` plus a tail row — never a non-start-aligned slice of
the input (the r3 lesson: XLA materializes those as a full HBM copy).
"""

from __future__ import annotations

import functools
from math import gcd

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_tpu.ops.fir import prepare_phase_table

__all__ = ["resample_fir_gain"]

LANE = 128
MAX_G = 1024
MAX_TILE_BYTES = 8 << 20


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _plan(Kr: int, I: int, D: int, offset: int, start: int, Kf: int):
    """Static geometry, or None when the fused layout doesn't apply.

    Returns (G, S, Ge, HALO, cp1, cp2, (i_g, o_g), WB):
    cp1/cp2 = per-column-tile (lo, hi) band row ranges for stage 1/2.
    """
    Kp = -(-Kr // I)
    G0 = I * LANE // gcd(I, LANE)
    for mult in (1, 2, 4, 8):
        G = G0 * mult
        if G > MAX_G:
            return None
        S = G * D // I
        if S % LANE == 0:
            break
    else:
        return None
    Ge = G + _round_up(max(Kf - 1, 0), LANE)
    g = np.arange(Ge, dtype=np.int64)
    t_g = g * D - offset
    o_g = (-t_g) % I
    i_g = (t_g + o_g) // I
    W = start + int(i_g.max()) + Kp
    halo_w = max(0, W - S)
    HALO = _round_up(max(halo_w, 1), LANE)
    if HALO > S:
        return None               # lookahead exceeds one following row
    WB = _round_up(max(W, S + HALO), LANE)
    cp1 = []
    for c in range(Ge // LANE):
        sel = slice(c * LANE, (c + 1) * LANE)
        lo = (start + int(i_g[sel].min())) // LANE * LANE
        hi = _round_up(start + int(i_g[sel].max()) + Kp, LANE)
        cp1.append((lo, min(hi, WB)))
    cp2 = []
    for c in range(G // LANE):
        lo = c * LANE
        hi = min(_round_up(c * LANE + LANE - 1 + Kf, LANE), Ge)
        cp2.append((lo, hi))
    return G, S, Ge, HALO, tuple(cp1), tuple(cp2), (i_g, o_g), WB


def _build_bands(taps_r, I, taps_f, gain, i_g, o_g, start, WB, G, Ge):
    table = prepare_phase_table(taps_r, I)            # [I, Kp]
    Kp = table.shape[1]
    B1 = np.zeros((WB, Ge), dtype=np.float32)
    for gg in range(Ge):
        s0 = start + int(i_g[gg])
        B1[s0: s0 + Kp, gg] = table[int(o_g[gg])]
    B2 = np.zeros((Ge, G), dtype=np.float32)
    Kf = taps_f.shape[0]
    for gg in range(G):
        B2[gg: gg + Kf, gg] = gain * taps_f
    return B1, B2


def _kernel(S, cp1, cp2, precision, x_ref, h_ref, b1_ref, b2_ref, o_ref):
    """x_ref [tile, S]; h_ref [tile, HALO] (next-row halo); b1 [WB, Ge];
    b2 [Ge, G]; o_ref [tile, G].

    The resampled intermediate is held as in-register VALUES, not a
    scratch ref — a scratch round trip between the stage-1 and stage-2
    dots serializes them behind VMEM waits (measured 2.1 ms vs the
    value form at chain shapes)."""
    tiles = []
    for c, (lo, hi) in enumerate(cp1):
        cols = slice(c * LANE, (c + 1) * LANE)
        mh = min(hi, S)
        acc = None
        if lo < mh:                      # main-row part of the band
            acc = jnp.dot(x_ref[:, lo:mh], b1_ref[lo:mh, cols],
                          precision=precision,
                          preferred_element_type=jnp.float32)
        if hi > S:                       # halo part (may be the whole tile)
            hlo = max(lo, S)
            h = jnp.dot(h_ref[:, hlo - S: hi - S], b1_ref[hlo:hi, cols],
                        precision=precision,
                        preferred_element_type=jnp.float32)
            acc = h if acc is None else acc + h
        tiles.append(acc)
    yr = jnp.concatenate(tiles, axis=1)
    for c, (lo, hi) in enumerate(cp2):
        cols = slice(c * LANE, (c + 1) * LANE)
        o_ref[:, cols] = jnp.dot(yr[:, lo:hi], b2_ref[lo:hi, cols],
                                 precision=precision,
                                 preferred_element_type=jnp.float32)


TILE_ROWS = 256     # rows per grid step; P pads up to a multiple so the
                    # grid always has >1 step (DMA/compute pipelining)


def _tile_rows(P: int, S: int):
    t = TILE_ROWS
    while t > 8 and t * S * 4 > MAX_TILE_BYTES:
        t //= 2
    return min(t, _round_up(P, 8))


def _ref_tail(taps_r, I, D, taps_f, gain, x, offset, m0, num, start):
    """Unfused tail: audio outputs [m0, m0+num) via the direct paths."""
    from sdr_tpu.ops import fir
    Kf = taps_f.shape[0]
    nyr = num + Kf - 1
    t0 = m0 * D - offset
    off_t = (-t0) % I
    i_t = (t0 + off_t) // I
    yr, _ = fir.fir_resample(taps_r, I, D, x, int(off_t), nyr,
                             method="direct", start=start + int(i_t))
    y = fir.fir_filter(taps_f, yr, num, method="direct")
    return gain * y


def _band_rows(plan, n: int, num: int) -> int:
    """Whole main rows computable from an ``n``-sample buffer: each row
    needs S own samples plus HALO lookahead from the next row."""
    G, S, _, HALO = plan[0], plan[1], plan[2], plan[3]
    return min(-(-num // G), max(0, (n - (S + HALO)) // S + 1))


def _resample_fir_1d(taps_r, I, D, taps_f, gain, x, offset, num, start,
                     interpret, plan, tile):
    G, S, Ge, HALO, cp1, cp2, (i_g, o_g), WB = plan
    n = x.shape[-1]
    P = _band_rows(plan, n, num)
    n_band = min(num, P * G)
    parts = []
    if P > 0:
        xm = x[: P * S].reshape(P, S)
        tail = x[P * S: P * S + HALO]
        tpad = HALO - tail.shape[-1]
        if tpad > 0:
            tail = jnp.pad(tail, (0, tpad))
        xh = jnp.concatenate([xm[1:, :HALO], tail.reshape(1, HALO)],
                             axis=0)
        # non-dividing grid: Pallas masks the boundary block's copies
        # (pad-region outputs never reach HBM), so no row padding — a
        # jnp.pad here would materialize a full copy of the input
        B1, B2 = _build_bands(taps_r, I, taps_f, gain, i_g, o_g, start,
                              WB, G, Ge)
        from sdr_tpu.utils.device import fir_precision
        out = pl.pallas_call(
            functools.partial(_kernel, S, cp1, cp2, fir_precision()),
            grid=(-(-P // tile),),
            in_specs=[
                pl.BlockSpec((tile, S), lambda p: (p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, HALO), lambda p: (p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((WB, Ge), lambda p: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Ge, G), lambda p: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, G), lambda p: (p, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, G), jnp.float32),
            interpret=interpret,
        )(xm, xh, jnp.asarray(B1), jnp.asarray(B2))
        parts.append(out.reshape(P * G)[:n_band])
    if n_band < num:
        parts.append(_ref_tail(taps_r, I, D, taps_f, gain, x, offset,
                               n_band, num - n_band, start))
    if len(parts) == 1:
        return parts[0]
    return jnp.concatenate(parts, axis=-1)


def resample_fir_gain(taps_r, I: int, D: int, taps_f, gain: float, x,
                      offset: int, num: int, start: int = 0, *,
                      interpret: bool | None = None,
                      required: bool = False):
    """Fused resample -> FIR -> gain over the last axis (leading dims
    batched; real float32 data).

    ``y[m] = gain * sum_j taps_f[j] * yr[m + j]`` for m in [0, num),
    where ``yr[g] = sum_k T[o_g, k] * x[start + i_g + k]`` is the
    closed-form polyphase resample of ``ops.fir.fir_resample`` at phase
    ``offset``.  Returns None when the lane-aligned geometry doesn't
    apply (caller runs the stages unfused) unless ``required``.
    """
    taps_r = np.asarray(taps_r, dtype=np.float32)
    taps_f = np.asarray(taps_f, dtype=np.float32)
    I, D, offset = int(I), int(D), int(offset)
    num, start = int(num), int(start)
    plan = _plan(taps_r.shape[0], I, D, offset, start, taps_f.shape[0])
    usable = plan is not None and num >= plan[0]
    if not usable:
        if required:
            raise ValueError(
                f"fused back-half geometry unsupported: K={taps_r.shape[0]} "
                f"I={I} D={D} Kf={taps_f.shape[0]} start={start} num={num}")
        return None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    x = jnp.asarray(x, dtype=jnp.float32)
    P = _band_rows(plan, x.shape[-1], num)
    tile = _tile_rows(P, plan[1]) if P > 0 else 1
    fn = functools.partial(_resample_fir_1d, taps_r, I, D, taps_f,
                           float(gain), offset=offset, num=num,
                           start=start, interpret=interpret, plan=plan,
                           tile=tile)
    lead = x.shape[:-1]
    if lead:
        flat = x.reshape((-1, x.shape[-1]))
        y = jax.vmap(lambda v: fn(v))(flat)
        return y.reshape(lead + (num,))
    return fn(x)
