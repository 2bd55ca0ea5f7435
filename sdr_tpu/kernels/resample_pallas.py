"""Pallas TPU kernel for the banded-matmul rational resampler.

The L0 replacement for c_sources/resample.c (the polyphase hot loop,
resample.c:34-87) at full MXU/HBM efficiency.  The XLA band formulation
(ops/fir.py ``_resample_band``) already beats the strided-conv path, but
r3 measured it at only ~8.5% of its HBM floor on the chain's 3/10 stage:
its G = I*round(128/I) output group (e.g. 129 for I=3) misaligns every
lane tile, the [P, S] row reshape with S not a lane multiple is a full
relayout, and the halo concatenate is another pass.  This kernel keeps
the same algebra but picks LANE-ALIGNED geometry and runs it in VMEM:

* G = output group per row: the smallest multiple of lcm(I, 128) whose
  row stride S = G*D/I is a lane multiple — so the output tile is whole
  128-lane tiles and the input row matrix ``xm[p, s] = x[p*S + s]`` is a
  FREE reshape (no relayout, no copy);
* the band B[r, g] = T[o_g, k] at r = start + i_g + k is block-banded:
  each 128-column tile c only reads band rows [lo_c, hi_c) with
  hi_c - lo_c ~ 128*D/I + Kp, so the kernel does one
  [TILE_P, H_c] x [H_c, 128] matmul per column tile instead of the
  dense [TILE_P, S] x [S, G] product — ~3x fewer MACs at G = 3*128
  (the misaligned-G formulation's only advantage, recovered);
* rows read at most LANE samples past their own stride; those come from
  the one-row-shifted view ``xm[1:, :128]`` plus a tiny tail row — never
  a non-start-aligned slice of the input, which XLA materializes as a
  full HBM copy (the r3 lesson, see ops/quantized.py).

Per-output MXU work is ~(128*D/I + Kp) MACs on fully-aligned tiles; for
the FM chain's 3/10 stage that puts the compute floor at the HBM floor.
Tap positions, phases and the ``start``/``offset`` origins are all folded
into the band host-side (numpy, static per trace) exactly as in the XLA
formulation.
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

__all__ = ["resample_band"]

LANE = 128
MAX_G = 1024          # at most 8 column tiles per row
MAX_TILE_BYTES = 8 << 20   # VMEM budget for one input row tile (~2.6 MB
                           # double-buffered at the chain's S=1280 plus the
                           # resident band still fits; 512-row tiles measured
                           # 8% faster than 256 at the 3/10 chain stage)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _plan(K: int, I: int, D: int, offset: int, start: int):
    """Static geometry: (G, S, col_plans, B, halo_w) or None when the
    lane-aligned banded layout doesn't apply.

    col_plans[c] = (lo, hi): band rows read by column tile c, both
    multiples of LANE so every in-kernel slice is tile-aligned.
    """
    Kp = -(-K // I)                     # taps per phase row
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
    g = np.arange(G, dtype=np.int64)
    t_g = g * D - offset
    o_g = (-t_g) % I
    i_g = (t_g + o_g) // I
    W = start + int(i_g.max()) + Kp
    halo_w = W - S
    if halo_w > LANE:
        return None            # window tail exceeds one halo row
    halo_w = max(0, halo_w)
    nct = G // LANE
    col_plans = []
    WB = _round_up(max(W, S + halo_w, LANE), LANE)
    for c in range(nct):
        sel = slice(c * LANE, (c + 1) * LANE)
        lo = (start + int(i_g[sel].min())) // LANE * LANE
        hi = _round_up(start + int(i_g[sel].max()) + Kp, LANE)
        col_plans.append((lo, min(hi, WB)))
    return G, S, col_plans, (i_g, o_g), WB, halo_w


def _build_band(taps_np, I, i_g, o_g, start, WB, G):
    table = prepare_phase_table(taps_np, I)            # [I, Kp]
    Kp = table.shape[1]
    B = np.zeros((WB, G), dtype=np.float32)
    for gg in range(G):
        s0 = start + int(i_g[gg])
        B[s0: s0 + Kp, gg] = table[int(o_g[gg])]
    return B


def _kernel(S, col_plans, precision, x_ref, h_ref, b_ref, o_ref):
    """x_ref [TILE_P, S] aligned rows; h_ref [TILE_P, LANE] next-row halo;
    b_ref [WB, G] band; o_ref [TILE_P, G]."""
    for c, (lo, hi) in enumerate(col_plans):
        cols = slice(c * LANE, (c + 1) * LANE)
        mh = min(hi, S)
        acc = jnp.dot(x_ref[:, lo:mh], b_ref[lo:mh, cols],
                      precision=precision,
                      preferred_element_type=jnp.float32)
        if hi > S:
            acc = acc + jnp.dot(h_ref[:, : hi - S], b_ref[S:hi, cols],
                                precision=precision,
                                preferred_element_type=jnp.float32)
        o_ref[:, cols] = acc


def _tile_rows(P: int, S: int):
    """Largest valid row tile, or None.  Mosaic requires the sublane
    (second-minor) block dim divisible by 8 or equal to the array dim."""
    for tile in (512, 256, 128, 64, 32, 16, 8):
        if P % tile == 0 and tile * S * 4 <= MAX_TILE_BYTES:
            return tile
    if P * S * 4 <= MAX_TILE_BYTES:
        return P          # single tile == whole array: always legal
    return None


def _resample_band_1d(taps_np, I, D, x, offset, num, start, interpret,
                      plan):
    G, S, col_plans, (i_g, o_g), WB, halo_w = plan
    n = x.shape[-1]
    P = min(-(-num // G), n // S)          # whole main rows available
    n_band = min(num, P * G)
    parts = []
    if P > 0:
        xm = x[: P * S].reshape(P, S)      # free: start-aligned, S % 128 == 0
        tail = x[P * S: P * S + LANE]
        tpad = LANE - tail.shape[-1]
        if tpad > 0:
            tail = jnp.pad(tail, (0, tpad))
        xh = jnp.concatenate([xm[1:, :LANE], tail.reshape(1, LANE)], axis=0)
        B = jnp.asarray(_build_band(taps_np, I, i_g, o_g, start, WB, G))
        tile = _tile_rows(P, S)
        if tile is None:
            from sdr_tpu.ops.fir import _resample_band
            return _resample_band(taps_np, I, D, x, offset, num, start)
        from sdr_tpu.utils.device import fir_precision
        out = pl.pallas_call(
            functools.partial(_kernel, S, tuple(col_plans), fir_precision()),
            grid=(P // tile,),
            in_specs=[
                pl.BlockSpec((tile, S), lambda p: (p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, LANE), lambda p: (p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((WB, G), lambda p: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, G), lambda p: (p, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, G), jnp.float32),
            interpret=interpret,
        )(xm, xh, B)
        parts.append(out.reshape(P * G)[:n_band])
    if n_band < num:                       # ragged tail: gather path
        from sdr_tpu.ops import fir
        rem = num - n_band
        t0 = n_band * D - offset
        off_t = (-t0) % I
        i_t = (t0 + off_t) // I
        tail_y, _ = fir.fir_resample(taps_np, I, D, x, int(off_t), rem,
                                     method="direct", start=start + int(i_t))
        parts.append(tail_y.astype(jnp.float32))
    if len(parts) == 1:
        return parts[0]
    return jnp.concatenate(parts, axis=-1)


def resample_band(taps, I: int, D: int, x, offset: int, num: int,
                  start: int = 0, *, interpret: bool | None = None,
                  required: bool = False):
    """Lane-aligned banded-matmul resampler; real float32 data, leading
    dims batched.  Matches ``ops.fir.fir_resample`` output semantics
    (the y part only — callers track end_offset).  Returns ``None`` when
    the geometry doesn't apply (caller falls back to the XLA band)
    unless ``required``.
    """
    taps_np = np.asarray(taps, dtype=np.float32)
    K = taps_np.shape[0]
    I, D, offset, start, num = int(I), int(D), int(offset), int(start), int(num)
    plan = _plan(K, I, D, offset, start)
    usable = plan is not None and num >= plan[0]
    if not usable:
        if required:
            raise ValueError(
                f"banded pallas resampler does not support K={K} I={I} "
                f"D={D} start={start} num={num}")
        return None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    x = jnp.asarray(x, dtype=jnp.float32)
    fn = functools.partial(_resample_band_1d, taps_np, I, D, offset=offset,
                           num=num, start=start, interpret=interpret,
                           plan=plan)
    lead = x.shape[:-1]
    if lead:
        flat = x.reshape((-1, x.shape[-1]))
        y = jax.vmap(lambda v: fn(v))(flat)
        return y.reshape(lead + (num,))
    return fn(x)
