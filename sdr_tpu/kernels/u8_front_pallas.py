"""Pallas TPU kernel for the fused int8 u8-IQ front end.

The chain's front half (interleaved u8 IQ -> convert -> K-tap
decimate-by-f, reference convert.c:15-20 + decimate.c:16-24) already runs
as two int8 MXU matmuls in ``ops/quantized.py`` — but that XLA
formulation materializes the overlapping window matrix ``X2`` (plus its
``x ^ 0x80`` bitcast) in HBM and reads it back twice, putting the op at
~4 ms / 32x10 MiB blocks: bandwidth-bound on intermediates, not on the
actual input.

This kernel fuses window construction, the ``x - 128`` bitcast, both
hi/lo int8 dots, and the float epilogue into one pass: each input byte is
DMA'd to VMEM once, windows exist only as VMEM views, and the only HBM
writes are the two planar f32 output planes.  Bound = max(int8-MXU time
of the dense band, input+output bytes / HBM bandwidth).

Layout (identical algebra to ops/quantized.py — see its docstring),
parameterized by Q = outputs per window row (``q_out``):

* main rows   ``x2[p, s] = raw[p*stride + s]``, ``stride = 2 f Q``
  (Q outputs per row, 2f bytes per output step);
* halo        ``x2h[p, j] = raw[(p+1)*stride + j]``, j < 128 — the last
  ``W - stride = 2(K-1) + 2 - 2f`` window bytes of row p live at the
  start of row p+1, so the window matrix never needs to exist:
  ``y[p] = X2[p] @ B  =  x2[p] @ B[:stride] + x2h[p] @ B[stride:]``;
* band        ``B[2f q + 2k + c, c Q + q] = T16[k]`` split into s8
  hi/lo so ``acc = 256 (X @ Bhi) + X @ Blo`` accumulates the exact
  integer correlation with 16-bit-quantized taps in s32.

Q trades MXU work for output-lane fill: the dense band costs
``4 f Q + 2 halo`` MACs per complex output, linear in Q, while the dot's
N dimension is ``2 Q`` — so Q=64 (the TPU default) halves the MXU work
of Q=128 and still fills all 128 output lanes (64 I + 64 Q columns).

Zero-copy operands: when the raw block is stride-aligned (the pipeline's
block sizes are chosen so it is), the main-row matrix is a pure reshape
of the input buffer — the 100s-of-MB input is never copied, only DMA'd
to VMEM by the kernel itself; the halo matrix is a small strided gather
(LANE/stride of the input).  Unaligned calls fall back to a padded copy.

Requires ``2(K - 1) + 2 - 2f <= 128`` (taps K <= f + 64); the FM chain's
51-tap decimate-by-8 front end fits with room to spare.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_tpu.ops.quantized import u8_front_plan

__all__ = ["u8_front_pallas"]

LANE = 128
Q_DEFAULT = 128     # outputs per window row — r4 chain-shape sweep:
                    # 3.28 ms (Q=128) vs 3.55 (64) / 4.21 (256); the
                    # XLA formulation's optimum stays Q=64
                    # (ops/quantized.py Q_DEFAULT)
ROWS = 512          # max output rows per grid step


def geometry(n_b: int, stride: int, num: int, q_out: int):
    """(rows, tile, aligned): total window rows, grid tile size, and
    whether the zero-copy aligned layout applies for an ``n_b``-byte
    buffer producing ``num`` outputs."""
    P = -(-num // q_out)
    if n_b % stride == 0 and 0 <= n_b // stride - P <= 64:
        rows = n_b // stride
        for tile in (ROWS, 256, 128, 64, 32, 16, 8, 4, 2, 1):
            if rows % tile == 0:
                return rows, tile, True
    tile = min(ROWS, max(8, P))
    return -(-P // tile) * tile, tile, False


def build_views(raw, stride: int, rows: int, aligned: bool):
    """xm [rows, stride] main rows + xh [rows, LANE] halo rows.

    xm is a free reshape of the input (start-aligned slice = a view);
    xh rows are xm shifted by ONE ROW (xm[1:, :LANE]) plus a final 0x80
    row (the u8 stream's zero sample — it only feeds window tails of
    outputs past ``num``, which the caller discards).  A
    non-start-aligned slice (``raw[stride:]``) must never appear here:
    XLA materializes it as a FULL copy of the input (measured at ~3 ms
    per 32x10 MiB on the r2 form of this function).  Unaligned buffers
    0x80-pad to a whole number of rows first (copies)."""
    if not aligned:
        need = rows * stride + LANE
        if raw.shape[-1] < need:
            raw = jnp.pad(raw, (0, need - raw.shape[-1]),
                          constant_values=0x80)
        # the final row's halo may be real bytes past the last whole row
        # (raw longer than rows*stride) — a tiny slice, cheap because its
        # OUTPUT is 128 bytes (slice cost follows output size)
        tail = raw[rows * stride: rows * stride + LANE].reshape(1, LANE)
        xm = raw[: rows * stride].reshape(rows, stride)
        return xm, jnp.concatenate([xm[1:, :LANE], tail], axis=0)
    xm = raw.reshape(rows, stride)
    xh = jnp.concatenate(
        [xm[1:, :LANE], jnp.full((1, LANE), 0x80, jnp.uint8)], axis=0)
    return xm, xh


def build_bands(Bhi, Blo, stride: int):
    """ONE combined band matrix ``[stride + 128, n_cols]`` (hi|lo side
    by side for s16 — a single wide dot measured well over the split
    two-dot form: the r5 shape probe put the same-geometry s8 matmul at
    366 Top/s in one [.., 2176] x [2176, 512] dot while the split-dot
    kernel ran at ~100), zero-padded to a 128-row halo block, plus its
    (resident) BlockSpec."""
    W, n_cols = Bhi.shape
    B = Bhi if Blo is None else np.concatenate([Bhi, Blo], axis=1)
    Bp = np.zeros((stride + LANE, B.shape[1]), dtype=np.int8)
    Bp[:W] = B
    spec = pl.BlockSpec((stride + LANE, B.shape[1]), lambda p: (0, 0),
                        memory_space=pltpu.VMEM)
    return [jnp.asarray(Bp)], spec


def band_acc(xm_ref, xh_ref, b_ref, two_band: bool):
    """The shared front-end integer algebra: s32 accumulator of the
    16-bit (hi|lo combined band) or 8-bit quantized correlation."""
    stride = xm_ref.shape[1]
    xm = pltpu.bitcast(xm_ref[:] ^ jnp.uint8(0x80), jnp.int8)
    xh = pltpu.bitcast(xh_ref[:] ^ jnp.uint8(0x80), jnp.int8)
    acc = (jnp.dot(xm, b_ref[:stride, :],
                   preferred_element_type=jnp.int32)
           + jnp.dot(xh, b_ref[stride:, :],
                     preferred_element_type=jnp.int32))
    if two_band:
        h = acc.shape[-1] // 2
        acc = acc[:, :h] * 256 + acc[:, h:]
    return acc


def _kernel(scale: float, two_band: bool, q_out: int, xm_ref, xh_ref,
            b_ref, oi_ref, oq_ref):
    y = (band_acc(xm_ref, xh_ref, b_ref, two_band)
         .astype(jnp.float32) * jnp.float32(scale))
    oi_ref[:] = y[:, :q_out]
    oq_ref[:] = y[:, q_out:]


def _u8_front_1d(taps_np: np.ndarray, factor: int, raw, num: int,
                 interpret: bool, precision: str = "s16",
                 q_out: int = Q_DEFAULT, byte_off: int = 0):
    """raw: [bytes] u8 -> [2, num] planar f32."""
    K, f = taps_np.shape[0], factor
    W, stride, scale, Bhi, Blo = u8_front_plan(taps_np, f, precision,
                                               q_out, byte_off)
    halo_w = W - stride
    if halo_w > LANE:
        raise ValueError(
            f"{K} taps at factor {f} (+{byte_off} offset): window tail "
            f"{halo_w} exceeds the {LANE}-byte halo")

    rows, tile, aligned = geometry(raw.shape[-1], stride, num, q_out)
    xm, xh = build_views(raw, stride, rows, aligned)
    bands, band_spec = build_bands(Bhi, Blo, stride)

    oi, oq = pl.pallas_call(
        functools.partial(_kernel, scale, Blo is not None, q_out),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, stride), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, LANE), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
        ] + [band_spec] * len(bands),
        out_specs=[
            pl.BlockSpec((tile, q_out), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, q_out), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, q_out), jnp.float32),
            jax.ShapeDtypeStruct((rows, q_out), jnp.float32),
        ],
        interpret=interpret,
    )(xm, xh, *bands)
    y = jnp.stack([oi.reshape(rows * q_out)[:num],
                   oq.reshape(rows * q_out)[:num]])
    return y


def u8_front_pallas(taps, factor: int, raw, num: int = None, *,
                    interpret: bool | None = None, precision: str = "s16",
                    q_out: int = Q_DEFAULT, byte_off: int = 0):
    """Fused interleaved-u8-IQ convert + decimate as a Pallas kernel.

    Drop-in for ``ops.quantized.fir_decimate_u8_planar``:
    ``raw [..., 2n] u8 -> [..., 2, num] f32`` with
    ``y[m] = sum_k taps[k] (raw[2(m f + k) + c] - 128) / 128`` per
    component c, taps 16-bit-quantized (identical numerics — same plan)
    or 8-bit with ``precision='s8'`` (one band: half the MXU work).
    ``q_out`` picks the band geometry (outputs per window row); any value
    yields bit-identical outputs — it only moves the MXU/lane tradeoff.
    ``byte_off`` statically shifts every window that many bytes into
    ``raw`` (absorbed into the band — the buffer itself stays unsliced).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    taps_np = np.asarray(taps, dtype=np.float32)
    K, f = taps_np.shape[0], int(factor)
    n = (raw.shape[-1] - byte_off) // 2
    num = int((n - K) // f + 1 if num is None else num)
    fn = functools.partial(_u8_front_1d, taps_np, f, num=num,
                           interpret=interpret, precision=precision,
                           q_out=q_out, byte_off=byte_off)
    lead = raw.shape[:-1]
    if lead:
        flat = raw.reshape((-1, raw.shape[-1]))
        y = jax.vmap(fn)(flat)
        return y.reshape(lead + (2, num))
    return fn(raw)
