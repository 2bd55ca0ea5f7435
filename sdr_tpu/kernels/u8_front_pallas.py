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

Layout (identical algebra to ops/quantized.py — see its docstring):

* main rows   ``x2[p, s] = raw[p*stride + s]``, ``stride = 256 f``
  (128 outputs per row, 2f bytes per output step);
* halo        ``x2h[p, j] = raw[(p+1)*stride + j]``, j < 128 — the last
  ``W - stride = 2(K-1) + 2 - 2f`` window bytes of row p live at the
  start of row p+1, so the window matrix never needs to exist:
  ``y[p] = X2[p] @ B  =  x2[p] @ B[:stride] + x2h[p] @ B[stride:]``;
* band        ``B[2f q + 2k + c, 128 c + q] = T16[k]`` split into s8
  hi/lo so ``acc = 256 (X @ Bhi) + X @ Blo`` accumulates the exact
  integer correlation with 16-bit-quantized taps in s32.

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
ROWS = 512          # output rows per grid step (ROWS*128 complex outputs)


def _kernel(scale: float, xm_ref, xh_ref, bhi_ref, blo_ref,
            oi_ref, oq_ref):
    """xm_ref: [ROWS, stride] u8 main rows; xh_ref: [ROWS, 128] u8 halo;
    bhi/blo_ref: [stride + 128, 256] s8 band; oi/oq_ref: [ROWS, 128] f32.
    """
    stride = xm_ref.shape[1]
    xm = pltpu.bitcast(xm_ref[:] ^ jnp.uint8(0x80), jnp.int8)
    xh = pltpu.bitcast(xh_ref[:] ^ jnp.uint8(0x80), jnp.int8)
    hi = (jnp.dot(xm, bhi_ref[:stride, :],
                  preferred_element_type=jnp.int32)
          + jnp.dot(xh, bhi_ref[stride:, :],
                    preferred_element_type=jnp.int32))
    lo = (jnp.dot(xm, blo_ref[:stride, :],
                  preferred_element_type=jnp.int32)
          + jnp.dot(xh, blo_ref[stride:, :],
                    preferred_element_type=jnp.int32))
    y = (hi * 256 + lo).astype(jnp.float32) * jnp.float32(scale)
    oi_ref[:] = y[:, :LANE]
    oq_ref[:] = y[:, LANE:]


def _kernel_s8(scale: float, xm_ref, xh_ref, b_ref, oi_ref, oq_ref):
    """Single-band variant (8-bit taps): one dot pair instead of two —
    half the MXU work of the s16 hi/lo kernel."""
    stride = xm_ref.shape[1]
    xm = pltpu.bitcast(xm_ref[:] ^ jnp.uint8(0x80), jnp.int8)
    xh = pltpu.bitcast(xh_ref[:] ^ jnp.uint8(0x80), jnp.int8)
    acc = (jnp.dot(xm, b_ref[:stride, :],
                   preferred_element_type=jnp.int32)
           + jnp.dot(xh, b_ref[stride:, :],
                     preferred_element_type=jnp.int32))
    y = acc.astype(jnp.float32) * jnp.float32(scale)
    oi_ref[:] = y[:, :LANE]
    oq_ref[:] = y[:, LANE:]


def _u8_front_1d(taps_np: np.ndarray, factor: int, raw, num: int,
                 interpret: bool, precision: str = "s16"):
    """raw: [bytes] u8 -> [2, num] planar f32."""
    K, f = taps_np.shape[0], factor
    W, stride, scale, Bhi, Blo = u8_front_plan(taps_np, f, precision)
    halo_w = W - stride
    if halo_w > LANE:
        raise ValueError(
            f"{K} taps at factor {f}: window tail {halo_w} exceeds the "
            f"{LANE}-byte halo (need K <= f + {LANE // 2})")

    P = -(-num // LANE)                 # output rows
    Pt = -(-P // ROWS)                  # grid steps
    rows = Pt * ROWS
    need = (rows + 1) * stride          # +1 row backs the last halo
    n_b = raw.shape[-1]
    if n_b < need:
        # warmup/pad byte is 0x80 = the stream's zero sample
        raw = jnp.pad(raw, (0, need - n_b), constant_values=0x80)
    xm = raw[: rows * stride].reshape(rows, stride)
    xh = raw[stride: stride + rows * stride].reshape(rows, stride)[:, :LANE]

    # band padded to a 128-row halo block (zero rows beyond W)
    Bp = np.zeros((stride + LANE, 2 * LANE), dtype=np.int8)
    Bh = Bp.copy()
    Bh[:W] = Bhi
    bands = [jnp.asarray(Bh)]
    if Blo is not None:
        Bl = Bp.copy()
        Bl[:W] = Blo
        bands.append(jnp.asarray(Bl))
    band_spec = pl.BlockSpec((stride + LANE, 2 * LANE), lambda p: (0, 0),
                             memory_space=pltpu.VMEM)

    oi, oq = pl.pallas_call(
        functools.partial(_kernel if Blo is not None else _kernel_s8,
                          scale),
        grid=(Pt,),
        in_specs=[
            pl.BlockSpec((ROWS, stride), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANE), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
        ] + [band_spec] * len(bands),
        out_specs=[
            pl.BlockSpec((ROWS, LANE), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANE), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(xm, xh, *bands)
    y = jnp.stack([oi.reshape(rows * LANE)[:num],
                   oq.reshape(rows * LANE)[:num]])
    return y


def u8_front_pallas(taps, factor: int, raw, num: int = None, *,
                    interpret: bool | None = None, precision: str = "s16"):
    """Fused interleaved-u8-IQ convert + decimate as a Pallas kernel.

    Drop-in for ``ops.quantized.fir_decimate_u8_planar``:
    ``raw [..., 2n] u8 -> [..., 2, num] f32`` with
    ``y[m] = sum_k taps[k] (raw[2(m f + k) + c] - 128) / 128`` per
    component c, taps 16-bit-quantized (identical numerics — same plan)
    or 8-bit with ``precision='s8'`` (one band: half the MXU work).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    taps_np = np.asarray(taps, dtype=np.float32)
    K, f = taps_np.shape[0], int(factor)
    n = raw.shape[-1] // 2
    num = int((n - K) // f + 1 if num is None else num)
    fn = functools.partial(_u8_front_1d, taps_np, f, num=num,
                           interpret=interpret, precision=precision)
    lead = raw.shape[:-1]
    if lead:
        flat = raw.reshape((-1, raw.shape[-1]))
        y = jax.vmap(fn)(flat)
        return y.reshape(lead + (2, num))
    return fn(raw)
