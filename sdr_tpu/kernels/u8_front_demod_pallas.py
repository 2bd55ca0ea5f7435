"""Pallas TPU kernel: fused u8-IQ front end + FM demod.

Extends kernels/u8_front_pallas.py one stage further down the chain: the
banded int8 matmuls produce the decimated I/Q planes *in VMEM*, and this
kernel consumes them right there — polynomial atan2 of
``x[m] * conj(x[m-1])`` (reference SDR/Demod.hs:20-28 on the output of
convert.c + decimate.c) — writing only the single f32 demod plane to HBM.
Vs the unfused pair (front kernel -> XLA demod) this removes the write +
read of both intermediate I/Q planes and the demod's own VPU dispatch.

The band geometry (Q outputs per window row, zero-copy aligned operands)
is shared with the front kernel — see its module docstring.  At the s8
precision and Q=64 the op is at the HBM floor: the only unavoidable
traffic is one read of the raw bytes and one write of the (1/f-rate)
demod plane.

The one-sample-back shift in row-major [ROWS, Q] layout is built from
``pltpu.roll``:

    prev[p, q] = v[p, q-1]            (lane roll within the row)
    prev[p, 0] = v[p-1, Q-1]          (row roll, then lane roll)
    prev[0, 0] = scratch[Q-1]         (previous grid step's last row —
                                       grid steps run sequentially on TPU,
                                       so a VMEM scratch row carries it)

and the previous *block's* final (I, Q) sample enters through a [2, Q]
carry operand whose last lane holds the sample (zeros on warmup:
atan2(0, 0) = 0, matching the reference's initial ``phase 0 = 0``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_tpu.ops.demod import _ATAN_P
from sdr_tpu.ops.quantized import u8_front_plan
from sdr_tpu.kernels.u8_front_pallas import (LANE, Q_DEFAULT, band_acc,
                                             build_bands, build_views,
                                             geometry)

__all__ = ["u8_front_demod_pallas"]


def _poly_atan2(b, a):
    """ops.demod.fast_atan2 inlined with Mosaic-supported ops only
    (abs/min/max/div/mul/add/select): 5.8e-7 rad max error."""
    ab, aa = jnp.abs(b), jnp.abs(a)
    hi = jnp.maximum(aa, ab)
    z = jnp.minimum(aa, ab) / jnp.where(hi == 0, jnp.float32(1), hi)
    z2 = z * z
    p = jnp.float32(_ATAN_P[0])
    for c in _ATAN_P[1:]:
        p = p * z2 + jnp.float32(c)
    r = p * z
    r = jnp.where(ab > aa, jnp.float32(np.pi / 2) - r, r)
    r = jnp.where(a < 0, jnp.float32(np.pi) - r, r)
    return jnp.where(b < 0, -r, r)


def _shift_back_one(v, first_row, row0, col0):
    """prev[p, q] = v at the flat (row-major) predecessor of (p, q);
    row 0's predecessor row is ``first_row`` [1, Q]."""
    up = jnp.where(row0, first_row, pltpu.roll(v, 1, 0))
    return jnp.where(col0, pltpu.roll(up, 1, 1), pltpu.roll(v, 1, 1))


def _demod_kernel(scale: float, two_band: bool, q_out: int, tile: int,
                  xm_ref, xh_ref, b_ref, carry_ref, o_ref, si_ref,
                  sq_ref):
    y = (band_acc(xm_ref, xh_ref, b_ref, two_band)
         .astype(jnp.float32) * jnp.float32(scale))
    i, q = y[:, :q_out], y[:, q_out:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        si_ref[...] = carry_ref[0:1, :]
        sq_ref[...] = carry_ref[1:2, :]

    row0 = jax.lax.broadcasted_iota(jnp.int32, (tile, q_out), 0) == 0
    col0 = jax.lax.broadcasted_iota(jnp.int32, (tile, q_out), 1) == 0
    pi = _shift_back_one(i, si_ref[...], row0, col0)
    pq = _shift_back_one(q, sq_ref[...], row0, col0)
    o_ref[:] = _poly_atan2(q * pi - i * pq, i * pi + q * pq)
    si_ref[...] = i[tile - 1:tile, :]
    sq_ref[...] = q[tile - 1:tile, :]


def _front_demod_1d(taps_np: np.ndarray, factor: int, raw, last_iq,
                    num: int, interpret: bool, precision: str,
                    q_out: int = Q_DEFAULT, byte_off: int = 0):
    """raw: [bytes] u8, last_iq: [2] f32 -> demod [num] f32."""
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
    carry = jnp.zeros((2, q_out), jnp.float32).at[:, q_out - 1].set(last_iq)

    out = pl.pallas_call(
        functools.partial(_demod_kernel, scale, Blo is not None, q_out,
                          tile),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, stride), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, LANE), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
        ] + [band_spec] * len(bands) + [
            pl.BlockSpec((2, q_out), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, q_out), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, q_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, q_out), jnp.float32),
                        pltpu.VMEM((1, q_out), jnp.float32)],
        interpret=interpret,
    )(xm, xh, *bands, carry)
    return out.reshape(rows * q_out)[:num]


def u8_front_demod_pallas(taps, factor: int, raw, last_iq=None,
                          num: int = None, *,
                          interpret: bool | None = None,
                          precision: str = "s16",
                          q_out: int = Q_DEFAULT, byte_off: int = 0):
    """Fused u8-IQ convert + decimate + FM demod.

    ``raw [..., 2n] u8``, ``last_iq [..., 2] f32`` (the previous block's
    final decimated sample; zeros on warmup) -> ``[..., num] f32`` demod
    output: ``atan2-poly(x[m] * conj(x[m-1]))`` over the decimated stream
    ``x[m] = sum_k taps[k] (raw[2(m f + k)] - 128, raw[...+1] - 128)/128``.
    Front-end integer algebra identical to fir_decimate_u8_planar at the
    same ``precision``; atan2 is the 5.8e-7-rad polynomial.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    taps_np = np.asarray(taps, dtype=np.float32)
    K, f = taps_np.shape[0], int(factor)
    n = (raw.shape[-1] - byte_off) // 2
    num = int((n - K) // f + 1 if num is None else num)
    if last_iq is None:
        last_iq = jnp.zeros(raw.shape[:-1] + (2,), jnp.float32)
    fn = functools.partial(_front_demod_1d, taps_np, f, num=num,
                           interpret=interpret, precision=precision,
                           q_out=q_out, byte_off=byte_off)
    lead = raw.shape[:-1]
    if lead:
        flat = raw.reshape((-1, raw.shape[-1]))
        liq = jnp.asarray(last_iq, jnp.float32).reshape(-1, 2)
        y = jax.vmap(fn)(flat, liq)
        return y.reshape(lead + (num,))
    return fn(raw, jnp.asarray(last_iq, jnp.float32))
