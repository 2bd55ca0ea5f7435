"""Sample-format conversion and scaling.

TPU-native equivalents of c_sources/convert.c and c_sources/scale.c and
their wrappers in hs_sources/SDR/Util.hs:91-255.  On TPU these are pure
elementwise VPU ops that XLA fuses into neighbors; there is no reason for a
hand kernel (the reference needed SSE/AVX because scalar C was the
bottleneck; here the op disappears into the surrounding fusion).

Layout note: radio hardware delivers *interleaved* I/Q (convert.c:15-20
reads in[2i], in[2i+1]).  We accept the same interleaved layout with an
even trailing dimension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "iq_u8_to_cfloat",
    "iq_i16_to_cfloat",
    "cfloat_to_iq_i16",
    "scale",
    "cplx_map",
]


def iq_u8_to_cfloat(x):
    """Interleaved unsigned-byte I/Q -> complex64, RTL-SDR format.

    Reference: ``interleavedIQUnsigned256ToFloat`` (Util.hs:91-98) /
    ``convertC`` (convert.c:15-20):  (v - 128) / 128  per component.
    """
    x = jnp.asarray(x)
    v = (x.astype(jnp.float32) - 128.0) / 128.0
    v = v.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2))
    return jax.lax.complex(v[..., 0], v[..., 1])


def iq_i16_to_cfloat(x):
    """Interleaved signed-16-bit I/Q -> complex64, BladeRF format.

    Reference: ``interleavedIQSigned2048ToFloat`` (Util.hs:141-149) /
    ``convertCBladeRF`` (convert.c:52-57):  v / 2048  per component.
    """
    x = jnp.asarray(x)
    v = x.astype(jnp.float32) / 2048.0
    v = v.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2))
    return jax.lax.complex(v[..., 0], v[..., 1])


def cfloat_to_iq_i16(x):
    """complex64 -> interleaved int16 I/Q for transmission (BladeRF).

    Reference: ``complexFloatToInterleavedIQSigned2048`` (Util.hs:191-199) /
    ``convertBladeRFTransmit`` (convert.c:87-101): scale by 2048, round,
    clamp to [-2048, 2047].
    """
    v = jnp.stack([x.real, x.imag], axis=-1)
    v = v.reshape(x.shape[:-1] + (2 * x.shape[-1],))
    v = jnp.clip(jnp.round(v * 2048.0), -2048, 2047)
    return v.astype(jnp.int16)


def scale(factor, x):
    """y = factor * x.  Reference: scale.c:15-20 / Util.hs:214-255."""
    return jnp.asarray(x) * jnp.asarray(factor, dtype=jnp.float32)


def cplx_map(f, x):
    """Apply ``f`` to the real and imaginary parts independently.

    Reference: ``cplxMap`` (Util.hs:258-261).
    """
    return jax.lax.complex(f(x.real), f(x.imag))
