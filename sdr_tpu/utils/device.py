"""Device capability query and kernel-variant selection.

The analog of the reference's CPUID layer (hs_sources/SDR/CPUID.hs):
there, ``featureSelect`` picks the fastest SIMD implementation the host
supports (CPUID.hs:100-104); here there is one ISA (the TPU), but multiple
execution strategies (XLA conv / Pallas kernel / gather)
whose relative speed depends on device generation and problem shape.
``best_method`` is the dispatch point; the recorded matrix currently
routes unit-stride FIRs to the Pallas banded kernel on TPU, strided ones
to XLA's conv lowering, and everything to conv/direct on CPU.
"""

from __future__ import annotations

import functools
import os

import jax

__all__ = ["device_kind", "on_tpu", "best_method", "feature_select",
           "fir_precision", "set_fir_precision"]


# ---------------------------------------------------------------------------
# Matmul precision policy for the f32 FIR/band/conv paths.
#
# The TPU MXU multiplies in bf16 by default (f32 operands are truncated;
# accumulation stays f32).  Measured on-device at the reference's test
# distribution (values uniform(-10,10), K=64), default precision leaves
# 0.1-0.3 absolute error — 10-30x OUTSIDE the reference's 0.01
# cross-implementation bound (tests/TestSuite.hs:284-289), invisible to
# the CPU test suite (XLA:CPU matmuls are true f32).  HIGHEST (bf16x3,
# ~6 MXU passes) restores f32-accurate products; every measured FIR stage
# is HBM/VPU-bound rather than MXU-bound, so the accuracy is nearly free
# — both precisions are benched (bench_kernels.json) and the dispatch
# table records the dispatched-at precision.
# ---------------------------------------------------------------------------

_PRECISION_NAMES = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _precision_from_env() -> jax.lax.Precision:
    name = os.environ.get("SDR_TPU_FIR_PRECISION", "highest").lower()
    if name not in _PRECISION_NAMES:
        raise ValueError(
            f"SDR_TPU_FIR_PRECISION={name!r}: expected one of "
            f"{sorted(_PRECISION_NAMES)}")
    return _PRECISION_NAMES[name]


_fir_precision = _precision_from_env()


def fir_precision():
    """The matmul precision used by the f32 FIR execution paths."""
    return _fir_precision


def set_fir_precision(name_or_prec):
    """Set the FIR matmul precision ('default' | 'high' | 'highest' or a
    ``jax.lax.Precision``).  Returns the previous value.

    The value is read at TRACE time: it affects functions traced after
    the call, while already-jit-compiled programs (including the
    functools.partial-baked Pallas kernels) keep the precision they were
    traced with — their caches are keyed on argument shapes, not on this
    global.  Call it before building/jitting a pipeline, or clear caches
    (``jax.clear_caches()``) to retrace at the new precision."""
    global _fir_precision
    prev = _fir_precision
    if isinstance(name_or_prec, str):
        name = name_or_prec.lower()
        if name not in _PRECISION_NAMES:
            raise ValueError(
                f"set_fir_precision({name_or_prec!r}): expected one of "
                f"{sorted(_PRECISION_NAMES)}")
        _fir_precision = _PRECISION_NAMES[name]
    else:
        _fir_precision = name_or_prec
    return prev


@functools.cache
def device_kind() -> str:
    return jax.devices()[0].device_kind


@functools.cache
def on_tpu() -> bool:
    return "TPU" in device_kind() or jax.default_backend() in ("tpu", "axon")


def best_method(n_taps: int, factor: int = 1, num: int = 1 << 20) -> str:
    """Pick an execution path for a strided FIR of this shape: the
    argmax over the recorded benchmark matrix (utils/tuning.py), the
    measured analog of the reference's CPUID dispatch."""
    from sdr_tpu.utils import tuning
    return tuning.best_method("tpu" if on_tpu() else "cpu",
                              n_taps, factor, num)


def feature_select(table, default: str = "conv") -> str:
    """featureSelect analog: first available strategy from ``table``
    ([(predicate(), value), ...]) else ``default``."""
    for pred, val in table:
        if pred:
            return val
    return default
