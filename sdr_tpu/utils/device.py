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

import jax

__all__ = ["device_kind", "on_tpu", "best_method", "feature_select"]


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
