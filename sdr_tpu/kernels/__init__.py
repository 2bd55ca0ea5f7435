"""Pallas TPU kernels (the reference's c_sources/ layer, TPU-native)."""

from sdr_tpu.kernels.fir_pallas import fir_strided  # noqa: F401
