"""Pallas TPU kernels (the reference's c_sources/ layer, TPU-native)."""

from sdr_tpu.kernels.fir_pallas import fir_strided  # noqa: F401
from sdr_tpu.kernels.u8_front_pallas import u8_front_pallas  # noqa: F401
