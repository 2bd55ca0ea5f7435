"""Pallas kernel differential tests (interpret mode on CPU; the same
kernels compile for TPU and are benchmarked there by bench.py)."""

import numpy as np
import pytest

from sdr_tpu.ops import fir
from sdr_tpu.kernels import fir_strided
from oracles import filter_oracle, decimate_oracle

TOL = 0.01


@pytest.mark.parametrize("ntaps", [32, 51, 128, 300])
def test_pallas_filter_real(rng, ntaps):
    n = 4096
    x = rng.uniform(-10, 10, n).astype(np.float32)
    taps = rng.uniform(-1, 1, ntaps).astype(np.float32)
    num = n - ntaps + 1
    got = np.asarray(fir_strided(taps, x, num, 1, interpret=True))
    want = filter_oracle(taps, x, num)
    np.testing.assert_allclose(got, want, atol=TOL)


@pytest.mark.parametrize("factor", [2, 4, 8])
def test_pallas_decimate_real(rng, factor):
    n, ntaps = 8192, 51
    x = rng.uniform(-10, 10, n).astype(np.float32)
    taps = rng.uniform(-1, 1, ntaps).astype(np.float32)
    num = (n - ntaps) // factor + 1
    got = np.asarray(fir_strided(taps, x, num, factor, interpret=True))
    want = decimate_oracle(taps, factor, x, num)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_pallas_batched(rng):
    x = rng.uniform(-1, 1, (3, 2048)).astype(np.float32)
    taps = rng.uniform(-1, 1, 33).astype(np.float32)
    num = 2048 - 33 + 1
    got = np.asarray(fir_strided(taps, x, num, 1, interpret=True))
    assert got.shape == (3, num)
    np.testing.assert_allclose(got[1], filter_oracle(taps, x[1], num),
                               atol=TOL)


def test_pallas_complex_via_dispatch(rng):
    """method='pallas' through the public op (complex handled as 2-row
    real batch)."""
    n, ntaps, f = 4096, 51, 8
    x = (rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)).astype(
        np.complex64)
    taps = rng.uniform(-1, 1, ntaps).astype(np.float32)
    num = (n - ntaps) // f + 1
    got = np.asarray(fir.fir_decimate(taps, f, x, num, method="pallas"))
    want = decimate_oracle(taps, f, x.astype(np.complex128), num)
    assert np.abs(got - want).max() < TOL


def test_pallas_short_output(rng):
    """num smaller than one tile still works (padding path)."""
    x = rng.uniform(-1, 1, 600).astype(np.float32)
    taps = rng.uniform(-1, 1, 33).astype(np.float32)
    got = np.asarray(fir_strided(taps, x, 100, 1, interpret=True))
    np.testing.assert_allclose(got, filter_oracle(taps, x, 100), atol=TOL)


# --- fused int8 u8-IQ front end (kernels/u8_front_pallas.py) ---

def _u8_front_oracle(taps, factor, raw, num):
    """Float reference: convert (convert.c:15-20) then decimate
    (decimate.c:73-82), per plane."""
    x = (raw.astype(np.float64) - 128.0) / 128.0
    i, q = x[0::2], x[1::2]
    out = np.empty((2, num))
    for c, comp in enumerate((i, q)):
        for m in range(num):
            out[c, m] = np.dot(taps, comp[m * factor: m * factor + len(taps)])
    return out


@pytest.mark.parametrize("factor,ntaps", [(8, 51), (4, 33), (2, 17), (8, 72)])
def test_pallas_u8_front(rng, factor, ntaps):
    from sdr_tpu.kernels import u8_front_pallas
    raw = rng.integers(0, 256, 70000).astype(np.uint8)
    taps = rng.uniform(-1, 1, ntaps).astype(np.float32)
    num = (raw.shape[0] // 2 - ntaps) // factor + 1
    got = np.asarray(u8_front_pallas(taps, factor, raw, num, interpret=True))
    want = _u8_front_oracle(taps, factor, raw, num)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_pallas_u8_front_matches_xla_int8_path_exactly(rng):
    """Same plan, same integer algebra -> bit-identical to
    ops.quantized.fir_decimate_u8_planar."""
    from sdr_tpu.kernels import u8_front_pallas
    from sdr_tpu.ops.quantized import fir_decimate_u8_planar
    raw = rng.integers(0, 256, (3, 1 << 16)).astype(np.uint8)
    taps = rng.uniform(-1, 1, 51).astype(np.float32)
    got = np.asarray(u8_front_pallas(taps, 8, raw, interpret=True))
    want = np.asarray(fir_decimate_u8_planar(taps, 8, raw))
    np.testing.assert_array_equal(got, want)


def test_pallas_u8_front_s8_matches_xla_s8_exactly(rng):
    """Single-band 8-bit-tap kernel: bit-identical to the XLA s8 path,
    and within the quantization bound of the float oracle."""
    from sdr_tpu.kernels import u8_front_pallas
    from sdr_tpu.ops.quantized import fir_decimate_u8_planar
    raw = rng.integers(0, 256, 1 << 16).astype(np.uint8)
    taps = rng.uniform(-1, 1, 51).astype(np.float32)
    num = (raw.shape[0] // 2 - 51) // 8 + 1
    got = np.asarray(u8_front_pallas(taps, 8, raw, interpret=True,
                                     precision="s8"))
    want = np.asarray(fir_decimate_u8_planar(taps, 8, raw, num,
                                             precision="s8"))
    np.testing.assert_array_equal(got, want)
    # quantization bound: each tap off by <= half an s8 LSB, |x| < 1
    bound = 51 * float(np.abs(taps).max()) / 254.0
    np.testing.assert_allclose(got, _u8_front_oracle(taps, 8, raw, num),
                               atol=bound * np.sqrt(2))


def test_pallas_u8_front_rejects_wide_window():
    from sdr_tpu.kernels import u8_front_pallas
    taps = np.ones(200, dtype=np.float32)
    raw = np.zeros(1 << 16, dtype=np.uint8)
    with pytest.raises(ValueError, match="halo"):
        u8_front_pallas(taps, 8, raw, interpret=True)
