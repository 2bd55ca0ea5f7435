"""Polyphase DFT-filterbank channelizer tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from sdr_tpu import ops
from sdr_tpu.ops.channelize import polyphase_channelize, channelizer_taps
from sdr_tpu.ops import fir


def test_equivalence_to_mix_and_decimate(rng):
    """Channel c == mix down by c/C -> same FIR -> decimate C (the direct
    form the filterbank factorizes)."""
    C, P, N = 8, 6, 4096
    taps = channelizer_taps(C, P)
    x = (rng.normal(size=N) + 1j * rng.normal(size=N)).astype(np.complex64)
    Y = np.asarray(polyphase_channelize(taps, C, x))
    n = np.arange(N)
    for c in [0, 1, 3, 7]:
        mixed = (x * np.exp(-2j * np.pi * c * n / C)).astype(np.complex64)
        want = np.asarray(fir.fir_decimate(taps, C, mixed, Y.shape[-1]))
        np.testing.assert_allclose(Y[c], want, atol=2e-2)


def test_tone_localization(rng):
    """A tone at +c/C cycles/sample lands at DC of channel c, and is
    rejected elsewhere."""
    C, N = 16, 1 << 14
    taps = channelizer_taps(C, 12)
    for c in [0, 2, 9, 15]:
        x = np.exp(2j * np.pi * (c / C) * np.arange(N)).astype(np.complex64)
        Y = np.asarray(polyphase_channelize(taps, C, x))
        power = np.mean(np.abs(Y) ** 2, axis=-1)
        assert power.argmax() == c
        others = np.delete(power, c)
        assert power[c] > 50 * others.max(), (c, power)


def test_offset_tone_appears_as_baseband_offset():
    """A tone slightly off a channel center demodulates to that offset."""
    C, N = 8, 1 << 14
    taps = channelizer_taps(C, 12)
    f_off = 0.004  # cycles/sample, well inside the channel
    x = np.exp(2j * np.pi * (3 / C + f_off) * np.arange(N)).astype(
        np.complex64)
    Y = np.asarray(polyphase_channelize(taps, C, x))
    spec = np.abs(np.fft.fft(Y[3]))
    peak = np.fft.fftfreq(Y.shape[-1])[spec.argmax()]
    # channel rate is fs/C: offset scales by C
    assert abs(peak - f_off * C) < 1e-3


def test_batched(rng):
    C = 4
    taps = channelizer_taps(C, 4)
    x = (rng.normal(size=(3, 1024)) + 1j * rng.normal(size=(3, 1024))
         ).astype(np.complex64)
    Y = np.asarray(polyphase_channelize(taps, C, x))
    assert Y.shape[:2] == (3, C)
    Y0 = np.asarray(polyphase_channelize(taps, C, x[1]))
    np.testing.assert_allclose(Y[1], Y0, atol=1e-5)


def test_wideband_fm_bank(rng):
    """End-to-end: 4 FM stations in one wideband stream -> channelize ->
    per-channel FM demod recovers each station's tone."""
    from sdr_tpu.stream import fm_mod
    from sdr_tpu.ops import fm_demod
    C, N = 4, 1 << 16
    fs = 1.0
    tones = [0.0005, 0.001, 0.0015, 0.002]
    n = np.arange(N)
    x = np.zeros(N, dtype=np.complex64)
    for c, ft in enumerate(tones):
        audio = np.sin(2 * np.pi * ft * n)
        base = fm_mod(audio, 0.02, fs, amplitude=0.5)
        x += (base * np.exp(2j * np.pi * (c / C) * n)).astype(np.complex64)
    taps = channelizer_taps(C, 16)
    Y = np.asarray(polyphase_channelize(taps, C, x))
    for c, ft in enumerate(tones):
        y, _ = fm_demod(jnp.asarray(Y[c]))
        seg = np.asarray(y)[200:]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        peak = spec[1:].argmax() + 1
        want_bin = ft * C * len(seg)  # channel rate = fs/C
        assert abs(peak - want_bin) < 3, (c, peak, want_bin)


def test_streaming_channelize_blockwise_equals_whole(rng):
    import jax.numpy as jnp
    from sdr_tpu.stream import Channelize
    C = 8
    taps = channelizer_taps(C, 6)
    op = Channelize(taps, C)
    x = (rng.normal(size=8192) + 1j * rng.normal(size=8192)).astype(
        np.complex64)
    c0 = op.init_carry(8192, x.dtype)
    _, whole = op.apply(c0, jnp.asarray(x))
    c = op.init_carry(1024, x.dtype)
    parts = []
    for i in range(0, 8192, 1024):
        c, y = op.apply(c, jnp.asarray(x[i:i + 1024]))
        parts.append(np.asarray(y))
    got = np.concatenate(parts, axis=-1)
    np.testing.assert_allclose(got, np.asarray(whole), atol=1e-4)


def test_streaming_channelize_time_sharded(rng):
    import jax.numpy as jnp
    from sdr_tpu.stream import Channelize
    from sdr_tpu import parallel
    C = 4
    taps = channelizer_taps(C, 6)
    op = Channelize(taps, C)
    x = (rng.normal(size=8192) + 1j * rng.normal(size=8192)).astype(
        np.complex64)
    c0 = op.init_carry(8192, x.dtype)
    _, whole = op.apply(c0, jnp.asarray(x))
    mesh = parallel.time_mesh(8)
    got = np.asarray(parallel.run_time_sharded([op], mesh, jnp.asarray(x)))
    np.testing.assert_allclose(got, np.asarray(whole), atol=1e-4)


def test_stencil_matches_gather(rng):
    """The gather-free stencil formulation (the TPU path) must match the
    window-gather oracle exactly (VERDICT r3 #6)."""
    from sdr_tpu.ops.channelize import polyphase_channelize, channelizer_taps
    for C, P in ((8, 5), (64, 12)):
        taps = channelizer_taps(C, P)
        x = (rng.normal(size=4096) + 1j * rng.normal(size=4096)
             ).astype(np.complex64)
        a = np.asarray(polyphase_channelize(taps, C, x, method="stencil"))
        b = np.asarray(polyphase_channelize(taps, C, x, method="gather"))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-4)
