"""Tests for sources, plot consumers, device dispatch, profiling."""

import numpy as np
import pytest

from sdr_tpu.stream import (stream_string, stream_random, fork, devnull,
                            tone, noise, fm_mod)
from sdr_tpu.io import plot_line, plot_fill, Waterfall
from sdr_tpu.utils import best_method, device_kind, timed, trace
from sdr_tpu import ops


def test_stream_string_bits():
    it = stream_string(b"\x01\x80", 16)
    blk = next(it)
    # LSB-first: byte 0x01 -> bit0=1 others 0; 0x80 -> bit7=1
    want = np.full(16, -1.0, np.float32)
    want[0] = 1.0
    want[15] = 1.0
    np.testing.assert_array_equal(blk, want)
    # repeats
    np.testing.assert_array_equal(next(it), want)


def test_stream_string_wraps_mid_block():
    it = stream_string(b"\xff", 12)
    np.testing.assert_array_equal(next(it), np.ones(12, np.float32))


def test_stream_random():
    it = stream_random(256, seed=1)
    a, b = next(it), next(it)
    assert set(np.unique(a)) <= {-1.0, 1.0}
    assert not np.array_equal(a, b)


def test_fork_and_devnull():
    seen = []
    fork([np.zeros(4)] * 3, seen.append, seen.append)
    assert len(seen) == 6
    assert devnull(iter([1, 2, 3])) == 3


def test_tone_noise_fm_mod():
    t = tone(0.1, 1000)
    spec = np.abs(np.fft.fft(t))
    assert np.argmax(spec) == 100
    n = noise(1000, scale=2.0)
    assert abs(np.sqrt(np.mean(np.abs(n) ** 2)) - 2.0) < 0.2
    audio = np.sin(2 * np.pi * 0.01 * np.arange(1000))
    iq = fm_mod(audio, 0.1, 1.0)
    y, _ = ops.fm_demod(iq)
    np.testing.assert_allclose(np.asarray(y)[1:],
                               2 * np.pi * 0.1 * audio[1:], atol=1e-2)


def test_plots(tmp_path, rng):
    y = rng.normal(size=256)
    plot_line(y, str(tmp_path / "l.png"), title="t")
    plot_fill(np.abs(y), str(tmp_path / "f.png"))
    wf = Waterfall(64, rows=32)
    for _ in range(5):
        wf.push(rng.uniform(0.1, 1.0, (3, 64)))
    wf.save(str(tmp_path / "w.png"))
    for f in ["l.png", "f.png", "w.png"]:
        assert (tmp_path / f).stat().st_size > 500


def test_best_method_cpu():
    assert best_method(64, 8) in {"conv", "direct", "pallas"}
    assert isinstance(device_kind(), str)


def test_tuning_table_dispatch(tmp_path, monkeypatch):
    """best_method = argmax over the measured rate table; the r2 batched
    matrix has the Pallas kernel winning unit-stride at every recorded
    tap count (27x conv at k32)."""
    from sdr_tpu.utils import tuning
    assert tuning.best_method("tpu", 32) == "pallas"
    assert tuning.best_method("tpu", 512) == "pallas"
    # strided keys by taps/phase: k128/d4 (32/phase) -> pallas wins the
    # recorded matrix 15.5 vs 4.1 G/s; k51/d8 (7/phase) -> conv 10.5 vs 8.1
    assert tuning.best_method("tpu", 128, factor=4) == "pallas"
    assert tuning.best_method("tpu", 51, factor=8) == "conv"
    assert tuning.best_method("cpu", 32, num=100) == "direct"
    # runtime override via SDR_TPU_TUNING_JSON
    p = tmp_path / "t.json"
    p.write_text('{"tpu": {"filter": {"direct": {"32": 9e99}}}}')
    monkeypatch.setenv("SDR_TPU_TUNING_JSON", str(p))
    assert tuning.best_method("tpu", 32) == "direct"


def test_tuning_regenerate_cli(tmp_path, capsys):
    """The refresh CLI parses a kernel matrix into the table schema."""
    import json
    from sdr_tpu.utils import tuning
    m = {"filter_r_k128_conv": 1e9, "filter_r_k128_pallas": 2e9,
         "decimate_r_k128_conv": 3e9, "decimate_r_k51_d8_conv": 5e9,
         "filter_c_k128_conv": 7e9, "u8_front_k51_d8_int8": 4e9}
    p = tmp_path / "m.json"
    p.write_text(json.dumps(m))
    tuning._main(["tuning", str(p)])
    out = json.loads(capsys.readouterr().out)
    assert out["tpu"]["filter"]["pallas"]["128"] == 2e9
    # complex rows must NOT overwrite the real-input rows
    assert out["tpu"]["filter"]["conv"]["128"] == 1e9
    # decimate keys by taps per phase: k128/d4 -> 32, k51/d8 -> 7
    assert out["tpu"]["decimate"]["conv"]["32"] == 3e9
    assert out["tpu"]["decimate"]["conv"]["7"] == 5e9


def test_timed_and_trace(capsys):
    with timed("x"):
        pass
    assert "x:" in capsys.readouterr().out
    with trace("region"):
        pass


def test_to_host_from_host_roundtrip(rng):
    from sdr_tpu.utils import to_host, from_host
    x = (rng.normal(size=64) + 1j * rng.normal(size=64)).astype(np.complex64)
    d = from_host(x)
    back = to_host(d)
    np.testing.assert_allclose(back, x, atol=1e-6)
    r = rng.normal(size=64).astype(np.float32)
    np.testing.assert_allclose(to_host(from_host(r)), r, atol=1e-7)


def test_axes_helpers():
    from sdr_tpu.io import zero_axis, centered_axis
    z = zero_axis(8, 48000)
    assert z[0] == 0 and z[1] == 6000
    c = centered_axis(8, 48000)
    assert c[4] == 0 and c[0] == -24000
