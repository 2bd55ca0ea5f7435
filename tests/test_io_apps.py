"""IO layer and app CLI tests."""

import socket
import subprocess
import sys
import threading
import wave

import numpy as np
import pytest

from sdr_tpu.io import (iq_file_source, read_iq_file, write_iq_file,
                        wav_sink, block_sink, udp_source, udp_sink)
from sdr_tpu.utils import parse_size


# --- files ---

def test_iq_file_roundtrip(tmp_path, rng):
    x = rng.integers(0, 256, 10000).astype(np.uint8)
    p = tmp_path / "x.iq"
    write_iq_file(p, x)
    back = read_iq_file(p, "u8")
    np.testing.assert_array_equal(back, x)
    blocks = list(iq_file_source(p, 4096))
    assert len(blocks) == 2  # trailing partial dropped
    np.testing.assert_array_equal(np.concatenate(blocks), x[:8192])


def test_iq_file_source_repeat(tmp_path, rng):
    x = rng.integers(0, 256, 4096).astype(np.uint8)
    p = tmp_path / "x.iq"
    write_iq_file(p, x)
    it = iq_file_source(p, 4096, repeat=True)
    assert next(it) is not None
    assert next(it) is not None  # loops


def test_wav_sink(tmp_path):
    p = tmp_path / "a.wav"
    w, close = wav_sink(p, 48000)
    w(np.sin(np.linspace(0, 100, 4800)))
    close()
    with wave.open(str(p)) as wf:
        assert wf.getframerate() == 48000
        assert wf.getnframes() == 4800
        assert wf.getnchannels() == 1


def test_block_sink(tmp_path, rng):
    p = tmp_path / "o.f32"
    w, close = block_sink(p, "f32")
    a = rng.normal(size=100).astype(np.float32)
    w(a)
    w(a)
    close()
    back = read_iq_file(p, "f32")
    assert back.shape == (200,)
    np.testing.assert_allclose(back[:100], a)


# --- UDP (wire-compatible with NetworkStream.hs: raw bytes, one block per
# datagram) ---

def test_udp_roundtrip(rng):
    port = 23987
    blocks_out = [rng.integers(0, 256, 2048).astype(np.uint8)
                  for _ in range(5)]
    received = []

    def rx():
        for b in udp_source(("127.0.0.1", port), 2048, timeout=5.0):
            received.append(b)
            if len(received) == 5:
                break

    t = threading.Thread(target=rx)
    t.start()
    import time
    time.sleep(0.2)
    send, close = udp_sink(("127.0.0.1", port))
    for b in blocks_out:
        send(b)
        time.sleep(0.01)
    t.join(timeout=10)
    close()
    assert len(received) == 5
    for got, want in zip(received, blocks_out):
        np.testing.assert_array_equal(got, want)


def test_udp_oversize_block_rejected():
    send, close = udp_sink(("127.0.0.1", 9))
    with pytest.raises(ValueError):
        send(np.zeros(1 << 17, np.float32))
    close()


# --- parse_size (ArgUtils.hs:10-18) ---

@pytest.mark.parametrize("s,want", [
    ("1024", 1024), ("1K", 1000), ("90.2M", 90_200_000),
    ("1.5G", 1_500_000_000), ("1280K", 1_280_000), (" 2M ", 2_000_000),
])
def test_parse_size(s, want):
    assert parse_size(s) == want


def test_parse_size_rejects():
    with pytest.raises(ValueError):
        parse_size("1.0001K")
    with pytest.raises(ValueError):
        parse_size("")


# --- app CLIs end-to-end (subprocess on CPU backend) ---

def _run_app(args, tmp_path):
    import os
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the app runs with cwd=tmp_path; make the repo importable regardless
    # of whether the caller's environment already had it on PYTHONPATH
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; from sdr_tpu.apps.%s import main; sys.exit(main(%r))"
        % (args[0], args[1:]))
    return subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, cwd=str(tmp_path))


@pytest.fixture(scope="module")
def fm_capture(tmp_path_factory):
    """Synthetic FM broadcast: 700 Hz tone at 75 kHz deviation, 1.28 MS/s,
    u8 interleaved."""
    d = tmp_path_factory.mktemp("capture")
    fs, n = 1_280_000, 1_310_720
    t = np.arange(n) / fs
    audio = np.sin(2 * np.pi * 700 * t)
    phase = 2 * np.pi * 75e3 * np.cumsum(audio) / fs
    iq = 0.9 * np.exp(1j * phase)
    raw = np.empty(2 * n, dtype=np.uint8)
    raw[0::2] = np.clip(np.round(iq.real * 128 + 128), 0, 255)
    raw[1::2] = np.clip(np.round(iq.imag * 128 + 128), 0, 255)
    p = d / "fm.iq"
    raw.tofile(p)
    return p


def _dominant_tone(wav_path, rate):
    with wave.open(str(wav_path)) as wf:
        pcm = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
    seg = pcm[2000:].astype(np.float64)
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    return (np.argmax(spec[5:]) + 5) * rate / len(seg)


def test_fm_app(fm_capture, tmp_path):
    out = tmp_path / "audio.wav"
    r = _run_app(["fm", "--in", str(fm_capture), "--out", str(out),
                  "--block", "655360"], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    tone = _dominant_tone(out, 48000)
    assert abs(tone - 700) < 10, f"tone {tone}"


def test_waterfall_app(fm_capture, tmp_path):
    out = tmp_path / "wf.png"
    r = _run_app(["waterfall", "--in", str(fm_capture), "--out", str(out),
                  "--block", "524288", "--fft", "256", "--hop", "128"],
                 tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 1000


def test_am_app(tmp_path):
    # AM tone: carrier at +0.2 cycles/sample modulated by 500 Hz
    fs, n = 1_280_000, 1_048_576
    t = np.arange(n) / fs
    msg = 0.5 * (1 + 0.8 * np.sin(2 * np.pi * 500 * t))
    iq = msg * np.exp(2j * np.pi * 0.2 * np.arange(n))
    raw = np.empty(2 * n, dtype=np.uint8)
    raw[0::2] = np.clip(np.round(iq.real * 128 + 128), 0, 255)
    raw[1::2] = np.clip(np.round(iq.imag * 128 + 128), 0, 255)
    cap = tmp_path / "am.iq"
    raw.tofile(cap)
    out = tmp_path / "am.wav"
    r = _run_app(["am", "--in", str(cap), "--out", str(out),
                  "--if-freq", "0.2", "--decim", "16",
                  "--block", "1048576"], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    with wave.open(str(out)) as wf:
        rate = wf.getframerate()
        pcm = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
    assert rate == 80000
    seg = pcm[10000:].astype(np.float64)
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    tone = (np.argmax(spec[5:]) + 5) * rate / len(seg)
    assert abs(tone - 500) < 10, f"tone {tone}"


def test_channelizer_app(tmp_path):
    r = _run_app(["channelizer", "--synthetic", "--channels", "8",
                  "--seconds", "0.05"], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "demodulated 8 channels" in r.stdout


# --- serialization (Serialize.hs parity) ---

def test_serialize_raw_roundtrip(rng):
    from sdr_tpu.io import to_bytes, from_bytes
    x = rng.normal(size=100).astype(np.complex64)
    np.testing.assert_array_equal(from_bytes(to_bytes(x), np.complex64), x)


def test_serialize_framed_roundtrip(tmp_path, rng):
    from sdr_tpu.io import write_framed, read_framed
    blocks = [rng.normal(size=64).astype(np.float32),
              rng.integers(0, 255, 32).astype(np.uint8),
              rng.normal(size=16).astype(np.complex64)]
    p = tmp_path / "s.bin"
    assert write_framed(p, blocks) == 3
    back = list(read_framed(p))
    assert len(back) == 3
    for a, b in zip(back, blocks):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(a, b)


def test_serialize_truncated_frame(tmp_path, rng):
    from sdr_tpu.io import write_framed, read_framed, frame_blocks
    p = tmp_path / "s.bin"
    data = frame_blocks(rng.normal(size=64).astype(np.float32))
    with open(p, "wb") as fh:
        fh.write(data)
        fh.write(data[: len(data) // 2])  # truncated second frame
    back = list(read_framed(p))
    assert len(back) == 1


def test_channelizer_app_wideband(tmp_path):
    r = _run_app(["channelizer", "--synthetic", "--wideband",
                  "--channels", "4", "--seconds", "0.02"], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "demodulated 4 channels" in r.stdout


def test_fm_app_native_loader(fm_capture, tmp_path):
    out = tmp_path / "audio_native.wav"
    r = _run_app(["fm", "--in", str(fm_capture), "--out", str(out),
                  "--block", "655360", "--native"], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    tone = _dominant_tone(out, 48000)
    assert abs(tone - 700) < 10, f"tone {tone}"


def test_fm_tx_then_rx_roundtrip(tmp_path):
    """Transmit chain then receive chain: the audio tone survives."""
    # make a 1 s 600 Hz tone WAV at 48 kHz
    import wave as wave_mod
    tone_wav = tmp_path / "tone.wav"
    n = 48000
    audio = 0.8 * np.sin(2 * np.pi * 600 * np.arange(n) / 48000)
    with wave_mod.open(str(tone_wav), "wb") as wf:
        wf.setnchannels(1); wf.setsampwidth(2); wf.setframerate(48000)
        wf.writeframes((audio * 32767).astype("<i2").tobytes())
    txout = tmp_path / "tx.iq"
    r = _run_app(["fm_tx", "--in", str(tone_wav), "--out", str(txout)],
                 tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    # demodulate the transmitted IQ (i16 -> u8-style chain via i16 convert)
    iq = np.fromfile(txout, dtype=np.int16)
    # convert i16 IQ to u8 rtl format for the rx app: rescale
    z = iq.astype(np.float32) / 2048.0
    u8 = np.clip(np.round(z * 128 + 128), 0, 255).astype(np.uint8)
    cap = tmp_path / "loop.iq"
    u8.tofile(cap)
    out = tmp_path / "rx.wav"
    r = _run_app(["fm", "--in", str(cap), "--out", str(out),
                  "--block", "655360"], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    tone = _dominant_tone(out, 48000)
    assert abs(tone - 600) < 10, f"tone {tone}"


def test_follow_iq_file(tmp_path, rng):
    """Tail a growing raw file: complete blocks appear as they land, the
    trailing partial stays buffered, idle_timeout ends the follow."""
    import threading
    import time
    from sdr_tpu.io.files import follow_iq_file
    p = tmp_path / "grow.iq"
    data = rng.integers(0, 256, 4096, dtype=np.uint8)
    p.write_bytes(b"")

    def writer():
        with open(p, "ab") as fh:
            for i in range(0, 4096, 512):
                fh.write(data[i:i + 512].tobytes())
                fh.flush()
                time.sleep(0.02)

    t = threading.Thread(target=writer)
    t.start()
    blocks = list(follow_iq_file(p, 1024, poll=0.01, idle_timeout=1.0))
    t.join()
    assert len(blocks) == 4
    np.testing.assert_array_equal(np.concatenate(blocks), data)


def test_waterfall_app_follow(fm_capture, tmp_path):
    """Live waterfall: follow a growing capture, rewrite the PNG
    continuously, print ANSI rows (Plot.hs:72-78 headless analog)."""
    out = tmp_path / "wf_live.png"
    r = _run_app(["waterfall", "--in", str(fm_capture), "--out", str(out),
                  "--block", "524288", "--fft", "256", "--hop", "128",
                  "--follow", "--term", "--refresh-rows", "32",
                  "--idle-timeout", "1.0"], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 1000
    assert "followed" in r.stdout
    # ANSI rows printed to the terminal
    assert len(r.stdout.splitlines()) > 10


def test_waterfall_ansi_rows():
    from sdr_tpu.io.plot import Waterfall
    wf = Waterfall(256, rows=16)
    rows = np.ones((4, 256), dtype=np.float32) * 1e-6
    rows[:, 100] = 1.0  # a strong bin must render as heavy ink
    lines = wf.ansi_rows(rows, cols=64)
    assert len(lines) == 4 and all(len(l) == 64 for l in lines)
    assert lines[0][100 * 64 // 256] == "@"
    assert lines[0].count("@") == 1


def test_fm_chain_deemphasis_response():
    """fm_chain(deemphasis=75e-6) must attenuate per the RC curve:
    |H(f2)|/|H(f1)| = sqrt((1+(2*pi*f1*tau)^2)/(1+(2*pi*f2*tau)^2))."""
    import math
    import numpy as np
    import jax.numpy as jnp
    from sdr_tpu.apps.chains import fm_chain
    from sdr_tpu.stream import Pipeline
    fs, n = 1_280_000, 163_840 * 4
    f1, f2, tau = 1_000.0, 5_000.0, 75e-6
    t = np.arange(n) / fs
    audio = np.sin(2 * np.pi * f1 * t) + 0.5 * np.sin(2 * np.pi * f2 * t)
    iq = 0.9 * np.exp(1j * (2 * np.pi * 75e3 * np.cumsum(audio) / fs))
    raw = np.empty(2 * n, np.uint8)
    raw[0::2] = np.clip(np.round(iq.real * 128 + 128), 0, 255)
    raw[1::2] = np.clip(np.round(iq.imag * 128 + 128), 0, 255)

    def run(de):
        p = Pipeline(fm_chain(deemphasis=de), block_in=163_840,
                     in_dtype=jnp.uint8)
        _, y = p.process(raw)
        return np.asarray(y)[2000:]

    def tone(x, f):
        m = len(x)
        k = int(round(f * m / 48_000))
        X = np.abs(np.fft.rfft(x * np.hanning(m)))
        return X[max(k - 2, 0): k + 3].max()

    flat, de = run(None), run(tau)
    measured = (tone(de, f2) / tone(de, f1)) / (tone(flat, f2)
                                                / tone(flat, f1))
    expect = math.sqrt((1 + (2 * math.pi * f1 * tau) ** 2)
                       / (1 + (2 * math.pi * f2 * tau) ** 2))
    assert abs(measured - expect) < 0.05, (measured, expect)


def test_deemphasis_batched_and_sharded_paths():
    """The FIR-form de-emphasis must run through the block-parallel and
    time-sharded runners (the Iir form could not time-shard)."""
    import numpy as np
    import jax.numpy as jnp
    from sdr_tpu.apps.chains import fm_chain
    from sdr_tpu import parallel
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, 163_840 * 4, dtype=np.uint8))
    ops = fm_chain(deemphasis=75e-6, front="quantized", method="conv")
    y_b = np.asarray(parallel.run_time_batched(ops, raw, 4))
    y_s = np.asarray(parallel.run_time_sharded(
        fm_chain(deemphasis=75e-6, front="quantized", method="conv"),
        parallel.time_mesh(4), raw))
    np.testing.assert_allclose(y_b, y_s, atol=1e-5)
    y2 = np.asarray(parallel.run_time_sharded(
        fm_chain(stereo=True, deemphasis=75e-6),
        parallel.time_mesh(4), raw))
    assert y2.shape[0] == 2
