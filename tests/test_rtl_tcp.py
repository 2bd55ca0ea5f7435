"""rtl_tcp client tests against a mock server.

The reference's live path (sdrStream, RTLSDRStream.hs:54-87) cannot be
hardware-tested here and neither could the original (no radio in CI);
the network protocol IS testable: a mock rtl_tcp server asserts the
configuration command stream and serves a deterministic IQ byte stream,
driven end-to-end through the FM receiver app.
"""

import socket
import struct
import threading
import wave

import numpy as np
import pytest

from sdr_tpu.io.rtl_tcp import (RtlTcpParams, RtlTcpSource,
                                parse_rtl_tcp_url, rtl_tcp_source)


class MockRtlTcp:
    """One-connection rtl_tcp server: header, command capture, fixed
    payload, close."""

    def __init__(self, payload: bytes, tuner_type: int = 5, gains: int = 29):
        self.payload = payload
        self.commands = []
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._header = b"RTL0" + struct.pack(">II", tuner_type, gains)
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        conn, _ = self._srv.accept()
        conn.sendall(self._header)
        # commands arrive before the consumer starts draining samples;
        # read whatever is queued without blocking the payload
        conn.settimeout(0.5)
        buf = b""
        while True:  # drain everything the configure step sent
            try:
                chunk = conn.recv(256)
            except socket.timeout:
                break
            if not chunk:
                break
            buf += chunk
        for i in range(0, len(buf) - len(buf) % 5, 5):
            self.commands.append(struct.unpack(">BI", buf[i:i + 5]))
        conn.settimeout(None)
        conn.sendall(self.payload)
        conn.shutdown(socket.SHUT_WR)
        conn.close()
        self._srv.close()

    def join(self):
        self._thread.join(timeout=10)


def test_url_parsing():
    assert parse_rtl_tcp_url("rtl_tcp://radio:1234") == ("radio", 1234)
    assert parse_rtl_tcp_url("127.0.0.1:99") == ("127.0.0.1", 99)
    with pytest.raises(ValueError):
        parse_rtl_tcp_url("rtl_tcp://noport")


def test_source_config_and_stream():
    rng = np.random.default_rng(7)
    payload = rng.integers(0, 256, 4096 * 3 + 100, dtype=np.uint8).tobytes()
    srv = MockRtlTcp(payload)
    src = RtlTcpSource("127.0.0.1", srv.port,
                       RtlTcpParams(90_200_000, 1_280_000,
                                    freq_correction=12, tuner_gain=297),
                       block=4096)
    assert src.tuner_type == 5 and src.tuner_gain_count == 29
    blocks = list(src)
    srv.join()
    # full blocks only; the 100-byte tail is dropped at EOF
    assert len(blocks) == 3
    got = np.concatenate(blocks)
    np.testing.assert_array_equal(
        got, np.frombuffer(payload[: 4096 * 3], dtype=np.uint8))
    cmds = dict(srv.commands)
    assert cmds[0x02] == 1_280_000      # sample rate
    assert cmds[0x01] == 90_200_000     # center frequency
    assert cmds[0x05] == 12             # freq correction ppm
    assert cmds[0x03] == 1 and cmds[0x04] == 297  # manual gain 29.7 dB
    src.close()


def test_source_auto_gain_commands():
    srv = MockRtlTcp(b"\x80" * 1024)
    src = RtlTcpSource("127.0.0.1", srv.port,
                       RtlTcpParams(100_000_000, 2_048_000), block=512)
    list(src)
    srv.join()
    cmds = dict(srv.commands)
    assert cmds[0x03] == 0 and cmds[0x08] == 1  # AGC mode
    src.close()


def test_bad_magic_rejected():
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        conn.sendall(b"NOPE" + b"\x00" * 8)
        conn.close()
        srv.close()

    threading.Thread(target=serve, daemon=True).start()
    with pytest.raises(ConnectionError):
        RtlTcpSource("127.0.0.1", port,
                     RtlTcpParams(1_000_000, 1_000_000), block=512)


def test_fm_app_end_to_end_rtl_tcp(tmp_path):
    """apps/fm.py --in rtl_tcp://... drives the full receive chain from
    the mock radio to a WAV file (the examples/fm/fm.hs loop with the
    network front end)."""
    from sdr_tpu.apps.fm import main
    rng = np.random.default_rng(0)
    block = 81920
    payload = rng.integers(0, 256, block * 3, dtype=np.uint8).tobytes()
    srv = MockRtlTcp(payload)
    out = str(tmp_path / "audio.wav")
    rc = main(["--in", f"rtl_tcp://127.0.0.1:{srv.port}",
               "--out", out, "--rate", "1280K", "--freq", "90.2M",
               "--block", str(block), "--method", "conv"])
    srv.join()
    assert rc == 0
    with wave.open(out) as wf:
        assert wf.getframerate() == 48000
        assert wf.getnframes() == 3 * block // 2 // 8 * 3 // 10


def test_rtl_tcp_source_helper():
    srv = MockRtlTcp(b"\x80" * 2048)
    src = rtl_tcp_source(f"rtl_tcp://127.0.0.1:{srv.port}",
                         RtlTcpParams(1, 2), block=1024)
    assert sum(b.shape[0] for b in src) == 2048
    src.close()


def test_audio_sink_gated():
    """Optional sounddevice sink: headless hosts get a clean error and
    availability probe (Pulse.hs analog stays optional, SURVEY §7.7)."""
    from sdr_tpu.io import audio_available, audio_sink
    if audio_available():
        write, close = audio_sink(48000)
        write(np.zeros(480, np.float32))
        close()
    else:
        with pytest.raises(RuntimeError, match="sounddevice"):
            audio_sink(48000)
