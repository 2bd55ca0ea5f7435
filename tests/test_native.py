"""Native C++ block-loader tests."""

import socket
import time

import numpy as np
import pytest

from sdr_tpu.io import native_file_source, native_udp_source, native_available
from sdr_tpu.io.native import build_native


pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no native toolchain")


def test_build():
    assert build_native() is not None


def test_file_loader(tmp_path, rng):
    x = rng.integers(0, 256, 40000).astype(np.uint8)
    p = tmp_path / "x.iq"
    x.tofile(p)
    blocks = list(native_file_source(p, 8192))
    assert len(blocks) == 4  # partial trailing block dropped
    np.testing.assert_array_equal(np.concatenate(blocks), x[:32768])


def test_file_loader_repeat(tmp_path, rng):
    x = rng.integers(0, 256, 8192).astype(np.uint8)
    p = tmp_path / "x.iq"
    x.tofile(p)
    it = iter(native_file_source(p, 6000, repeat=True))
    a = next(it)
    b = next(it)
    c = next(it)
    whole = np.concatenate([a, b, c])
    np.testing.assert_array_equal(whole, np.tile(x, 3)[:18000])


def test_file_loader_i16(tmp_path, rng):
    x = rng.integers(-2048, 2048, 4096).astype(np.int16)
    p = tmp_path / "x.iq"
    x.tofile(p)
    blocks = list(native_file_source(p, 2048, dtype=np.int16))
    assert len(blocks) == 2
    np.testing.assert_array_equal(np.concatenate(blocks), x)


def test_udp_loader(rng):
    port = 24751
    src = native_udp_source(port, 1024)
    time.sleep(0.2)
    sent = [rng.integers(0, 256, 1024).astype(np.uint8) for _ in range(3)]
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    it = iter(src)
    got = []
    for b in sent:
        s.sendto(b.tobytes(), ("127.0.0.1", port))
        got.append(next(it))
    s.close()
    for g, w in zip(got, sent):
        np.testing.assert_array_equal(g, w)
    assert src.dropped == 0
    src.close()


def test_backpressure_file(tmp_path, rng):
    """Bounded ring: producer cannot run ahead more than n_buffers."""
    x = rng.integers(0, 256, 1 << 20).astype(np.uint8)
    p = tmp_path / "big.iq"
    x.tofile(p)
    src = native_file_source(p, 4096, n_buffers=2)
    it = iter(src)
    first = next(it)
    time.sleep(0.1)  # producer parked on the full ring, not at EOF
    rest = list(it)
    whole = np.concatenate([first] + rest)
    np.testing.assert_array_equal(whole, x)
