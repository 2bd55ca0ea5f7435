"""UDP block streaming.

Reference: hs_sources/SDR/NetworkStream.hs:17-42 — one storable vector per
datagram, raw little-endian sample bytes, no framing.  Wire-compatible
here: ``udp_sink`` sends each block as one datagram of its raw bytes;
``udp_source`` yields one ndarray per received datagram.  (Datagram size
caps block*itemsize at ~64 KiB, same constraint the reference inherits.)
"""

from __future__ import annotations

import socket
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["udp_source", "udp_sink"]

_MAX_DGRAM = 65507


def udp_source(bind: Tuple[str, int], block: int, dtype=np.uint8,
               timeout: Optional[float] = None) -> Iterator[np.ndarray]:
    """Yield blocks received as single datagrams on ``bind`` (host, port).

    Reference: ``udpSource`` (NetworkStream.hs:28-35).  Datagrams smaller
    than a full block are dropped (partial vectors are not part of the
    static-shape contract); larger ones are truncated.
    """
    dtype = np.dtype(dtype)
    nbytes = block * dtype.itemsize
    if nbytes > _MAX_DGRAM:
        raise ValueError(f"block of {nbytes} bytes exceeds UDP datagram max")
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 1 << 22)
    sock.bind(bind)
    if timeout is not None:
        sock.settimeout(timeout)
    try:
        while True:
            try:
                data, _ = sock.recvfrom(nbytes)
            except socket.timeout:
                return
            if len(data) < nbytes:
                continue
            yield np.frombuffer(data[:nbytes], dtype=dtype).copy()
    finally:
        sock.close()


def udp_sink(dest: Tuple[str, int]):
    """Return (send, close); ``send`` transmits one block per datagram.

    Reference: ``udpSink`` (NetworkStream.hs:37-42).
    """
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF, 1 << 22)

    def send(block):
        b = np.ascontiguousarray(np.asarray(block))
        if b.nbytes > _MAX_DGRAM:
            raise ValueError(
                f"block of {b.nbytes} bytes exceeds UDP datagram max")
        sock.sendto(b.tobytes(), dest)

    return send, sock.close
