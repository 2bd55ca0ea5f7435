"""Broadcast FM receiver CLI (the examples/fm/fm.hs app, recorded-file I/O).

    python -m sdr_tpu.apps.fm --in capture.iq --out audio.wav \
        --rate 1280K --block 1310720

Reads RTL-SDR-format u8 interleaved IQ, writes 48 kHz mono WAV.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import jax.numpy as jnp

from sdr_tpu.apps.chains import fm_chain
from sdr_tpu.io import iq_file_source, wav_sink
from sdr_tpu.stream import Pipeline, rate as rate_meter
from sdr_tpu.utils import parse_size


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in", dest="inp", required=True,
                    help="input raw u8 interleaved IQ file")
    ap.add_argument("--out", default="audio.wav", help="output WAV file")
    ap.add_argument("--rate", default="1280K", type=parse_size,
                    help="input sample rate (complex S/s), e.g. 1280K")
    ap.add_argument("--block", default="1310720", type=parse_size,
                    help="u8 items per block (must keep chain rates integral)")
    ap.add_argument("--volume", type=float, default=0.2)
    ap.add_argument("--method", default="auto",
                    choices=["auto", "direct", "banded", "conv", "pallas"])
    ap.add_argument("--front", default="auto",
                    choices=["auto", "exact", "quantized"],
                    help="front end: exact f32 stages or the fused "
                         "int8-MXU convert+decimate (auto: quantized "
                         "on TPU)")
    ap.add_argument("--batched", type=int, default=0, metavar="B",
                    help="process B blocks block-parallel per dispatch "
                         "(offline-throughput path; 0 = stream "
                         "sequentially)")
    ap.add_argument("--meter", action="store_true",
                    help="print throughput while running")
    ap.add_argument("--native", action="store_true",
                    help="ingest via the C++ ring-buffer loader")
    args = ap.parse_args(argv)

    audio_rate = args.rate // 8 * 3 // 10
    pipe = Pipeline(fm_chain(args.volume, args.method, front=args.front),
                    block_in=args.block, in_dtype=jnp.uint8)
    write, close = wav_sink(args.out, audio_rate)
    if args.native:
        from sdr_tpu.io import native_file_source
        source = native_file_source(args.inp, args.block)
    else:
        source = iq_file_source(args.inp, args.block)
    if args.batched:
        def batched_blocks():
            import numpy as _np
            from sdr_tpu.parallel.sharded import run_time_batched
            import jax.numpy as _jnp
            cs = pipe.init()
            buf = []
            for blk in source:
                buf.append(_np.asarray(blk))
                if len(buf) == args.batched:
                    cs, y = run_time_batched(
                        pipe.ops, _jnp.asarray(_np.concatenate(buf)),
                        len(buf), carries=cs, return_carries=True)
                    buf.clear()
                    yield _np.asarray(y)
            if buf:
                cs, y = run_time_batched(
                    pipe.ops, _jnp.asarray(_np.concatenate(buf)),
                    len(buf), carries=cs, return_carries=True)
                yield _np.asarray(y)
        blocks = batched_blocks()
    else:
        blocks = pipe.run(source)
    if args.meter:
        blocks = rate_meter(blocks,
                            pipe.block_out * max(1, args.batched))
    n = 0
    for y in blocks:
        y = np.asarray(y)
        write(y)
        n += y.shape[-1]
    close()
    print(f"wrote {n} audio samples at {audio_rate} Hz to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
