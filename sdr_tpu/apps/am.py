"""AM/airband receiver CLI (BASELINE config #4).

    python -m sdr_tpu.apps.am --in capture.iq --out audio.wav \
        --rate 1280K --if-freq 0.2 --decim 16
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import jax.numpy as jnp

from sdr_tpu.apps.chains import am_chain
from sdr_tpu.io import iq_file_source, wav_sink
from sdr_tpu.stream import Pipeline
from sdr_tpu.utils import parse_size


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in", dest="inp", required=True)
    ap.add_argument("--out", default="audio.wav")
    ap.add_argument("--rate", default="1280K", type=parse_size)
    ap.add_argument("--block", default="1048576", type=parse_size)
    ap.add_argument("--if-freq", type=float, default=0.25,
                    help="carrier offset in cycles/sample to mix to DC")
    ap.add_argument("--decim", type=int, default=16)
    ap.add_argument("--volume", type=float, default=0.5)
    ap.add_argument("--method", default="auto")
    args = ap.parse_args(argv)

    audio_rate = args.rate // args.decim
    pipe = Pipeline(
        am_chain(args.if_freq, args.decim, volume=args.volume,
                 method=args.method),
        block_in=args.block, in_dtype=jnp.uint8)
    write, close = wav_sink(args.out, audio_rate)
    n = 0
    for y in pipe.run(iq_file_source(args.inp, args.block)):
        write(np.asarray(y))
        n += pipe.block_out
    close()
    print(f"wrote {n} audio samples at {audio_rate} Hz to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
