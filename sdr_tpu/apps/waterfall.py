"""Spectral waterfall CLI (BASELINE config #3; Plot.hs:72-78).

One-shot render of a recording:

    python -m sdr_tpu.apps.waterfall --in capture.iq --out waterfall.png \
        --fft 1024 --hop 512

Live follow of a GROWING capture (the headless analog of the reference's
rolling OpenGL waterfall): tail the file, push rows into the scrolling
buffer, atomically rewrite the PNG every ``--refresh-rows`` rows so a
viewer polling it sees the stream advance; ``--term`` additionally prints
ANSI rows to the terminal as they arrive:

    python -m sdr_tpu.apps.waterfall --in live.iq --follow --term \
        --idle-timeout 5
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import jax.numpy as jnp

from sdr_tpu.apps.chains import waterfall_chain
from sdr_tpu.io import iq_file_source
from sdr_tpu.io.files import follow_iq_file
from sdr_tpu.io.plot import Waterfall
from sdr_tpu.ops import waterfall_image
from sdr_tpu.stream import Pipeline
from sdr_tpu.utils import parse_size


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in", dest="inp", required=True)
    ap.add_argument("--out", default="waterfall.png")
    ap.add_argument("--fft", type=int, default=1024)
    ap.add_argument("--hop", type=int, default=512)
    ap.add_argument("--block", default="1048576", type=parse_size)
    ap.add_argument("--max-rows", type=int, default=2048)
    ap.add_argument("--follow", action="store_true",
                    help="tail a growing file; rewrite --out continuously")
    ap.add_argument("--refresh-rows", type=int, default=64,
                    help="rewrite the PNG every N new rows (follow mode)")
    ap.add_argument("--idle-timeout", type=float, default=None,
                    help="stop following after N quiet seconds "
                         "(default: follow forever)")
    ap.add_argument("--term", action="store_true",
                    help="also print ANSI rows to the terminal (follow)")
    ap.add_argument("--term-cols", type=int, default=80)
    args = ap.parse_args(argv)

    pipe = Pipeline(waterfall_chain(args.fft, args.hop),
                    block_in=args.block, in_dtype=jnp.uint8)

    if args.follow:
        wf = Waterfall(args.fft, rows=min(args.max_rows, 512))
        source = follow_iq_file(args.inp, args.block,
                                idle_timeout=args.idle_timeout)
        pending = 0
        written = 0
        try:
            for y in pipe.run(source):
                rows = np.asarray(y)
                wf.push(rows)
                if args.term:
                    for line in wf.ansi_rows(rows, cols=args.term_cols):
                        print(line, flush=True)
                pending += rows.shape[0]
                if pending >= args.refresh_rows:
                    wf.save(args.out, atomic=True)
                    written += pending
                    pending = 0
        except KeyboardInterrupt:
            pass
        wf.save(args.out, atomic=True)
        written += pending
        print(f"followed {written} rows into {args.out}")
        return 0

    rows = []
    total = 0
    for y in pipe.run(iq_file_source(args.inp, args.block)):
        rows.append(np.asarray(y))
        total += rows[-1].shape[0]
        if total >= args.max_rows:
            break
    img = np.concatenate(rows, axis=0)[: args.max_rows]
    waterfall_image(img, args.out)
    print(f"wrote {img.shape[0]}x{img.shape[1]} waterfall to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
