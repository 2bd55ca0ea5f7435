"""Spectral waterfall CLI (BASELINE config #3; Plot.hs:72-78 headless).

    python -m sdr_tpu.apps.waterfall --in capture.iq --out waterfall.png \
        --fft 1024 --hop 512
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import jax.numpy as jnp

from sdr_tpu.apps.chains import waterfall_chain
from sdr_tpu.io import iq_file_source
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
    args = ap.parse_args(argv)

    pipe = Pipeline(waterfall_chain(args.fft, args.hop),
                    block_in=args.block, in_dtype=jnp.uint8)
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
