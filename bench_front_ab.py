"""One-off A/B probe: quantized front-end geometry at chain shapes.

Times fir_decimate_u8_planar (impl x precision x q_out) with bench.py's
calibrated-pair methodology at the EXACT shapes the headline chain runs
(32 x 10 MiB u8 blocks, K=51, D=8).  Writes bench_front_ab.json — the
committed copy holds the r3 formulation A/B (xor+concat vs xor+split vs
u8-direct split; see its _note) that set the current impl='xla'
(u8-direct split dot) and the Q=64 default.  Rerunning refreshes the
'xla_*' rows with the current formulation.
Run standalone on the TPU; ~2 min per variant warm.
"""
import json
import numpy as np
import jax.numpy as jnp

import bench
from sdr_tpu.apps.chains import fm_taps
from sdr_tpu.ops.quantized import fir_decimate_u8_planar

def main():
    rf, _, _ = fm_taps()
    nblocks, block = 32, 10_485_760
    n_d = block // 2 // 8
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (nblocks, block), dtype=np.uint8))
    total = nblocks * block // 2
    out = {}
    try:
        out.update(json.load(open("bench_front_ab.json")))
    except (OSError, ValueError):
        pass
    variants = []
    for prec in ("s16", "s8"):
        for q in (32, 64, 128):
            variants.append(("xla", prec, q))
    for impl, prec, q in variants:
        key = f"{impl}_{prec}_q{q}"
        try:
            dt = bench._time_jit(
                lambda i, r, p=prec, qq=q, im=impl: fir_decimate_u8_planar(
                    rf, 8, r + i.astype(jnp.uint8), n_d, impl=im,
                    precision=p, q_out=qq),
                iters=8, operands=(raw,), runs=4)
            out[key] = {"sec": dt, "gsps_equiv": total / dt / 1e9}
            print(key, out[key], flush=True)
        except Exception as e:
            out[key] = {"error": str(e)[:200]}
            print(key, "ERR", str(e)[:120], flush=True)
        with open("bench_front_ab.json", "w") as fh:
            json.dump(out, fh, indent=2)

if __name__ == "__main__":
    main()
