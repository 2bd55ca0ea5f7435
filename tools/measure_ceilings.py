"""Measure the attached device's unit ceilings for the roofline model.

Probes each execution unit with the op that can only be bound by it:

* ``hbm``      — chained elementwise add over a 256 MB array (one read +
                 one write per pass; optimization_barrier between passes).
* ``vpu``      — chained degree-64 Horner polynomial (128 f32 flops per
                 element per pass; HBM share < 15% at the probe size).
* ``mxu_*``    — [4096, 4096] square f32 matmuls at DEFAULT / HIGH /
                 HIGHEST precision (bf16x1 / x3 / x6 passes), and an
                 int8 x int8 -> int32 matmul.

Rates are printed as ONE JSON line; paste the values into
``sdr_tpu.utils.roofline.MEASURED_CEILINGS`` with provenance.  The
calibrated-pair timing (bench._time_jit) cancels the tunnel's
per-dispatch constant; run in a good device window (the tunneled chip is
bimodal on a minutes scale — see bench.py) and treat results as
lower-bound capabilities: the best sustained rate ever measured for a
unit is the ceiling.

Usage:  python tools/measure_ceilings.py
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402  (configures the persistent compile cache)


def measure(tag, fn, work, operands, iters, chained=False):
    try:
        dt = bench._time_jit(fn, iters=iters, operands=operands,
                             chained=chained)
        rate = work / dt
        print(f"{tag:24s} {rate/1e12:8.2f} T/s  ({dt*1e3:.3f} ms/pass)",
              file=sys.stderr)
        return rate
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: {str(e)[:200]}", file=sys.stderr)
        return None


def main():
    rng = np.random.default_rng(0)
    out = {"device": jax.devices()[0].device_kind,
           "run_at_unix": int(time.time())}

    # HBM: one read + one write per pass, 256 MiB f32
    n_h = 1 << 26
    xh = jnp.asarray(rng.uniform(-1, 1, (512, n_h // 512)).astype(np.float32))
    out["hbm_bps"] = measure(
        "hbm (copy r+w)", lambda i, x: x + jnp.float32(1.0),
        2.0 * 4 * n_h, (xh,), iters=16, chained=True)

    # VPU: degree-64 Horner, 128 flops/element/pass over 64 MiB
    n_v = 1 << 24
    xv = jnp.asarray(
        rng.uniform(-1, 1, (512, n_v // 512)).astype(np.float32))

    def horner(i, x):
        acc = x
        for _ in range(64):
            acc = acc * jnp.float32(0.249) + x
        return acc * jnp.float32(1e-3)

    out["vpu_flops"] = measure(
        "vpu (horner-64)", horner, 128.0 * n_v, (xv,), iters=16,
        chained=True)

    # MXU: square matmuls, 2*m^3 flops each
    m = 4096
    a = jnp.asarray(rng.uniform(-1, 1, (m, m)).astype(np.float32) / m)
    b = jnp.asarray(rng.uniform(-1, 1, (m, m)).astype(np.float32))
    flops = 2.0 * m ** 3
    for name, prec in (("default", jax.lax.Precision.DEFAULT),
                       ("high", jax.lax.Precision.HIGH),
                       ("highest", jax.lax.Precision.HIGHEST)):
        out[f"mxu_f32_{name}_flops"] = measure(
            f"mxu f32 {name}",
            lambda i, x, y, p=prec: jnp.dot(
                x + i.astype(jnp.float32) * 1e-30, y, precision=p,
                preferred_element_type=jnp.float32),
            flops, (a, b), iters=8)

    a8 = jnp.asarray(rng.integers(-127, 127, (m, m), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, (m, m), dtype=np.int8))
    # perturbation must be NONZERO or XLA CSEs every iteration into one
    # matmul (wrap-around on +1 is harmless for timing)
    out["mxu_int8_ops"] = measure(
        "mxu int8",
        lambda i, x, y: jnp.dot((x + i.astype(jnp.int8)), y,
                                preferred_element_type=jnp.int32),
        flops, (a8, b8), iters=16)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
