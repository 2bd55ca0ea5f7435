"""Measured kernel-dispatch table: pick the FIR execution path from
recorded benchmark rates, not hardcoded thresholds.

The reference's dispatch layer (SDR/CPUID.hs:100-104 ``featureSelect``)
selects among SIMD variants by a *capability* predicate; on TPU every
strategy is always available and the right choice depends on problem
shape, so selection is by *measured throughput* instead.  Rates below are
samples/sec from the committed ``bench_kernels.json`` matrix (the
Criterion analog, benchmarks/Benchmarks.hs:79-156) at the recorded tap
counts; ``best_method`` log-interpolates each method's rate at the
requested tap count and returns the argmax.

Refresh after a new matrix run with::

    python -m sdr_tpu.utils.tuning bench_kernels.json

which prints an updated ``MEASURED`` block to paste in.  A deployment can
also override at runtime via ``SDR_TPU_TUNING_JSON=<path>`` (same schema:
``{family: {method: {taps: rate}}}``).
"""

from __future__ import annotations

import json
import math
import os

__all__ = ["best_method", "measured_rates"]

# samples/sec by {family: {method: {n_taps: rate}}}.
# family 'filter' = unit stride, 'decimate' = strided.  TPU provenance,
# per row: k32 = r2 calibrated-pair rows at batched in-chain shapes
# ([32, n] — single 1-D convs degenerate ~100x on TPU and must not seed
# this table); k128/k512 = r1 bench_kernels.json VERBATIM (older
# harness — refresh from the batched matrix when it completes).  The
# argmax is robust to the mixed provenance: pallas wins k32 by 27x
# (r2) and was already ahead at k128/k512 within r1's own numbers.
# CPU numbers are rough orders from the test machine — CPU is a
# correctness backend, not a target.
MEASURED = {
    "tpu": {
        "filter": {
            "conv":   {32: 3.21e9, 128: 8.89e9, 512: 1.00e10},
            "pallas": {32: 8.82e10, 128: 9.48e9, 512: 1.49e10},
        },
        "decimate": {
            "conv":   {128: 7.02e9},
            "pallas": {128: 6.8e9},
        },
    },
    "cpu": {
        "filter": {
            "conv":   {32: 2.0e8, 512: 1.0e8},
            "direct": {32: 1.0e8, 512: 2.0e7},
        },
        "decimate": {
            "conv":   {32: 2.0e8, 512: 1.0e8},
            "direct": {32: 1.0e8, 512: 2.0e7},
        },
    },
}


def measured_rates(device_family: str):
    """The active rate table for ``device_family`` ('tpu' | 'cpu'):
    the ``SDR_TPU_TUNING_JSON`` override if set, else ``MEASURED``."""
    path = os.environ.get("SDR_TPU_TUNING_JSON")
    if path:
        try:
            with open(path) as fh:
                loaded = json.load(fh)
            if device_family in loaded:
                return {fam: {m: {int(k): float(v) for k, v in d.items()}
                              for m, d in fams.items()}
                        for fam, fams in loaded[device_family].items()}
        except (OSError, ValueError):
            pass
    return MEASURED.get(device_family, MEASURED["cpu"])


def _rate_at(table: dict, n_taps: int) -> float:
    """Log-log interpolate/extrapolate (clamped) a {taps: rate} table."""
    pts = sorted(table.items())
    if not pts:
        return 0.0
    if n_taps <= pts[0][0]:
        return pts[0][1]
    if n_taps >= pts[-1][0]:
        return pts[-1][1]
    for (k0, r0), (k1, r1) in zip(pts, pts[1:]):
        if k0 <= n_taps <= k1:
            t = (math.log(n_taps) - math.log(k0)) / (
                math.log(k1) - math.log(k0))
            return math.exp(math.log(r0) * (1 - t) + math.log(r1) * t)
    return pts[-1][1]


def best_method(device_family: str, n_taps: int, factor: int = 1,
                num: int = 1 << 20) -> str:
    """Highest measured-rate execution path for a strided FIR.

    Small problems on CPU skip to 'direct' (dispatch overhead dominates
    and the im2col stays tiny); otherwise the argmax over the measured
    table for the family ('filter' for unit stride, 'decimate' else).
    """
    if device_family != "tpu" and num < 4096:
        return "direct"
    fam = "filter" if factor == 1 else "decimate"
    table = measured_rates(device_family).get(fam, {})
    best, best_rate = "conv", 0.0
    for method, rates in table.items():
        r = _rate_at(rates, n_taps)
        if r > best_rate:
            best, best_rate = method, r
    return best


def _main(argv):
    """Regenerate the MEASURED tpu block from a bench_kernels.json."""
    with open(argv[1]) as fh:
        m = json.load(fh)
    table: dict = {"filter": {}, "decimate": {}}
    for key, rate in m.items():
        parts = key.split("_")  # e.g. filter_r_k128_conv
        if len(parts) == 4 and parts[0] in table and parts[2][0] == "k":
            fam, _, ktaps, method = parts
            table[fam].setdefault(method, {})[int(ktaps[1:])] = rate
    print(json.dumps({"tpu": table}, indent=2, sort_keys=True))
    return 0


if __name__ == "__main__":  # pragma: no cover
    import sys
    sys.exit(_main(sys.argv))
