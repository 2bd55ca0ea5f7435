"""Pure-numpy oracle implementations of the reference kernel semantics.

These play the role the reference's ``filterHighLevel`` /
``decimateHighLevel`` / ``resampleHighLevel`` fallbacks play in its
differential test suite (tests/TestSuite.hs): an independent, obviously-
correct implementation every fast path must agree with.  Each function is a
direct transliteration of the semantics documented in SURVEY.md §2.2 —
*not* of any reference source file.
"""

import numpy as np


def filter_oracle(taps, x, num):
    """y[i] = sum_j taps[j] * x[i+j]  (correlation orientation)."""
    taps = np.asarray(taps)
    x = np.asarray(x)
    K = len(taps)
    return np.stack([(x[i:i + K] * taps).sum() for i in range(num)])


def decimate_oracle(taps, factor, x, num):
    """y[i] = sum_j taps[j] * x[i*factor + j]."""
    taps = np.asarray(taps)
    x = np.asarray(x)
    K = len(taps)
    return np.stack([(x[i * factor:i * factor + K] * taps).sum()
                     for i in range(num)])


def resample_oracle(taps, interpolation, decimation, x, offset, num):
    """The reference's sequential phase recurrence, verbatim semantics:

    per output: dot(x[inputOffset:], taps[filterOffset::I]) then
    (q, r) = divmod(D - filterOffset - 1, I); inputOffset += q + 1;
    filterOffset = I - 1 - r.  Returns (y, end_offset).
    """
    taps = np.asarray(taps)
    x = np.asarray(x)
    out = []
    fo = offset
    io = 0
    for _ in range(num):
        sub = taps[fo::interpolation]
        seg = x[io:io + len(sub)]
        out.append((seg * sub[: len(seg)]).sum())
        q, r = divmod(decimation - fo - 1, interpolation)
        io += q + 1
        fo = interpolation - 1 - r
    return np.stack(out) if out else np.zeros(0, x.dtype), fo


def fm_demod_oracle(x, last=0j):
    out = np.empty(len(x), dtype=np.float64)
    for i, s in enumerate(x):
        out[i] = np.angle(s * np.conj(last))
        last = s
    return out, last


def dc_blocker_oracle(x, last_sample=0.0, last_output=0.0, alpha=0.997):
    y = np.empty(len(x), dtype=np.float64)
    ls, lo = last_sample, last_output
    for i, s in enumerate(x):
        lo = s - ls + alpha * lo
        ls = s
        y[i] = lo
    return y, (ls, lo)


def agc_oracle(x, mu, reference, state=1.0):
    y = np.empty(len(x), dtype=np.complex128)
    g = state
    for i, s in enumerate(x):
        c = s * g
        y[i] = c
        g = g + mu * (reference - abs(c))
    return y, g
