"""FIR filter design (offline, host-side math).

Reference: hs_sources/SDR/FilterDesign.hs — sinc, Hanning/Hamming/Blackman
windows, windowed sinc, square-root raised cosine, and a frequency-response
plot.  All pure numpy (design happens once at pipeline-construction time;
there is nothing to accelerate).  ``remez`` re-exports scipy's Parks-
McClellan design, which is what the reference's example coefficients were
generated with offline in Octave (examples/fm/Coeffs.hs:3-9).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "sinc",
    "hanning",
    "hamming",
    "blackman",
    "windowed_sinc",
    "srrc",
    "remez",
    "frequency_response",
    "plot_frequency",
]


def sinc(size: int, cutoff: float) -> np.ndarray:
    """Sampled sinc low-pass prototype; ``size`` should be odd.

    Reference: FilterDesign.hs:29-36 — value at center is ``cutoff``;
    elsewhere ``sin(pi*cutoff*k)/(k*pi)`` with k the (center - idx) offset.
    """
    k = (size - 1) // 2 - np.arange(size)
    out = np.where(k == 0, float(cutoff),
                   np.sin(np.pi * cutoff * k) / (np.where(k == 0, 1, k) * np.pi))
    return out.astype(np.float32)


def hanning(size: int) -> np.ndarray:
    """Hann window.  Reference: FilterDesign.hs:39-44."""
    n = np.arange(size)
    return (0.5 * (1 - np.cos(2 * np.pi * n / (size - 1)))).astype(np.float32)


def hamming(size: int) -> np.ndarray:
    """Hamming window.  Reference: FilterDesign.hs:47-52."""
    n = np.arange(size)
    return (0.54 - 0.46 * np.cos(2 * np.pi * n / (size - 1))).astype(np.float32)


def blackman(size: int) -> np.ndarray:
    """Blackman window.  Reference: FilterDesign.hs:55-60."""
    n = np.arange(size)
    return (0.42 - 0.5 * np.cos(2 * np.pi * n / (size - 1))
            + 0.08 * np.cos(4 * np.pi * n / (size - 1))).astype(np.float32)


def windowed_sinc(size: int, cutoff: float, window=hanning) -> np.ndarray:
    """Windowed-sinc FIR design.  Reference: FilterDesign.hs:63-68."""
    return (sinc(size, cutoff) * window(size)).astype(np.float32)


def srrc(n: int, ts: int, beta: float) -> np.ndarray:
    """Square-root raised cosine pulse over [-n, n].

    Reference: FilterDesign.hs:85-98 (including its special-case handling at
    x = 0 and |x| = ts/(4*beta)).
    """
    xs = np.arange(-n, n + 1, dtype=np.float64)
    out = np.empty_like(xs)
    for i, x in enumerate(xs):
        if x == 0:
            out[i] = 1 - beta + 4 * beta / np.pi
        elif abs(abs(x) - ts / (4 * beta)) < 0.001:
            out[i] = (beta / np.sqrt(2)) * (
                (1 + 2 / np.pi) * np.sin(np.pi / (4 * beta))
                + (1 - 2 / np.pi) * np.cos(np.pi / (4 * beta)))
        else:
            xd = x / ts
            out[i] = (np.sin(np.pi * xd * (1 - beta))
                      + 4 * beta * xd * np.cos(np.pi * xd * (1 + beta))) / (
                np.pi * xd * (1 - (4 * beta * xd) ** 2))
    return out.astype(np.float32)


def remez(numtaps: int, bands, desired, fs: float = 2.0) -> np.ndarray:
    """Parks-McClellan equiripple design (scipy-backed).

    The reference designed its example taps offline with Octave's
    ``remez(50, [0 0.08 0.125 1], [1 1 0 0])`` (examples/fm/Coeffs.hs:3-9);
    this gives the same designs in-process.  ``bands``/``desired`` follow
    scipy.signal.remez conventions.
    """
    from scipy.signal import remez as _remez
    return _remez(numtaps, bands, desired, fs=fs).astype(np.float32)


def frequency_response(taps, n: int = 512):
    """(freqs in [0, 1] of Nyquist, |H|) of a linear-phase FIR.

    Same magnitude computation the reference plots
    (FilterDesign.hs:70-81): coefficients rotated about their center.
    """
    taps = np.asarray(taps, dtype=np.float64)
    w = np.linspace(0, np.pi, n, endpoint=False)
    center = (len(taps) - 1) / 2
    idx = np.arange(len(taps)) - center
    H = (taps[None, :] * np.exp(-1j * w[:, None] * idx)).sum(axis=1)
    return w / np.pi, np.abs(H)


def plot_frequency(taps, filename: str) -> None:
    """Save a PNG of the filter's frequency response.

    Reference: ``plotFrequency`` (FilterDesign.hs:76-81, Chart/Cairo there,
    matplotlib here).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    f, mag = frequency_response(taps)
    fig, ax = plt.subplots(figsize=(8, 4.5))
    ax.plot(f, mag)
    ax.set_title("Frequency Response")
    ax.set_xlabel("frequency (fraction of Nyquist)")
    ax.set_ylabel("|H|")
    fig.savefig(filename, dpi=100)
    plt.close(fig)
