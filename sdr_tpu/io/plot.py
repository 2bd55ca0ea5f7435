"""Plot consumers: line, filled, waterfall.

Reference: hs_sources/SDR/Plot.hs — OpenGL consumers ``plotLine`` (38-69),
``plotFill(Axes)`` (104-131), ``plotWaterfall`` (72-78) with Cairo axes
(134-171).  TPU hosts are headless, so these render PNGs (single-shot or
rolling) with matplotlib; the waterfall keeps a scrolling row buffer like
the reference's texture ring.
"""

from __future__ import annotations

import numpy as np

__all__ = ["plot_line", "plot_fill", "Waterfall", "zero_axis",
           "centered_axis"]


def zero_axis(n: int, fs: float = 1.0) -> np.ndarray:
    """Frequency axis [0, fs) for n bins — the reference's ``zeroAxes``
    labeling (Plot.hs:134-150)."""
    return np.arange(n) * (fs / n)


def centered_axis(n: int, fs: float = 1.0) -> np.ndarray:
    """DC-centered frequency axis [-fs/2, fs/2) for fftshift'd spectra —
    the reference's ``centeredAxes`` labeling (Plot.hs:152-171)."""
    return (np.arange(n) - n // 2) * (fs / n)


def _ax(title, xlabel, ylabel, figsize=(10, 5)):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=figsize)
    if title:
        ax.set_title(title)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    return fig, ax


def plot_line(y, filename: str, x=None, title: str = "",
              xlabel: str = "sample", ylabel: str = "") -> None:
    """Line plot of one block (plotLine/plotLineAxes, Plot.hs:38-69)."""
    import matplotlib.pyplot as plt
    fig, ax = _ax(title, xlabel, ylabel)
    y = np.asarray(y)
    ax.plot(np.asarray(x) if x is not None else np.arange(len(y)), y,
            linewidth=0.8)
    fig.savefig(filename, dpi=100)
    plt.close(fig)


def plot_fill(y, filename: str, x=None, title: str = "",
              xlabel: str = "frequency", ylabel: str = "power") -> None:
    """Filled plot (plotFill/plotFillAxes, Plot.hs:104-131)."""
    import matplotlib.pyplot as plt
    fig, ax = _ax(title, xlabel, ylabel)
    y = np.asarray(y)
    xs = np.asarray(x) if x is not None else np.arange(len(y))
    ax.fill_between(xs, y, color="#3070b0")
    fig.savefig(filename, dpi=100)
    plt.close(fig)


class Waterfall:
    """Scrolling waterfall consumer (plotWaterfall, Plot.hs:72-78).

    Feed spectral rows with :meth:`push`; :meth:`save` renders the current
    window.  Keeps the latest ``rows`` lines, scrolling like the
    reference's OpenGL texture ring.
    """

    def __init__(self, bins: int, rows: int = 512, db: bool = True):
        self.buf = np.zeros((rows, bins), dtype=np.float32)
        self.db = db
        self._n = 0

    def push(self, row) -> None:
        row = np.asarray(row, dtype=np.float32)
        if row.ndim == 1:
            row = row[None, :]
        k = row.shape[0]
        self.buf = np.roll(self.buf, -k, axis=0)
        self.buf[-k:] = row
        self._n += k

    def save(self, filename: str) -> None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        img = self.buf
        if self.db:
            img = 20 * np.log10(np.maximum(img, 1e-12))
        fig, ax = plt.subplots(figsize=(10, 6))
        ax.imshow(img, aspect="auto", origin="lower", cmap="viridis")
        ax.set_xlabel("frequency bin")
        ax.set_ylabel("time (rows)")
        fig.savefig(filename, dpi=100)
        plt.close(fig)
