"""Headless 2D plotting — the Graph2D replacement.

Capability parity with ``Graphics/Graph2D.{h,cpp}`` (function plots, scatter
series, grids, multiple overlaid lines, axis ranges) re-targeted from an
OpenGL FBO to headless matplotlib PNG output (SURVEY §2.3 plan: the
presentation layer becomes image dumps). Used by the test/validation apps
to produce the reference's histogram-vs-pdf and spectrum-curve plots."""

from __future__ import annotations

import numpy as np


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


class Graph2D:
    """Multi-series 2D plotter (createfunction/plotpoints capability)."""

    def __init__(self, title="", xlabel="x", ylabel="y", figsize=(7, 5)):
        plt = _mpl()
        self.plt = plt
        self.fig, self.ax = plt.subplots(figsize=figsize)
        self.ax.set_title(title)
        self.ax.set_xlabel(xlabel)
        self.ax.set_ylabel(ylabel)
        self.ax.grid(True, alpha=0.3)

    def plot_function(self, f, a, b, n=512, label=None, **kw):
        x = np.linspace(a, b, n)
        y = np.asarray(f(x))
        self.ax.plot(x, y, label=label, **kw)
        return self

    def plot_line(self, x, y, label=None, **kw):
        self.ax.plot(np.asarray(x), np.asarray(y), label=label, **kw)
        return self

    def plot_points(self, x, y, label=None, s=6, **kw):
        self.ax.scatter(np.asarray(x), np.asarray(y), s=s, label=label, **kw)
        return self

    def plot_histogram(self, samples, bins=64, range=None, density=True,
                       label=None, **kw):
        self.ax.hist(np.asarray(samples), bins=bins, range=range,
                     density=density, alpha=0.55, label=label, **kw)
        return self

    def set_range(self, xmin=None, xmax=None, ymin=None, ymax=None):
        if xmin is not None or xmax is not None:
            self.ax.set_xlim(xmin, xmax)
        if ymin is not None or ymax is not None:
            self.ax.set_ylim(ymin, ymax)
        return self

    def save(self, path):
        if self.ax.get_legend_handles_labels()[0]:
            self.ax.legend()
        self.fig.tight_layout()
        self.fig.savefig(path, dpi=110)
        self.plt.close(self.fig)
        return path
