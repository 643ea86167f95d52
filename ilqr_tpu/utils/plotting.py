"""Trajectory plotting, the counterpart of the reference's plot_results.py.

The reference script hardcodes the acrobot dims and the CSV path
(ref: plot_results.py:28-31); here dims come from the data and any Solution
or CSV plots. matplotlib is imported lazily so the core library never
depends on it.
"""

from __future__ import annotations

import numpy as np


def plot_trajectory(xs, us, dt: float = 1.0, title: str = "iLQR result",
                    save_path=None, show: bool = False):
    """State and control subplots over time (ref: plot_results.py:33-37).

    Returns the matplotlib Figure.
    """
    import matplotlib

    if save_path is not None and not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xs = np.asarray(xs)
    us = np.asarray(us)
    tx = np.arange(xs.shape[0]) * dt
    tu = np.arange(us.shape[0]) * dt

    fig, (ax_x, ax_u) = plt.subplots(2, 1, sharex=True, figsize=(8, 6))
    for i in range(xs.shape[1]):
        ax_x.plot(tx, xs[:, i], label=f"x{i + 1}")
    ax_x.set_ylabel("state")
    ax_x.legend(loc="best", fontsize=8)
    ax_x.set_title(title)
    for j in range(us.shape[1]):
        ax_u.plot(tu, us[:, j], label=f"u{j + 1}")
    ax_u.set_ylabel("control")
    ax_u.set_xlabel("time [s]")
    ax_u.legend(loc="best", fontsize=8)
    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, dpi=120)
    if show:
        plt.show()
    return fig


def plot_csv(path: str, n: int, m: int, dt: float = 1.0, **kw):
    """Plot a reference-format CSV (ref: plot_results.py:5-21 reader)."""
    from ilqr_tpu.utils.io import read_trajectory_csv

    xs, us = read_trajectory_csv(path, n, m)
    return plot_trajectory(xs, us, dt=dt, **kw)
