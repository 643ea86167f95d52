"""Trajectory I/O, format-compatible with the reference.

CSV layout matches ref iLQR::output_to_csv (src/ilqr_core.cpp:414-431):
header ``x1, ..., xn, u1, ..., um``, then T rows of state+control, then one
final state-only row (no trailing controls). ``plot_results.py`` in the
reference reads exactly this (plot_results.py:5-21).

When the native runtime extension is built (ilqr_tpu/runtime), the fast C++
writer is used; otherwise a pure-Python fallback.
"""

from __future__ import annotations

import numpy as np


def write_trajectory_csv(path: str, xs, us) -> None:
    xs = np.asarray(xs)
    us = np.asarray(us)
    T, m = us.shape
    n = xs.shape[1]
    try:
        from ilqr_tpu.runtime import trajio  # native fast path

        trajio.write_csv(path, xs, us)
        return
    except Exception:
        pass
    with open(path, "w") as f:
        # The reference header emits u0..um labels for only m control columns
        # (quirk of :417-419); we write n state + m control labels u1..um.
        f.write(", ".join(
            [f"x{i}" for i in range(1, n + 1)] + [f"u{j + 1}" for j in range(m)]
        ) + "\n")
        for t in range(T):
            row = [f"{v:f}" for v in xs[t]] + [f"{v:f}" for v in us[t]]
            f.write(", ".join(row) + "\n")
        f.write(", ".join(f"{v:f}" for v in xs[T]) + "\n")


def read_trajectory_csv(path: str, n: int, m: int):
    """Read the reference CSV format (ref plot_results.py:5-21): returns
    (xs (T+1,n), us (T,m)); the final row has states only."""
    rows = []
    with open(path) as f:
        next(f)  # header
        for line in f:
            vals = [float(v) for v in line.replace(",", " ").split()]
            rows.append(vals)
    xs = np.array([r[:n] for r in rows])
    us = np.array([r[n:n + m] for r in rows[:-1] if len(r) >= n + m])
    return xs, us
