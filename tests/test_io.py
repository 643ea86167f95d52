"""Trajectory I/O tests: reference CSV format compatibility
(ref: src/ilqr_core.cpp:414-431 writer, plot_results.py:5-21 reader)."""

import os

import numpy as np

from ilqr_tpu.utils.io import read_trajectory_csv, write_trajectory_csv


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    T, n, m = 12, 4, 2
    xs = rng.normal(size=(T + 1, n))
    us = rng.normal(size=(T, m))
    path = os.path.join(tmp_path, "traj.csv")
    write_trajectory_csv(path, xs, us)
    xs2, us2 = read_trajectory_csv(path, n, m)
    np.testing.assert_allclose(xs2, xs, atol=1e-6)  # %f → 6 decimals
    np.testing.assert_allclose(us2, us, atol=1e-6)


def test_format_matches_reference(tmp_path):
    """Header row + T rows of n+m values + one final row of n values."""
    T, n, m = 3, 4, 1
    xs = np.arange((T + 1) * n, dtype=float).reshape(T + 1, n)
    us = np.arange(T * m, dtype=float).reshape(T, m)
    path = os.path.join(tmp_path, "traj.csv")
    write_trajectory_csv(path, xs, us)
    lines = open(path).read().strip().split("\n")
    assert len(lines) == 1 + T + 1
    header = [h.strip() for h in lines[0].split(",")]
    assert header[:n] == ["x1", "x2", "x3", "x4"]
    assert header[n:] == ["u1"]
    assert len(lines[1].split(",")) == n + m
    assert len(lines[-1].split(",")) == n  # final state-only row


def test_reads_reference_golden():
    """The reader must parse the actual reference binary's output format."""
    root = os.path.join(os.path.dirname(__file__), "..", "golden")
    xs, us = read_trajectory_csv(
        os.path.join(root, "integrator_golden.csv"), 4, 2
    )
    assert xs.shape == (100, 4)
    assert us.shape == (99, 2)
