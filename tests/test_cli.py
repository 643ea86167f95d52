"""CLI smoke tests (ref: src/run_ilqr.cpp behavior) via in-process main()."""

import os

import numpy as np
import pytest

from ilqr_tpu.__main__ import build_parser, main


def test_parser_problems():
    p = build_parser()
    args = p.parse_args(["acrobot"])
    assert args.problem == "acrobot"
    # dt defaults per problem inside main() (None until resolved)
    assert args.dt is None
    with pytest.raises(SystemExit):
        p.parse_args(["not_a_model"])


def test_integrator_end_to_end(tmp_path, capsys):
    out = str(tmp_path / "result.csv")
    rc = main(["integrator", "--quiet", "--max-iter", "20",
               "--output", out])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "Final cost" in captured
    # reference workload converges to ~356.17 (golden/integrator_log.txt)
    from ilqr_tpu.utils.io import read_trajectory_csv

    xs, us = read_trajectory_csv(out, 4, 2)
    assert xs.shape == (100, 4)
    assert us.shape == (99, 2)
    # end state near the reference's converged end state (the 2-second
    # horizon with ±0.5 force doesn't reach the goal; golden CSV last row)
    assert np.abs(xs[-1][:2] - np.array([-0.121, 0.233])).max() < 0.1


def test_pendulum_short_horizon(tmp_path):
    out = str(tmp_path / "p.csv")
    rc = main(["pendulum", "--quiet", "-T", "60", "--max-iter", "15",
               "--deriv-mode", "analytic", "--output", out])
    assert rc == 0
    assert os.path.exists(out)


def test_batch_mode(tmp_path, capsys):
    out = str(tmp_path / "b.csv")
    rc = main(["integrator", "--batch", "4", "--max-iter", "10",
               "--deriv-mode", "analytic", "--output", out])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "solves/s" in captured
    assert os.path.exists(out)


def test_every_choice_has_a_problem_spec():
    """Every problem name the parser advertises must have a _PROBLEMS
    entry (point_mass_3d was once in choices only -> KeyError)."""
    from ilqr_tpu.__main__ import _PROBLEMS

    p = build_parser()
    choices = next(a for a in p._actions if a.dest == "problem").choices
    missing = [c for c in choices if c not in _PROBLEMS]
    assert not missing, f"CLI choices without problem specs: {missing}"


def test_quadrotor_short_horizon(tmp_path):
    out = str(tmp_path / "q.csv")
    rc = main(["quadrotor", "--quiet", "-T", "40", "--max-iter", "8",
               "--deriv-mode", "analytic", "--output", out])
    assert rc == 0
    from ilqr_tpu.utils.io import read_trajectory_csv

    xs, us = read_trajectory_csv(out, 12, 4)
    assert xs.shape == (41, 12) and us.shape == (40, 4)
    # hover-thrust init: controls stay in the asymmetric box
    assert us.min() >= -1e-6 and us.max() <= 3.0 + 1e-6
