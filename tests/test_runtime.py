"""Native runtime (C++ trajio) tests. Skipped if the toolchain can't build
the shared library."""

import numpy as np
import pytest

trajio = pytest.importorskip("ilqr_tpu.runtime.trajio")


def test_native_csv_matches_python_format(tmp_path):
    from ilqr_tpu.utils.io import read_trajectory_csv

    rng = np.random.default_rng(0)
    xs = rng.normal(size=(8, 4))
    us = rng.normal(size=(7, 2))
    p_native = str(tmp_path / "native.csv")
    trajio.write_csv(p_native, xs, us)
    x2, u2 = read_trajectory_csv(p_native, 4, 2)
    np.testing.assert_allclose(x2, xs, atol=1e-6)
    np.testing.assert_allclose(u2, us, atol=1e-6)
    lines = open(p_native).read().strip().split("\n")
    assert lines[0].split(",")[0].strip() == "x1"
    assert len(lines) == 1 + 7 + 1


def test_binary_batch_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    B, T, n, m = 6, 11, 4, 1
    xs = rng.normal(size=(B, T + 1, n))
    us = rng.normal(size=(B, T, m))
    path = str(tmp_path / "batch.ilqt")
    trajio.write_batch(path, xs, us)
    x2, u2 = trajio.read_batch(path)
    np.testing.assert_array_equal(x2, xs)  # binary → bit-exact
    np.testing.assert_array_equal(u2, us)


def test_single_trajectory_promotes_to_batch(tmp_path):
    rng = np.random.default_rng(2)
    xs = rng.normal(size=(5, 3))
    us = rng.normal(size=(4, 2))
    path = str(tmp_path / "one.ilqt")
    trajio.write_batch(path, xs, us)
    x2, u2 = trajio.read_batch(path)
    assert x2.shape == (1, 5, 3)
    np.testing.assert_array_equal(x2[0], xs)


def test_checkpoint_solution_roundtrip(tmp_path):
    """Solution pytrees checkpoint via the generic npz path."""
    import jax.numpy as jnp

    from ilqr_tpu import SolverConfig, get_model, solve
    from ilqr_tpu.models import double_integrator as di
    from ilqr_tpu.utils.checkpoint import restore, save

    m = get_model("double_integrator")
    p = di.default_params()
    sol = solve(m, p, SolverConfig(use_control_limits=False, max_iter=10),
                0.02, jnp.zeros(4), jnp.zeros((20, 2)))
    path = str(tmp_path / "sol.npz")
    save(path, sol)
    sol2 = restore(path, sol)
    np.testing.assert_array_equal(np.asarray(sol.us), np.asarray(sol2.us))
    assert float(sol.cost) == float(sol2.cost)
