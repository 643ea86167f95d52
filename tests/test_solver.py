"""End-to-end solver tests: golden parity vs the C++ reference binary,
convergence behavior, termination reasons, warm start (MPC), determinism.

The golden CSVs in golden/ were produced by building and running the reference
(see golden/README.md); matching them within the CSV quantization (~5e-7) is
this framework's strongest correctness oracle (SURVEY §4 takeaway).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu import (
    SolverConfig,
    TerminationReason,
    get_model,
    solve,
    solve_warm,
)
from ilqr_tpu.models import acrobot as ac
from ilqr_tpu.models import double_integrator as di
from ilqr_tpu.utils.io import read_trajectory_csv

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "golden")


def test_integrator_golden_parity():
    """FD parity mode reproduces the reference binary's converged trajectory
    (ref workload: run_ilqr.cpp:18-37 — dt=0.02, T=99, goal (1,.5,0,0))."""
    m = get_model("double_integrator")
    p = di.default_params(goal=(1.0, 0.5, 0.0, 0.0))
    sol = solve(
        m, p, SolverConfig(deriv_mode="fd"), 0.02,
        jnp.array([-1.0, 0.0, 0.0, -0.2]), jnp.zeros((99, 2)),
    )
    gx, gu = read_trajectory_csv(
        os.path.join(GOLDEN, "integrator_golden.csv"), 4, 2
    )
    assert np.abs(np.asarray(sol.xs) - gx).max() < 1e-5
    assert np.abs(np.asarray(sol.us) - gu).max() < 1e-5
    # reference log: converged at iter 14 (cost change < tolFun), cost ≈356.17
    assert abs(float(sol.cost) - 356.1685) < 1e-2
    assert int(sol.reason) == TerminationReason.FUN_TOL


@pytest.mark.slow
def test_acrobot_golden_parity():
    """The hard oracle: acrobot swing-up, T=499, FD derivatives, hits
    maxIter=100 exactly like the reference (golden/acrobot_log.txt)."""
    m = get_model("acrobot")
    p = ac.default_params()
    sol = solve(
        m, p, SolverConfig(deriv_mode="fd"), 0.02,
        jnp.zeros(4), jnp.zeros((499, 1)),
    )
    gx, gu = read_trajectory_csv(
        os.path.join(GOLDEN, "acrobot_golden.csv"), 4, 1
    )
    assert np.abs(np.asarray(sol.xs) - gx).max() < 1e-5
    assert np.abs(np.asarray(sol.us) - gu).max() < 1e-5
    # reference log final cost ≈ 5.4 (golden/acrobot_log.txt, iter 99)
    assert abs(float(sol.cost) - 5.3979) < 1e-3


def test_integrator_unconstrained_converges_fast():
    """Without control limits the integrator is an easy Newton problem
    (verify-skill probe: ~6 iterations, cost ≈311)."""
    m = get_model("double_integrator")
    p = di.default_params(goal=(1.0, 0.5, 0.0, 0.0))
    cfg = SolverConfig(use_control_limits=False)
    sol = solve(m, p, cfg, 0.02, jnp.array([-1.0, 0.0, 0.0, -0.2]),
                jnp.zeros((99, 2)))
    assert int(sol.iterations) <= 10
    assert abs(float(sol.cost) - 311.0) < 5.0
    assert int(sol.reason) in (
        TerminationReason.GRAD_TOL, TerminationReason.FUN_TOL,
    )


def test_analytic_mode_matches_fd_solution():
    """Analytic derivatives land on the same optimum as the FD parity mode
    (different iteration paths are fine; the fixed point is the same)."""
    m = get_model("double_integrator")
    p = di.default_params(goal=(1.0, 0.5, 0.0, 0.0))
    x0 = jnp.array([-1.0, 0.0, 0.0, -0.2])
    u0 = jnp.zeros((99, 2))
    s_fd = solve(m, p, SolverConfig(deriv_mode="fd"), 0.02, x0, u0)
    s_an = solve(m, p, SolverConfig(deriv_mode="analytic"), 0.02, x0, u0)
    assert abs(float(s_fd.cost) - float(s_an.cost)) < 1e-3
    assert np.abs(np.asarray(s_fd.us) - np.asarray(s_an.us)).max() < 1e-2


def test_warm_start_mpc():
    """Re-solving from a nearby initial state with the previous solution warm
    start takes very few iterations (verify-skill probe: ≤2 from the SAME x0;
    allow a couple more from a perturbed one)."""
    m = get_model("double_integrator")
    p = di.default_params(goal=(1.0, 0.5, 0.0, 0.0))
    cfg = SolverConfig(deriv_mode="analytic")
    x0 = jnp.array([-1.0, 0.0, 0.0, -0.2])
    sol = solve(m, p, cfg, 0.02, x0, jnp.zeros((99, 2)))

    resolved = solve_warm(m, p, cfg, 0.02, x0, sol)
    assert int(resolved.iterations) <= 2

    x0_shift = x0 + jnp.array([0.02, -0.01, 0.0, 0.0])
    shifted = solve_warm(m, p, cfg, 0.02, x0_shift, sol)
    assert int(shifted.iterations) <= int(sol.iterations)
    # the warm solve must land on the shifted problem's own optimum: match
    # a cold solve from x0_shift, not just "somewhere near the old cost"
    cold = solve(m, p, cfg, 0.02, x0_shift, jnp.zeros((99, 2)))
    assert abs(float(shifted.cost) - float(cold.cost)) < 1e-4 * (
        1.0 + abs(float(cold.cost)))


def test_solver_is_deterministic():
    """Bitwise reproducibility — the TPU-native answer to the reference's
    OpenMP nondeterminism troubles (SURVEY §5 race detection)."""
    m = get_model("acrobot")
    p = ac.default_params()
    cfg = SolverConfig(deriv_mode="analytic", max_iter=10)
    x0 = jnp.zeros(4)
    u0 = jnp.full((99, 1), 0.1)
    s1 = solve(m, p, cfg, 0.02, x0, u0)
    s2 = solve(m, p, cfg, 0.02, x0, u0)
    assert np.array_equal(np.asarray(s1.us), np.asarray(s2.us))
    assert float(s1.cost) == float(s2.cost)


def test_max_iter_termination():
    m = get_model("acrobot")
    p = ac.default_params()
    cfg = SolverConfig(deriv_mode="analytic", max_iter=3)
    sol = solve(m, p, cfg, 0.02, jnp.zeros(4), jnp.zeros((49, 1)))
    assert int(sol.iterations) == 3
    assert int(sol.reason) == TerminationReason.MAX_ITER


def test_solve_jits_and_caches():
    """solve must be jittable with (model, cfg) static."""
    import functools

    m = get_model("double_integrator")
    p = di.default_params()
    cfg = SolverConfig(use_control_limits=False, max_iter=20)
    jitted = jax.jit(
        functools.partial(solve, m, cfg=cfg, dt=0.02),
    )
    s1 = jitted(p, x0=jnp.zeros(4), u0=jnp.zeros((20, 2)))
    s2 = jitted(p, x0=jnp.ones(4) * 0.1, u0=jnp.zeros((20, 2)))
    assert np.isfinite(float(s1.cost)) and np.isfinite(float(s2.cost))


@pytest.mark.slow
def test_acrobot_corrected_mode_swings_up():
    """Corrected (non-parity) mode: clamped forward pass + analytic
    derivatives still solves the swing-up with controls inside the box."""
    m = get_model("acrobot")
    p = ac.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True)
    sol = solve(m, p, cfg, 0.02, jnp.zeros(4), jnp.zeros((499, 1)))
    xf = np.asarray(sol.xs[-1])
    assert abs(xf[0] - 3.1415) < 0.05
    assert abs(xf[1]) < 0.05
    assert np.abs(np.asarray(sol.us)).max() <= 5.0 + 1e-9
