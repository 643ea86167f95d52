"""Batched-solve tests: the framework's parallelism story (SURVEY §2
parallelism inventory — problem-level batching via vmap)."""

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu import SolverConfig, get_model, solve
from ilqr_tpu.batch import convergence_stats, make_batch_solver, solve_batch
from ilqr_tpu.models import double_integrator as di


def _cfg():
    return SolverConfig(deriv_mode="analytic", max_iter=30)


def test_identical_problems_identical_solutions():
    """verify-skill probe: identical batch elements give identical costs."""
    m = get_model("double_integrator")
    p = di.default_params()
    x0 = jnp.broadcast_to(jnp.array([-1.0, 0.0, 0.0, -0.2]), (8, 4))
    sol = solve_batch(m, p, _cfg(), 0.02, x0, jnp.zeros((99, 2)))
    costs = np.asarray(sol.cost)
    assert costs.shape == (8,)
    assert np.all(costs == costs[0])


def test_batch_matches_single():
    """Each batched solve equals its standalone counterpart."""
    m = get_model("double_integrator")
    p = di.default_params()
    cfg = _cfg()
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(4, 4)) * 0.5)
    u0 = jnp.zeros((99, 2))
    batched = solve_batch(m, p, cfg, 0.02, x0, u0)
    for b in range(4):
        single = solve(m, p, cfg, 0.02, x0[b], u0)
        assert abs(float(batched.cost[b]) - float(single.cost)) < 1e-8
        np.testing.assert_allclose(
            np.asarray(batched.us[b]), np.asarray(single.us), atol=1e-8
        )


def test_batched_params():
    """Per-problem goals via params_batched=True — impossible with the
    reference's virtual-dispatch models."""
    m = get_model("double_integrator")
    goals = np.stack([
        [1.0, 0.5, 0.0, 0.0],
        [-1.0, 0.2, 0.0, 0.0],
        [0.3, -0.7, 0.0, 0.0],
    ])
    params = jax.vmap(lambda g: di.default_params(goal=tuple(np.zeros(4))))(
        jnp.zeros((3,))
    )
    params = params._replace(goal=jnp.asarray(goals))
    x0 = jnp.zeros((3, 4))
    sol = solve_batch(
        m, params, _cfg(), 0.02, x0, jnp.zeros((99, 2)), params_batched=True
    )
    # each trajectory's end state approaches its own goal position
    ends = np.asarray(sol.xs[:, -1, :2])
    assert np.abs(ends - goals[:, :2]).max() < 0.4  # ±0.5 force limit, T=99


def test_make_batch_solver_jit():
    m = get_model("double_integrator")
    p = di.default_params()
    solver = make_batch_solver(m, _cfg())
    x0 = jnp.zeros((4, 4))
    sol = solver(p, dt=0.02, x0=x0, u0=jnp.zeros((99, 2)))
    assert sol.cost.shape == (4,)


def test_convergence_stats():
    m = get_model("double_integrator")
    p = di.default_params()
    x0 = jnp.zeros((4, 4))
    sol = solve_batch(m, p, _cfg(), 0.02, x0, jnp.zeros((99, 2)))
    stats = convergence_stats(sol)
    assert set(stats) >= {"mean_cost", "max_cost", "mean_iterations",
                          "converged_frac"}
    assert 0.0 <= float(stats["converged_frac"]) <= 1.0
