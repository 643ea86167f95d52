"""Property-based solver invariants (hypothesis).

Shapes are FIXED and a single jitted solve is shared across all examples
(hypothesis draws only array VALUES), so the suite pays one compile per
property, not per example. These check what the reference guarantees by
construction of the algorithm (ref src/ilqr_core.cpp):

- the solve never returns a cost above the initial rollout's (steps are
  only accepted when the cost decreases, ref :199-213, :242-255);
- with the corrected clamped rollout every control respects the box;
- termination reason is always one of the four defined reasons and the
  reported diagnostics are finite;
- warm-starting from the converged solution of the SAME problem
  terminates (almost) immediately (ref warm-start overload :65-76).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ilqr_tpu import SolverConfig, get_model, solve, solve_warm
from ilqr_tpu.models import double_integrator as di
from ilqr_tpu.types import TerminationReason

T = 30
DT = 0.05
MODEL = get_model("double_integrator")
# boxqp_mode="enum": the m=2 exact enumeration — the "auto" route at m=2
# is the iterative projected Newton whose while_loops trace for minutes
# on CPU (CLAUDE.md), far too slow for a property suite.
CFG = SolverConfig(deriv_mode="analytic", clamp_forward=True, max_iter=25,
                   boxqp_mode="enum")


@functools.lru_cache(maxsize=1)
def _jitted_solve():
    return jax.jit(lambda p, x0: solve(
        MODEL, p, CFG, DT, x0, jnp.zeros((T, 2), jnp.float32)))


@functools.lru_cache(maxsize=1)
def _jitted_warm():
    return jax.jit(lambda p, x0, prev: solve_warm(
        MODEL, p, CFG, DT, x0, prev))


def _params(goal_xy, u_lim):
    p = di.default_params(goal=(goal_xy[0], goal_xy[1], 0.0, 0.0))
    return p._replace(
        u_min=jnp.asarray([-u_lim, -u_lim], jnp.float32),
        u_max=jnp.asarray([u_lim, u_lim], jnp.float32),
    )


def _initial_rollout_cost(p, x0):
    """Open-loop zero-control Euler rollout cost (what init_traj computes,
    ref ilqr_core.cpp:11-56) in plain numpy."""
    x = np.asarray(x0, np.float64)
    goal = np.asarray(p.goal, np.float64)
    hx = np.asarray(p.hx_diag, np.float64)
    hu = np.asarray(p.hu_diag, np.float64)
    c = 0.0
    for _ in range(T):
        e = goal - x
        c += e @ (hx * e)  # u = 0 contributes nothing
        x = x + DT * np.concatenate([x[2:], np.zeros(2)])
    e = goal - x
    c += float(p.final_scale) * e @ (hx * e)
    return c


finite = functools.partial(st.floats, allow_nan=False, allow_infinity=False)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(gx=finite(min_value=-1.5, max_value=1.5),
       gy=finite(min_value=-1.5, max_value=1.5),
       px=finite(min_value=-1.0, max_value=1.0),
       py=finite(min_value=-1.0, max_value=1.0),
       vx=finite(min_value=-0.5, max_value=0.5),
       u_lim=finite(min_value=0.1, max_value=1.0))
def test_solve_invariants(gx, gy, px, py, vx, u_lim):
    p = _params((gx, gy), u_lim)
    x0 = jnp.asarray([px, py, vx, 0.0], jnp.float32)
    sol = _jitted_solve()(p, x0)

    cost = float(sol.cost)
    assert np.isfinite(cost) and cost >= 0.0
    # never worse than the zero-control initial rollout (f32 slack)
    c0 = _initial_rollout_cost(p, x0)
    assert cost <= c0 * (1 + 1e-4) + 1e-4

    us = np.asarray(sol.us)
    assert us.min() >= -u_lim - 1e-5 and us.max() <= u_lim + 1e-5

    assert int(sol.reason) in {int(TerminationReason.GRAD_TOL),
                               int(TerminationReason.FUN_TOL),
                               int(TerminationReason.LAMBDA_MAX),
                               int(TerminationReason.MAX_ITER)}
    assert np.isfinite(float(sol.gnorm))
    assert np.isfinite(np.asarray(sol.xs)).all()


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(gx=finite(min_value=-1.0, max_value=1.0),
       u_lim=finite(min_value=0.2, max_value=0.8))
def test_warm_restart_is_near_noop(gx, u_lim):
    """Re-solving the SAME problem warm from its own solution must not
    wander: the returned trajectory stays the converged one and the cost
    is no worse (+ f32 slack). NOTE it does NOT terminate in 1-2
    iterations in general — when the cold solve converged with
    λ > lambda_grad_term (1e-5), the gradient termination is gated off
    and the schedule rejects steps while escalating λ until LAMBDA_MAX
    (ref ilqr_core.cpp:153-159, :266-281); the reference does exactly
    the same through its static λ carry-over."""
    p = _params((gx, 0.3), u_lim)
    x0 = jnp.asarray([0.2, -0.1, 0.0, 0.0], jnp.float32)
    cold = _jitted_solve()(p, x0)
    warm = _jitted_warm()(p, x0, cold)
    assert float(warm.cost) <= float(cold.cost) * (1 + 1e-4) + 1e-4
    np.testing.assert_allclose(np.asarray(warm.us), np.asarray(cold.us),
                               atol=5e-4)
    assert bool(warm.reason != int(TerminationReason.RUNNING))
