"""Rollout and line-search tests (ref: test/test_ilqr_forward_pass.cpp).

The reference's only assertion is xs[1] of the initial rollout on a T=9
double-integrator problem; replicated here plus closed-loop and line-search
semantics it never tested.
"""

import jax.numpy as jnp
import numpy as np

from ilqr_tpu.config import SolverConfig
from ilqr_tpu.models import get_model
from ilqr_tpu.models import double_integrator as di
from ilqr_tpu.ops.rollout import line_search, open_loop_rollout, rollout
from ilqr_tpu.solver import init_state


def _problem():
    m = get_model("double_integrator")
    p = di.default_params(goal=(1.0, 1.0, 0.0, 0.0))
    cfg = SolverConfig()
    x0 = jnp.zeros(4)
    u0 = jnp.full((9, 2), 0.1)
    return m, p, cfg, x0, u0


def test_initial_rollout_matches_reference():
    # ref test_ilqr_forward_pass.cpp:52-81 TESTCASE 1:
    # xs[1] = [0, 0, 0.005, 0.005] with dt=0.05, u=(0.1,0.1)
    m, p, cfg, x0, u0 = _problem()
    xs, us, cost = open_loop_rollout(m, p, cfg, 0.05, x0, u0)
    np.testing.assert_allclose(xs[1], [0.0, 0.0, 0.005, 0.005], atol=1e-3)
    np.testing.assert_allclose(us, u0, atol=1e-12)
    assert xs.shape == (10, 4)

    # init_state wires the same rollout through the solver entry point
    state = init_state(m, p, cfg, 0.05, x0, u0)
    np.testing.assert_allclose(state.xs, xs, atol=1e-12)
    np.testing.assert_allclose(float(state.cost), float(cost), atol=1e-12)


def test_open_loop_cost_is_sum_of_stage_costs():
    m, p, cfg, x0, u0 = _problem()
    xs, us, cost = open_loop_rollout(m, p, cfg, 0.05, x0, u0)
    manual = sum(float(m.cost(p, xs[t], us[t])) for t in range(9))
    manual += float(m.final_cost(p, xs[-1]))
    assert abs(float(cost) - manual) < 1e-9


def test_closed_loop_feedback_correction():
    """With K = -I-ish gains, a perturbed start is pulled toward the
    reference trajectory; controls actually applied are returned."""
    m, p, cfg, x0, u0 = _problem()
    xs_ref, _, _ = open_loop_rollout(m, p, cfg, 0.05, x0, u0)
    K = jnp.broadcast_to(-0.5 * jnp.eye(2, 4), (9, 2, 4))
    x0_pert = x0 + jnp.array([0.1, -0.1, 0.0, 0.0])
    xs, us, _ = rollout(m, p, cfg, 0.05, x0_pert, u0, xs_ref, K)
    # u_0 = u_ff + K (x0_pert - xs_ref[0])
    expected_u0 = u0[0] + K[0] @ (x0_pert - xs_ref[0])
    np.testing.assert_allclose(us[0], expected_u0, atol=1e-12)


def test_clamp_forward_respects_limits():
    m, p, cfg, x0, _ = _problem()
    big_u = jnp.full((9, 2), 5.0)  # way over the ±0.5 box
    cfg_clamp = cfg.replace(clamp_forward=True)
    _, us, _ = open_loop_rollout(m, p, cfg_clamp, 0.05, x0, big_u)
    assert bool(jnp.all(us <= p.u_max + 1e-12))
    assert bool(jnp.all(us >= p.u_min - 1e-12))
    # parity mode (the reference's known defect): NOT clamped
    _, us2, _ = open_loop_rollout(m, p, cfg, 0.05, x0, big_u)
    assert bool(jnp.all(us2 == big_u))


def test_line_search_accepts_descent():
    """A pure feedforward step along -cu must be accepted with α chosen from
    the schedule and dcost > 0."""
    m, p, cfg, x0, u0 = _problem()
    state = init_state(m, p, cfg, 0.05, x0, u0)
    T = 9
    # toy descent direction: steer controls toward zero-ish improvement
    k = -0.1 * jnp.ones((T, 2))
    K = jnp.zeros((T, 2, 4))
    dV = jnp.array([-1.0, 0.0])  # expected reduction = α·1 > 0
    ls = line_search(
        m, p, cfg, 0.05, x0, state.xs, state.us, k, K, dV, state.cost
    )
    assert ls.xs.shape == state.xs.shape
    assert float(ls.alpha) in [0.0] + list(cfg.alphas)


def test_line_search_rejects_when_no_improvement():
    """From the optimum-ish zero-control state with an ascent direction every
    α must be rejected (alpha → 0.0, matching ref :224)."""
    m = get_model("double_integrator")
    p = di.default_params(goal=(0.0, 0.0, 0.0, 0.0))  # already at goal
    cfg = SolverConfig()
    x0 = jnp.zeros(4)
    u0 = jnp.zeros((9, 2))
    state = init_state(m, p, cfg, 0.05, x0, u0)
    k = jnp.ones((9, 2))  # any step away from rest raises cost
    K = jnp.zeros((9, 2, 4))
    dV = jnp.array([-1.0, 0.0])
    ls = line_search(m, p, cfg, 0.05, x0, state.xs, state.us, k, K, dV, state.cost)
    assert not bool(ls.accepted)
    assert float(ls.alpha) == 0.0
