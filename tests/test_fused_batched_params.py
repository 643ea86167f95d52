"""Fused solver with per-problem params (batched goals/limits)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu import SolverConfig, get_model
from ilqr_tpu.fused import solve_batch_fused
from ilqr_tpu.models import pendulum as pend
from ilqr_tpu.ops.pallas_rollout import pack_params_batched, unpack_params


def test_pack_params_batched_layout():
    """Each params scalar becomes one per-problem row; lane b of the tile
    carries problem b's value; dt is the shared last row."""
    bb = 1024
    base = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), pend.default_params())
    batched = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (bb,) + a.shape).copy(), base)
    goals = jnp.stack(
        [jnp.arange(bb, dtype=jnp.float32),
         jnp.zeros(bb, jnp.float32)], axis=1)
    batched = batched._replace(goal=goals)
    arr, _treedef, shapes = pack_params_batched(batched, 0.05, 1)
    assert arr.shape[1:] == (1, 8, 128)
    assert shapes[0] == (2,)  # per-problem goal shape
    # goal[0] is the first row: lane b carries problem b's value
    flat = np.asarray(arr[0]).reshape(-1)
    np.testing.assert_allclose(flat[:10], np.arange(10), atol=0)
    # dt is the last row, shared
    np.testing.assert_allclose(np.asarray(arr[-1]), 0.05)


@pytest.mark.slow
def test_batched_goals_each_solved_to_own_goal():
    m = get_model("pendulum")
    B = 3
    base = pend.default_params()
    goals = jnp.asarray([[3.14159, 0.0], [2.0, 0.0], [-2.5, 0.0]],
                        jnp.float32)
    params = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(
            jnp.asarray(a, jnp.float32)[None],
            (B,) + jnp.shape(a)).copy(), base)
    params = params._replace(goal=goals)
    # loosen the torque limit so every goal is reachable
    params = params._replace(
        u_min=jnp.full((B, 1), -8.0, jnp.float32),
        u_max=jnp.full((B, 1), 8.0, jnp.float32))

    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=8)
    x0 = jnp.zeros((B, 2), jnp.float32)
    u0 = jnp.zeros((25, 1), jnp.float32)
    sol = solve_batch_fused(m, params, cfg, 0.05, x0, u0,
                            params_batched=True)
    # oracle: per-goal solves with SHARED params must match lane-for-lane
    for b in range(B):
        pb = jax.tree_util.tree_map(lambda a: a[b], params)
        ref = solve_batch_fused(m, pb, cfg, 0.05, x0[b:b + 1], u0)
        assert abs(float(sol.cost[b]) - float(ref.cost[0])) < 1e-2


def test_batched_matches_shared_when_identical():
    """Batched params equal across the batch give the same answer as
    shared params."""
    m = get_model("pendulum")
    B = 2
    base = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), pend.default_params())
    batched = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape).copy(), base)
    # short horizon + 3-α schedule: this test compiles TWO interpret-mode
    # fused programs (shared- and batched-params kernels), and compile
    # time scales with the unrolled body size (T × candidates)
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=4, alphas=(1.0, 0.3, 0.03))
    x0 = jnp.asarray([[0.3, 0.0], [-0.2, 0.1]], jnp.float32)
    u0 = jnp.zeros((8, 1), jnp.float32)
    s_shared = solve_batch_fused(m, base, cfg, 0.05, x0, u0)
    s_batched = solve_batch_fused(m, batched, cfg, 0.05, x0, u0,
                                  params_batched=True)
    np.testing.assert_allclose(np.asarray(s_batched.cost),
                               np.asarray(s_shared.cost), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s_batched.us),
                               np.asarray(s_shared.us), atol=1e-6)


@pytest.mark.slow
def test_batched_goals_m2_integrator():
    """Per-problem params on an m=2 model: the merged sweep reads limits/
    goals from the packed per-lane params tile (the m=1-only slice in
    fused.py's chunk_args feeds only the split path), so batched params
    must work for every fused-supported m."""
    from ilqr_tpu.models import double_integrator as di

    m = get_model("double_integrator")
    B = 2
    base = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32),
        di.default_params(goal=(1.0, 0.5, 0.0, 0.0)))
    goals = jnp.asarray([[1.0, 0.5, 0.0, 0.0], [-0.5, 0.8, 0.0, 0.0]],
                        jnp.float32)
    params = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape).copy(), base)
    params = params._replace(goal=goals)
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=4, alphas=(1.0, 0.3, 0.03))
    x0 = jnp.asarray([[-1.0, 0.0, 0.0, -0.2], [0.3, -0.4, 0.0, 0.0]],
                     jnp.float32)
    u0 = jnp.zeros((8, 2), jnp.float32)
    sol = solve_batch_fused(m, params, cfg, 0.02, x0, u0,
                            params_batched=True)
    for b in range(B):
        pb = jax.tree_util.tree_map(lambda a: a[b], params)
        ref = solve_batch_fused(m, pb, cfg, 0.02, x0[b:b + 1], u0)
        assert abs(float(sol.cost[b]) - float(ref.cost[0])) < 1e-3, b
        np.testing.assert_allclose(np.asarray(sol.us[b]),
                                   np.asarray(ref.us[0]), atol=1e-4)
