"""Multi-device sharding tests on an 8-virtual-device CPU mesh — the TPU
analogue of a fake multi-node backend (SURVEY §4). conftest.py forces
--xla_force_host_platform_device_count=8."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu import SolverConfig, get_model
from ilqr_tpu.batch import solve_batch
from ilqr_tpu.models import double_integrator as di
from ilqr_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_solver,
    sharded_convergence_stats,
)


def test_virtual_devices_present():
    assert jax.device_count() == 8


def _cfg():
    return SolverConfig(deriv_mode="analytic", max_iter=25)


def test_sharded_solver_matches_unsharded():
    m = get_model("double_integrator")
    p = di.default_params()
    cfg = _cfg()
    rng = np.random.default_rng(0)
    B = 16
    x0 = jnp.asarray(rng.normal(size=(B, 4)) * 0.5)
    u0 = jnp.zeros((B, 99, 2))

    run = make_sharded_solver(m, cfg)
    sol = run(p, 0.02, x0, u0)
    ref = solve_batch(m, p, cfg, 0.02, x0, u0[0])

    np.testing.assert_allclose(
        np.asarray(sol.cost), np.asarray(ref.cost), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(sol.us), np.asarray(ref.us), atol=1e-10
    )


def test_sharded_solution_is_actually_sharded():
    m = get_model("double_integrator")
    p = di.default_params()
    run = make_sharded_solver(m, _cfg())
    B = 8
    x0 = jnp.zeros((B, 4))
    sol = run(p, 0.02, x0, jnp.zeros((B, 99, 2)))
    # the batch axis of the output must be split across devices
    shardings = {d.device for d in sol.cost.addressable_shards}
    assert len(shardings) == 8


def test_collective_stats_reduction():
    """psum/pmax over the batch axis inside shard_map — the only collectives
    this workload needs (SURVEY §5 distributed backend)."""
    m = get_model("double_integrator")
    p = di.default_params()
    cfg = _cfg()
    mesh = make_mesh()
    fn = sharded_convergence_stats(m, cfg, mesh)
    B = 16
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(B, 4)) * 0.3)
    u0 = jnp.zeros((B, 99, 2))
    stats = fn(p, 0.02, x0, u0)
    assert int(stats["n"]) == B

    ref = solve_batch(m, p, cfg, 0.02, x0, u0[0])
    assert abs(float(stats["mean_cost"]) - float(np.mean(ref.cost))) < 1e-6
    assert abs(float(stats["max_cost"]) - float(np.max(ref.cost))) < 1e-6


@pytest.mark.slow
def test_sharded_fused_solver_matches_local():
    """Multi-chip fused deployment: shard_map over the mesh, one fused
    block per device — must equal the local fused solve bit-exactly."""
    from ilqr_tpu.fused import solve_batch_fused
    from ilqr_tpu.models import pendulum as pend
    from ilqr_tpu.parallel.mesh import make_sharded_fused_solver

    m = get_model("pendulum")
    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), pend.default_params())
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=2)
    run = make_sharded_fused_solver(m, cfg, make_mesh())
    B = 8
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, 2)) * 0.2, jnp.float32)
    u0 = jnp.zeros((B, 6, 1), jnp.float32)
    sol = run(p, 0.05, x0, u0)
    ref = solve_batch_fused(m, p, cfg, 0.05, x0, u0[0])
    np.testing.assert_array_equal(np.asarray(sol.cost),
                                  np.asarray(ref.cost))
    assert len({d.device for d in sol.cost.addressable_shards}) == 8


def test_uneven_batch_raises_clear_error():
    """B not divisible by mesh size: the API contract is 'B divisible by
    mesh size', enforced eagerly with an actionable ValueError rather than
    an opaque GSPMD sharding failure."""
    m = get_model("double_integrator")
    p = di.default_params()
    run = make_sharded_solver(m, _cfg())
    x0 = jnp.zeros((6, 4))  # 6 % 8 != 0
    with pytest.raises(ValueError, match="not divisible by the mesh size"):
        run(p, 0.02, x0, jnp.zeros((6, 99, 2)))


def test_sharded_warm_solver_matches_unsharded():
    """Warm (MPC) solves under the mesh (VERDICT r4 item 3): the sharded
    warm solver must reproduce vmap(solve_warm) per-lane."""
    from ilqr_tpu.parallel.mesh import make_sharded_warm_solver
    from ilqr_tpu.solver import solve, solve_warm

    m = get_model("double_integrator")
    p = di.default_params()
    cfg = SolverConfig(deriv_mode="analytic", max_iter=8)
    B, T = 8, 12
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(B, 4)) * 0.4, jnp.float32)
    u0 = jnp.zeros((B, T, 2), jnp.float32)
    cold = jax.jit(jax.vmap(
        lambda x, u: solve(m, p, cfg, 0.05, x, u)))(x0, u0)
    x0_new = x0 + jnp.float32(0.02)
    run = make_sharded_warm_solver(m, cfg, make_mesh())
    sol = run(p, 0.05, x0_new, cold.us, cold.xs, cold.K,
              cold.lam, cold.dlam)
    ref = jax.jit(jax.vmap(
        lambda x, prev: solve_warm(m, p, cfg, 0.05, x, prev)
    ))(x0_new, cold)
    np.testing.assert_allclose(np.asarray(sol.cost),
                               np.asarray(ref.cost), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sol.us),
                               np.asarray(ref.us), rtol=1e-5, atol=1e-6)
    assert len({d.device for d in sol.cost.addressable_shards}) == 8


@pytest.mark.slow
def test_sharded_fused_warm_solver_matches_local():
    """Fused warm (MPC fleet re-plan) under the mesh: one fused warm
    block per device must equal the local fused warm solve bit-exactly."""
    from ilqr_tpu.fused import solve_batch_fused, solve_batch_fused_warm
    from ilqr_tpu.models import pendulum as pend
    from ilqr_tpu.parallel.mesh import make_sharded_fused_warm_solver
    from ilqr_tpu.types import Solution

    m = get_model("pendulum")
    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), pend.default_params())
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=2)
    B = 8
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(B, 2)) * 0.2, jnp.float32)
    u0 = jnp.zeros((B, 6, 1), jnp.float32)
    cold = solve_batch_fused(m, p, cfg, 0.05, x0, u0[0])
    x0_new = x0 + jnp.float32(0.01)
    run = make_sharded_fused_warm_solver(m, cfg, make_mesh())
    sol = run(p, 0.05, x0_new, cold.us, cold.xs, cold.K,
              cold.lam, cold.dlam)
    prev = Solution(xs=cold.xs, us=cold.us, k=None, K=cold.K, cost=None,
                    lam=cold.lam, dlam=cold.dlam, iterations=None,
                    reason=None, gnorm=None)
    ref = solve_batch_fused_warm(m, p, cfg, 0.05, x0_new, prev)
    np.testing.assert_array_equal(np.asarray(sol.cost),
                                  np.asarray(ref.cost))
    assert len({d.device for d in sol.cost.addressable_shards}) == 8


def test_sharded_pn_fixed_matches_unsharded():
    """boxqp_mode='pn_fixed' (the any-m QP route) under the mesh
    (VERDICT r4 item 5): the m=12 thruster_ring on the sharded vmap path
    must reproduce the unsharded vmap solve per-lane."""
    from ilqr_tpu.models import thruster_ring as tr

    m = get_model("thruster_ring")
    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), tr.default_params())
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=3, boxqp_mode="pn_fixed",
                       backward_kernel="xla", rollout_kernel="xla",
                       deriv_kernel="xla")
    B, T = 8, 10
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(0.2 * rng.normal(size=(B, 6)), jnp.float32)
    u0 = jnp.zeros((B, T, 12), jnp.float32)
    run = make_sharded_solver(m, cfg, make_mesh())
    sol = run(p, 0.05, x0, u0)
    ref = solve_batch(m, p, cfg, 0.05, x0, u0)
    # rtol: the sharded program runs 1 lane/device vs 8 lanes unsharded —
    # XLA reassociates per shape, and 3 iterations of the m=12 PN QP
    # amplify that ~1e-5-class f32 noise (same gauge as the round-3
    # fused-vs-XLA equivalence probe, experiments/equiv_tpu.py).
    np.testing.assert_allclose(np.asarray(sol.cost),
                               np.asarray(ref.cost), rtol=1e-4)
    assert len({d.device for d in sol.cost.addressable_shards}) == 8
