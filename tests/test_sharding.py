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
