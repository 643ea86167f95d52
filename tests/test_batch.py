"""Batched-solve tests: the framework's parallelism story (SURVEY §2
parallelism inventory — problem-level batching via vmap)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_chunked_dispatch_bit_identical():
    """solve_batch_chunked == monolithic solve_batch BIT-exactly (the
    m>MAX_STAGE_KERNEL_M TPU crash mitigation must not change results —
    BENCH_NOTES round 5)."""
    import numpy as np

    from ilqr_tpu.batch import solve_batch, solve_batch_chunked

    model = get_model("double_integrator")
    params = di.default_params()
    cfg = SolverConfig(deriv_mode="analytic", max_iter=11)
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.normal(size=(5, 4)), jnp.float32)
    u0 = jnp.zeros((5, 20, 2), jnp.float32)
    mono = solve_batch(model, params, cfg, 0.05, x0, u0, iter_chunk=None)
    for chunk in (1, 3, 4, 100):
        ch = solve_batch_chunked(model, params, cfg, 0.05, x0, u0,
                                 iter_chunk=chunk)
        for f in ("cost", "us", "xs", "lam", "iterations", "reason"):
            np.testing.assert_array_equal(
                np.asarray(getattr(mono, f)), np.asarray(getattr(ch, f)),
                err_msg=f"{f} differs at iter_chunk={chunk}")


def test_chunked_dispatch_params_batched():
    import numpy as np

    from ilqr_tpu.batch import solve_batch, solve_batch_chunked

    model = get_model("double_integrator")
    base = di.default_params()
    B = 4
    params = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + jnp.shape(a)), base)
    params = params._replace(
        goal=params.goal + jnp.arange(B, dtype=params.goal.dtype)[:, None]
        * 0.1)
    cfg = SolverConfig(deriv_mode="analytic", max_iter=9)
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(rng.normal(size=(B, 4)), jnp.float32)
    u0 = jnp.zeros((B, 15, 2), jnp.float32)
    mono = solve_batch(model, params, cfg, 0.05, x0, u0,
                       params_batched=True, iter_chunk=None)
    ch = solve_batch_chunked(model, params, cfg, 0.05, x0, u0,
                             iter_chunk=2, params_batched=True)
    np.testing.assert_array_equal(np.asarray(mono.cost),
                                  np.asarray(ch.cost))


def test_wide_m_ledger_guard(monkeypatch):
    """The per-process wide-m work ledger must refuse an over-budget
    solve BEFORE touching the device, and the contained dispatch must
    match the monolithic solve (BENCH_NOTES round 5 fault writeup)."""
    import ilqr_tpu.batch as batch_mod
    from ilqr_tpu.batch import solve_batch, solve_batch_wide
    from ilqr_tpu.models import thruster_ring as tr

    model = get_model("thruster_ring")
    params = tr.default_params()
    cfg_small = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                             max_iter=3, boxqp_mode="pn_fixed",
                             backward_kernel="xla", rollout_kernel="xla",
                             deriv_kernel="xla")
    rng = np.random.default_rng(6)
    x0 = jnp.asarray(0.2 * rng.normal(size=(4, 6)), jnp.float32)
    u0 = jnp.zeros((4, 8, 12), jnp.float32)

    monkeypatch.setitem(batch_mod._WIDE_M_LEDGER, "lane_iters", 0)
    wide = solve_batch_wide(model, params, cfg_small, 0.05, x0, u0)
    mono = solve_batch(model, params, cfg_small, 0.05, x0, u0,
                       iter_chunk=None)
    np.testing.assert_array_equal(np.asarray(wide.cost),
                                  np.asarray(mono.cost))
    assert batch_mod._WIDE_M_LEDGER["lane_iters"] == 4 * 3

    # over-budget request refused upfront with the full story
    cfg_big = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                           max_iter=40, boxqp_mode="pn_fixed",
                           backward_kernel="xla", rollout_kernel="xla",
                           deriv_kernel="xla")
    big_x0 = jnp.zeros((1024, 6), jnp.float32)
    big_u0 = jnp.zeros((1024, 8, 12), jnp.float32)
    with pytest.raises(ValueError, match="refusing a wide-m"):
        solve_batch_wide(model, params, cfg_big, 0.05, big_x0, big_u0)
    # env override raises the budget
    monkeypatch.setenv("ILQR_TPU_WIDE_M_BUDGET", "10000000")
    monkeypatch.setitem(batch_mod._WIDE_M_LEDGER, "lane_iters", 0)
    cfg_tiny = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                            max_iter=1, boxqp_mode="pn_fixed",
                            backward_kernel="xla", rollout_kernel="xla",
                            deriv_kernel="xla")
    sol = solve_batch_wide(model, params, cfg_tiny, 0.05, big_x0, big_u0)
    assert np.all(np.isfinite(np.asarray(sol.cost)))
