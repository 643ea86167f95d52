"""Fixed-shape projected-Newton boxQP (boxqp_mode="pn_fixed") tests.

``boxqp_pn`` is the XLA-path port of the in-kernel _qp_pn recipe
(ops/pallas_sweep.py): no data-dependent control flow, any m. Oracles:
exact enumeration (m ≤ 4), scipy L-BFGS-B and the reference-semantics
iterative solver (all m), KKT conditions at the returned point. The e2e
tests run the m=12 thruster_ring (VERDICT r3 item 1); pn_fixed keeps
ANY m TPU-viable past the fused cap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu import SolverConfig, get_model, solve
from ilqr_tpu.ops.boxqp import boxqp, boxqp_enum, boxqp_pn, quad_cost


def _problem(rng, m, ridge=None, scale=1.0):
    A = rng.normal(size=(m, m))
    Q = jnp.asarray(A @ A.T + (ridge if ridge is not None else m) * np.eye(m))
    c = jnp.asarray(scale * rng.normal(size=m))
    lo = jnp.asarray(-rng.uniform(0.05, 1.0, size=m))
    hi = jnp.asarray(rng.uniform(0.05, 1.0, size=m))
    return Q, c, lo, hi


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("m", [1, 2, 3, 4])
def test_pn_matches_enum(seed, m):
    rng = np.random.default_rng(seed * 10 + m)
    Q, c, lo, hi = _problem(rng, m)
    pn = boxqp_pn(Q, c, lo, hi)
    en = boxqp_enum(Q, c, lo, hi)
    assert int(pn.status) == 5
    np.testing.assert_allclose(np.asarray(pn.x), np.asarray(en.x), atol=2e-5)
    assert (float(quad_cost(Q, c, pn.x))
            <= float(quad_cost(Q, c, en.x)) + 1e-7)


@pytest.mark.parametrize("m", [6, 10, 12, 16, 24])
def test_pn_kkt_and_beats_iterative(m):
    """For m past the enumeration range (incl. m > _PN_UNROLL_MAX → the
    matrix-form twin): KKT conditions hold at the returned point and the
    value is never worse than the reference-semantics iterative solver's."""
    rng = np.random.default_rng(100 + m)
    for trial in range(10):
        ridge = [2.0, 0.3, float(m)][trial % 3]
        scale = [0.5, 1.0, 4.0][trial % 3]
        Q, c, lo, hi = _problem(rng, m, ridge=ridge, scale=scale)
        pn = boxqp_pn(Q, c, lo, hi)
        assert int(pn.status) == 5, f"m={m} trial={trial}"
        x = np.asarray(pn.x)
        g = np.asarray(Q @ pn.x + c)
        assert (x >= np.asarray(lo) - 1e-9).all()
        assert (x <= np.asarray(hi) + 1e-9).all()
        gscale = max(1.0, float(np.abs(g).max()))
        at_lo = x <= np.asarray(lo) + 1e-7
        at_hi = x >= np.asarray(hi) - 1e-7
        interior = ~at_lo & ~at_hi
        # stationarity on interior dims, dual feasibility on the faces
        assert np.abs(g[interior]).max(initial=0.0) < 1e-5 * gscale, \
            f"m={m} trial={trial}"
        assert (g[at_lo] > -1e-5 * gscale).all(), f"m={m} trial={trial}"
        assert (g[at_hi] < 1e-5 * gscale).all(), f"m={m} trial={trial}"
        it = boxqp(Q, c, jnp.zeros(m), lo, hi)
        assert (float(quad_cost(Q, c, pn.x))
                <= float(quad_cost(Q, c, it.x)) + 1e-7), \
            f"m={m} trial={trial}"


@pytest.mark.parametrize("m", [4, 12, 16])
def test_pn_matches_scipy(m):
    from scipy.optimize import minimize

    rng = np.random.default_rng(7 * m)
    Q, c, lo, hi = _problem(rng, m)
    pn = boxqp_pn(Q, c, lo, hi)
    Qn, cn = np.asarray(Q), np.asarray(c)
    ref = minimize(
        lambda x: 0.5 * x @ Qn @ x + x @ cn,
        np.clip(np.zeros(m), lo, hi),
        jac=lambda x: Qn @ x + cn,
        bounds=list(zip(np.asarray(lo), np.asarray(hi))),
        method="L-BFGS-B", tol=1e-14,
    )
    np.testing.assert_allclose(np.asarray(pn.x), ref.x, atol=5e-5)


@pytest.mark.parametrize("m", [3, 12, 16])
def test_pn_non_pd(m):
    d = np.ones(m)
    d[-1] = -0.5
    Q = jnp.asarray(np.diag(d))
    c = jnp.asarray(np.linspace(-0.2, 0.2, m))
    pn = boxqp_pn(Q, c, jnp.full((m,), -1.0), jnp.full((m,), 1.0))
    assert int(pn.status) < 1
    np.testing.assert_array_equal(np.asarray(pn.x), np.zeros(m))
    assert not bool(jnp.any(pn.free))


def test_pn_vmaps_and_jits():
    rng = np.random.default_rng(1)
    B, m = 16, 12
    A = rng.normal(size=(B, m, m))
    Q = jnp.asarray(A @ np.swapaxes(A, 1, 2) + m * np.eye(m))
    c = jnp.asarray(rng.normal(size=(B, m)))
    lo = jnp.full((B, m), -0.5)
    hi = jnp.full((B, m), 0.5)
    res = jax.jit(jax.vmap(boxqp_pn))(Q, c, lo, hi)
    assert res.x.shape == (B, m)
    assert bool(jnp.all(res.status == 5))
    # spot-check one lane against the unbatched call
    one = boxqp_pn(Q[3], c[3], lo[3], hi[3])
    np.testing.assert_allclose(np.asarray(res.x[3]), np.asarray(one.x),
                               atol=1e-6)


def test_pn_chol_free_solves_k_rows():
    """The returned identity-padded factor must solve the free subspace
    (the backward pass builds K through it, ref ilqr_core.cpp:377-385)."""
    from ilqr_tpu.ops.boxqp import free_solve

    rng = np.random.default_rng(0)
    m = 10
    Q, c, lo, hi = _problem(rng, m, scale=5.0)  # strong c → clamped dims
    pn = boxqp_pn(Q, c, lo, hi)
    free = np.asarray(pn.free)
    assert free.any() and not free.all()  # the interesting mixed case
    b = jnp.asarray(rng.normal(size=m))
    z = free_solve(pn.chol_free, b, pn.free)
    zn = np.asarray(z)
    # clamped rows zeroed; free rows solve Q_ff z_f = b_f exactly
    assert np.abs(zn[~free]).max(initial=0.0) == 0.0
    Qff = np.asarray(Q)[np.ix_(free, free)]
    np.testing.assert_allclose(Qff @ zn[free], np.asarray(b)[free],
                               atol=1e-8)


def test_pn_mode_solves_thruster_ring_m12():
    """Full m=12 solve on the vmap path with boxqp_mode='pn_fixed'
    converges to the iterative solver's optimum, respecting the one-sided
    thruster box."""
    from ilqr_tpu.models import thruster_ring as tr

    model = get_model("thruster_ring")
    p = tr.default_params()
    T = 50
    x0 = jnp.zeros(6)
    u0 = jnp.zeros((T, 12))
    cfg_pn = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                          max_iter=30, boxqp_mode="pn_fixed")
    cfg_it = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                          max_iter=30, boxqp_mode="iterative")
    s_pn = solve(model, p, cfg_pn, 0.05, x0, u0)
    s_it = solve(model, p, cfg_it, 0.05, x0, u0)
    assert abs(float(s_pn.cost) - float(s_it.cost)) < 1e-2 * abs(
        float(s_it.cost))
    us = np.asarray(s_pn.us)
    assert us.min() >= -1e-6 and us.max() <= 8.0 + 1e-6
    # lower bounds genuinely active (one-sided thrusters idle a lot)
    assert (us <= 1e-6).mean() > 0.3
    # and it actually reaches the goal pose
    xf = np.asarray(s_pn.xs[-1])
    assert abs(xf[0] - 1.5) < 0.1 and abs(xf[1] + 1.0) < 0.1
    assert abs(xf[2] - 0.8) < 0.1


def test_pn_mode_solves_integrator_m2():
    from ilqr_tpu.models import double_integrator as di

    model = get_model("double_integrator")
    p = di.default_params(goal=(1.0, 0.5, 0.0, 0.0))
    x0 = jnp.array([-1.0, 0.0, 0.0, -0.2])
    u0 = jnp.zeros((99, 2))
    s_it = solve(model, p, SolverConfig(deriv_mode="analytic"), 0.02, x0, u0)
    s_pn = solve(model, p,
                 SolverConfig(deriv_mode="analytic", boxqp_mode="pn_fixed"),
                 0.02, x0, u0)
    assert abs(float(s_it.cost) - float(s_pn.cost)) < 1e-3
    assert np.abs(np.asarray(s_it.us) - np.asarray(s_pn.us)).max() < 1e-2
