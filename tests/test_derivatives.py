"""Derivative-engine oracles (ref: test/test_ilqr_derivatives.cpp — which is
entirely commented out in the reference because it calls a never-defined
method; these tests implement what it intended, against analytic values of the
double integrator, and additionally cross-check the FD parity mode against the
analytic mode).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu.config import SolverConfig
from ilqr_tpu.models import get_model
from ilqr_tpu.models import double_integrator as di
from ilqr_tpu.ops.derivatives import analytic_derivs, compute_derivs, fd_derivs

DT = 0.05


def _setup(T=9):
    m = get_model("double_integrator")
    p = di.default_params(goal=(1.0, 1.0, 0.0, 0.0))
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(T + 1, 4)))
    us = jnp.asarray(rng.normal(size=(T, 2)) * 0.3)
    return m, p, xs, us


def test_analytic_dynamics_jacobians():
    """fx = I + A·dt, fu = B·dt for the linear double integrator
    (the discrete Euler step's exact Jacobians)."""
    m, p, xs, us = _setup()
    d = analytic_derivs(m, p, SolverConfig(), DT, xs, us)

    A = np.zeros((4, 4))
    A[0, 2] = A[1, 3] = 1.0
    B = np.zeros((4, 2))
    B[2, 0] = B[3, 1] = 1.0
    np.testing.assert_allclose(d.fx, np.broadcast_to(np.eye(4) + DT * A, d.fx.shape), atol=1e-12)
    np.testing.assert_allclose(d.fu, np.broadcast_to(DT * B, d.fu.shape), atol=1e-12)


def test_analytic_cost_derivatives():
    """cx = -2 Hx (g-x), cxx = 2 Hx; cu = 2 Hu u, cuu = 2 Hu; cxu = 0."""
    m, p, xs, us = _setup()
    d = analytic_derivs(m, p, SolverConfig(), DT, xs, us)

    Hx = np.diag([1.0, 1.0, 0.2, 0.2])
    for t in range(us.shape[0]):
        e = np.asarray(p.goal - xs[t])
        np.testing.assert_allclose(d.cx[t], -2.0 * Hx @ e, atol=1e-10)
        np.testing.assert_allclose(d.cu[t], 2.0 * np.asarray(us[t]), atol=1e-10)
        np.testing.assert_allclose(d.cxx[t], 2.0 * Hx, atol=1e-10)
        np.testing.assert_allclose(d.cxu[t], np.zeros((4, 2)), atol=1e-10)
        np.testing.assert_allclose(d.cuu[t], 2.0 * np.eye(2), atol=1e-10)
    # terminal row from final_cost (10·Hx)
    eT = np.asarray(p.goal - xs[-1])
    np.testing.assert_allclose(d.cx[-1], -20.0 * Hx @ eT, atol=1e-9)
    np.testing.assert_allclose(d.cxx[-1], 20.0 * Hx, atol=1e-9)


@pytest.mark.parametrize("model_name", ["double_integrator", "acrobot"])
def test_fd_matches_analytic(model_name):
    """The FD parity mode (eps=1e-3 central stencils, ref finite_diff.h)
    agrees with exact jacfwd derivatives to O(eps²)."""
    m = get_model(model_name)
    p = m.default_params()
    rng = np.random.default_rng(1)
    T = 7
    xs = jnp.asarray(rng.normal(size=(T + 1, m.n)) * 0.5)
    us = jnp.asarray(rng.normal(size=(T, m.m)) * 0.5)
    cfg = SolverConfig()

    da = analytic_derivs(m, p, cfg, DT, xs, us)
    df = fd_derivs(m, p, cfg, DT, xs, us)

    for name in ("fx", "fu", "cx", "cu", "cxx", "cxu", "cuu"):
        a, f = getattr(da, name), getattr(df, name)
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(a), atol=5e-5,
            err_msg=f"{model_name}.{name}",
        )


def test_compute_derivs_dispatch():
    m, p, xs, us = _setup()
    d1 = compute_derivs(m, p, SolverConfig(deriv_mode="analytic"), DT, xs, us)
    d2 = compute_derivs(m, p, SolverConfig(deriv_mode="fd"), DT, xs, us)
    np.testing.assert_allclose(d1.fx, d2.fx, atol=1e-6)
    with pytest.raises(ValueError):
        compute_derivs(m, p, SolverConfig(deriv_mode="bogus"), DT, xs, us)


def test_derivs_shapes():
    m, p, xs, us = _setup(T=5)
    d = analytic_derivs(m, p, SolverConfig(), DT, xs, us)
    assert d.fx.shape == (5, 4, 4)
    assert d.fu.shape == (5, 4, 2)
    assert d.cx.shape == (6, 4)
    assert d.cu.shape == (5, 2)
    assert d.cxx.shape == (6, 4, 4)
    assert d.cxu.shape == (5, 4, 2)
    assert d.cuu.shape == (5, 2, 2)
