"""Parallel-in-time (associative-scan) backward-pass tests.

At λ = 0 the associative formulation must reproduce the serial recursion
exactly; at λ > 0 it solves the fully-regularized LQR subproblem (the
serial reference mixes regularized gains with unregularized V updates, a
deliberate difference documented in ops/assoc_backward.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu import SolverConfig, get_model, solve
from ilqr_tpu.models import double_integrator as di
from ilqr_tpu.ops.backward import backward_pass
from ilqr_tpu.ops.assoc_backward import backward_pass_assoc
from ilqr_tpu.types import Derivs


def _random_lqr(T=31, n=4, m=2, seed=0):
    rng = np.random.default_rng(seed)
    fx = jnp.asarray(rng.normal(size=(T, n, n)) * 0.2 + np.eye(n))
    fu = jnp.asarray(rng.normal(size=(T, n, m)) * 0.3)
    cx = jnp.asarray(rng.normal(size=(T + 1, n)))
    cu = jnp.asarray(rng.normal(size=(T, m)))
    A = rng.normal(size=(T + 1, n, n))
    cxx = jnp.asarray(A @ np.swapaxes(A, -1, -2) * 0.1 + np.eye(n))
    cxu = jnp.asarray(rng.normal(size=(T, n, m)) * 0.1)
    B = rng.normal(size=(T, m, m))
    cuu = jnp.asarray(B @ np.swapaxes(B, -1, -2) * 0.1 + np.eye(m))
    us = jnp.asarray(rng.normal(size=(T, m)) * 0.2)
    return Derivs(fx=fx, fu=fu, cx=cx, cu=cu, cxx=cxx, cxu=cxu, cuu=cuu), us


def test_matches_serial_at_lambda_zero():
    d, us = _random_lqr()
    T, m = us.shape
    cfg = SolverConfig(use_control_limits=False)
    big = jnp.full((m,), 1e9)
    ser = backward_pass(d, us, jnp.zeros(()), -big, big, cfg,
                        prev_k_last=jnp.zeros((m,)))
    par = backward_pass_assoc(d, us, jnp.zeros(()), cfg)
    assert not bool(ser.diverged) and not bool(par.diverged)
    np.testing.assert_allclose(np.asarray(par.k), np.asarray(ser.k),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(par.K), np.asarray(ser.K),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(par.dV), np.asarray(ser.dV),
                               rtol=1e-9, atol=1e-9)


def test_matches_regularized_lqr_at_lambda_positive():
    """With λ > 0 the assoc sweep equals a serial sweep whose cost carries
    cuu+λI everywhere (the fully-regularized subproblem)."""
    d, us = _random_lqr(seed=1)
    T, m = us.shape
    lam = jnp.asarray(0.37)
    cfg = SolverConfig(use_control_limits=False)
    # serial sweep of the problem with cuu := cuu + λI and λ := 0
    d_reg = d._replace(cuu=d.cuu + lam * jnp.eye(m))
    big = jnp.full((m,), 1e9)
    ser = backward_pass(d_reg, us, jnp.zeros(()), -big, big, cfg,
                        prev_k_last=jnp.zeros((m,)))
    par = backward_pass_assoc(d, us, lam, cfg)
    np.testing.assert_allclose(np.asarray(par.k), np.asarray(ser.k),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(par.K), np.asarray(ser.K),
                               rtol=1e-8, atol=1e-9)


def test_divergence_detected():
    d, us = _random_lqr(seed=2)
    m = us.shape[1]
    d_bad = d._replace(cuu=d.cuu - 50.0 * jnp.eye(m))
    cfg = SolverConfig(use_control_limits=False)
    par = backward_pass_assoc(d_bad, us, jnp.zeros(()), cfg)
    assert bool(par.diverged)


def test_full_solve_assoc_mode():
    """End-to-end: the unconstrained integrator solved in assoc mode lands
    on the same optimum as scan mode."""
    model = get_model("double_integrator")
    p = di.default_params(goal=(1.0, 0.5, 0.0, 0.0))
    x0 = jnp.array([-1.0, 0.0, 0.0, -0.2])
    u0 = jnp.zeros((99, 2))
    s_scan = solve(model, p,
                   SolverConfig(use_control_limits=False), 0.02, x0, u0)
    s_assoc = solve(model, p,
                    SolverConfig(use_control_limits=False,
                                 backward_mode="assoc"), 0.02, x0, u0)
    assert abs(float(s_scan.cost) - float(s_assoc.cost)) < 1e-6
    np.testing.assert_allclose(np.asarray(s_scan.us),
                               np.asarray(s_assoc.us), atol=1e-4)


def test_frozen_unconstrained_degenerates_to_assoc():
    """With a box nothing touches, assoc_frozen's refinement must leave
    every dim free and reproduce the plain assoc sweep exactly."""
    from ilqr_tpu.ops.assoc_backward import backward_pass_assoc_frozen

    d, us = _random_lqr(seed=3)
    m = us.shape[1]
    cfg = SolverConfig()
    big = jnp.full((m,), 1e9)
    fro = backward_pass_assoc_frozen(d, us, jnp.zeros(()), -big, big, cfg)
    par = backward_pass_assoc(d, us, jnp.zeros(()), cfg)
    np.testing.assert_allclose(np.asarray(fro.k), np.asarray(par.k),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(fro.K), np.asarray(par.K),
                               rtol=1e-9, atol=1e-9)


def test_frozen_matches_serial_constrained_at_lambda_zero():
    """On a binding box with clean active sets, the frozen-set refinement
    must land on the serial constrained sweep's gains (λ=0, f64; the
    serial boxQP converges to exact KKT there)."""
    from ilqr_tpu.ops.assoc_backward import backward_pass_assoc_frozen

    d, us = _random_lqr(seed=4)
    T, m = us.shape
    lo = jnp.full((m,), -0.35)
    hi = jnp.full((m,), 0.35)
    cfg = SolverConfig(boxqp_mode="iterative")
    ser = backward_pass(d, us, jnp.zeros(()), lo, hi, cfg,
                        prev_k_last=jnp.zeros((m,)))
    # ~52% of dims sit on a face here; the active set needs ~5 sweeps to
    # stabilize, after which agreement is machine-precision (measured
    # max|Δk| = 6.8e-16 at R=5; the default R=2 is the cheap approximate
    # setting the iLQR line search absorbs).
    cfg_r = cfg.replace(assoc_refine_sweeps=6)
    fro = backward_pass_assoc_frozen(d, us, jnp.zeros(()), lo, hi, cfg_r)
    assert not bool(ser.diverged) and not bool(fro.diverged)
    # the box must actually bind somewhere, or this test is vacuous
    lo_d = lo[None] - us
    hi_d = hi[None] - us
    at_face = (np.asarray(ser.k) <= np.asarray(lo_d) + 1e-9) | (
        np.asarray(ser.k) >= np.asarray(hi_d) - 1e-9)
    assert at_face.any()
    np.testing.assert_allclose(np.asarray(fro.k), np.asarray(ser.k),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(fro.K), np.asarray(ser.K),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(fro.dV), np.asarray(ser.dV),
                               rtol=1e-6, atol=1e-7)


def test_frozen_full_solve_control_limited():
    """End-to-end: the control-limited integrator solved with
    backward_mode='assoc_frozen' lands on the scan-mode optimum and
    respects the box."""
    model = get_model("double_integrator")
    p = di.default_params(goal=(1.5, 0.8, 0.0, 0.0))
    x0 = jnp.array([-1.0, 0.0, 0.0, -0.2])
    u0 = jnp.zeros((99, 2))
    s_scan = solve(model, p, SolverConfig(), 0.02, x0, u0)
    s_fro = solve(model, p, SolverConfig(backward_mode="assoc_frozen"),
                  0.02, x0, u0)
    assert abs(float(s_scan.cost) - float(s_fro.cost)) < 1e-4 * abs(
        float(s_scan.cost)) + 1e-6
    us = np.asarray(s_fro.us)
    umin, umax = np.asarray(p.u_min), np.asarray(p.u_max)
    assert (us >= umin - 1e-9).all() and (us <= umax + 1e-9).all()
    # the solution must actually saturate (else the box test is vacuous)
    assert ((us <= umin + 1e-6) | (us >= umax - 1e-6)).any()


@pytest.mark.slow
def test_assoc_vmaps():
    d, us = _random_lqr()
    cfg = SolverConfig(use_control_limits=False)
    B = 3
    db = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), d)
    usb = jnp.broadcast_to(us[None], (B,) + us.shape)
    lams = jnp.asarray([0.0, 0.1, 1.0])
    out = jax.vmap(lambda dd, uu, ll: backward_pass_assoc(dd, uu, ll, cfg))(
        db, usb, lams)
    assert out.k.shape == (B,) + us.shape
    ref0 = backward_pass_assoc(d, us, lams[0], cfg)
    np.testing.assert_allclose(np.asarray(out.k[0]), np.asarray(ref0.k),
                               atol=1e-9)
