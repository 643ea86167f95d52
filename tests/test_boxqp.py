"""boxQP unit tests.

Mirrors the reference's hand-value suite (ref: test/test_boxqp.cpp:16-202) —
clamping, quadCost, the Armijo clamped line search (easy / wrong-direction /
hits-limits), and boxQP end-to-end with expected status codes, active sets,
and Cholesky factors — plus randomized cross-checks against a brute-force
projected solve the reference lacks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu.config import BoxQPConfig
from ilqr_tpu.ops.boxqp import (
    boxqp,
    clamp_to_limits,
    quad_cost,
    quadclamp_line_search,
)

CFG = BoxQPConfig()


def test_clamp():
    # ref test_boxqp.cpp:16-24
    x = jnp.array([20.0, -50.0, 1.0])
    lo = jnp.full(3, -10.0)
    hi = jnp.full(3, 5.0)
    np.testing.assert_allclose(
        clamp_to_limits(x, lo, hi), [5.0, -10.0, 1.0], atol=1e-6
    )


def test_quad_cost():
    # ref test_boxqp.cpp:38-48
    x = jnp.array([0.35, 0.7])
    H = jnp.array([[0.25, 0.0], [0.0, 0.6]])
    g = jnp.array([-15.0, 1.0])
    assert abs(float(quad_cost(H, g, x)) - (-4.3876875)) < 1e-6


def test_line_search_easy():
    # ref test_boxqp.cpp:50-71: min x'x from (2,2) along (-1,-1) → (1,1)
    H = 2.0 * jnp.eye(2)
    g = jnp.zeros(2)
    x, v, failed, _n = quadclamp_line_search(
        jnp.array([2.0, 2.0]), jnp.array([-1.0, -1.0]), H, g,
        jnp.full(2, -10.0), jnp.full(2, 10.0), CFG,
    )
    np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-6)
    assert abs(float(v) - 2.0) < 1e-6
    assert not bool(failed)


def test_line_search_wrong_direction():
    # ref test_boxqp.cpp:73-89: ascent direction must fail
    H = 2.0 * jnp.eye(2)
    g = jnp.zeros(2)
    _x, _v, failed, _n = quadclamp_line_search(
        jnp.array([2.0, 2.0]), jnp.array([1.0, 1.0]), H, g,
        jnp.full(2, -10.0), jnp.full(2, 10.0), CFG,
    )
    assert bool(failed)


def test_line_search_hits_limits():
    # ref test_boxqp.cpp:91-107
    H = 2.0 * jnp.eye(2)
    g = jnp.zeros(2)
    x, v, failed, _n = quadclamp_line_search(
        jnp.array([2.0, 2.0]), jnp.array([-1.0, -1.0]), H, g,
        jnp.full(2, 1.5), jnp.full(2, 10.0), CFG,
    )
    np.testing.assert_allclose(x, [1.5, 1.5], atol=1e-6)
    assert abs(float(v) - 4.5) < 1e-6
    assert not bool(failed)


def test_boxqp_interior_optimum():
    # ref test_boxqp.cpp:117-133: unconstrained optimum at the origin
    res = boxqp(
        2.0 * jnp.eye(2), jnp.zeros(2), jnp.array([2.0, 2.0]),
        jnp.full(2, -10.0), jnp.full(2, 10.0),
    )
    np.testing.assert_allclose(res.x, [0.0, 0.0], atol=1e-6)
    assert int(res.status) >= 1


def test_boxqp_all_clamped():
    # ref test_boxqp.cpp:135-159: optimum outside the box → status 6,
    # both dims clamped, factor untouched from the previous iteration.
    res = boxqp(
        2.0 * jnp.eye(2), jnp.zeros(2), jnp.array([2.0, 2.0]),
        jnp.full(2, 1.5), jnp.full(2, 10.0),
    )
    assert int(res.status) == 6
    np.testing.assert_allclose(res.x, [1.5, 1.5], atol=1e-6)
    assert not bool(res.free[0]) and not bool(res.free[1])
    # The reference's R_free here is chol(2I)·? = sqrt(2)·I from iteration 1.
    np.testing.assert_allclose(
        res.chol_free, np.sqrt(2.0) * np.eye(2), atol=1e-3
    )


def test_boxqp_free_interior_with_gradient():
    # ref test_boxqp.cpp:161-184: status 5, x = -g/diag, R = sqrt(3.001) I
    res = boxqp(
        3.001 * jnp.eye(2), jnp.full(2, 0.201), jnp.zeros(2),
        jnp.full(2, -0.6), jnp.full(2, 0.4),
    )
    assert int(res.status) == 5
    np.testing.assert_allclose(res.x, [-0.0669777, -0.0669777], atol=1e-6)
    assert bool(res.free[0]) and bool(res.free[1])
    np.testing.assert_allclose(
        res.chol_free, np.sqrt(3.001) * np.eye(2), atol=1e-3
    )


def test_boxqp_one_dim_clamped():
    # ref test_boxqp.cpp:186-206 (assert-free in the ref; asserted here):
    # identity-ish H, g=0, lower[0]=0.2 active → x = (0.2, 0, 0)
    H = jnp.diag(jnp.array([1.0, 5.0, 1.0]))
    res = boxqp(
        H, jnp.zeros(3), jnp.array([0.5, 0.5, 1.0]),
        jnp.array([0.2, -1.0, -1.0]), jnp.ones(3),
    )
    assert int(res.status) >= 1
    np.testing.assert_allclose(res.x, [0.2, 0.0, 0.0], atol=1e-5)
    assert not bool(res.free[0])
    assert bool(res.free[1]) and bool(res.free[2])


@pytest.mark.parametrize("seed", range(8))
def test_boxqp_matches_projected_reference(seed):
    """Randomized PD QPs cross-checked against scipy's constrained optimizer."""
    from scipy.optimize import minimize

    rng = np.random.default_rng(seed)
    m = rng.integers(1, 6)
    A = rng.normal(size=(m, m))
    Q = A @ A.T + m * np.eye(m)
    c = rng.normal(size=m)
    lo = -rng.uniform(0.1, 1.0, size=m)
    hi = rng.uniform(0.1, 1.0, size=m)
    x0 = rng.uniform(-1.0, 1.0, size=m)

    res = boxqp(jnp.asarray(Q), jnp.asarray(c), jnp.asarray(x0),
                jnp.asarray(lo), jnp.asarray(hi))
    assert int(res.status) >= 1

    ref = minimize(
        lambda x: 0.5 * x @ Q @ x + x @ c,
        np.clip(x0, lo, hi),
        jac=lambda x: Q @ x + c,
        bounds=list(zip(lo, hi)),
        method="L-BFGS-B",
        tol=1e-12,
    )
    v_ours = float(quad_cost(jnp.asarray(Q), jnp.asarray(c), res.x))
    assert v_ours <= ref.fun + 1e-6
    np.testing.assert_allclose(np.asarray(res.x), ref.x, atol=1e-4)


def test_boxqp_non_pd_fails():
    """Indefinite Hessian on the free subspace → status -1 (failure),
    which the backward pass converts into λ escalation."""
    Q = jnp.array([[1.0, 0.0], [0.0, -2.0]])
    res = boxqp(Q, jnp.array([0.1, 0.1]), jnp.zeros(2),
                jnp.full(2, -1.0), jnp.full(2, 1.0))
    assert int(res.status) < 1


def test_boxqp_vmaps():
    """The whole QP must vmap — it runs per-timestep inside the backward scan."""
    import jax

    B, m = 16, 3
    rng = np.random.default_rng(0)
    A = rng.normal(size=(B, m, m))
    Q = jnp.asarray(A @ np.swapaxes(A, 1, 2) + 3 * np.eye(m))
    c = jnp.asarray(rng.normal(size=(B, m)))
    lo = jnp.full((B, m), -0.5)
    hi = jnp.full((B, m), 0.5)
    x0 = jnp.zeros((B, m))
    res = jax.vmap(lambda q, cc, x, l, h: boxqp(q, cc, x, l, h))(Q, c, x0, lo, hi)
    assert res.x.shape == (B, m)
    assert bool(jnp.all(res.status >= 1))
    assert bool(jnp.all(res.x >= lo - 1e-9)) and bool(jnp.all(res.x <= hi + 1e-9))
