"""Direct tile-level tests for the in-kernel m=4 QP machinery
(ops/pallas_sweep: _subdet/_adj_det/_qp_m4/_qp_newton/_free_solve_rows).

These helpers are plain jnp on (8, 128) tiles — testable against dense
oracles without entering Pallas. The ORACLE is ops/boxqp.boxqp_enum (itself
scipy-verified in tests/test_boxqp_enum.py) and plain dense linear algebra.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu.ops.boxqp import boxqp_enum
from ilqr_tpu.ops.pallas_sweep import (
    _adj_det,
    _free_solve_rows,
    _qp_m4,
    _qp_newton,
    _qp_pn,
    _subdet,
)

S, L = 8, 128
B = S * L


def _random_qps(seed, m=4, ridge=None, scale=1.0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(B, m, m))
    r = rng.uniform(0.2, 3.0, size=(B, 1, 1)) if ridge is None else ridge
    Q = A @ np.swapaxes(A, 1, 2) + r * np.eye(m)
    g = scale * rng.normal(size=(B, m))
    lo = -rng.uniform(0.05, 1.0, size=(B, m))
    hi = rng.uniform(0.05, 1.0, size=(B, m))
    return Q.astype(np.float32), g.astype(np.float32), \
        lo.astype(np.float32), hi.astype(np.float32)


def _tiles_mat(Q):
    """(B, m, m) -> nested list of (S, L) tiles (full symmetric)."""
    m = Q.shape[-1]
    return [[jnp.asarray(Q[:, i, j].reshape(S, L)) for j in range(m)]
            for i in range(m)]


def _tiles_vec(v):
    m = v.shape[-1]
    return [jnp.asarray(v[:, i].reshape(S, L)) for i in range(m)]


def test_subdet_and_adjugate_match_numpy():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(B, 4, 4))
    Q = (A + np.swapaxes(A, 1, 2)).astype(np.float32)  # symmetric, any sign
    q = _tiles_mat(Q)
    det = np.asarray(_subdet(q, (0, 1, 2, 3), (0, 1, 2, 3))).reshape(B)
    np.testing.assert_allclose(det, np.linalg.det(Q), rtol=2e-3, atol=2e-3)
    adj, det2 = _adj_det(q, (0, 1, 2, 3))
    # adjugate identity: adj(Q) = det(Q) · Q⁻¹
    ref = np.linalg.det(Q)[:, None, None] * np.linalg.inv(Q)
    got = np.stack([np.stack([np.asarray(adj[i][j]).reshape(B)
                              for j in range(4)], -1) for i in range(4)], -2)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)
    # sub-block: dims (0, 2, 3)
    idx = (0, 2, 3)
    sub = Q[:, np.ix_(idx, idx)[0], np.ix_(idx, idx)[1]]
    adj_s, det_s = _adj_det(q, idx)
    np.testing.assert_allclose(np.asarray(det_s).reshape(B),
                               np.linalg.det(sub), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("seed,scale", [(1, 1.0), (2, 4.0), (3, 0.2)])
def test_qp_m4_matches_boxqp_enum(seed, scale):
    """All 1024 random PD box QPs in one tile: the in-kernel 81-candidate
    enumeration lands on the boxqp_enum optimum (x AND free set)."""
    Q, g, lo, hi = _random_qps(seed, scale=scale)
    k, free, bad = _qp_m4(_tiles_mat(Q), _tiles_vec(g),
                          _tiles_vec(lo), _tiles_vec(hi))
    ref = jax.vmap(boxqp_enum)(jnp.asarray(Q), jnp.asarray(g),
                               jnp.asarray(lo), jnp.asarray(hi))
    assert not bool(jnp.any(bad))
    assert bool(jnp.all(ref.status == 5))
    x_got = np.stack([np.asarray(k[i]).reshape(B) for i in range(4)], -1)
    np.testing.assert_allclose(x_got, np.asarray(ref.x),
                               rtol=2e-3, atol=2e-3)
    f_got = np.stack([np.asarray(free[i]).reshape(B) for i in range(4)], -1)
    # free sets match wherever the solution isn't within tolerance of a
    # box face (exact ties make 'free' ambiguous — same x either way)
    interior_margin = np.minimum(np.asarray(ref.x) - lo, hi - np.asarray(ref.x))
    decisive = np.abs(interior_margin) > 1e-4
    np.testing.assert_array_equal(f_got[decisive],
                                  np.asarray(ref.free)[decisive])


def test_qp_m4_flags_non_pd():
    Q, g, lo, hi = _random_qps(7)
    Q[:, 3, 3] = -1.0  # break the 4th leading minor everywhere
    k, free, bad = _qp_m4(_tiles_mat(Q), _tiles_vec(g),
                          _tiles_vec(lo), _tiles_vec(hi))
    assert bool(jnp.all(bad))
    for i in range(4):
        assert not bool(jnp.any(free[i]))
        np.testing.assert_array_equal(np.asarray(k[i]), 0.0)


def test_qp_newton_m4_matches_dense_solve():
    Q, g, _lo, _hi = _random_qps(11)
    k, free, bad = _qp_newton(_tiles_mat(Q), _tiles_vec(g), 4)
    assert not bool(jnp.any(bad))
    ref = -np.linalg.solve(Q, g[..., None])[..., 0]
    got = np.stack([np.asarray(k[i]).reshape(B) for i in range(4)], -1)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_free_solve_rows_m4_matches_padded_inverse():
    """K rows: −(Q_free)⁻¹ · cols with identity padding, zeroed clamped
    rows (ref ilqr_core.cpp:377-385) — against the dense construction."""
    rng = np.random.default_rng(13)
    Q, _g, _lo, _hi = _random_qps(13)
    n = 3
    cols_np = rng.normal(size=(B, 4, n)).astype(np.float32)
    free_np = rng.uniform(size=(B, 4)) > 0.4
    free = [jnp.asarray(free_np[:, i].reshape(S, L)) for i in range(4)]
    cols = [[jnp.asarray(cols_np[:, j, i].reshape(S, L)) for i in range(n)]
            for j in range(4)]
    out = _free_solve_rows(_tiles_mat(Q), free, cols, 4)
    got = np.stack([np.stack([np.asarray(out[j][i]).reshape(B)
                              for i in range(n)], -1) for j in range(4)], -2)
    eye = np.eye(4, dtype=np.float32)
    mask = free_np[:, :, None] & free_np[:, None, :]
    P = np.where(mask, Q, eye)
    ref = -np.linalg.solve(P, cols_np)
    ref = np.where(free_np[:, :, None], ref, 0.0)
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)


def test_qp_m4_boundary_tie():
    """A solution exactly on a box face ties the free and clamped
    candidate sets — the enumeration must still return the optimum
    (free-set choice is ambiguous there; x is not)."""
    Q = np.eye(4, dtype=np.float32)[None].repeat(B, 0)
    c = np.tile(np.asarray([-0.5, 0.25, 0.0, 0.1], np.float32), (B, 1))
    lo = np.full((B, 4), -0.5, np.float32)
    hi = np.full((B, 4), 0.5, np.float32)
    k, free, bad = _qp_m4(_tiles_mat(Q), _tiles_vec(c),
                          _tiles_vec(lo), _tiles_vec(hi))
    assert not bool(jnp.any(bad))
    x = np.stack([np.asarray(k[i]).reshape(B) for i in range(4)], -1)
    np.testing.assert_allclose(x, np.tile([0.5, -0.25, 0.0, -0.1], (B, 1)),
                               atol=1e-6)


# --- general-m (projected Newton) machinery, m > 4 -------------------------

def _enum_oracle(Q, g, lo, hi):
    """Exact box-QP argmin by full 3^m active-set enumeration (numpy) —
    the same construction boxqp_enum uses, without its m <= 4 cap."""
    import itertools

    Bn, m = g.shape
    best_v = np.full(Bn, np.inf)
    best_x = np.zeros((Bn, m))
    for combo in itertools.product((0, 1, 2), repeat=m):
        F = [i for i in range(m) if combo[i] == 1]
        x = np.empty((Bn, m))
        for i in range(m):
            if combo[i] == 0:
                x[:, i] = lo[:, i]
            elif combo[i] == 2:
                x[:, i] = hi[:, i]
        if F:
            C = [i for i in range(m) if combo[i] != 1]
            QFF = Q[:, F][:, :, F]
            rhs = g[:, F].copy()
            if C:
                rhs += np.einsum("bij,bj->bi", Q[:, F][:, :, C], x[:, C])
            x[:, np.array(F)] = -np.linalg.solve(QFF, rhs[..., None])[..., 0]
        gr = np.einsum("bij,bj->bi", Q, x) + g
        ok = np.ones(Bn, bool)
        for i in range(m):
            if combo[i] == 1:
                ok &= ((x[:, i] >= lo[:, i] - 1e-9)
                       & (x[:, i] <= hi[:, i] + 1e-9))
            elif combo[i] == 0:
                ok &= gr[:, i] >= -1e-9
            else:
                ok &= gr[:, i] <= 1e-9
        v = (0.5 * np.einsum("bi,bij,bj->b", x, Q, x)
             + np.einsum("bi,bi->b", g, x))
        take = ok & (v < best_v)
        best_v = np.where(take, v, best_v)
        best_x = np.where(take[:, None], x, best_x)
    return best_x, best_v


@pytest.mark.parametrize("m,seed,scale", [(5, 21, 1.0), (5, 22, 3.0),
                                          (6, 23, 1.0), (6, 24, 3.0),
                                          (7, 25, 1.0),
                                          (8, 26, 1.0), (8, 27, 3.0)])
def test_qp_pn_matches_enum_oracle(m, seed, scale):
    """The fixed-shape in-kernel projected Newton (m > 4) lands on the
    exact enumerated optimum: objective gap at f32 rounding level and
    the argmin within f32 tolerance on every one of the 1024 lanes."""
    Q, g, lo, hi = _random_qps(seed, m=m, scale=scale)
    k, free, bad = _qp_pn(_tiles_mat(Q), _tiles_vec(g),
                          _tiles_vec(lo), _tiles_vec(hi), m)
    assert not bool(jnp.any(bad))
    x = np.stack([np.asarray(k[i]).reshape(B) for i in range(m)], -1)
    xo, vo = _enum_oracle(Q.astype(np.float64), g.astype(np.float64),
                          lo.astype(np.float64), hi.astype(np.float64))
    v = (0.5 * np.einsum("bi,bij,bj->b", x, Q, x)
         + np.einsum("bi,bi->b", g, x))
    assert (v - vo).max() < 1e-5, (v - vo).max()
    np.testing.assert_allclose(x, xo, atol=2e-3)
    # KKT-consistent free masks: free dims strictly inside the box agree
    # with the oracle active set on non-degenerate lanes
    fr = np.stack([np.asarray(free[i]).reshape(B) for i in range(m)], -1)
    interior = (xo > lo + 1e-4) & (xo < hi - 1e-4)
    assert (fr | ~interior).all()


def test_qp_pn_flags_non_pd():
    m = 6
    Q, g, lo, hi = _random_qps(31, m=m)
    Q[:, 5, 5] = -1.0  # break the last pivot everywhere
    k, free, bad = _qp_pn(_tiles_mat(Q), _tiles_vec(g),
                          _tiles_vec(lo), _tiles_vec(hi), m)
    assert bool(jnp.all(bad))
    for i in range(m):
        assert not bool(jnp.any(free[i]))
        np.testing.assert_array_equal(np.asarray(k[i]), 0.0)


def test_qp_newton_m6_matches_dense_solve():
    Q, g, _lo, _hi = _random_qps(33, m=6)
    k, free, bad = _qp_newton(_tiles_mat(Q), _tiles_vec(g), 6)
    assert not bool(jnp.any(bad))
    ref = -np.linalg.solve(Q, g[..., None])[..., 0]
    got = np.stack([np.asarray(k[i]).reshape(B) for i in range(6)], -1)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_free_solve_rows_m6_matches_padded_inverse():
    """The masked-Cholesky K-row solve (m > 4) against the dense
    identity-padded inverse construction (ref ilqr_core.cpp:377-385)."""
    rng = np.random.default_rng(37)
    m = 6
    Q, _g, _lo, _hi = _random_qps(37, m=m)
    n = 4
    cols_np = rng.normal(size=(B, m, n)).astype(np.float32)
    free_np = rng.uniform(size=(B, m)) > 0.4
    free = [jnp.asarray(free_np[:, i].reshape(S, L)) for i in range(m)]
    cols = [[jnp.asarray(cols_np[:, j, i].reshape(S, L)) for i in range(n)]
            for j in range(m)]
    out = _free_solve_rows(_tiles_mat(Q), free, cols, m)
    got = np.stack([np.stack([np.asarray(out[j][i]).reshape(B)
                              for i in range(n)], -1) for j in range(m)], -2)
    eye = np.eye(m, dtype=np.float32)
    mask = free_np[:, :, None] & free_np[:, None, :]
    P = np.where(mask, Q, eye)
    ref = -np.linalg.solve(P, cols_np)
    ref = np.where(free_np[:, :, None], ref, 0.0)
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)


# --- m = 12 (the raised MAX_FUSED_M cap; round 4) -------------------------
#
# 3^12 exact enumeration is out of reach as a full-lane numpy oracle, so
# m = 12 uses two oracles: ops/boxqp.boxqp_pn in f64 (itself verified
# against scipy L-BFGS-B and exact enumeration in tests/test_boxqp_pn.py)
# on every lane, and scipy L-BFGS-B directly on a lane subset.


@pytest.mark.parametrize("seed,scale", [(41, 1.0), (42, 3.0)])
def test_qp_pn_m12_matches_boxqp_pn_oracle(seed, scale):
    from ilqr_tpu.ops.boxqp import boxqp_pn

    m = 12
    Q, g, lo, hi = _random_qps(seed, m=m, scale=scale)
    k, free, bad = _qp_pn(_tiles_mat(Q), _tiles_vec(g),
                          _tiles_vec(lo), _tiles_vec(hi), m)
    assert not bool(jnp.any(bad))
    x = np.stack([np.asarray(k[i]).reshape(B) for i in range(m)], -1)
    # every lane inside the box
    assert (x >= lo - 1e-6).all() and (x <= hi + 1e-6).all()
    ref = jax.vmap(boxqp_pn)(
        jnp.asarray(Q, jnp.float64), jnp.asarray(g, jnp.float64),
        jnp.asarray(lo, jnp.float64), jnp.asarray(hi, jnp.float64))
    xo = np.asarray(ref.x)
    v = (0.5 * np.einsum("bi,bij,bj->b", x, Q.astype(np.float64), x)
         + np.einsum("bi,bi->b", g, x))
    vo = (0.5 * np.einsum("bi,bij,bj->b", xo, Q.astype(np.float64), xo)
          + np.einsum("bi,bi->b", g, xo))
    assert (v - vo).max() < 1e-4, (v - vo).max()
    np.testing.assert_allclose(x, xo, atol=5e-3)
    # scipy spot-check on a lane subset
    from scipy.optimize import minimize
    for b in range(0, B, 173):
        Qb, gb = Q[b].astype(np.float64), g[b].astype(np.float64)
        r = minimize(lambda z: 0.5 * z @ Qb @ z + z @ gb,
                     np.clip(np.zeros(m), lo[b], hi[b]),
                     jac=lambda z: Qb @ z + gb,
                     bounds=list(zip(lo[b], hi[b])),
                     method="L-BFGS-B", tol=1e-14)
        np.testing.assert_allclose(x[b], r.x, atol=5e-3)


def test_free_solve_rows_m12_matches_padded_inverse():
    rng = np.random.default_rng(43)
    m, n = 12, 6
    Q, _g, _lo, _hi = _random_qps(43, m=m)
    cols_np = rng.normal(size=(B, m, n)).astype(np.float32)
    free_np = rng.uniform(size=(B, m)) > 0.4
    free = [jnp.asarray(free_np[:, i].reshape(S, L)) for i in range(m)]
    cols = [[jnp.asarray(cols_np[:, j, i].reshape(S, L)) for i in range(n)]
            for j in range(m)]
    out = _free_solve_rows(_tiles_mat(Q), free, cols, m)
    got = np.stack([np.stack([np.asarray(out[j][i]).reshape(B)
                              for i in range(n)], -1) for j in range(m)], -2)
    eye = np.eye(m, dtype=np.float32)
    mask = free_np[:, :, None] & free_np[:, None, :]
    P = np.where(mask, Q, eye)
    ref = -np.linalg.solve(P, cols_np)
    ref = np.where(free_np[:, :, None], ref, 0.0)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


# --- m = 16 (the round-5 MAX_FUSED_M cap) ---------------------------------
#
# Same oracle pair as m = 12: boxqp_pn in f64 on every lane + scipy
# L-BFGS-B on a lane subset (TPU-side evidence: the m16_fused /
# m16_equiv rows in experiments/secondary_results.jsonl).


@pytest.mark.parametrize("seed,scale", [(51, 1.0), (52, 3.0)])
def test_qp_pn_m16_matches_boxqp_pn_oracle(seed, scale):
    from ilqr_tpu.ops.boxqp import boxqp_pn

    m = 16
    Q, g, lo, hi = _random_qps(seed, m=m, scale=scale)
    k, free, bad = _qp_pn(_tiles_mat(Q), _tiles_vec(g),
                          _tiles_vec(lo), _tiles_vec(hi), m)
    assert not bool(jnp.any(bad))
    x = np.stack([np.asarray(k[i]).reshape(B) for i in range(m)], -1)
    assert (x >= lo - 1e-6).all() and (x <= hi + 1e-6).all()
    ref = jax.vmap(boxqp_pn)(
        jnp.asarray(Q, jnp.float64), jnp.asarray(g, jnp.float64),
        jnp.asarray(lo, jnp.float64), jnp.asarray(hi, jnp.float64))
    xo = np.asarray(ref.x)
    v = (0.5 * np.einsum("bi,bij,bj->b", x, Q.astype(np.float64), x)
         + np.einsum("bi,bi->b", g, x))
    vo = (0.5 * np.einsum("bi,bij,bj->b", xo, Q.astype(np.float64), xo)
          + np.einsum("bi,bi->b", g, xo))
    assert (v - vo).max() < 1e-4, (v - vo).max()
    np.testing.assert_allclose(x, xo, atol=5e-3)
    from scipy.optimize import minimize
    for b in range(0, B, 173):
        Qb, gb = Q[b].astype(np.float64), g[b].astype(np.float64)
        r = minimize(lambda z: 0.5 * z @ Qb @ z + z @ gb,
                     np.clip(np.zeros(m), lo[b], hi[b]),
                     jac=lambda z: Qb @ z + gb,
                     bounds=list(zip(lo[b], hi[b])),
                     method="L-BFGS-B", tol=1e-14)
        np.testing.assert_allclose(x[b], r.x, atol=5e-3)


def test_free_solve_rows_m16_matches_padded_inverse():
    rng = np.random.default_rng(53)
    m, n = 16, 6
    Q, _g, _lo, _hi = _random_qps(53, m=m)
    cols_np = rng.normal(size=(B, m, n)).astype(np.float32)
    free_np = rng.uniform(size=(B, m)) > 0.4
    free = [jnp.asarray(free_np[:, i].reshape(S, L)) for i in range(m)]
    cols = [[jnp.asarray(cols_np[:, j, i].reshape(S, L)) for i in range(n)]
            for j in range(m)]
    out = _free_solve_rows(_tiles_mat(Q), free, cols, m)
    got = np.stack([np.stack([np.asarray(out[j][i]).reshape(B)
                              for i in range(n)], -1) for j in range(m)], -2)
    eye = np.eye(m, dtype=np.float32)
    mask = free_np[:, :, None] & free_np[:, None, :]
    P = np.where(mask, Q, eye)
    ref = -np.linalg.solve(P, cols_np)
    ref = np.where(free_np[:, :, None], ref, 0.0)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


# --- m = 20 --------------------------------------------------------------


@pytest.mark.parametrize("seed,scale", [(61, 1.0), (62, 3.0)])
def test_qp_pn_m20_matches_boxqp_pn_oracle(seed, scale):
    from ilqr_tpu.ops.boxqp import boxqp_pn

    m = 20
    Q, g, lo, hi = _random_qps(seed, m=m, scale=scale)
    k, free, bad = _qp_pn(_tiles_mat(Q), _tiles_vec(g),
                          _tiles_vec(lo), _tiles_vec(hi), m)
    assert not bool(jnp.any(bad))
    x = np.stack([np.asarray(k[i]).reshape(B) for i in range(m)], -1)
    assert (x >= lo - 1e-6).all() and (x <= hi + 1e-6).all()
    ref = jax.vmap(boxqp_pn)(
        jnp.asarray(Q, jnp.float64), jnp.asarray(g, jnp.float64),
        jnp.asarray(lo, jnp.float64), jnp.asarray(hi, jnp.float64))
    xo = np.asarray(ref.x)
    v = (0.5 * np.einsum("bi,bij,bj->b", x, Q.astype(np.float64), x)
         + np.einsum("bi,bi->b", g, x))
    vo = (0.5 * np.einsum("bi,bij,bj->b", xo, Q.astype(np.float64), xo)
          + np.einsum("bi,bi->b", g, xo))
    assert (v - vo).max() < 2e-4, (v - vo).max()
    np.testing.assert_allclose(x, xo, atol=8e-3)
    from scipy.optimize import minimize
    for b in range(0, B, 211):
        Qb, gb = Q[b].astype(np.float64), g[b].astype(np.float64)
        r = minimize(lambda z: 0.5 * z @ Qb @ z + z @ gb,
                     np.clip(np.zeros(m), lo[b], hi[b]),
                     jac=lambda z: Qb @ z + gb,
                     bounds=list(zip(lo[b], hi[b])),
                     method="L-BFGS-B", tol=1e-14)
        np.testing.assert_allclose(x[b], r.x, atol=8e-3)


# --- m = 24 (the round-5 final MAX_FUSED_M cap) ----------------------------
#
# Same oracle pair: boxqp_pn in f64 on every lane + scipy L-BFGS-B on a
# lane subset (TPU-side evidence: the m24_fused row in
# experiments/secondary_results.jsonl — 2,616 solves/s, 2,166 s compile).


@pytest.mark.parametrize("seed,scale", [(71, 1.0), (72, 3.0)])
def test_qp_pn_m24_matches_boxqp_pn_oracle(seed, scale):
    from ilqr_tpu.ops.boxqp import boxqp_pn

    m = 24
    Q, g, lo, hi = _random_qps(seed, m=m, scale=scale)
    k, free, bad = _qp_pn(_tiles_mat(Q), _tiles_vec(g),
                          _tiles_vec(lo), _tiles_vec(hi), m)
    assert not bool(jnp.any(bad))
    x = np.stack([np.asarray(k[i]).reshape(B) for i in range(m)], -1)
    assert (x >= lo - 1e-6).all() and (x <= hi + 1e-6).all()
    ref = jax.vmap(boxqp_pn)(
        jnp.asarray(Q, jnp.float64), jnp.asarray(g, jnp.float64),
        jnp.asarray(lo, jnp.float64), jnp.asarray(hi, jnp.float64))
    xo = np.asarray(ref.x)
    v = (0.5 * np.einsum("bi,bij,bj->b", x, Q.astype(np.float64), x)
         + np.einsum("bi,bi->b", g, x))
    vo = (0.5 * np.einsum("bi,bij,bj->b", xo, Q.astype(np.float64), xo)
          + np.einsum("bi,bi->b", g, xo))
    assert (v - vo).max() < 2e-4, (v - vo).max()
    np.testing.assert_allclose(x, xo, atol=8e-3)
    from scipy.optimize import minimize
    for b in range(0, B, 239):
        Qb, gb = Q[b].astype(np.float64), g[b].astype(np.float64)
        r = minimize(lambda z: 0.5 * z @ Qb @ z + z @ gb,
                     np.clip(np.zeros(m), lo[b], hi[b]),
                     jac=lambda z: Qb @ z + gb,
                     bounds=list(zip(lo[b], hi[b])),
                     method="L-BFGS-B", tol=1e-14)
        np.testing.assert_allclose(x[b], r.x, atol=8e-3)


def test_free_solve_rows_m24_matches_padded_inverse():
    rng = np.random.default_rng(73)
    m, n = 24, 6
    Q, _g, _lo, _hi = _random_qps(73, m=m)
    cols_np = rng.normal(size=(B, m, n)).astype(np.float32)
    free_np = rng.uniform(size=(B, m)) > 0.4
    free = [jnp.asarray(free_np[:, i].reshape(S, L)) for i in range(m)]
    cols = [[jnp.asarray(cols_np[:, j, i].reshape(S, L)) for i in range(n)]
            for j in range(m)]
    out = _free_solve_rows(_tiles_mat(Q), free, cols, m)
    got = np.stack([np.stack([np.asarray(out[j][i]).reshape(B)
                              for i in range(n)], -1) for j in range(m)], -2)
    eye = np.eye(m, dtype=np.float32)
    mask = free_np[:, :, None] & free_np[:, None, :]
    P = np.where(mask, Q, eye)
    ref = -np.linalg.solve(P, cols_np)
    ref = np.where(free_np[:, :, None], ref, 0.0)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)
