"""Fused Pallas backward-kernel tests (interpret mode on CPU; the same code
compiles via Mosaic on TPU)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu import SolverConfig, get_model
from ilqr_tpu.batch import solve_batch
from ilqr_tpu.models import acrobot as ac
from ilqr_tpu.ops.backward import backward_pass
from ilqr_tpu.ops.pallas_backward import backward_sweep_batched
from ilqr_tpu.types import Derivs


def _random_problem(B=5, T=7, n=4, m=1, seed=0):
    rng = np.random.default_rng(seed)
    f32 = np.float32
    fx = (rng.normal(size=(B, T, n, n)) * 0.3 + np.eye(n)).astype(f32)
    fu = (rng.normal(size=(B, T, n, m)) * 0.1).astype(f32)
    cx = rng.normal(size=(B, T + 1, n)).astype(f32)
    cu = rng.normal(size=(B, T, m)).astype(f32)
    A = rng.normal(size=(B, T + 1, n, n))
    cxx = (A @ np.swapaxes(A, -1, -2) + np.eye(n)).astype(f32)
    cxu = (rng.normal(size=(B, T, n, m)) * 0.1).astype(f32)
    cuu = rng.uniform(0.5, 2.0, size=(B, T, m, m)).astype(f32)
    us = (rng.normal(size=(B, T, m)) * 0.2).astype(f32)
    lam = np.abs(rng.normal(size=(B,))).astype(f32)
    return fx, fu, cx, cu, cxx, cxu, cuu, us, lam


def test_kernel_matches_xla_backward():
    fx, fu, cx, cu, cxx, cxu, cuu, us, lam = _random_problem()
    u_min = jnp.asarray([-0.7], jnp.float32)
    u_max = jnp.asarray([0.7], jnp.float32)
    cfg = SolverConfig()  # boxqp_mode auto → closed-form m=1 in the scan too

    def ref_one(fxb, fub, cxb, cub, cxxb, cxub, cuub, usb, lamb):
        d = Derivs(fx=fxb, fu=fub, cx=cxb, cu=cub, cxx=cxxb, cxu=cxub,
                   cuu=cuub)
        return backward_pass(d, usb, lamb, u_min, u_max, cfg,
                             prev_k_last=jnp.zeros((1,), jnp.float32))

    ref = jax.vmap(ref_one)(*map(jnp.asarray,
                                 (fx, fu, cx, cu, cxx, cxu, cuu, us, lam)))

    lo = jnp.asarray(u_min[None, None] - us)
    hi = jnp.asarray(u_max[None, None] - us)
    k, K, dV, div = backward_sweep_batched(
        *map(jnp.asarray, (fx, fu, cx, cu, cxx, cxu, cuu)), lo, hi,
        jnp.asarray(lam), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(k), np.asarray(ref.k), atol=2e-6)
    np.testing.assert_allclose(np.asarray(K), np.asarray(ref.K), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dV), np.asarray(ref.dV), atol=2e-6)
    assert np.array_equal(np.asarray(div), np.asarray(ref.diverged))


def test_kernel_flags_divergence():
    """Negative Quu on some lanes must latch those lanes' diverged flags."""
    fx, fu, cx, cu, cxx, cxu, cuu, us, lam = _random_problem(B=3, T=4)
    cuu[1] = -50.0  # force QuuF < 0 for problem 1
    lam = np.zeros_like(lam)
    lo = np.full((3, 4, 1), -1.0, np.float32)
    hi = np.full((3, 4, 1), 1.0, np.float32)
    k, K, dV, div = backward_sweep_batched(
        *map(jnp.asarray, (fx, fu, cx, cu, cxx, cxu, cuu, lo, hi, lam)),
        interpret=True,
    )
    div = np.asarray(div)
    assert bool(div[1])
    assert not bool(div[0]) and not bool(div[2])


@pytest.mark.slow
def test_batch_padding():
    """Batch sizes not divisible by 1024 are padded internally and sliced
    back; padded lanes must not contaminate results."""
    fx, fu, cx, cu, cxx, cxu, cuu, us, lam = _random_problem(B=3, T=5, seed=2)
    lo = np.full((3, 5, 1), -0.5, np.float32)
    hi = np.full((3, 5, 1), 0.5, np.float32)
    args = list(map(jnp.asarray, (fx, fu, cx, cu, cxx, cxu, cuu, lo, hi, lam)))
    k3, K3, dV3, div3 = backward_sweep_batched(*args, interpret=True)
    # same problems duplicated → identical answers per copy
    args2 = [jnp.concatenate([a, a], axis=0) for a in args]
    k6, K6, dV6, div6 = backward_sweep_batched(*args2, interpret=True)
    np.testing.assert_allclose(np.asarray(k6[:3]), np.asarray(k3), atol=1e-7)
    np.testing.assert_allclose(np.asarray(k6[3:]), np.asarray(k3), atol=1e-7)


@pytest.mark.slow
def test_solver_end_to_end_pallas_vs_xla():
    """Full batched solves agree between backward_kernel='pallas'
    (interpret off-TPU) and 'xla'."""
    m = get_model("acrobot")
    # the fused path is f32-only; tests run under x64, so cast params down
    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), ac.default_params()
    )
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(0.05 * rng.normal(size=(3, 4)), jnp.float32)
    u0 = jnp.zeros((29, 1), jnp.float32)
    kw = dict(deriv_mode="analytic", clamp_forward=True, max_iter=8)
    sx = solve_batch(m, p, SolverConfig(backward_kernel="xla", **kw),
                     0.02, x0, u0)
    sp = solve_batch(m, p, SolverConfig(backward_kernel="pallas", **kw),
                     0.02, x0, u0)
    np.testing.assert_allclose(
        np.asarray(sx.cost), np.asarray(sp.cost), rtol=1e-3
    )
    # f32 op-order drift through 8 solver iterations; controls are O(5)
    assert np.abs(np.asarray(sx.us) - np.asarray(sp.us)).max() < 2e-2
