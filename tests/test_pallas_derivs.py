"""Fused Pallas derivative-kernel tests (interpret mode on CPU). The kernel
computes exact derivatives via nested in-kernel JVPs, so it must match
jax.jacfwd-based analytic_derivs to f32 roundoff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu import SolverConfig, get_model
from ilqr_tpu.ops.derivatives import analytic_derivs
from ilqr_tpu.ops.pallas_derivs import derivs_batched

FIELDS = ("fx", "fu", "cx", "cu", "cxx", "cxu", "cuu")


def _problem(mo, B=3, T=7, seed=0):
    rng = np.random.default_rng(seed)
    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), mo.default_params())
    xs = jnp.asarray(rng.normal(size=(B, T + 1, mo.n)) * 0.4, jnp.float32)
    us = jnp.asarray(rng.normal(size=(B, T, mo.m)) * 0.4, jnp.float32)
    return p, xs, us


@pytest.mark.parametrize("name", ["acrobot", "double_integrator",
                                  "pendulum", "cartpole"])
@pytest.mark.parametrize("integ", ["euler", "rk4"])
def test_kernel_matches_jacfwd(name, integ):
    mo = get_model(name)
    p, xs, us = _problem(mo)
    cfg = SolverConfig(integrator=integ)
    d_k = derivs_batched(mo, integ, p, 0.02, xs, us, interpret=True)
    d_r = jax.vmap(
        lambda a, b: analytic_derivs(mo, p, cfg, 0.02, a, b))(xs, us)
    for f in FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(d_k, f)), np.asarray(getattr(d_r, f)),
            atol=1e-4, err_msg=f"{name}/{integ}/{f}",
        )


@pytest.mark.slow
def test_terminal_row_from_final_cost():
    """cx[T]/cxx[T] come from final_cost, not the running cost
    (ref derivatives.cpp:48-49, 92)."""
    mo = get_model("acrobot")
    p, xs, us = _problem(mo, B=2, T=5)
    d = derivs_batched(mo, "euler", p, 0.02, xs, us, interpret=True)
    gT = jax.vmap(jax.grad(lambda x: mo.final_cost(p, x)))(xs[:, -1])
    hT = jax.vmap(jax.hessian(lambda x: mo.final_cost(p, x)))(xs[:, -1])
    np.testing.assert_allclose(np.asarray(d.cx[:, -1]), np.asarray(gT),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(d.cxx[:, -1]), np.asarray(hT),
                               atol=1e-4)


@pytest.mark.slow
def test_fd_mode_stencils():
    """The kernel's FD mode implements the reference's central stencils
    (finite_diff.h:22-86). Validated on the quadratic model — where the
    2-/4-point stencils are exact for any eps — with eps large enough that
    f32 rounding noise (the limiting factor of FD Hessians in f32, see
    ops/pallas_derivs.py) stays well below tolerance."""
    mo = get_model("double_integrator")
    p, xs, us = _problem(mo)
    d_k = derivs_batched(mo, "euler", p, 0.02, xs, us, mode="fd", eps=0.05,
                         interpret=True)
    d_r = jax.vmap(
        lambda a, b: analytic_derivs(mo, p, SolverConfig(), 0.02, a, b)
    )(xs, us)
    for f in FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(d_k, f)), np.asarray(getattr(d_r, f)),
            atol=2e-3, err_msg=f)


@pytest.mark.slow
def test_compute_derivs_dispatch_forced_pallas():
    """compute_derivs routes batched analytic calls through the kernel when
    deriv_kernel='pallas' (interpret off-TPU)."""
    from ilqr_tpu.ops.derivatives import compute_derivs

    mo = get_model("acrobot")
    p, xs, us = _problem(mo, B=2, T=5)
    cfg = SolverConfig(deriv_kernel="pallas")
    d_k = jax.vmap(
        lambda a, b: compute_derivs(mo, p, cfg, 0.02, a, b))(xs, us)
    d_r = jax.vmap(
        lambda a, b: analytic_derivs(mo, p, cfg, 0.02, a, b))(xs, us)
    for f in FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(d_k, f)), np.asarray(getattr(d_r, f)),
            atol=1e-4, err_msg=f)


@pytest.mark.slow
def test_kernel_matches_jacfwd_quadrotor():
    """n=12/m=4: the largest-state model through the derivative kernel
    (16 in-kernel JVP probes per step). Euler only — interpret mode at
    this size is heavy enough."""
    mo = get_model("quadrotor")
    p, xs, us = _problem(mo, B=2, T=4)
    cfg = SolverConfig(integrator="euler")
    d_k = derivs_batched(mo, "euler", p, 0.02, xs, us, interpret=True)
    d_r = jax.vmap(
        lambda a, b: analytic_derivs(mo, p, cfg, 0.02, a, b))(xs, us)
    for f in FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(d_k, f)), np.asarray(getattr(d_r, f)),
            atol=2e-4, err_msg=f"quadrotor/{f}",
        )
