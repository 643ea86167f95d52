"""Batched linearization of dynamics and quadratization of cost.

The reference loops over timesteps, finite-differencing the model per step
(ref: src/derivatives.cpp, include/finite_diff.h; eps=1e-3 central stencils) —
the dominant runtime cost (ref notes.md:45), with OpenMP attempts disabled for
nondeterminism. Here the time axis AND the probe axis are batched with ``vmap``
so the whole stage is a handful of fused XLA kernels, deterministic by
construction.

Two modes (SolverConfig.deriv_mode):
- "analytic": ``jacfwd``/``grad``-of-``grad`` of the discrete step and cost.
  Exact, and cheaper than FD (n+m forward tangents vs 2(n+m) + 4(n+m)² evals).
- "fd": central differences replicating the reference's stencils exactly
  (gradient/Jacobian: finite_diff.h:22-47; Hessian 4-point: finite_diff.h:67-86;
  cross-Hessian: derivatives.cpp:129-143) for bit-tolerant parity runs.

Terminal handling matches the reference's *effective* behavior: cx[T]/cxx[T]
come from final_cost (derivatives.cpp:48-49, 92); cu[T], cuu[T], cxu[T] are
never read by the backward pass (the ref computes cuu[T] pointlessly and
produces an identically-zero cxu[T] via a flagged-wrong formula,
derivatives.cpp:68,140), so we do not store them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ilqr_tpu.config import SolverConfig
from ilqr_tpu.models.base import Model, get_integrator
from ilqr_tpu.types import Derivs


def _step_fn(model: Model, params, cfg: SolverConfig, dt):
    integ = get_integrator(cfg.integrator)
    return lambda x, u: integ(model, params, x, u, dt)


# ---------------------------------------------------------------------------
# Analytic mode
# ---------------------------------------------------------------------------

def analytic_derivs(model: Model, params, cfg: SolverConfig, dt, xs, us) -> Derivs:
    step = _step_fn(model, params, cfg, dt)
    cost = lambda x, u: model.cost(params, x, u)
    xs_run = xs[:-1]

    fx = jax.vmap(jax.jacfwd(step, argnums=0))(xs_run, us)
    fu = jax.vmap(jax.jacfwd(step, argnums=1))(xs_run, us)

    cx_run = jax.vmap(jax.grad(cost, argnums=0))(xs_run, us)
    cu = jax.vmap(jax.grad(cost, argnums=1))(xs_run, us)
    cxx_run = jax.vmap(jax.jacfwd(jax.grad(cost, argnums=0), argnums=0))(xs_run, us)
    cxu = jax.vmap(jax.jacfwd(jax.grad(cost, argnums=0), argnums=1))(xs_run, us)
    cuu = jax.vmap(jax.jacfwd(jax.grad(cost, argnums=1), argnums=1))(xs_run, us)

    final = lambda x: model.final_cost(params, x)
    cx_T = jax.grad(final)(xs[-1])
    cxx_T = jax.hessian(final)(xs[-1])

    # Full-DDP second-order dynamics tensors (exact, nested forward-mode;
    # see types.Derivs for shapes). Tassa's MATLAB iLQG computes these under
    # its full_DDP flag; the C++ reference never did.
    fxx = fxu = fuu = None
    if cfg.full_ddp:
        fxx = jax.vmap(jax.jacfwd(jax.jacfwd(step, argnums=0), argnums=0))(
            xs_run, us)
        fxu = jax.vmap(jax.jacfwd(jax.jacfwd(step, argnums=0), argnums=1))(
            xs_run, us)
        fuu = jax.vmap(jax.jacfwd(jax.jacfwd(step, argnums=1), argnums=1))(
            xs_run, us)

    return Derivs(
        fx=fx,
        fu=fu,
        cx=jnp.concatenate([cx_run, cx_T[None]], axis=0),
        cu=cu,
        cxx=jnp.concatenate([cxx_run, cxx_T[None]], axis=0),
        cxu=cxu,
        cuu=cuu,
        fxx=fxx,
        fxu=fxu,
        fuu=fuu,
    )


# ---------------------------------------------------------------------------
# Finite-difference parity mode
# ---------------------------------------------------------------------------

def _fd_jacobian(f_batched, z, eps):
    """Central-difference Jacobian batched over time and probe axes.

    ``f_batched`` maps (T, P, d) probe states → (T, P, out). Returns
    (T, out, d). Matches finite_diff.h:35-47 (column i = ∂f/∂z_i).
    """
    d = z.shape[-1]
    probes = eps * jnp.eye(d, dtype=z.dtype)
    zp = z[:, None, :] + probes[None]
    zm = z[:, None, :] - probes[None]
    fp = f_batched(zp)
    fm = f_batched(zm)
    return jnp.swapaxes((fp - fm) / (2.0 * eps), 1, 2)


def _fd_gradient(f_batched, z, eps):
    """(T, d) → (T, d) central-difference gradient (finite_diff.h:22-33)."""
    d = z.shape[-1]
    probes = eps * jnp.eye(d, dtype=z.dtype)
    fp = f_batched(z[:, None, :] + probes[None])
    fm = f_batched(z[:, None, :] - probes[None])
    return (fp - fm) / (2.0 * eps)


def _fd_hessian(f_batched, z, eps):
    """4-point-stencil Hessian over the full (i, j) grid (finite_diff.h:67-86;
    the reference fills the upper triangle and mirrors — the full symmetric
    grid evaluates to the same matrix)."""
    d = z.shape[-1]
    e = eps * jnp.eye(d, dtype=z.dtype)
    ei = e[None, :, None, :]  # broadcast over (T, i, j, dim)
    ej = e[None, None, :, :]
    base = z[:, None, None, :]
    fpp = f_batched(base + ei + ej)
    fpm = f_batched(base + ei - ej)
    fmp = f_batched(base - ei + ej)
    fmm = f_batched(base - ei - ej)
    return (fpp - fmp - fpm + fmm) / (4.0 * eps * eps)


def fd_derivs(model: Model, params, cfg: SolverConfig, dt, xs, us) -> Derivs:
    eps = cfg.fd_eps
    step = _step_fn(model, params, cfg, dt)
    cost = lambda x, u: model.cost(params, x, u)
    final = lambda x: model.final_cost(params, x)
    xs_run = xs[:-1]
    n = xs.shape[-1]
    m = us.shape[-1]

    # vmap over (time, probes...) with the partner argument broadcast per-t.
    def over_probes(f, n_probe_axes):
        for _ in range(n_probe_axes):
            f = jax.vmap(f, in_axes=(0, None))
        return f

    # fx/fu: Jacobians of the DISCRETE Euler step (derivatives.cpp:15-26)
    step_x = jax.vmap(over_probes(step, 1), in_axes=(0, 0))
    fx = _fd_jacobian(lambda zp: step_x(zp, us), xs_run, eps)
    step_u = jax.vmap(over_probes(lambda u, x: step(x, u), 1), in_axes=(0, 0))
    fu = _fd_jacobian(lambda zp: step_u(zp, xs_run), us, eps)

    # cx/cu (derivatives.cpp:29-54): running rows use cost(·, u_t); the
    # terminal row uses final_cost; cu[T] is zero (not stored).
    cost_x = jax.vmap(over_probes(cost, 1), in_axes=(0, 0))
    cx_run = _fd_gradient(lambda zp: cost_x(zp, us), xs_run, eps)
    cost_u = jax.vmap(over_probes(lambda u, x: cost(x, u), 1), in_axes=(0, 0))
    cu = _fd_gradient(lambda zp: cost_u(zp, xs_run), us, eps)
    final_x1 = jax.vmap(final)
    probes = eps * jnp.eye(n, dtype=xs.dtype)
    cx_T = (final_x1(xs[-1][None] + probes) - final_x1(xs[-1][None] - probes)) / (
        2.0 * eps
    )

    # cxx (derivatives.cpp:76-96): running from cost, terminal from final_cost
    cost_x2 = jax.vmap(over_probes(cost, 2), in_axes=(0, 0))
    cxx_run = _fd_hessian(lambda zp: cost_x2(zp, us), xs_run, eps)
    final3 = jax.vmap(jax.vmap(jax.vmap(final)))
    cxx_T = _fd_hessian(final3, xs[-1][None], eps)[0]

    # cuu (derivatives.cpp:98-112)
    cost_u2 = jax.vmap(over_probes(lambda u, x: cost(x, u), 2), in_axes=(0, 0))
    cuu = _fd_hessian(lambda zp: cost_u2(zp, xs_run), us, eps)

    # cxu cross-Hessian, 4-point in (x_i, u_j) (derivatives.cpp:129-143)
    ex = (eps * jnp.eye(n, dtype=xs.dtype))[None, :, None, :]
    eu = (eps * jnp.eye(m, dtype=us.dtype))[None, None, :, :]
    xb = xs_run[:, None, None, :]
    ub = us[:, None, None, :]

    def c_at(dx_sign, du_sign):
        xq = jnp.broadcast_to(xb + dx_sign * ex, (xs_run.shape[0], n, m, n))
        uq = jnp.broadcast_to(ub + du_sign * eu, (us.shape[0], n, m, m))
        # vmap over (T, i, j) pairs jointly
        f = cost
        for _ in range(3):
            f = jax.vmap(f)
        return f(xq, uq)

    cxu = (c_at(1, 1) - c_at(-1, 1) - c_at(1, -1) + c_at(-1, -1)) / (
        4.0 * eps * eps
    )

    return Derivs(
        fx=fx,
        fu=fu,
        cx=jnp.concatenate([cx_run, cx_T[None]], axis=0),
        cu=cu,
        cxx=jnp.concatenate([cxx_run, cxx_T[None]], axis=0),
        cxu=cxu,
        cuu=cuu,
    )


import functools


def _kernel_interpret() -> bool:
    from ilqr_tpu.ops.rollout import _interpret

    return _interpret()


def _use_fused_derivs(model: Model, cfg: SolverConfig, dtype) -> bool:
    return (
        model.has_soa
        and not cfg.full_ddp  # kernels are Gauss-Newton-layout only
        and dtype == jnp.float32
        and cfg.deriv_kernel != "xla"
        and (cfg.deriv_kernel == "pallas"
             or (jax.default_backend() == "tpu"
                 and model.m <= _stage_kernel_cap()))
    )


def _stage_kernel_cap() -> int:
    # Shared auto-mode width cap with the rollout kernel — see
    # ops/rollout.MAX_STAGE_KERNEL_M (m=12 kernel-fault writeup).
    from ilqr_tpu.ops.rollout import MAX_STAGE_KERNEL_M

    return MAX_STAGE_KERNEL_M


@functools.lru_cache(maxsize=None)
def _get_derivs_cv(model: Model, cfg: SolverConfig):
    from ilqr_tpu.ops.pallas_derivs import derivs_batched

    # "analytic" → exact in-kernel JVPs; "fd" → the reference's central
    # stencils with cfg.fd_eps, evaluated in-kernel.
    kmode = "jvp" if cfg.deriv_mode == "analytic" else "fd"
    xla_impl = analytic_derivs if cfg.deriv_mode == "analytic" else fd_derivs

    def kernel_call(params, dt, xs, us):
        return derivs_batched(
            model, cfg.integrator, params, dt, xs, us,
            mode=kmode, eps=cfg.fd_eps,
            interpret=_kernel_interpret(),
            vma_axes=cfg.vma_axes,
        )

    @jax.custom_batching.custom_vmap
    def _cv(params, dt, xs, us):
        # Single-problem path: kernel with a B=1 block on TPU (see
        # ops/pallas_rollout.py) — keeps unbatched MPC replans fast.
        if jax.default_backend() == "tpu":
            d = kernel_call(params, dt, xs[None], us[None])
            return jax.tree_util.tree_map(lambda a: a[0], d)
        return xla_impl(model, params, cfg, dt, xs, us)

    @_cv.def_vmap
    def _rule(axis_size, in_batched, params, dt, xs, us):
        pb, dtb, xsb, usb = in_batched
        if any(jax.tree_util.tree_leaves(pb)) or dtb:
            out = jax.vmap(
                lambda p_, d_, a, b: xla_impl(model, p_, cfg, d_, a, b),
                in_axes=(jax.tree_util.tree_map(
                    lambda bt: 0 if bt else None, pb),
                    0 if dtb else None, 0 if xsb else None,
                    0 if usb else None),
                axis_size=axis_size,
            )(params, dt, xs, us)
            return out, jax.tree_util.tree_map(lambda _: True, out)

        def bc(a, b):
            return a if b else jnp.broadcast_to(
                a[None], (axis_size,) + a.shape)

        out = kernel_call(params, dt, bc(xs, xsb), bc(us, usb))
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return _cv


def compute_derivs(model: Model, params, cfg: SolverConfig, dt, xs, us) -> Derivs:
    if cfg.deriv_mode not in ("analytic", "fd"):
        raise ValueError(f"unknown deriv_mode {cfg.deriv_mode!r}")
    if cfg.full_ddp and cfg.deriv_mode != "analytic":
        raise ValueError(
            "full_ddp requires deriv_mode='analytic' (the second-order "
            "dynamics tensors come from nested forward-mode AD; the "
            "reference's FD engine has no such stencils to be parity with)")
    if _use_fused_derivs(model, cfg, jnp.asarray(xs).dtype):
        fn = _get_derivs_cv(model, cfg)
        return fn(params, jnp.asarray(dt, jnp.float32), xs, us)
    if cfg.deriv_mode == "analytic":
        return analytic_derivs(model, params, cfg, dt, xs, us)
    return fd_derivs(model, params, cfg, dt, xs, us)
