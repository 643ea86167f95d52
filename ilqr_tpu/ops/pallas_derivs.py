"""Fused Pallas TPU kernel for the batched linearization stage.

Computes fx, fu, cx, cu, cxx, cxu, cuu for every (problem, timestep) — the
stage that dominates the reference's solve time (ref notes.md:45, via
per-step central differences in src/derivatives.cpp). Here each grid step
produces EXACT derivatives for 1024 problems at one timestep by running
nested forward-mode JVPs of the model's SoA functions *inside the kernel*:

- first derivatives: one JVP per basis direction (n+m of them),
- second derivatives: nested JVP-of-JVP per direction pair (symmetric
  pairs computed once and mirrored),
- everything unrolled over the (tiny) state/control dims, so each JVP is a
  short chain of elementwise VPU ops over the (8, 128) problem tile.

This is exact like `jax.jacfwd` (it IS forward-mode AD, just staged
manually), with none of the XLA-level batching overhead, and one HBM
read of (x_t, u_t) per step amortized over all ~75 directional evaluations
— the fusion the reference attempted with OpenMP and abandoned
(ref derivatives.cpp:18-123, notes.md:12).

Layout mirrors ops/pallas_backward.py; the terminal row (cx[T], cxx[T]
from final_cost, ref derivatives.cpp:48-49,92) is produced by the same
kernel at grid step t == T.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilqr_tpu.ops.pallas_rollout import pack_params, unpack_params
from ilqr_tpu.types import Derivs

S = 8
L = 128
BLOCK = S * L


def _basis(k, dims, like):
    """Tangent tuple: ones-tile at row k, zeros elsewhere."""
    one = jnp.ones_like(like)
    zero = jnp.zeros_like(like)
    return jnp.stack([one if i == k else zero for i in range(dims)])


def _kernel(model, n, m, integrator, mode, eps, treedef, shapes,
            params_ref, xs_ref, us_ref,
            fx_ref, fu_ref, cx_ref, cu_ref, cxx_ref, cxu_ref, cuu_ref,
            ):
    t = pl.program_id(1)
    n_t = pl.num_programs(1)  # == T + 1
    p, dt = unpack_params(params_ref, treedef, shapes)

    x = jnp.stack([xs_ref[0, i, 0] for i in range(n)])
    u = jnp.stack([us_ref[0, j, 0] for j in range(m)])
    tile = x[0]

    def step_fn(xv, uv):
        d = model.dynamics_soa(p, xv, uv)
        if integrator == "euler":
            return xv + d * dt
        if integrator == "rk4":
            k1 = d
            k2 = model.dynamics_soa(p, xv + 0.5 * dt * k1, uv)
            k3 = model.dynamics_soa(p, xv + 0.5 * dt * k2, uv)
            k4 = model.dynamics_soa(p, xv + dt * k3, uv)
            return xv + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        raise ValueError(integrator)

    cost_fn = lambda xv, uv: model.cost_soa(p, xv, uv)
    final_fn = lambda xv: model.final_cost_soa(p, xv)

    zx = jnp.zeros_like(x)
    zu = jnp.zeros_like(u)

    def ei(i, wrt_x):
        return ((_basis(i, n, tile), zu) if wrt_x
                else (zx, _basis(i, m, tile)))

    # Directional first/second derivatives, either exact (forward-mode JVP)
    # or central differences with the reference's eps (finite_diff.h:9 /
    # derivatives.cpp:10 — gradient/Jacobian 2-point, Hessian 4-point
    # stencils, finite_diff.h:22-86).
    def d1(f, tang):
        if mode == "jvp":
            return jax.jvp(f, (x, u), tang)[1]
        tx, tu = tang
        return (f(x + eps * tx, u + eps * tu)
                - f(x - eps * tx, u - eps * tu)) / (2.0 * eps)

    def d2(f, ti, tj):
        if mode == "jvp":
            def inner(xv, uv):
                return jax.jvp(f, (xv, uv), ti)[1]

            return jax.jvp(inner, (x, u), tj)[1]
        txi, tui = ti
        txj, tuj = tj
        fpp = f(x + eps * (txi + txj), u + eps * (tui + tuj))
        fpm = f(x + eps * (txi - txj), u + eps * (tui - tuj))
        fmp = f(x - eps * (txi - txj), u - eps * (tui - tuj))
        fmm = f(x - eps * (txi + txj), u - eps * (tui + tuj))
        return (fpp - fpm - fmp + fmm) / (4.0 * eps * eps)

    # ---- running rows: everything but the terminal cx/cxx (t < T)
    @pl.when(t < n_t - 1)
    def _():
        # fx/fu: Jacobians of the discrete step (ref derivatives.cpp:15-26)
        for i in range(n):
            dcol = d1(step_fn, ei(i, True))
            for r in range(n):
                fx_ref[0, r, i, 0] = dcol[r]
        for j in range(m):
            dcol = d1(step_fn, ei(j, False))
            for r in range(n):
                fu_ref[0, r, j, 0] = dcol[r]

        # cx/cu: cost gradient (ref derivatives.cpp:29-54)
        for i in range(n):
            cx_ref[0, i, 0] = d1(cost_fn, ei(i, True))
        for j in range(m):
            cu_ref[0, j, 0] = d1(cost_fn, ei(j, False))

        # second derivatives (ref derivatives.cpp:57-144); symmetric blocks
        # computed on the upper triangle and mirrored.
        for i in range(n):
            for j in range(i, n):
                h = d2(cost_fn, ei(i, True), ei(j, True))
                cxx_ref[0, i, j, 0] = h
                if i != j:
                    cxx_ref[0, j, i, 0] = h
        for i in range(n):
            for j in range(m):
                cxu_ref[0, i, j, 0] = d2(cost_fn, ei(i, True), ei(j, False))
        for i in range(m):
            for j in range(i, m):
                h = d2(cost_fn, ei(i, False), ei(j, False))
                cuu_ref[0, i, j, 0] = h
                if i != j:
                    cuu_ref[0, j, i, 0] = h

    # ---- terminal row: cx[T], cxx[T] from final_cost (t == T)
    @pl.when(t == n_t - 1)
    def _():
        ffn = lambda xv, uv: final_fn(xv)
        for i in range(n):
            cx_ref[0, i, 0] = d1(ffn, ei(i, True))
        for i in range(n):
            for j in range(i, n):
                h = d2(ffn, ei(i, True), ei(j, True))
                cxx_ref[0, i, j, 0] = h
                if i != j:
                    cxx_ref[0, j, i, 0] = h


def _pack_tail(x, nb):
    rest = x.shape[1:]
    perm = tuple(range(1, x.ndim)) + (0,)
    return jnp.transpose(x, perm).reshape(rest + (nb, S, L))


def _unpack_tail(y, bb):
    rest = y.shape[:-3]
    y = y.reshape(rest + (bb,))
    perm = (y.ndim - 1,) + tuple(range(y.ndim - 1))
    return jnp.transpose(y, perm)


def derivs_packed(model, integrator: str, packed_params, xs_p, us_p,
                  mode: str = "jvp", eps: float = 1e-3,
                  interpret: bool = False, vma_axes: tuple = ()):
    """Kernel-layout entry point (no relayout) — see
    :func:`backward_sweep_packed` in ops/pallas_backward.py.

    Shapes: xs_p (T+1, n, NB, S, L), us_p (T, m, NB, S, L). Returns the
    packed tuple (fx (T,n,n,NB,S,L), fu (T,n,m,NB,S,L), cx (T+1,n,NB,S,L),
    cu (T,m,NB,S,L), cxx (T+1,n,n,NB,S,L), cxu (T,n,m,NB,S,L),
    cuu (T,m,m,NB,S,L)).
    """
    params_p, treedef, shapes = packed_params
    T, m, nb, _s, _l = us_p.shape
    n = xs_p.shape[1]
    P = params_p.shape[0]
    f32 = jnp.float32

    # us and the T-row outputs have no row T; clamp those indices. At t==T
    # the clamped blocks are revisited but never written, so the data from
    # t==T-1 is flushed untouched.
    clamp_t = lambda t: jnp.minimum(t, T - 1)

    if params_p.ndim == 4:  # per-problem params (P, NB, S, L)
        params_spec = pl.BlockSpec((P, 1, S, L), lambda b, t: (0, b, 0, 0),
                                   memory_space=pltpu.VMEM)
    else:                   # shared params (P, S, L), resident
        params_spec = pl.BlockSpec((P, S, L), lambda b, t: (0, 0, 0),
                                   memory_space=pltpu.VMEM)
    specs_in = [
        params_spec,
        pl.BlockSpec((1, n, 1, S, L), lambda b, t: (t, 0, b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, 1, S, L),
                     lambda b, t: (clamp_t(t), 0, b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    run_idx = lambda b, t: (clamp_t(t), 0, 0, b, 0, 0)
    run_idx3 = lambda b, t: (clamp_t(t), 0, b, 0, 0)
    specs_out = [
        pl.BlockSpec((1, n, n, 1, S, L), run_idx,
                     memory_space=pltpu.VMEM),  # fx (T rows)
        pl.BlockSpec((1, n, m, 1, S, L), run_idx,
                     memory_space=pltpu.VMEM),  # fu
        pl.BlockSpec((1, n, 1, S, L), lambda b, t: (t, 0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # cx (T+1 rows)
        pl.BlockSpec((1, m, 1, S, L), run_idx3,
                     memory_space=pltpu.VMEM),  # cu
        pl.BlockSpec((1, n, n, 1, S, L), lambda b, t: (t, 0, 0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # cxx (T+1 rows)
        pl.BlockSpec((1, n, m, 1, S, L), run_idx,
                     memory_space=pltpu.VMEM),  # cxu
        pl.BlockSpec((1, m, m, 1, S, L), run_idx,
                     memory_space=pltpu.VMEM),  # cuu
    ]
    from ilqr_tpu.utils.vma import sds

    out_shape = [
        sds((T, n, n, nb, S, L), f32, vma_axes),
        sds((T, n, m, nb, S, L), f32, vma_axes),
        sds((T + 1, n, nb, S, L), f32, vma_axes),
        sds((T, m, nb, S, L), f32, vma_axes),
        sds((T + 1, n, n, nb, S, L), f32, vma_axes),
        sds((T, n, m, nb, S, L), f32, vma_axes),
        sds((T, m, m, nb, S, L), f32, vma_axes),
    ]

    return pl.pallas_call(
        functools.partial(_kernel, model, n, m, integrator, mode, float(eps),
                          treedef, shapes),
        grid=(nb, T + 1),
        in_specs=specs_in,
        out_specs=specs_out,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(params_p, xs_p, us_p)


def derivs_batched(model, integrator: str, params, dt, xs, us,
                   mode: str = "jvp", eps: float = 1e-3,
                   interpret: bool = False, vma_axes: tuple = ()) -> Derivs:
    """Batched linearization via the fused kernel.

    Args: xs (B, T+1, n), us (B, T, m); params shared, dt scalar.
    ``mode``: "jvp" (exact forward-mode AD) or "fd" (the reference's
    central-difference stencils with ``eps``). Returns a Derivs with a
    leading batch axis, f32.
    """
    B, T, m = us.shape
    f32 = jnp.float32

    bb = ((B + BLOCK - 1) // BLOCK) * BLOCK
    nb = bb // BLOCK
    pad = bb - B

    def prep(x):
        x = x.astype(f32)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], f32)], axis=0)
        return x

    xs_p = _pack_tail(prep(xs), nb)   # (T+1, n, NB, S, L)
    us_p = _pack_tail(prep(us), nb)   # (T, m, NB, S, L)
    packed_params = pack_params(params, dt)

    fx, fu, cx, cu, cxx, cxu, cuu = derivs_packed(
        model, integrator, packed_params, xs_p, us_p,
        mode=mode, eps=eps, interpret=interpret, vma_axes=vma_axes)

    up = lambda a: _unpack_tail(a, bb)[:B]
    return Derivs(fx=up(fx), fu=up(fu), cx=up(cx), cu=up(cu),
                  cxx=up(cxx), cxu=up(cxu), cuu=up(cuu))
