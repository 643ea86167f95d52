"""Merged linearize+backward Pallas kernel (m = 1).

In the fused solver the linearization exists only to feed the backward
recursion — nothing else reads it. Keeping them as two kernels costs a
full HBM round-trip of every per-timestep derivative array (~190 MB per
1024-problem sweep at T=499). This kernel runs BOTH per grid step:

  grid step (b, t)  ≡  timestep T−1−t of block b:
    1. read just (x_t, u_t) — ~20 MB/sweep instead of ~200,
    2. differentiate the model in-registers (forward-mode JVPs, or the
       reference's FD stencils — same modes as ops/pallas_derivs),
    3. immediately consume fx/fu/cx/cu/cxx/cxu/cuu in the closed-form
       m=1 DDP backward step (same math as ops/pallas_backward, ref
       src/ilqr_core.cpp:350-401) with the V-carries in VMEM scratch.

The terminal value (cx_T/cxx_T from final_cost, ref derivatives.cpp:48-49)
is differentiated in-kernel at the t == 0 initialization step.

λ-escalation retries re-run the whole kernel (re-deriving the same
derivatives); retries are rare and the kernel is HBM-bound, so recompute
is free compared to materializing the linearization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilqr_tpu.ops.pallas_rollout import unpack_params

S = 8
L = 128


def _basis(k, dims, like):
    one = jnp.ones_like(like)
    zero = jnp.zeros_like(like)
    return jnp.stack([one if i == k else zero for i in range(dims)])


def _kernel(model, n, integrator, mode, eps, treedef, shapes,
            params_ref, xs_ref, xsT_ref, us_ref, lam_ref,
            k_ref, K_ref, dv_ref, div_ref,
            vx, vxx, dv, div):
    m = 1
    t = pl.program_id(1)
    n_t = pl.num_programs(1)  # == T
    p, dt = unpack_params(params_ref, treedef, shapes)

    x = jnp.stack([xs_ref[0, i, 0] for i in range(n)])
    u = jnp.stack([us_ref[0, j, 0] for j in range(m)])
    tile = x[0]
    zx = jnp.zeros_like(x)
    zu = jnp.zeros_like(u)

    def step_fn(xv, uv):
        d = model.dynamics_soa(p, xv, uv)
        if integrator == "euler":
            return xv + d * dt
        k1 = d
        k2 = model.dynamics_soa(p, xv + 0.5 * dt * k1, uv)
        k3 = model.dynamics_soa(p, xv + 0.5 * dt * k2, uv)
        k4 = model.dynamics_soa(p, xv + dt * k3, uv)
        return xv + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    cost_fn = lambda xv, uv: model.cost_soa(p, xv, uv)
    final_fn = lambda xv, uv: model.final_cost_soa(p, xv)

    def ei(i, wrt_x):
        return ((_basis(i, n, tile), zu) if wrt_x
                else (zx, _basis(i, m, tile)))

    def d1(f, tang, at_x=None):
        xx = x if at_x is None else at_x
        if mode == "jvp":
            return jax.jvp(f, (xx, u), tang)[1]
        tx, tu = tang
        return (f(xx + eps * tx, u + eps * tu)
                - f(xx - eps * tx, u - eps * tu)) / (2.0 * eps)

    def d2(f, ti, tj, at_x=None):
        xx = x if at_x is None else at_x
        if mode == "jvp":
            def inner(xv, uv):
                return jax.jvp(f, (xv, uv), ti)[1]

            return jax.jvp(inner, (xx, u), tj)[1]
        txi, tui = ti
        txj, tuj = tj
        fpp = f(xx + eps * (txi + txj), u + eps * (tui + tuj))
        fpm = f(xx + eps * (txi - txj), u + eps * (tui - tuj))
        fmp = f(xx - eps * (txi - txj), u - eps * (tui - tuj))
        fmm = f(xx - eps * (txi + txj), u - eps * (tui + tuj))
        return (fpp - fpm - fmp + fmm) / (4.0 * eps * eps)

    # --- t == 0: V_T from final_cost, differentiated in-kernel
    @pl.when(t == 0)
    def _():
        xT = jnp.stack([xsT_ref[i, 0] for i in range(n)])
        for i in range(n):
            vx[i] = d1(final_fn, ei(i, True), at_x=xT)
        for i in range(n):
            for j in range(i, n):
                h = d2(final_fn, ei(i, True), ei(j, True), at_x=xT)
                vxx[i, j] = h
                if i != j:
                    vxx[j, i] = h
        dv[0] = jnp.zeros((S, L), jnp.float32)
        dv[1] = jnp.zeros((S, L), jnp.float32)
        div[0] = jnp.zeros((S, L), jnp.float32)

    # --- linearize timestep T-1-t in registers
    fxc = [[None] * n for _ in range(n)]
    fu1 = [None] * n
    for i in range(n):
        col = d1(step_fn, ei(i, True))
        for r in range(n):
            fxc[r][i] = col[r]
    colu = d1(step_fn, ei(0, False))
    for r in range(n):
        fu1[r] = colu[r]

    cx1 = [d1(cost_fn, ei(i, True)) for i in range(n)]
    cu1 = d1(cost_fn, ei(0, False))
    cxx1 = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i, n):
            h = d2(cost_fn, ei(i, True), ei(j, True))
            cxx1[i][j] = h
            cxx1[j][i] = h
    cxu1 = [d2(cost_fn, ei(i, True), ei(0, False)) for i in range(n)]
    cuu1 = d2(cost_fn, ei(0, False), ei(0, False))

    # --- backward step (ref ilqr_core.cpp:359-393; see pallas_backward)
    lam = lam_ref[0]
    fuT_vxx = [None] * n
    for j in range(n):
        acc = fu1[0] * vxx[0, j]
        for i in range(1, n):
            acc = acc + fu1[i] * vxx[i, j]
        fuT_vxx[j] = acc

    qu = cu1
    for i in range(n):
        qu = qu + fu1[i] * vx[i]
    quu = cuu1
    for j in range(n):
        quu = quu + fuT_vxx[j] * fu1[j]
    quuF = quu + lam

    qux = [None] * n
    qx = [None] * n
    for j in range(n):
        accq = cxu1[j]
        accx = cx1[j]
        for i in range(n):
            accq = accq + fuT_vxx[i] * fxc[i][j]
            accx = accx + fxc[i][j] * vx[i]
        qux[j] = accq
        qx[j] = accx

    w = [[None] * n for _ in range(n)]
    for kk in range(n):
        for j in range(n):
            acc = vxx[kk, 0] * fxc[0][j]
            for l in range(1, n):
                acc = acc + vxx[kk, l] * fxc[l][j]
            w[kk][j] = acc
    qxx = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            acc = cxx1[i][j]
            for kk in range(n):
                acc = acc + fxc[kk][i] * w[kk][j]
            qxx[i][j] = acc

    lo = p.u_min[0] - u[0]
    hi = p.u_max[0] - u[0]
    bad = quuF <= 0.0
    q_safe = jnp.where(bad, jnp.ones_like(quuF), quuF)
    x1 = jnp.clip(-qu / q_safe, lo, hi)
    gk = quuF * x1 + qu
    clamped = jnp.logical_or(
        jnp.logical_and(x1 <= lo, gk > 0.0),
        jnp.logical_and(x1 >= hi, gk < 0.0),
    )
    k_i = jnp.where(bad, jnp.zeros_like(x1), x1)
    zero_K = jnp.logical_or(clamped, bad)
    Krow = [jnp.where(zero_K, jnp.zeros_like(qux[j]), -qux[j] / q_safe)
            for j in range(n)]

    div[0] = jnp.maximum(div[0], bad.astype(jnp.float32))
    dv[0] = dv[0] + k_i * qu
    dv[1] = dv[1] + 0.5 * k_i * quu * k_i

    kq = k_i * quu
    for j in range(n):
        vx[j] = qx[j] + Krow[j] * kq + Krow[j] * qu + qux[j] * k_i
    for i in range(n):
        for j in range(n):
            vxx[i, j] = (qxx[i][j] + Krow[i] * quu * Krow[j]
                         + Krow[i] * qux[j] + qux[i] * Krow[j])

    k_ref[0, 0] = k_i
    for j in range(n):
        K_ref[0, j, 0] = Krow[j]

    @pl.when(t == n_t - 1)
    def _():
        dv_ref[0, 0] = dv[0]
        dv_ref[1, 0] = dv[1]
        div_ref[0] = div[0]


def sweep_packed(model, integrator: str, packed_params, xs_p, us_p, lam_p,
                 mode: str = "jvp", eps: float = 1e-3,
                 interpret: bool = False):
    """Merged linearize+backward sweep in kernel layout.

    Shapes: xs_p (T+1, n, NB, S, L), us_p (T, 1, NB, S, L),
    lam_p (NB, S, L). Control limits come from the packed params
    (p.u_min/p.u_max). Returns packed (k (T,NB,S,L), K (T,n,NB,S,L),
    dv (2,NB,S,L), diverged (NB,S,L) f32 0/1).
    """
    params_p, treedef, shapes = packed_params
    T = us_p.shape[0]
    n = xs_p.shape[1]
    nb = xs_p.shape[2]
    P = params_p.shape[0]
    f32 = jnp.float32

    if params_p.ndim == 4:
        params_spec = pl.BlockSpec((P, 1, S, L), lambda b, t: (0, b, 0, 0),
                                   memory_space=pltpu.VMEM)
    else:
        params_spec = pl.BlockSpec((P, S, L), lambda b, t: (0, 0, 0),
                                   memory_space=pltpu.VMEM)
    specs_in = [
        params_spec,
        pl.BlockSpec((1, n, 1, S, L), lambda b, t: (T - 1 - t, 0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # x at T-1-t
        pl.BlockSpec((n, 1, S, L), lambda b, t: (0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # terminal x (xs row T)
        pl.BlockSpec((1, 1, 1, S, L), lambda b, t: (T - 1 - t, 0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # u at T-1-t
        pl.BlockSpec((1, S, L), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),  # lam
    ]
    specs_out = [
        pl.BlockSpec((1, 1, S, L), lambda b, t: (T - 1 - t, b, 0, 0),
                     memory_space=pltpu.VMEM),  # k
        pl.BlockSpec((1, n, 1, S, L), lambda b, t: (T - 1 - t, 0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # K
        pl.BlockSpec((2, 1, S, L), lambda b, t: (0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # dv
        pl.BlockSpec((1, S, L), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),  # diverged
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, nb, S, L), f32),
        jax.ShapeDtypeStruct((T, n, nb, S, L), f32),
        jax.ShapeDtypeStruct((2, nb, S, L), f32),
        jax.ShapeDtypeStruct((nb, S, L), f32),
    ]
    scratch = [
        pltpu.VMEM((n, S, L), f32),
        pltpu.VMEM((n, n, S, L), f32),
        pltpu.VMEM((2, S, L), f32),
        pltpu.VMEM((1, S, L), f32),
    ]
    return pl.pallas_call(
        functools.partial(_kernel, model, n, integrator, mode, float(eps),
                          treedef, shapes),
        grid=(nb, T),
        in_specs=specs_in,
        out_specs=specs_out,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(params_p, xs_p[:-1], xs_p[-1], us_p, lam_p)
