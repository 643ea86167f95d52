"""Fused Pallas TPU kernel for the batched backward DDP recursion (m = 1).

Why: the XLA path expresses the backward sweep as ``vmap(lax.scan(step))`` —
correct, but each of the T sequential scan steps dispatches several small
fused kernels, so wall-clock is dominated by per-step overhead, not math
(the per-step matrices are 4×4). This kernel runs the WHOLE recursion for a
block of 1024 problems in one ``pallas_call``:

- the batch is laid out as the trailing (8, 128) = (sublane, lane) tile, so
  every scalar in the Riccati algebra becomes one full-width VPU op over
  1024 problems;
- the time axis is the (sequential, reversed) Pallas grid dimension, so
  per-step inputs (fx, cxx, …) stream HBM→VMEM double-buffered by the
  Pallas pipeline while V-carries live in VMEM scratch across grid steps;
- m = 1 lets the control-limited QP use its closed form
  clamp(−Qu/QuuF) (see ops/backward.py), so there are no inner loops at all.

Semantics match ops/backward.backward_pass (ref: src/ilqr_core.cpp:350-401)
with ``boxqp_mode='auto'``: Q-terms, λ-regularized QuuF, clamped closed-form
k, K zeroed on the clamped/diverged dim, dV accumulation, symmetric V
updates, latched divergence on QuuF ≤ 0.

The reference's whole backward pass for ONE problem takes ~0.2 s of its
0.5 s acrobot solve (golden/acrobot_log.txt); this kernel does 1024 problems
in roughly the HBM time of streaming their linearizations.

Layout (BB = padded batch = k·1024, S = 8, L = 128, NB = BB/1024):
  fx   (T, n, n, NB, S, L)    cx   (T, n, NB, S, L)   (terminal row passed
  fu   (T, n, NB, S, L)       cxx  (T, n, n, NB, S, L)  separately as cxT/cxxT)
  cu   (T, NB, S, L)          cxu  (T, n, NB, S, L)
  cuu  (T, NB, S, L)          lo/hi (T, NB, S, L)  = u_min−us / u_max−us
  lam  (NB, S, L)
Outputs: k (T, NB, S, L), K (T, n, NB, S, L), dv (2, NB, S, L),
  diverged (NB, S, L) float32 (0/1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 8
L = 128
BLOCK = S * L  # problems per grid block


def _kernel(n: int,
            fx_ref, fu_ref, cx_ref, cu_ref, cxx_ref, cxu_ref, cuu_ref,
            lo_ref, hi_ref, lam_ref, cxT_ref, cxxT_ref,
            k_ref, K_ref, dv_ref, div_ref,
            vx, vxx, dv, div):
    """One (b, t) grid step: timestep T-1-t of the recursion for block b."""
    t = pl.program_id(1)
    n_t = pl.num_programs(1)

    # --- initialize carries from the terminal cost at the first step
    @pl.when(t == 0)
    def _():
        for i in range(n):
            vx[i] = cxT_ref[i, 0]
            for j in range(n):
                vxx[i, j] = cxxT_ref[i, j, 0]
        dv[0] = jnp.zeros((S, L), jnp.float32)
        dv[1] = jnp.zeros((S, L), jnp.float32)
        div[0] = jnp.zeros((S, L), jnp.float32)

    lam = lam_ref[0]

    # --- Q-terms (ref ilqr_core.cpp:359-367), unrolled over n; every value
    # below is an (8, 128) tile = 1024 problems.
    fu = [fu_ref[0, i, 0] for i in range(n)]
    fuT_vxx = [None] * n  # (fuᵀ Vxx)[j]
    for j in range(n):
        acc = fu[0] * vxx[0, j]
        for i in range(1, n):
            acc = acc + fu[i] * vxx[i, j]
        fuT_vxx[j] = acc

    qu = cu_ref[0, 0]
    for i in range(n):
        qu = qu + fu[i] * vx[i]

    quu = cuu_ref[0, 0]
    for j in range(n):
        quu = quu + fuT_vxx[j] * fu[j]
    quuF = quu + lam

    fxc = [[fx_ref[0, i, j, 0] for j in range(n)] for i in range(n)]
    qux = [None] * n
    for j in range(n):
        acc = cxu_ref[0, j, 0]
        for i in range(n):
            acc = acc + fuT_vxx[i] * fxc[i][j]
        qux[j] = acc

    qx = [None] * n
    for j in range(n):
        acc = cx_ref[0, j, 0]
        for i in range(n):
            acc = acc + fxc[i][j] * vx[i]
        qx[j] = acc

    # qxx = cxx + fxᵀ (Vxx fx): w[k][j] = Σ_l Vxx[k,l]·fx[l,j]
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
            acc = cxx_ref[0, i, j, 0]
            for kk in range(n):
                acc = acc + fxc[kk][i] * w[kk][j]
            qxx[i][j] = acc

    # --- closed-form 1-D box QP (see ops/backward.py): k = clamp(−Qu/QuuF)
    lo = lo_ref[0, 0]
    hi = hi_ref[0, 0]
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

    # --- dV accumulation (ref :388-389)
    dv[0] = dv[0] + k_i * qu
    dv[1] = dv[1] + 0.5 * k_i * quu * k_i

    # --- V updates (ref :391-393); symmetric by construction
    kq = k_i * quu
    for j in range(n):
        vx[j] = qx[j] + Krow[j] * kq + Krow[j] * qu + qux[j] * k_i
    for i in range(n):
        for j in range(n):
            vxx[i, j] = (qxx[i][j] + Krow[i] * quu * Krow[j]
                         + Krow[i] * qux[j] + qux[i] * Krow[j])

    # --- write outputs for this timestep
    k_ref[0, 0] = k_i
    for j in range(n):
        K_ref[0, j, 0] = Krow[j]

    @pl.when(t == n_t - 1)
    def _():
        dv_ref[0, 0] = dv[0]
        dv_ref[1, 0] = dv[1]
        div_ref[0] = div[0]


def _pack_tail(x, nb):
    """(BB, T, ...) → (T, ..., NB, S, L): batch to trailing (8,128) tiles."""
    bb = x.shape[0]
    rest = x.shape[1:]
    # (BB, T, ...) -> (T, ..., BB) -> (T, ..., NB, S, L)
    perm = tuple(range(1, x.ndim)) + (0,)
    y = jnp.transpose(x, perm)
    return y.reshape(rest + (nb, S, L))


def _unpack_tail(y, bb):
    """(T, ..., NB, S, L) → (BB, T, ...)."""
    rest = y.shape[:-3]
    y = y.reshape(rest + (bb,))
    perm = (y.ndim - 1,) + tuple(range(y.ndim - 1))
    return jnp.transpose(y, perm)


def backward_sweep_packed(fx_p, fu_p, cx_p, cu_p, cxx_p, cxu_p, cuu_p,
                          lo_p, hi_p, lam_p, cxT_p, cxxT_p,
                          interpret: bool = False, vma_axes: tuple = ()):
    """Kernel-layout entry point (no relayout): inputs/outputs are packed
    (time-major, trailing (NB, S, L) problem tiles) — the layout the fused
    batch solver (ilqr_tpu/fused.py) keeps end-to-end.

    Shapes: fx_p (T,n,n,NB,S,L), fu_p/cx_p/cxu_p (T,n,NB,S,L),
    cu_p/cuu_p/lo_p/hi_p (T,NB,S,L), lam_p (NB,S,L), cxT_p (n,NB,S,L),
    cxxT_p (n,n,NB,S,L). Returns packed (k (T,NB,S,L), K (T,n,NB,S,L),
    dv (2,NB,S,L), diverged (NB,S,L) f32 0/1).
    """
    T, n, _n2, nb, _s, _l = fx_p.shape

    specs_in = [
        pl.BlockSpec((1, n, n, 1, S, L), lambda b, t: (T - 1 - t, 0, 0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # fx
        pl.BlockSpec((1, n, 1, S, L), lambda b, t: (T - 1 - t, 0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # fu
        pl.BlockSpec((1, n, 1, S, L), lambda b, t: (T - 1 - t, 0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # cx
        pl.BlockSpec((1, 1, S, L), lambda b, t: (T - 1 - t, b, 0, 0),
                     memory_space=pltpu.VMEM),  # cu
        pl.BlockSpec((1, n, n, 1, S, L), lambda b, t: (T - 1 - t, 0, 0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # cxx
        pl.BlockSpec((1, n, 1, S, L), lambda b, t: (T - 1 - t, 0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # cxu
        pl.BlockSpec((1, 1, S, L), lambda b, t: (T - 1 - t, b, 0, 0),
                     memory_space=pltpu.VMEM),  # cuu
        pl.BlockSpec((1, 1, S, L), lambda b, t: (T - 1 - t, b, 0, 0),
                     memory_space=pltpu.VMEM),  # lo
        pl.BlockSpec((1, 1, S, L), lambda b, t: (T - 1 - t, b, 0, 0),
                     memory_space=pltpu.VMEM),  # hi
        pl.BlockSpec((1, S, L), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),  # lam
        pl.BlockSpec((n, 1, S, L), lambda b, t: (0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # cxT
        pl.BlockSpec((n, n, 1, S, L), lambda b, t: (0, 0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # cxxT
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
    f32 = jnp.float32
    from ilqr_tpu.utils.vma import sds

    out_shape = [
        sds((T, nb, S, L), f32, vma_axes),
        sds((T, n, nb, S, L), f32, vma_axes),
        sds((2, nb, S, L), f32, vma_axes),
        sds((nb, S, L), f32, vma_axes),
    ]
    scratch = [
        pltpu.VMEM((n, S, L), f32),     # vx
        pltpu.VMEM((n, n, S, L), f32),  # vxx
        pltpu.VMEM((2, S, L), f32),     # dv accumulator
        pltpu.VMEM((1, S, L), f32),     # diverged latch
    ]
    return pl.pallas_call(
        functools.partial(_kernel, n),
        grid=(nb, T),
        in_specs=specs_in,
        out_specs=specs_out,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(fx_p, fu_p, cx_p, cu_p, cxx_p, cxu_p, cuu_p, lo_p, hi_p, lam_p,
      cxT_p, cxxT_p)


@functools.partial(jax.jit, static_argnames=("interpret", "vma_axes"))
def backward_sweep_batched(
    fx, fu, cx, cu, cxx, cxu, cuu, lo, hi, lam, interpret: bool = False,
    vma_axes: tuple = (),
):
    """Batched backward recursion via the fused kernel.

    Args (B = batch, T = horizon, n = state dims; m must be 1):
      fx (B,T,n,n), fu (B,T,n,1), cx (B,T+1,n), cu (B,T,1), cxx (B,T+1,n,n),
      cxu (B,T,n,1), cuu (B,T,1,1), lo/hi (B,T,1) = limits−us, lam (B,)
    Returns (k (B,T,1), K (B,T,1,n), dV (B,2), diverged (B,) bool).
    """
    B, T, n, m = fu.shape
    assert m == 1, "pallas backward kernel is specialized to m == 1"
    f32 = jnp.float32

    bb = ((B + BLOCK - 1) // BLOCK) * BLOCK
    nb = bb // BLOCK
    pad = bb - B

    def prep(x):
        x = x.astype(f32)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], f32)], axis=0
            )
        return x

    fx_p = _pack_tail(prep(fx), nb)                      # (T,n,n,NB,S,L)
    fu_p = _pack_tail(prep(fu[..., 0]), nb)              # (T,n,NB,S,L)
    cx_p = _pack_tail(prep(cx[:, :-1]), nb)              # (T,n,NB,S,L)
    cu_p = _pack_tail(prep(cu[..., 0]), nb)              # (T,NB,S,L)
    cxx_p = _pack_tail(prep(cxx[:, :-1]), nb)            # (T,n,n,NB,S,L)
    cxu_p = _pack_tail(prep(cxu[..., 0]), nb)            # (T,n,NB,S,L)
    cuu_p = _pack_tail(prep(cuu[..., 0, 0]), nb)         # (T,NB,S,L)
    lo_p = _pack_tail(prep(lo[..., 0]), nb)              # (T,NB,S,L)
    hi_p = _pack_tail(prep(hi[..., 0]), nb)              # (T,NB,S,L)
    # λ=1 on padded lanes keeps QuuF PD there (no spurious diverged flags).
    lam_p = _pack_tail(
        jnp.concatenate([lam.astype(f32), jnp.ones((pad,), f32)])[:, None],
        nb,
    )[0]                                                 # (NB,S,L)
    cxT_p = _pack_tail(prep(cx[:, -1]), nb)              # (n,NB,S,L)
    cxxT_p = _pack_tail(prep(cxx[:, -1]), nb)            # (n,n,NB,S,L)

    k_p, K_p, dv_p, div_p = backward_sweep_packed(
        fx_p, fu_p, cx_p, cu_p, cxx_p, cxu_p, cuu_p, lo_p, hi_p, lam_p,
        cxT_p, cxxT_p, interpret=interpret, vma_axes=vma_axes)

    k = _unpack_tail(k_p, bb)[:B][..., None]            # (B,T,1)
    K = _unpack_tail(K_p, bb)[:B][:, :, None, :]        # (B,T,1,n)
    dV = _unpack_tail(dv_p, bb)[:B]                     # (B,2)
    diverged = _unpack_tail(div_p, bb)[:B] > 0.5        # (B,)
    return k, K, dV, diverged


# ---------------------------------------------------------------------------
# custom_vmap integration: ``vmap(solve)`` transparently dispatches batched
# backward sweeps to the fused kernel (see ops/backward.backward_pass).
# ---------------------------------------------------------------------------

def _backward_m1_scan(fx, fu, cx, cu, cxx, cxu, cuu, lo, hi, lam,
                      vma_axes: tuple = ()):
    """Unbatched m=1 closed-form backward recursion as a lax.scan — the
    single-problem path of the custom_vmap pair (math identical to the
    kernel; see ops/backward.py for the reference-cited semantics)."""
    T = fu.shape[0]
    dtype = fu.dtype

    def step(carry, inp):
        vx, vxx, dv, diverged = carry
        fx_t, fu_t, cx_t, cu_t, cxx_t, cxu_t, cuu_t, lo_t, hi_t = inp
        fuT = fu_t.T
        qx = cx_t + fx_t.T @ vx
        qu = cu_t + fuT @ vx
        fuT_vxx = fuT @ vxx
        qxx = cxx_t + fx_t.T @ (vxx @ fx_t)
        qux = cxu_t.T + fuT_vxx @ fx_t
        quu = cuu_t + fuT_vxx @ fu_t
        quuF = quu + lam * jnp.eye(1, dtype=dtype)

        q11 = quuF[0, 0]
        g1 = qu[0]
        bad = q11 <= 0
        q_safe = jnp.where(bad, jnp.ones_like(q11), q11)
        x1 = jnp.clip(-g1 / q_safe, lo_t[0], hi_t[0])
        gk = q11 * x1 + g1
        clamped = jnp.logical_or(
            jnp.logical_and(x1 <= lo_t[0], gk > 0),
            jnp.logical_and(x1 >= hi_t[0], gk < 0),
        )
        k_i = jnp.where(bad, jnp.zeros_like(x1), x1)[None]
        k_mat = jnp.where(clamped | bad, jnp.zeros_like(qux), -qux / q_safe)

        dv = dv + jnp.stack([k_i @ qu, 0.5 * k_i @ (quu @ k_i)]).reshape(2)
        kT_quu = k_mat.T @ quu
        vx_new = qx + kT_quu @ k_i + k_mat.T @ qu + qux.T @ k_i
        vxx_new = qxx + kT_quu @ k_mat + k_mat.T @ qux + qux.T @ k_mat
        vxx_new = 0.5 * (vxx_new + vxx_new.T)
        return (vx_new, vxx_new, dv, diverged | bad), (k_i, k_mat)

    # constant-initialized carries must match the body's (batch-varying)
    # outputs under shard_map(check_vma=True) — utils/vma.py
    from ilqr_tpu.utils.vma import vary

    init = vary((cx[-1], cxx[-1], jnp.zeros((2,), dtype),
                 jnp.zeros((), bool)), vma_axes)
    inputs = (fx, fu, cx[:-1], cu, cxx[:-1], cxu, cuu, lo, hi)
    (_vx, _vxx, dv, diverged), (k, K) = lax.scan(
        step, init, inputs, reverse=True
    )
    return k, K, dv, diverged


def backward_m1(fx, fu, cx, cu, cxx, cxu, cuu, lo, hi, lam,
                vma_axes: tuple = ()):
    """m=1 closed-form backward sweep; batched calls run the Pallas kernel.

    The unbatched (single-problem) path ALSO uses the kernel on TPU with a
    B=1 batch — the kernel's 1024-lane block is mostly idle but completes
    in ~0.1 ms, ~100× faster than T scan dispatches; that latency is what
    bounds real-time MPC replanning. ``vma_axes`` (static) declares the
    shard_map manual axes for the kernel outputs (utils/vma.py)."""
    return _get_backward_m1_cv(tuple(vma_axes))(
        fx, fu, cx, cu, cxx, cxu, cuu, lo, hi, lam)


@functools.lru_cache(maxsize=None)
def _get_backward_m1_cv(vma_axes: tuple):
    @jax.custom_batching.custom_vmap
    def _bm1(fx, fu, cx, cu, cxx, cxu, cuu, lo, hi, lam):
        if jax.default_backend() == "tpu":
            k, K, dV, div = backward_sweep_batched(
                fx[None], fu[None], cx[None], cu[None], cxx[None],
                cxu[None], cuu[None], lo[None], hi[None],
                jnp.asarray(lam)[None], vma_axes=vma_axes,
            )
            return k[0], K[0], dV[0], div[0]
        return _backward_m1_scan(fx, fu, cx, cu, cxx, cxu, cuu, lo, hi,
                                 lam, vma_axes=vma_axes)

    @_bm1.def_vmap
    def _backward_m1_vmap(axis_size, in_batched, *args):
        full = []
        for batched, a in zip(in_batched, args):
            if not batched:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            full.append(a)
        # Off-TPU (backward_kernel="pallas" forced, e.g. in tests) the
        # kernel runs in interpreter mode; on TPU it compiles via Mosaic.
        from ilqr_tpu.ops.rollout import _interpret

        out = backward_sweep_batched(
            *full, interpret=_interpret(), vma_axes=vma_axes,
        )
        return out, (True, True, True, True)

    return _bm1
