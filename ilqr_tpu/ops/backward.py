"""Backward Riccati/DDP recursion as a ``lax.scan`` over the horizon.

Semantics match ref src/ilqr_core.cpp:350-401:
  Q-terms:   Qx, Qu, Qxx, Qux, Quu from the linearization and V_{t+1}
  QuuF = Quu + λI — control-space Levenberg-Marquardt regularization (:367;
             the reference notes Tassa's state-space Vxx+λI variant differs)
  k_t  from boxQP(QuuF, Qu) warm-started with the NEXT timestep's k (:369)
  K_t  = −Q_free⁻¹ Qux_reg on free rows only, via the boxQP's subspace
             Cholesky factor (:377-385)
  dV  += (kᵀQu, ½kᵀQuu k)  (:388-389)
  V updates with symmetrization (:391-393)

The recursion is inherently serial in t (V_t depends on V_{t+1}); throughput
comes from vmapping whole solves, not from parallelizing this scan.

Divergence: the reference returns the diverging timestep immediately, leaving
k/K partially overwritten, and the caller escalates λ and retries
(:371, :142-148). Here a latched ``diverged`` flag is carried through the scan
and the retry re-runs from the last *complete* state — the only observable
difference is the boxQP warm-start value on retry iterations, which affects
QP iteration counts, not solutions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ilqr_tpu.config import SolverConfig
from ilqr_tpu.ops.boxqp import boxqp, free_solve
from ilqr_tpu.types import BackwardResult, Derivs


def backward_pass(
    derivs: Derivs, us, lam, u_min, u_max, cfg: SolverConfig, prev_k_last
) -> BackwardResult:
    """One backward sweep. ``prev_k_last`` is the previous sweep's k[T-1],
    used to warm-start the first (t = T−1) boxQP exactly like the reference's
    in-place k[min(i+1, T-1)] (ilqr_core.cpp:369)."""
    T, m = us.shape
    dtype = us.dtype
    eye_m = jnp.eye(m, dtype=dtype)

    # Parallel-in-time modes: O(log T) associative scan instead of the
    # serial recursion (see ops/assoc_backward.py). "assoc" covers the
    # unconstrained case; "assoc_frozen" extends it to control limits via
    # frozen-active-set refinement sweeps.
    if (cfg.backward_mode == "assoc" and not cfg.use_control_limits) or (
            cfg.backward_mode == "assoc_frozen"):
        if cfg.full_ddp:
            raise ValueError(
                "full_ddp is incompatible with the assoc backward modes: "
                "the Vx·fxx terms make each step's Q-expansion depend on "
                "the carried Vx, which breaks the associative "
                "reformulation")
        from ilqr_tpu.ops.assoc_backward import (backward_pass_assoc,
                                                 backward_pass_assoc_frozen)

        if cfg.backward_mode == "assoc_frozen" and cfg.use_control_limits:
            return backward_pass_assoc_frozen(
                derivs, us, lam, u_min, u_max, cfg)
        return backward_pass_assoc(derivs, us, lam, cfg)

    # Fused-kernel dispatch: for m=1/f32 control-limited sweeps, route
    # through a custom_vmap function — unbatched solves run the lax.scan
    # below either way, but vmapped solves hit the Pallas TPU kernel
    # (ops/pallas_backward) instead of a vmapped scan. "auto" enables this
    # on the TPU backend only (the kernel needs Mosaic).
    use_fused = (
        cfg.use_control_limits
        and m == 1
        and not cfg.full_ddp  # kernel bodies are Gauss-Newton only
        and cfg.boxqp_mode == "auto"
        and cfg.backward_kernel != "xla"
        and dtype == jnp.float32
        and (cfg.backward_kernel == "pallas"
             or jax.default_backend() == "tpu")
    )
    if use_fused:
        from ilqr_tpu.ops.pallas_backward import backward_m1

        lo = u_min[None] - us
        hi = u_max[None] - us
        k, K, dV, diverged = backward_m1(
            derivs.fx, derivs.fu, derivs.cx, derivs.cu,
            derivs.cxx, derivs.cxu, derivs.cuu, lo, hi, lam,
            vma_axes=cfg.vma_axes,
        )
        return BackwardResult(k=k, K=K, dV=dV, diverged=diverged)

    def step(carry, inp):
        vx, vxx, k_next, dv, diverged = carry
        if cfg.full_ddp:
            fx, fu, cx, cu, cxx, cxu, cuu, u, fxx, fxu, fuu = inp
        else:
            fx, fu, cx, cu, cxx, cxu, cuu, u = inp

        fuT = fu.T
        qx = cx + fx.T @ vx
        qu = cu + fuT @ vx
        fuT_vxx = fuT @ vxx
        qxx = cxx + fx.T @ (vxx @ fx)
        qux = cxu.T + fuT_vxx @ fx  # == Qux_reg (ref :362,366 are identical)
        quu = cuu + fuT_vxx @ fu
        if cfg.full_ddp:
            # Full second-order expansion: contract V'_x (the carried vx is
            # V_{t+1} in this reverse scan) with the dynamics Hessians —
            # Tassa's full_DDP terms, absent from the reference.
            qxx = qxx + jnp.tensordot(vx, fxx, axes=(0, 0))
            qux = qux + jnp.tensordot(vx, fxu, axes=(0, 0)).T
            quu = quu + jnp.tensordot(vx, fuu, axes=(0, 0))
        quuF = quu + lam * eye_m

        if cfg.use_control_limits and m == 1 and cfg.boxqp_mode == "auto":
            # Closed form for the 1-D box QP: min ½qx² + gx on [lo, hi] has
            # the analytic solution clamp(−g/q); projected Newton (ref
            # src/boxqp.cpp) exists for the coupled multi-dim case and
            # degenerates to exactly this at m=1. One step, no inner loops —
            # the hot path for m=1 models (acrobot, pendulum, cartpole).
            lo = (u_min - u)[0]
            hi = (u_max - u)[0]
            q11 = quuF[0, 0]
            g1 = qu[0]
            div_here = q11 <= 0
            q_safe = jnp.where(div_here, jnp.ones_like(q11), q11)
            x1 = jnp.clip(-g1 / q_safe, lo, hi)
            gk = q11 * x1 + g1  # gradient at the clamped point
            clamped = jnp.logical_or(
                jnp.logical_and(x1 <= lo, gk > 0),
                jnp.logical_and(x1 >= hi, gk < 0),
            )
            k_i = jnp.where(div_here, jnp.zeros_like(x1), x1)[None]
            # K row zeroed on the clamped dim (ref :377-385 semantics).
            k_mat = jnp.where(
                clamped | div_here, jnp.zeros_like(qux), -qux / q_safe
            )
        elif cfg.use_control_limits and m <= 4 and cfg.boxqp_mode == "enum":
            # exact loop-free active-set enumeration (see ops/boxqp.py)
            from ilqr_tpu.ops.boxqp import boxqp_enum

            res = boxqp_enum(quuF, qu, u_min - u, u_max - u)
            k_i = res.x
            div_here = res.status < 1
            k_mat = -jax.vmap(
                lambda col: free_solve(res.chol_free, col, res.free)
            )(qux.T).T
        elif cfg.use_control_limits and cfg.boxqp_mode == "pn_fixed":
            # Fixed-shape projected Newton (any m, no data-dependent
            # while_loops — see ops/boxqp.boxqp_pn). EXPLICIT opt-in only:
            # round 4/5 measured it LOSING to the iterative boxQP below on
            # the vmap path in both throughput (3.8 vs 5.9 solves/s, m=4
            # B=256 TPU) and trace/compile time (25 s vs 192 s first-batch
            # at m=12 B=512 — the m+6 unrolled masked-Cholesky iterations
            # out-trace the while_loop), and it shares the B>=512 XLA:TPU
            # worker fault (QP-agnostic — BENCH_NOTES round 5). The scan
            # path is latency-bound, not loop-bound; loop-freeness buys
            # nothing here. pn_fixed remains the f64-friendly, trace-light
            # in-KERNEL recipe (ops/pallas_sweep._qp_pn) and the
            # vmappable any-m semantics reference.
            from ilqr_tpu.ops.boxqp import boxqp_pn

            res = boxqp_pn(quuF, qu, u_min - u, u_max - u)
            k_i = res.x
            div_here = res.status < 1
            k_mat = -jax.vmap(
                lambda col: free_solve(res.chol_free, col, res.free)
            )(qux.T).T
        elif cfg.use_control_limits:
            res = boxqp(quuF, qu, k_next, u_min - u, u_max - u, cfg.boxqp)
            k_i = res.x
            div_here = res.status < 1
            # Feedback gains on free rows via the padded subspace factor
            # (ref :377-385). free_solve zeroes clamped rows.
            k_mat = -jax.vmap(
                lambda col: free_solve(res.chol_free, col, res.free)
            )(qux.T).T
        else:
            from ilqr_tpu.ops.boxqp import (_cho_solve_small, _chol_small,
                                            _use_unrolled)

            rhs = jnp.concatenate([qu[:, None], qux], axis=1)
            if _use_unrolled(dtype, m):
                chol = _chol_small(quuF)
                div_here = jnp.any(jnp.isnan(chol))
                sol = jnp.swapaxes(
                    _cho_solve_small(chol, jnp.swapaxes(rhs, -1, -2)),
                    -1, -2)
            else:
                chol = jnp.linalg.cholesky(quuF)
                div_here = jnp.any(jnp.isnan(chol))
                sol = jax.scipy.linalg.cho_solve((chol, True), rhs)
            k_i = -sol[:, 0]
            k_mat = -sol[:, 1:]
            # NaN-poisoning guard so the retry loop sees clean numbers.
            k_i = jnp.where(div_here, jnp.zeros_like(k_i), k_i)
            k_mat = jnp.where(div_here, jnp.zeros_like(k_mat), k_mat)

        dv = dv + jnp.stack([k_i @ qu, 0.5 * k_i @ (quu @ k_i)])

        kT_quu = k_mat.T @ quu
        vx_new = qx + kT_quu @ k_i + k_mat.T @ qu + qux.T @ k_i
        vxx_new = qxx + kT_quu @ k_mat + k_mat.T @ qux + qux.T @ k_mat
        vxx_new = 0.5 * (vxx_new + vxx_new.T)

        carry = (vx_new, vxx_new, k_i, dv, diverged | div_here)
        return carry, (k_i, k_mat)

    from ilqr_tpu.utils.vma import vary

    init = vary((
        derivs.cx[-1],          # Vx[T] = cx[T]   (ref :353)
        derivs.cxx[-1],         # Vxx[T] = cxx[T] (ref :354)
        prev_k_last,
        jnp.zeros((2,), dtype),  # dV (ref :356)
        jnp.zeros((), bool),
    ), cfg.vma_axes)
    inputs = (
        derivs.fx, derivs.fu, derivs.cx[:-1], derivs.cu,
        derivs.cxx[:-1], derivs.cxu, derivs.cuu, us,
    )
    if cfg.full_ddp:
        inputs = inputs + (derivs.fxx, derivs.fxu, derivs.fuu)
    (_vx, _vxx, _k, dv, diverged), (k, K) = lax.scan(
        step, init, inputs, reverse=True
    )
    return BackwardResult(k=k, K=K, dV=dv, diverged=diverged)


def gradient_norm(k, us):
    """mean over t of max_j |k_tj| / (|u_tj| + 1) (ref ilqr_core.cpp:405-412,
    replicating MATLAB's g_norm = mean(max(abs(l)./(abs(u)+1)))."""
    return jnp.mean(jnp.max(jnp.abs(k) / (jnp.abs(us) + 1.0), axis=-1))
