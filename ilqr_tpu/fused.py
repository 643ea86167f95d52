"""Fully-fused batch solver: the whole iLQR loop in kernel layout.

The composable path (``vmap(solve)``) re-lays-out data around every kernel
call: solver state lives batch-major ``(B, T, …)`` while the kernels want
time-major with trailing ``(NB, 8, 128)`` problem tiles, and the pack/unpack
transposes move the batch to the minor-most axis — the slowest relayout
class on TPU — several times per iteration.

This module keeps ALL solver state in kernel layout end-to-end: the three
fused kernels (ops/pallas_derivs, ops/pallas_backward, ops/pallas_rollout)
chain directly on packed arrays, every per-problem scalar of the outer loop
(λ, cost, termination state) is an ``(NB, 8, 128)`` tile, and the only
relayouts are one pack of the inputs and one unpack of the Solution.

Semantics match ilqr_tpu.solver (same reference citations) with the batched
interpretations the vmapped path already has:
- derivatives are recomputed every iteration (a vmapped ``lax.cond`` on
  flg_change evaluates both branches anyway — identical results since
  re-linearizing an unchanged trajectory is idempotent);
- the λ-escalation retry loop and the outer loop run until every live lane
  finishes, with converged/padded lanes frozen by masking.

Requirements: m ≤ 24 with ``sweep_kernel="merged"`` (in-kernel QP: exact
3^m active-set enumeration for m ≤ 4, fixed-shape projected Newton with
masked unrolled Cholesky for 5 ≤ m ≤ 24, Newton when unconstrained; m == 1
also works with the split kernels), a model with SoA functions, f32. Both
control-limited (``boxqp_mode`` auto/enum) and unconstrained
(``use_control_limits=False``) problems are supported. Use
``vmap(solve)`` for anything else (m > 12 via boxqp_mode="pn_fixed",
f64 parity, iterative boxQP).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ilqr_tpu.config import SolverConfig
from ilqr_tpu.models.base import Model
from ilqr_tpu.ops.pallas_backward import backward_sweep_packed
from ilqr_tpu.ops.pallas_derivs import derivs_packed
from ilqr_tpu.ops.pallas_rollout import (
    BLOCK,
    L,
    S,
    pack_params,
    pack_params_batched,
    rollout_packed,
)
from ilqr_tpu.types import Solution, TerminationReason


class FusedState(NamedTuple):
    xs_body: jnp.ndarray   # (T, n, NB, S, L) — rows 0..T-1
    x_term: jnp.ndarray    # (n, NB, S, L)    — terminal state (row T)
    us: jnp.ndarray        # (T, 1, NB, S, L)
    cost: jnp.ndarray      # (NB, S, L)
    lam: jnp.ndarray       # (NB, S, L)
    dlam: jnp.ndarray      # (NB, S, L)
    k: jnp.ndarray         # (T, m, NB, S, L)
    K: jnp.ndarray         # (T, m, n, NB, S, L)
    iteration: jnp.ndarray  # (NB, S, L) int32
    done: jnp.ndarray       # (NB, S, L) bool
    reason: jnp.ndarray     # (NB, S, L) int32
    gnorm: jnp.ndarray      # (NB, S, L)
    dcost: jnp.ndarray      # (NB, S, L)
    expected: jnp.ndarray   # (NB, S, L)


def _pack_tail(x, nb):
    rest = x.shape[1:]
    perm = tuple(range(1, x.ndim)) + (0,)
    return jnp.transpose(x, perm).reshape(rest + (nb, S, L))


def _unpack_tail(y, bb):
    rest = y.shape[:-3]
    y = y.reshape(rest + (bb,))
    perm = (y.ndim - 1,) + tuple(range(y.ndim - 1))
    return jnp.transpose(y, perm)


def _use_iter_kernel(model: Model, cfg: SolverConfig, T: int,
                     n: int) -> bool:
    """Whether the whole-iteration kernel (ops/pallas_iter.py) runs this
    solve. "auto" requires the merged sweep and the VMEM gain scratch to
    fit; an explicit "merged" defers the fit check to the kernel wrapper
    (which raises with the actual numbers)."""
    if cfg.iter_kernel == "split":
        return False
    if cfg.sweep_kernel != "merged":
        if cfg.iter_kernel == "merged":
            raise ValueError(
                "iter_kernel='merged' requires sweep_kernel='merged' "
                "(the whole-iteration kernel embeds the merged "
                "linearize+backward sweep)")
        return False
    if cfg.iter_kernel == "merged":
        return True
    if model.m * n >= 32:
        # large models: the whole-iteration kernel's phase-0 body embeds
        # the ~20k-op sweep step per blocked timestep — auto prefers the
        # two-kernel path (compile-friendlier); explicit "merged" is
        # still honored above.
        return False
    from ilqr_tpu.ops.pallas_iter import iter_kernel_fits

    return iter_kernel_fits(T, model.m, n, cfg.iter_time_block)


def _merged_iteration(model, cfg, packed_params, interpret, x0_p, state,
                      frozen, live, alphas, kmode, factor):
    """STEPs 1-4 as ONE kernel per backward attempt (ops/pallas_iter.py):
    linearize+backward with the gains resident in VMEM, in-kernel gate
    computation, candidate sweep, selection and predicated state emission.
    λ-escalation retries (ref ilqr_core.cpp:136-150) re-run the kernel
    with ``live`` restricted to the failed lanes; passthrough lanes
    re-emit their state unchanged, so the retry loop is exact."""
    from ilqr_tpu.ops.pallas_iter import iteration_packed

    f32 = jnp.float32

    def run_iter(lam, live_f, xs_body, x_term, us, k_old, K_old):
        # cost_prev is per-lane invariant across retries (a retrying lane
        # never stepped), so state.cost is correct for every attempt.
        return iteration_packed(
            model, cfg.integrator, cfg.clamp_forward, packed_params,
            x0_p, xs_body, x_term, us, k_old, K_old, lam, state.cost,
            live_f, alphas, mode=kmode, eps=cfg.fd_eps,
            use_limits=cfg.use_control_limits, z_min=cfg.z_min,
            tol_grad=cfg.tol_grad, lambda_grad_term=cfg.lambda_grad_term,
            interpret=interpret, time_block=cfg.iter_time_block,
            vma_axes=cfg.vma_axes)

    # attempt 1, unrolled (the all-lanes-succeed fast path — see the
    # split-path comments below; retries are 0/100 on the benchmark
    # workload since the exactly-symmetric Vxx update).
    (xs1, us1, xf1, k1, K1, lsc1, asel1, acc1, dc1, ex1, div1,
     g1) = run_iter(state.lam, live.astype(f32), state.xs_body,
                    state.x_term, state.us, state.k, state.K)
    ok1 = frozen | (div1 < 0.5)
    failed1 = live & ~ok1
    dlam1 = jnp.where(failed1, jnp.maximum(state.dlam * factor, factor),
                      state.dlam)
    lam1 = jnp.where(failed1,
                     jnp.maximum(state.lam * dlam1, cfg.lambda_min),
                     state.lam)

    def cond(c):
        return jnp.any(~c[0] & (c[1] <= cfg.lambda_max))

    def body(c):
        (ok, lam, dlam, xs, xf, us, k, K, lsc, accf, dc, ex, g) = c
        retry = ~ok
        (xs, us, xf, k, K, lsc_n, _asel_n, acc_n, dc_n, ex_n, div_n,
         g_n) = run_iter(lam, retry.astype(f32), xs, xf, us, k, K)
        lsc = jnp.where(retry, lsc_n, lsc)
        accf = jnp.where(retry, acc_n, accf)
        dc = jnp.where(retry, dc_n, dc)
        ex = jnp.where(retry, ex_n, ex)
        g = jnp.where(retry, g_n, g)
        new_ok = div_n < 0.5
        failed = retry & ~new_ok
        dlam_n = jnp.where(failed, jnp.maximum(dlam * factor, factor),
                           dlam)
        lam_n = jnp.where(failed,
                          jnp.maximum(lam * dlam_n, cfg.lambda_min), lam)
        return (ok | (retry & new_ok), lam_n, dlam_n, xs, xf, us, k, K,
                lsc, accf, dc, ex, g)

    init = (ok1, lam1, dlam1, xs1, xf1, us1, k1, K1, lsc1, acc1, dc1,
            ex1, g1)
    (back_ok, lam, dlam, xs, xf, us, k, K, lsc, accf, dc, ex,
     g) = lax.while_loop(cond, body, init)
    return (lam, dlam, back_ok, g, xs, us, xf, k, K, lsc, accf, dc, ex)


def _iteration(model: Model, cfg: SolverConfig, packed_params,
               u_min, u_max, interpret, x0_p,
               state: FusedState) -> FusedState:
    T = state.us.shape[0]
    n = state.xs_body.shape[1]
    nb = state.xs_body.shape[2]
    f32 = jnp.float32
    factor = jnp.asarray(cfg.lambda_factor, f32)
    kmode = "jvp" if cfg.deriv_mode == "analytic" else "fd"

    # Lanes past their budget are frozen exactly like done lanes — needed
    # because the outer loop is unrolled in chunks of cfg.fused_unroll, so
    # up to U−1 sub-iterations can run past max_iter (masked, ref :285).
    frozen = state.done | (state.iteration >= cfg.max_iter)
    live = ~frozen
    alphas = jnp.asarray([float(a) for a in cfg.alphas], f32)

    if _use_iter_kernel(model, cfg, T, n):
        (lam, dlam, back_ok, gnorm, xs_body_new, us_new, xterm_new,
         k_new, K_new, ls_cost, acc_f, ls_dcost,
         ls_expected) = _merged_iteration(
            model, cfg, packed_params, interpret, x0_p, state, frozen,
            live, alphas, kmode, factor)
        # gradient-norm termination (ref :153-159) — identical to the
        # kernel's in-register gate, recomputed here for bookkeeping
        grad_term = (back_ok & (gnorm < cfg.tol_grad)
                     & (lam < cfg.lambda_grad_term))
        accepted = back_ok & (acc_f > 0.5)
        take_step = accepted & ~grad_term & live
        return _finish_iteration(
            cfg, state, frozen, lam, dlam, gnorm, grad_term, accepted,
            take_step, xs_body_new, us_new, xterm_new, k_new, K_new,
            ls_cost, ls_dcost, ls_expected, factor)

    # ---- STEPs 1+2 combined per backward attempt. "merged" re-derives
    # the linearization inside the backward kernel every attempt (no HBM
    # round-trip, ops/pallas_sweep.py); "split" materializes it once via
    # the derivative kernel (ref ilqr_core.cpp:115-120) and replays the
    # backward kernel on λ retries.
    if cfg.sweep_kernel == "merged":
        from ilqr_tpu.ops.pallas_sweep import sweep_packed

        def run_backward(lam):
            return sweep_packed(
                model, cfg.integrator, packed_params, state.xs_body,
                state.x_term, state.us, lam, mode=kmode, eps=cfg.fd_eps,
                interpret=interpret, use_limits=cfg.use_control_limits,
                time_block=cfg.sweep_time_block, vma_axes=cfg.vma_axes)
    else:
        xs_full = jnp.concatenate([state.xs_body, state.x_term[None]],
                                  axis=0)
        d = derivs_packed(model, cfg.integrator, packed_params,
                          xs_full, state.us, mode=kmode, eps=cfg.fd_eps,
                          interpret=interpret, vma_axes=cfg.vma_axes)
        fx_p, fu_p, cx_p, cu_p, cxx_p, cxu_p, cuu_p = d
        # split path is m == 1 only; u_min is the shared (1,) limit vector
        # or a per-lane (NB, S, L) tile from batched params
        u_lo = u_min[0] if u_min.ndim == 1 else u_min
        u_hi = u_max[0] if u_max.ndim == 1 else u_max
        lo_p = u_lo - state.us[:, 0]
        hi_p = u_hi - state.us[:, 0]

        def run_backward(lam):
            k1, K1, dv1, div1 = backward_sweep_packed(
                fx_p, fu_p[:, :, 0], cx_p[:-1], cu_p[:, 0], cxx_p[:-1],
                cxu_p[:, :, 0], cuu_p[:, 0, 0], lo_p, hi_p, lam,
                cx_p[-1], cxx_p[-1], interpret=interpret,
                vma_axes=cfg.vma_axes)
            k1 = k1[:, None]
            # gnorm for the split path (the merged kernel emits it as an
            # epilogue output; here it needs one jnp pass over packed k)
            g1 = jnp.mean(
                jnp.max(jnp.abs(k1) / (jnp.abs(state.us) + 1.0), axis=1),
                axis=0)
            return k1, K1[:, None], dv1, div1, g1

    # ---- STEP 2: backward with per-lane λ escalation (ref :136-150).
    # The first attempt is UNROLLED (no loop): on the axon backend every
    # while_loop iteration costs ~0.4 ms of sync overhead (see
    # BENCH_NOTES.md loop probes), and retries are rare — the retry
    # while_loop only executes behind a lax.cond when some live lane
    # actually diverged.
    def bp_cond(carry):
        lam, _dlam, _k, _K, _dV, _g, ok = carry
        return jnp.any(~ok & (lam <= cfg.lambda_max))

    def bp_body(carry):
        lam, dlam, k, K, dV, gnorm, ok = carry
        k_n, K_n, dV_n, div_n, g_n = run_backward(lam)
        retry = ~ok
        new_ok = div_n < 0.5
        k = jnp.where(retry[None, None], k_n, k)
        K = jnp.where(retry[None, None, None], K_n, K)
        dV = jnp.where(retry[None], dV_n, dV)
        gnorm = jnp.where(retry, g_n, gnorm)
        failed = retry & ~new_ok
        dlam_n = jnp.where(failed, jnp.maximum(dlam * factor, factor), dlam)
        lam_n = jnp.where(failed, jnp.maximum(lam * dlam_n, cfg.lambda_min),
                          lam)
        return lam_n, dlam_n, k, K, dV, gnorm, ok | (retry & new_ok)

    # attempt 1, unrolled (the all-lanes-succeed fast path). The raw
    # k/K/dV/gnorm go into the carry unmasked: frozen lanes' stale values
    # are never consumed — the epilogue kernel's keep/gate selects and the
    # lane_freeze below restore them — so no whole-array masking thunks
    # are spent here.
    k_n, K_n, dV_n, div_n, g_n = run_backward(state.lam)
    ok1 = frozen | (div_n < 0.5)
    failed1 = live & ~ok1
    dlam1 = jnp.where(failed1, jnp.maximum(state.dlam * factor, factor),
                      state.dlam)
    lam1 = jnp.where(failed1,
                     jnp.maximum(state.lam * dlam1, cfg.lambda_min),
                     state.lam)

    # dormant while_loop: its cond is False whenever every live lane's
    # first attempt succeeded (~60 µs when not taken — loop probes in
    # BENCH_NOTES.md). With the exactly-symmetric Vxx update in the sweep
    # kernel the first attempt fails 0/100 iterations on the benchmark
    # workload (experiments/backward_trigger.py — it was 70/100 when Vxx
    # drifted asymmetric), so this really is a rare-repair path now.
    init = (lam1, dlam1, k_n, K_n, dV_n, g_n, ok1)
    lam, dlam, k, K, dV, gnorm, back_ok = lax.while_loop(
        bp_cond, bp_body, init)

    # ---- gradient-norm termination (ref :153-159)
    grad_term = back_ok & (gnorm < cfg.tol_grad) & (lam < cfg.lambda_grad_term)

    # ---- STEP 3+4: line search + accept/keep state writes as ONE kernel
    # (ref :184-226, :242-255): grid (A+1, T) sweeps every α-candidate
    # cost-only into VMEM scratch, computes the first-accepted-α selection
    # in-register, and re-emits the POST-ACCEPT xs/us/k/K with predicated
    # writes — no candidate arrays, no selection glue, and none of the
    # whole-array select thunks the solver loop otherwise needs (each is
    # ~30-100 µs on the axon backend — see ops/pallas_rollout.
    # linesearch_packed and BENCH_NOTES.md).
    from ilqr_tpu.ops.pallas_rollout import linesearch_packed

    gate = (back_ok & ~grad_term & live).astype(f32)
    keep = (back_ok & live).astype(f32)
    (xs_body_new, us_new, xterm_new, k_new, K_new, ls_cost, _alpha_sel,
     acc_f, ls_dcost, ls_expected) = linesearch_packed(
        model, cfg.integrator, cfg.clamp_forward, packed_params,
        x0_p, state.us, state.xs_body, state.x_term, K, k, state.K,
        state.k, alphas, dV, state.cost, gate, keep,
        cfg.z_min, interpret=interpret, time_block=cfg.ls_time_block,
        vma_axes=cfg.vma_axes)

    accepted = back_ok & (acc_f > 0.5)
    take_step = accepted & ~grad_term & live
    return _finish_iteration(
        cfg, state, frozen, lam, dlam, gnorm, grad_term, accepted,
        take_step, xs_body_new, us_new, xterm_new, k_new, K_new,
        ls_cost, ls_dcost, ls_expected, factor)


def _finish_iteration(cfg, state, frozen, lam, dlam, gnorm, grad_term,
                      accepted, take_step, xs_body_new, us_new, xterm_new,
                      k_new, K_new, ls_cost, ls_dcost, ls_expected,
                      factor) -> FusedState:
    """Per-lane bookkeeping after the line search (small tiles, fused by
    XLA): cost/λ schedule, termination, and the lane-sized freeze selects
    (the kernels already froze xs/us via gate and k/K via keep)."""
    f32 = jnp.float32
    # ---- remaining per-lane bookkeeping (small tiles, fused by XLA)
    cost_new = jnp.where(take_step, ls_cost, state.cost)

    # λ schedule (ref :242-282)
    dlam_acc = jnp.minimum(dlam / factor, 1.0 / factor)
    lam_acc = lam * dlam_acc * (lam > cfg.lambda_min).astype(f32)
    dlam_rej = jnp.maximum(dlam * factor, factor)
    lam_rej = jnp.maximum(lam * dlam_rej, cfg.lambda_min)

    sched = ~grad_term
    lam_new = jnp.where(sched, jnp.where(accepted, lam_acc, lam_rej), lam)
    dlam_new = jnp.where(sched, jnp.where(accepted, dlam_acc, dlam_rej),
                         dlam)

    # ---- termination (refs :153-159, :257-262, :276-281)
    fun_term = take_step & (ls_dcost < cfg.tol_fun)
    lam_term = ~grad_term & ~accepted & (lam_new > cfg.lambda_max)
    done = grad_term | fun_term | lam_term
    reason = jnp.where(
        grad_term, TerminationReason.GRAD_TOL,
        jnp.where(fun_term, TerminationReason.FUN_TOL,
                  jnp.where(lam_term, TerminationReason.LAMBDA_MAX,
                            TerminationReason.RUNNING))).astype(jnp.int32)

    # The kernel already froze xs/us (gate) and k/K (keep) per lane; only
    # the lane-sized fields need the freeze select here.
    def lane_freeze(old, new):
        return jnp.where(frozen, old, new)

    return FusedState(
        xs_body=xs_body_new, x_term=xterm_new, us=us_new,
        k=k_new, K=K_new,
        cost=lane_freeze(state.cost, cost_new),
        lam=lane_freeze(state.lam, lam_new),
        dlam=lane_freeze(state.dlam, dlam_new),
        iteration=lane_freeze(state.iteration, state.iteration + 1),
        done=lane_freeze(state.done, done),
        reason=lane_freeze(state.reason, reason),
        gnorm=lane_freeze(state.gnorm, gnorm),
        dcost=lane_freeze(state.dcost, ls_dcost),
        expected=lane_freeze(state.expected, ls_expected),
    )


def fused_applicable(model: Model, cfg: SolverConfig) -> bool:
    """True iff ``solve_batch_fused``'s own guards would accept
    (model, cfg) — the single source of truth for callers (CLI, serve,
    bench) choosing between the fused and vmap paths. Mirrors the
    ValueError guards below; keep in sync."""
    from ilqr_tpu.ops.pallas_sweep import MAX_FUSED_M

    if model.m > MAX_FUSED_M or cfg.full_ddp or not model.has_soa:
        return False
    if model.m >= 2 and cfg.sweep_kernel != "merged":
        return False
    if not cfg.use_control_limits and cfg.sweep_kernel != "merged":
        return False
    if cfg.use_control_limits and cfg.boxqp_mode not in (
            "auto", "enum", "pn_fixed"):
        return False
    return True


def solve_batch_fused(
    model: Model, params, cfg: SolverConfig, dt, x0, u0,
    params_batched: bool = False, interpret=None,
) -> Solution:
    """Batched solve entirely in kernel layout (see module docstring).

    Args: x0 (B, n); u0 (T, m) shared or (B, T, m). With
    ``params_batched=True`` every params leaf carries a leading B axis
    (per-problem goals/masses/limits — each params scalar becomes one
    per-problem row of the kernel's resident tile). Requires m ≤ MAX_FUSED_M and a
    model with SoA functions. Returns a Solution with leading batch axis B.
    """
    from ilqr_tpu.ops.pallas_sweep import MAX_FUSED_M

    if model.m > MAX_FUSED_M:
        raise ValueError(f"solve_batch_fused requires m <= {MAX_FUSED_M}")
    if cfg.full_ddp:
        raise ValueError(
            "solve_batch_fused does not support full_ddp (the kernel "
            "bodies are Gauss-Newton only) — use vmap(solve)")
    if model.m >= 2 and cfg.sweep_kernel != "merged":
        raise ValueError("m >= 2 needs sweep_kernel='merged' (in-kernel "
                         "active-set-enumeration QP)")
    if not model.has_soa:
        raise ValueError("solve_batch_fused requires SoA model functions")
    if not cfg.use_control_limits and cfg.sweep_kernel != "merged":
        raise ValueError("use_control_limits=False needs "
                         "sweep_kernel='merged' (in-kernel Newton)")
    if cfg.use_control_limits and cfg.boxqp_mode not in (
            "auto", "enum", "pn_fixed"):
        raise ValueError(
            "solve_batch_fused requires boxqp_mode='auto'/'enum'/"
            "'pn_fixed' (the in-kernel QP is chosen by m: exact "
            "enumeration for m <= 4, projected Newton above)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    f32 = jnp.float32
    x0 = jnp.asarray(x0, f32)
    B, n = x0.shape
    u0 = jnp.asarray(u0, f32)
    if u0.ndim == 2:
        u0 = jnp.broadcast_to(u0[None], (B,) + u0.shape)
    T = u0.shape[1]

    bb = ((B + BLOCK - 1) // BLOCK) * BLOCK
    n_chunks = bb // BLOCK
    pad = bb - B

    def prep(x):
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], f32)], axis=0)
        return x

    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, f32), params)
    pad_flags = jnp.arange(bb) >= B

    # One 1024-problem block per solve pass. Larger batches loop over
    # blocks from the HOST, reusing one jitted single-block program:
    # measured on v5e, a multi-block grid runs ~2× slower per solve than
    # chained single-block solves, chunked while_loops stop early per
    # chunk, and (crucially on the axon backend) the program compiled is
    # always the same small one. Do NOT wrap solve_batch_fused itself in
    # jax.jit for B > 1024 — that would inline the host loop.
    if params_batched:
        # pad each leaf's batch axis; limits become per-problem tiles
        params = jax.tree_util.tree_map(prep, params)

        def chunk_args(c):
            pc = jax.tree_util.tree_map(
                lambda a: a.reshape((n_chunks, BLOCK) + a.shape[1:])[c],
                params)
            arr, treedef, shapes = pack_params_batched(pc, dt, 1)
            u_min = _pack_tail(pc.u_min[:, 0], 1)
            u_max = _pack_tail(pc.u_max[:, 0], 1)
            return arr, u_min, u_max, treedef, shapes
    else:
        arr0, treedef0, shapes0 = pack_params(params, dt)
        u_min0 = jnp.asarray(params.u_min, f32)
        u_max0 = jnp.asarray(params.u_max, f32)

        def chunk_args(c):
            return arr0, u_min0, u_max0, treedef0, shapes0

    arr, u_min, u_max, treedef, shapes = chunk_args(0)
    solve_block = _get_block_solver(
        model, cfg, interpret, T, n, treedef, shapes)
    if n_chunks == 1:
        sol = solve_block(arr, u_min, u_max, prep(x0), prep(u0), pad_flags)
    else:
        xc = prep(x0).reshape(n_chunks, BLOCK, n)
        uc = prep(u0).reshape(n_chunks, BLOCK, T, model.m)
        pflags = pad_flags.reshape(n_chunks, BLOCK)
        sols = []
        for c in range(n_chunks):
            arr, u_min, u_max, _td, _sh = chunk_args(c)
            sols.append(
                solve_block(arr, u_min, u_max, xc[c], uc[c], pflags[c]))
        sol = jax.tree_util.tree_map(
            lambda *leaves: jnp.concatenate(leaves, axis=0), *sols)
    return jax.tree_util.tree_map(lambda a: a[:B], sol)


def solve_batch_fused_warm(
    model: Model, params, cfg: SolverConfig, dt, x0, prev: Solution,
    interpret=None,
) -> Solution:
    """Warm-started fused batch solve (MPC re-plan for a whole fleet):
    re-rollout ``prev.us`` with ``prev.K`` against ``prev.xs`` from the new
    ``x0`` (ref generate_trajectory overload 2, ilqr_core.cpp:65-76) and
    carry λ/dλ per lane. Shared params; B ≤ 1024 per chunk like
    :func:`solve_batch_fused`."""
    from ilqr_tpu.ops.pallas_sweep import MAX_FUSED_M

    if model.m > MAX_FUSED_M or not model.has_soa:
        raise ValueError(
            f"fused warm start requires m <= {MAX_FUSED_M} and SoA model")
    if cfg.full_ddp:
        raise ValueError(
            "solve_batch_fused_warm does not support full_ddp — use "
            "vmap(solve_warm)")
    if model.m >= 2 and cfg.sweep_kernel != "merged":
        raise ValueError("m >= 2 warm start needs sweep_kernel='merged'")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    f32 = jnp.float32
    x0 = jnp.asarray(x0, f32)
    B, n = x0.shape
    T = prev.us.shape[1]

    bb = ((B + BLOCK - 1) // BLOCK) * BLOCK
    n_chunks = bb // BLOCK
    pad = bb - B

    def prep(x):
        x = jnp.asarray(x, f32)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], f32)], axis=0)
        return x

    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, f32), params)
    arr, treedef, shapes = pack_params(params, dt)
    u_min = jnp.asarray(params.u_min, f32)
    u_max = jnp.asarray(params.u_max, f32)
    pad_flags = jnp.arange(bb) >= B

    solve_block = _get_block_solver(
        model, cfg, interpret, T, n, treedef, shapes, warm=True)

    assert prev.us.shape[2] == model.m, "Solution/model control dims differ"

    def block(sl):
        return solve_block(
            arr, u_min, u_max, prep(x0)[sl], prep(prev.us)[sl],
            pad_flags[sl], prep(prev.xs)[sl], prep(prev.K)[sl],
            prep(prev.lam)[sl], prep(prev.dlam)[sl])

    if n_chunks == 1:
        sol = block(slice(None))
    else:
        sols = [block(slice(c * BLOCK, (c + 1) * BLOCK))
                for c in range(n_chunks)]
        sol = jax.tree_util.tree_map(
            lambda *leaves: jnp.concatenate(leaves, axis=0), *sols)
    return jax.tree_util.tree_map(lambda a: a[:B], sol)


@functools.lru_cache(maxsize=None)
def _get_block_solver(model, cfg, interpret, T, n, treedef, shapes,
                      warm: bool = False):
    """jitted single-block solver, cached per static configuration; only
    the packed params array, limits, and problem data are traced."""

    if warm:
        def run(params_arr, u_min, u_max, x0, u0, pad_flags,
                xs_ref, K_prev, lam0, dlam0):
            packed_params = (params_arr, treedef, shapes)
            return _solve_block(
                model, cfg, packed_params, u_min, u_max, interpret, T, n,
                (x0, u0, pad_flags),
                warm=(xs_ref, K_prev, lam0, dlam0))
    else:
        def run(params_arr, u_min, u_max, x0, u0, pad_flags):
            packed_params = (params_arr, treedef, shapes)
            return _solve_block(model, cfg, packed_params, u_min, u_max,
                                interpret, T, n, (x0, u0, pad_flags))

    return jax.jit(run)


def _solve_block(model, cfg, packed_params, u_min, u_max, interpret, T, n,
                 args, warm=None) -> Solution:
    """One 1024-problem block in kernel layout (nb == 1). ``warm``
    optionally carries (xs_ref (B,T+1,n), K (B,T,1,n), lam (B,), dlam (B,))
    from a previous Solution — the MPC warm start (ref ilqr_core.cpp:65-76:
    re-rollout the previous controls WITH the previous gains from the new
    x0, λ/dλ carried over explicitly)."""
    x0, u0, pad_flags = args
    f32 = jnp.float32
    nb = 1

    m = model.m
    x0_p = _pack_tail(x0, nb)                # (n, NB, S, L)
    us_p = _pack_tail(u0, nb)                # (T, m, NB, S, L)

    if warm is None:
        # initial open-loop rollout (ref init_traj, ilqr_core.cpp:11-56)
        K0 = jnp.zeros((T, m, n, nb, S, L), f32)
        ref0 = jnp.zeros((T, n, nb, S, L), f32)
        lam0 = jnp.full((nb, S, L), cfg.lambda_init, f32)
        dlam0 = jnp.full((nb, S, L), cfg.dlambda_init, f32)
    else:
        xs_ref, K_prev, lam_w, dlam_w = warm
        ref0 = _pack_tail(xs_ref[:, :T], nb)
        K0 = _pack_tail(K_prev, nb)
        lam0 = _pack_tail(lam_w, nb)
        dlam0 = _pack_tail(dlam_w, nb)

    xs_body, us_p, x_fin, cost = rollout_packed(
        model, cfg.integrator, cfg.clamp_forward, packed_params,
        x0_p, us_p, ref0, K0, interpret=interpret,
        vma_axes=cfg.vma_axes)

    # padded lanes start (and stay) done so they never drive the loops
    pad_mask = _pack_tail(pad_flags, nb)

    state = FusedState(
        xs_body=xs_body,
        x_term=x_fin,
        us=us_p,
        cost=cost,
        lam=lam0,
        dlam=dlam0,
        k=jnp.zeros((T, m, nb, S, L), f32),
        K=jnp.zeros((T, m, n, nb, S, L), f32),
        iteration=jnp.zeros((nb, S, L), jnp.int32),
        done=pad_mask,
        reason=jnp.zeros((nb, S, L), jnp.int32),
        gnorm=jnp.zeros((nb, S, L), f32),
        dcost=jnp.zeros((nb, S, L), f32),
        expected=jnp.zeros((nb, S, L), f32),
    )
    # Under shard_map(check_vma=True) the constant-initialized fields
    # (λ/dλ, gains, counters) must be promoted to batch-varying to match
    # the loop body's kernel outputs (utils/vma.py; no-op when unsharded).
    from ilqr_tpu.utils.vma import vary

    state = vary(state, cfg.vma_axes)

    step = functools.partial(_iteration, model, cfg, packed_params,
                             u_min, u_max, interpret, x0_p)

    def cond(s: FusedState):
        return jnp.any(~s.done & (s.iteration < cfg.max_iter))

    # U iterations per while_loop step: loop-sync overhead (~0.4 ms per
    # iteration on the axon backend, BENCH_NOTES.md) amortizes U×; lanes
    # finishing mid-chunk are frozen by _iteration, so any U is exact.
    # Interpret mode (tests, off-TPU) downgrades the DEFAULT to U=1 —
    # there is no loop-sync overhead to amortize and the U×-larger body
    # just multiplies compile time. An explicitly-set fused_unroll is
    # honored everywhere so tests can exercise the chunked path.
    from ilqr_tpu.config import SolverConfig as _SC

    default_u = _SC.__dataclass_fields__["fused_unroll"].default
    if interpret and cfg.fused_unroll == default_u:
        U = 1
    else:
        U = max(1, int(cfg.fused_unroll))

    def chunk(s: FusedState):
        for _ in range(U):
            s = step(s)
        return s

    state = lax.while_loop(cond, chunk, state)

    reason = jnp.where(
        state.done, state.reason,
        jnp.asarray(TerminationReason.MAX_ITER, jnp.int32))

    up = lambda a: _unpack_tail(a, BLOCK)
    xs_full = jnp.concatenate([state.xs_body, state.x_term[None]], axis=0)
    return Solution(
        xs=up(xs_full),                       # (B, T+1, n)
        us=up(state.us),                      # (B, T, m)
        k=up(state.k),                        # (B, T, m)
        K=up(state.K),                        # (B, T, m, n)
        cost=up(state.cost),
        lam=up(state.lam),
        dlam=up(state.dlam),
        iterations=up(state.iteration),
        reason=up(reason),
        gnorm=up(state.gnorm),
    )
