"""The iLQR outer loop: derivatives → backward pass → line search → accept.

Functional re-design of ref src/ilqr_core.cpp:79-302. The reference drives the
loop with host control flow, in-place mutation, and λ/dλ in file-scope statics
shared across instances (include/ilqr.h:17-18). Here one iteration is a pure
``SolverState → SolverState`` function and the whole solve is a single
``lax.while_loop`` — so a complete solve is ONE XLA computation that can be
vmapped over thousands of problems and sharded over a TPU mesh.

Exact semantics preserved (each with its reference site):
- derivatives recomputed only when the trajectory changed (flgChange, :115-120)
- backward-pass divergence → λ escalation and retry; abandon at λ>λmax
  (:136-150)
- gradient-norm termination BEFORE the forward pass, requiring λ<1e-5
  (:153-159)
- the 11-α line search with z = dcost/expected acceptance (:184-226)
- accept: dλ = min(dλ/1.6, 1/1.6); λ ← λ·dλ·(λ>λmin) — note λ becomes exactly
  0 once it falls below λmin, and recovers to λmin on the next increase
  (:248-250)
- reject: dλ = max(dλ·1.6, 1.6); λ ← max(λ·dλ, λmin); stop at λ>λmax
  (:266-281)
- cost-improvement termination dcost < tolFun after accepting (:257-262)
- iteration cap (:285)
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax import lax

from ilqr_tpu.config import SolverConfig
from ilqr_tpu.models.base import Model
from ilqr_tpu.ops.backward import backward_pass, gradient_norm
from ilqr_tpu.ops.derivatives import compute_derivs
from ilqr_tpu.ops.rollout import line_search, open_loop_rollout, rollout
from ilqr_tpu.types import (
    BackwardResult,
    Derivs,
    Solution,
    SolverState,
    TerminationReason,
)


def _zeros_derivs(T, n, m, dtype, full_ddp=False) -> Derivs:
    return Derivs(
        fx=jnp.zeros((T, n, n), dtype),
        fu=jnp.zeros((T, n, m), dtype),
        cx=jnp.zeros((T + 1, n), dtype),
        cu=jnp.zeros((T, m), dtype),
        cxx=jnp.zeros((T + 1, n, n), dtype),
        cxu=jnp.zeros((T, n, m), dtype),
        cuu=jnp.zeros((T, m, m), dtype),
        fxx=jnp.zeros((T, n, n, n), dtype) if full_ddp else None,
        fxu=jnp.zeros((T, n, n, m), dtype) if full_ddp else None,
        fuu=jnp.zeros((T, n, m, m), dtype) if full_ddp else None,
    )


def _cast_params(params, dtype):
    """Cast floating params leaves to the solve dtype (which follows x0 —
    f64 for parity runs, f32 otherwise). Under jax_enable_x64
    default_params() builds f64 leaves, and mixing those with f32 problem
    data used to poison individual loop-carry fields to f64 (a while_loop
    carry dtype error deep in the first iteration)."""
    return jax.tree_util.tree_map(
        lambda a: (jnp.asarray(a, dtype)
                   if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                   else jnp.asarray(a)),
        params)


def init_state(
    model: Model,
    params,
    cfg: SolverConfig,
    dt,
    x0,
    u0,
    lam=None,
    dlam=None,
    warm_xs=None,
    warm_K=None,
) -> SolverState:
    """Initial rollout + state allocation (ref init_traj, ilqr_core.cpp:11-56).

    Fresh start: open-loop rollout of u0. Warm start (MPC): pass the previous
    solution's ``warm_xs``/``warm_K`` — the reference's warm-start overload
    re-rolls out with the old gains against the old trajectory
    (ilqr_core.cpp:65-76 → forward_pass with non-empty K, :316).
    """
    x0 = jnp.asarray(x0)
    u0 = jnp.asarray(u0, x0.dtype)
    dtype = x0.dtype
    T, m = u0.shape
    n = x0.shape[0]

    params = _cast_params(params, dtype)

    if warm_K is None:
        xs, us, cost = open_loop_rollout(model, params, cfg, dt, x0, u0)
    else:
        xs, us, cost = rollout(model, params, cfg, dt, x0, u0, warm_xs, warm_K)

    lam = jnp.asarray(cfg.lambda_init if lam is None else lam, dtype)
    dlam = jnp.asarray(cfg.dlambda_init if dlam is None else dlam, dtype)

    from ilqr_tpu.utils.vma import vary

    return vary(SolverState(
        xs=xs,
        us=us,
        cost=cost,
        lam=lam,
        dlam=dlam,
        k=jnp.zeros((T, m), dtype),
        K=jnp.zeros((T, m, n), dtype),
        derivs=_zeros_derivs(T, n, m, dtype, full_ddp=cfg.full_ddp),
        flg_change=jnp.ones((), bool),
        iteration=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        reason=jnp.asarray(TerminationReason.RUNNING, jnp.int32),
        gnorm=jnp.zeros((), dtype),
        dcost=jnp.zeros((), dtype),
        expected=jnp.zeros((), dtype),
        step_accepted=jnp.zeros((), bool),
    ), cfg.vma_axes)


def ilqr_iteration(
    model: Model, params, cfg: SolverConfig, dt, state: SolverState
) -> SolverState:
    """One outer iteration (STEPs 1-4 of ref generate_trajectory)."""
    dtype = state.xs.dtype
    T, m = state.us.shape
    n = state.xs.shape[1]
    lam_factor = jnp.asarray(cfg.lambda_factor, dtype)

    # ---- STEP 1: (re-)linearize if the trajectory changed (ref :115-120)
    derivs = lax.cond(
        state.flg_change,
        lambda: compute_derivs(model, params, cfg, dt, state.xs, state.us),
        lambda: state.derivs,
    )

    # ---- STEP 2: backward pass with λ-escalation retry (ref :136-150)
    def bp_cond(carry):
        lam, _dlam, _br, ok = carry
        return jnp.logical_and(~ok, lam <= cfg.lambda_max)

    def bp_body(carry):
        lam, dlam, _br, _ok = carry
        br = backward_pass(
            derivs, state.us, lam, params.u_min, params.u_max, cfg,
            prev_k_last=state.k[-1],
        )
        ok = ~br.diverged
        # Escalate λ only when this attempt diverged (ref :142-148).
        dlam_new = jnp.where(ok, dlam, jnp.maximum(dlam * lam_factor, lam_factor))
        lam_new = jnp.where(ok, lam, jnp.maximum(lam * dlam_new, cfg.lambda_min))
        return lam_new, dlam_new, br, ok

    from ilqr_tpu.utils.vma import vary

    br0 = BackwardResult(
        k=state.k, K=state.K, dV=jnp.zeros((2,), dtype),
        diverged=jnp.ones((), bool),
    )
    lam, dlam, br, back_ok = lax.while_loop(
        bp_cond, bp_body,
        vary((state.lam, state.dlam, br0, jnp.zeros((), bool)),
             cfg.vma_axes),
    )

    # ---- gradient-norm termination (ref :153-159); checked before the
    # forward pass, so xs/us/λ are left exactly as the backward pass did.
    gnorm = gradient_norm(br.k, state.us)
    grad_term = jnp.logical_and(
        back_ok,
        jnp.logical_and(gnorm < cfg.tol_grad, lam < cfg.lambda_grad_term),
    )

    # ---- STEP 3: batched line search (ref :184-226)
    ls = line_search(
        model, params, cfg, dt, state.xs[0], state.xs, state.us,
        br.k, br.K, br.dV, state.cost,
    )
    accepted = jnp.logical_and(back_ok, ls.accepted)
    take_step = jnp.logical_and(accepted, ~grad_term)

    # ---- STEP 4: accept/reject + λ schedule (ref :242-282)
    dlam_acc = jnp.minimum(dlam / lam_factor, 1.0 / lam_factor)
    lam_acc = lam * dlam_acc * (lam > cfg.lambda_min).astype(dtype)
    dlam_rej = jnp.maximum(dlam * lam_factor, lam_factor)
    lam_rej = jnp.maximum(lam * dlam_rej, cfg.lambda_min)

    sched_applies = ~grad_term
    lam_new = jnp.where(
        sched_applies, jnp.where(accepted, lam_acc, lam_rej), lam
    )
    dlam_new = jnp.where(
        sched_applies, jnp.where(accepted, dlam_acc, dlam_rej), dlam
    )

    xs_new = jnp.where(take_step, ls.xs, state.xs)
    us_new = jnp.where(take_step, ls.us, state.us)
    cost_new = jnp.where(take_step, ls.cost, state.cost)

    # ---- termination
    fun_term = jnp.logical_and(take_step, ls.dcost < cfg.tol_fun)
    lam_term = jnp.logical_and(
        ~grad_term, jnp.logical_and(~accepted, lam_new > cfg.lambda_max)
    )
    done = grad_term | fun_term | lam_term
    reason = jnp.where(
        grad_term,
        TerminationReason.GRAD_TOL,
        jnp.where(
            fun_term,
            TerminationReason.FUN_TOL,
            jnp.where(
                lam_term,
                TerminationReason.LAMBDA_MAX,
                TerminationReason.RUNNING,
            ),
        ),
    ).astype(jnp.int32)

    # Keep NaN out of the carried gains if the backward pass never succeeded.
    k_new = jnp.where(back_ok, br.k, state.k)
    K_new = jnp.where(back_ok, br.K, state.K)

    return SolverState(
        xs=xs_new,
        us=us_new,
        cost=cost_new,
        lam=lam_new,
        dlam=dlam_new,
        k=k_new,
        K=K_new,
        derivs=derivs,
        flg_change=take_step,
        iteration=state.iteration + 1,
        done=done,
        reason=reason,
        gnorm=gnorm,
        dcost=ls.dcost,
        expected=ls.expected,
        step_accepted=take_step,
    )


def _masked_iteration(model, params, cfg, dt, state: SolverState) -> SolverState:
    """Iteration body that freezes converged elements — required when the
    while_loop is vmapped (it then runs until ALL batch elements are done)."""
    new_state = ilqr_iteration(model, params, cfg, dt, state)
    return jax.tree_util.tree_map(
        lambda old, new: jnp.where(state.done, old, new), state, new_state
    )


def _solution(state: SolverState, cfg: SolverConfig) -> Solution:
    reason = jnp.where(
        state.done, state.reason, jnp.asarray(TerminationReason.MAX_ITER, jnp.int32)
    )
    return Solution(
        xs=state.xs,
        us=state.us,
        k=state.k,
        K=state.K,
        cost=state.cost,
        lam=state.lam,
        dlam=state.dlam,
        iterations=state.iteration,
        reason=reason,
        gnorm=state.gnorm,
    )


def solve(
    model: Model, params, cfg: SolverConfig, dt, x0, u0,
    lam=None, dlam=None,
) -> Solution:
    """Full solve as one XLA computation (ref generate_trajectory overload 3,
    ilqr_core.cpp:59-62). jit with static (model, cfg); vmap over
    (params, x0, u0) for batched solves."""
    params = _cast_params(params, jnp.asarray(x0).dtype)
    state = init_state(model, params, cfg, dt, x0, u0, lam=lam, dlam=dlam)

    def cond(s: SolverState):
        return jnp.logical_and(~s.done, s.iteration < cfg.max_iter)

    state = lax.while_loop(
        cond, functools.partial(_masked_iteration, model, params, cfg, dt), state
    )
    return _solution(state, cfg)


def solve_warm(
    model: Model, params, cfg: SolverConfig, dt, x0, prev: Solution
) -> Solution:
    """MPC warm start (ref generate_trajectory overload 2, ilqr_core.cpp:65-76):
    re-rollout the previous controls WITH the previous feedback gains from the
    new x0, and carry λ/dλ over explicitly (the reference does this implicitly
    through its static globals, include/ilqr.h:17-18 / notes.md:11)."""
    params = _cast_params(params, jnp.asarray(x0).dtype)
    state = init_state(
        model, params, cfg, dt, x0, prev.us,
        lam=prev.lam, dlam=prev.dlam, warm_xs=prev.xs, warm_K=prev.K,
    )

    def cond(s: SolverState):
        return jnp.logical_and(~s.done, s.iteration < cfg.max_iter)

    state = lax.while_loop(
        cond, functools.partial(_masked_iteration, model, params, cfg, dt), state
    )
    return _solution(state, cfg)


def make_solver(model: Model, cfg: SolverConfig):
    """jit-compiled solve with model/cfg closed over statically."""
    return jax.jit(functools.partial(solve, model, cfg=cfg))


def solve_verbose(
    model: Model, params, cfg: SolverConfig, dt, x0, u0,
) -> Solution:
    """Host-driven solve printing the reference's per-iteration table
    (ref SHOWPROGRESS output, ilqr_core.cpp:237-246). One jitted iteration
    per loop turn; used by the CLI, not the hot path."""
    import numpy as np

    params = _cast_params(params, jnp.asarray(x0).dtype)
    state = init_state(model, params, cfg, dt, x0, u0)
    print(f"Initial cost: {float(state.cost):.6g}")
    step = jax.jit(
        functools.partial(ilqr_iteration, model, params, cfg, dt)
    )
    print("iteration\tcost\t\treduction\texpect\t\tgrad\t\tlog10(lambda)")
    it = 0
    while not bool(state.done) and it < cfg.max_iter:
        state = step(state)
        it = int(state.iteration)
        lam = float(state.lam)
        loglam = np.log10(lam) if lam > 0 else -np.inf
        label = f"{float(state.cost):<12.6g}" if bool(state.step_accepted) else "NO STEP     "
        print(
            f"{it - 1:<12d}\t{label}\t{float(state.dcost):<12.3g}\t"
            f"{float(state.expected):<12.3g}\t{float(state.gnorm):<12.3g}\t"
            f"{loglam:<12.1f}"
        )
    reason = TerminationReason(int(_solution(state, cfg).reason))
    msgs = {
        TerminationReason.GRAD_TOL: "SUCCESS: gradient norm < tolGrad",
        TerminationReason.FUN_TOL: "SUCCESS: cost change < tolFun",
        TerminationReason.LAMBDA_MAX: "EXIT: lambda > lambdaMax",
        TerminationReason.MAX_ITER: "EXIT: Maximum iterations reached.",
    }
    print(f"\n{msgs.get(reason, str(reason))}\n")
    return _solution(state, cfg)
