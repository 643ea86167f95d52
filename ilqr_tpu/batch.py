"""Batched solves: the parallelism story of this framework.

The reference solves exactly one problem per process (ref: src/run_ilqr.cpp);
its only parallelism attempt was OpenMP over the finite-difference time loop,
disabled for nondeterminism (ref: notes.md:12, derivatives.cpp:18-123).

Here the WHOLE solver is vmapped over problems (initial states, goals, limits
— anything in params), so one device runs thousands of independent iLQR solves
in lock-step: every matrix op in the backward scan and every rollout becomes a
large batched kernel that XLA maps onto the MXU/VPU. Multi-chip scaling shards
the batch axis over a mesh (see ilqr_tpu.parallel).
"""

from __future__ import annotations

import functools
import math
import threading

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.config import SolverConfig
from ilqr_tpu.models.base import Model
from ilqr_tpu.solver import solve
from ilqr_tpu.types import Solution

# --- The wide-m XLA:TPU worker fault and its containment ----------------
#
# Past the per-stage kernel envelope (m > ops/rollout.MAX_STAGE_KERNEL_M)
# the vmapped while_loop solve runs as a pure-XLA scan program — and the
# XLA:TPU backend reproducibly KILLS THE WORKER ("kernel fault") once a
# process has executed too much of that program family, while the same
# program is CPU-valid and the fault is QP-agnostic (iterative and
# pn_fixed both). Round-5 bisect (experiments/m12_bisect.py rows,
# BENCH_NOTES round 5, all m=12 T=80):
#
#   OK:    (B=256, 40 it) monolithic or 4-it-chunked; (B=512|1024, 4 it);
#          (B=256, 80 it) in 4-iteration chunks  ← the proven maximum
#   CRASH: (B=256, 80 it) monolithic; (B=512, >=20 it); (B=1024, 40 it)
#          monolithic, 4-it-chunked, AND as 4 sequential B=256 solves —
#          the fault ACCUMULATES ACROSS EXECUTIONS within one process.
#
# Containment (all three layers engaged automatically on this route):
#   1. SAFE_ITER_CHUNK-iteration executions (host loop, state on device)
#      — bit-exact, no slower, and raises the B=256 ceiling 40 → 80+.
#   2. Batch-chunking to MAX_WIDE_DISPATCH_B lanes per dispatch.
#   3. A per-process lane-iteration LEDGER: a solve whose worst case
#      would push the process past WIDE_M_LANE_ITER_BUDGET (the proven
#      envelope) raises upfront — BEFORE touching the device — telling
#      the caller to lower B/max_iter or split across processes (the
#      experiments/run_round5a.sh pattern). Override the budget at your
#      own risk via ILQR_TPU_WIDE_M_BUDGET (env) after probing further.
SAFE_ITER_CHUNK = 4
MAX_WIDE_DISPATCH_B = 256
WIDE_M_LANE_ITER_BUDGET = 256 * 80   # chunked_256_80, the proven max
_WIDE_M_LEDGER = {"lane_iters": 0}
# check+reserve must be atomic: a SolverService worker thread and a
# main-thread solve_batch_wide (or two services) in one process would
# otherwise both pass the check and jointly exceed the proven envelope
# the ledger exists to enforce
_WIDE_M_LOCK = threading.Lock()


def _wide_m_budget() -> int:
    import os

    return int(os.environ.get("ILQR_TPU_WIDE_M_BUDGET",
                              WIDE_M_LANE_ITER_BUDGET))


def solve_batch_wide(
    model: Model,
    params,
    cfg: SolverConfig,
    dt,
    x0,
    u0,
    params_batched: bool = False,
    iter_chunk: int = SAFE_ITER_CHUNK,
) -> Solution:
    """The contained dispatch for ``m > MAX_STAGE_KERNEL_M`` on TPU (see
    the fault writeup above): batch-chunked to
    :data:`MAX_WIDE_DISPATCH_B` lanes, iteration-chunked to
    :data:`SAFE_ITER_CHUNK`, and accounted against the per-process
    ledger. Bit-identical to ``solve_batch(..., iter_chunk=None)``.
    Raises upfront if the worst-case work would exceed the proven
    per-process envelope."""
    if u0.ndim == 2:
        u0 = jnp.broadcast_to(u0[None], (x0.shape[0],) + u0.shape)
    B = int(x0.shape[0])
    projected = B * int(cfg.max_iter)
    budget = _wide_m_budget()
    with _WIDE_M_LOCK:
        if _WIDE_M_LEDGER["lane_iters"] + projected > budget:
            raise ValueError(
                f"refusing a wide-m (m={model.m} > MAX_STAGE_KERNEL_M) "
                f"TPU vmap solve of B={B} x max_iter={cfg.max_iter} = "
                f"{projected} lane-iterations: this process has already "
                f"executed {_WIDE_M_LEDGER['lane_iters']} and the proven "
                f"per-process envelope is {budget} — beyond it the "
                "XLA:TPU worker reproducibly crashes (a backend fault, "
                "not a repo bug: the program is CPU-valid; BENCH_NOTES "
                "round 5, experiments/m12_bisect.py). Lower B or "
                "max_iter, split the work across processes (the "
                "experiments/run_round5a.sh chain pattern), use the "
                "fused path (m <= MAX_FUSED_M), or raise "
                "ILQR_TPU_WIDE_M_BUDGET after probing further.")
        _WIDE_M_LEDGER["lane_iters"] += projected
    sols = []
    for c in range(0, B, MAX_WIDE_DISPATCH_B):
        sl = slice(c, min(c + MAX_WIDE_DISPATCH_B, B))
        p = (jax.tree_util.tree_map(lambda a: a[sl], params)
             if params_batched else params)
        sols.append(solve_batch_chunked(
            model, p, cfg, dt, x0[sl], u0[sl],
            iter_chunk=int(iter_chunk), params_batched=params_batched))
    if len(sols) == 1:
        return sols[0]
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.concatenate(leaves, axis=0), *sols)


def solve_batch(
    model: Model,
    params,
    cfg: SolverConfig,
    dt,
    x0,           # (B, n)
    u0,           # (B, T, m) or (T, m) broadcast to the batch
    params_batched: bool = False,
    iter_chunk="auto",
) -> Solution:
    """vmap the full solver over a batch of problems.

    ``params_batched=True`` means every leaf of ``params`` carries a leading
    batch axis (e.g. per-problem goals); otherwise params are shared.

    ``iter_chunk``: ``"auto"`` (default) dispatches the solve in
    host-driven chunks of :data:`SAFE_ITER_CHUNK` iterations ON THE TPU
    VMAP PATH FOR ``m > MAX_STAGE_KERNEL_M`` — the region where one
    monolithic execution can crash the XLA:TPU worker (see
    :data:`SAFE_ITER_CHUNK`; chunking is bit-exact, the loop conditions
    compose). Pass an int to force a chunk size (inside the fault region
    the int still runs through the FULL containment — batch-chunking and
    the work ledger — since iteration-chunking alone is a proven crash
    at B=1024), or ``None`` to force the single-dispatch program (the
    explicit at-your-own-risk escape). ``"auto"``/int chunking requires
    an eager call (this function jits internally); under an outer
    ``jit`` trace the dangerous configuration raises instead of
    compiling a program that can kill the worker.
    """
    if u0.ndim == 2:
        u0 = jnp.broadcast_to(u0[None], (x0.shape[0],) + u0.shape)
    from ilqr_tpu.ops.rollout import MAX_STAGE_KERNEL_M

    in_fault_region = (jax.default_backend() == "tpu"
                       and model.m > MAX_STAGE_KERNEL_M)
    if iter_chunk == "auto":
        iter_chunk = SAFE_ITER_CHUNK if in_fault_region else None
    if iter_chunk is not None:
        if any(isinstance(a, jax.core.Tracer) for a in (x0, u0)):
            raise ValueError(
                f"m={model.m} > MAX_STAGE_KERNEL_M vmap solves on TPU "
                "must dispatch in iteration chunks (one monolithic "
                "execution can crash the TPU worker — BENCH_NOTES round "
                "5), which needs host control flow: call solve_batch "
                "eagerly (it jits internally) instead of wrapping it in "
                "jax.jit, or pass iter_chunk=None to force the "
                "single-dispatch program at your own risk")
        if in_fault_region:
            # inside the worker-fault region an explicit chunk size still
            # goes through the FULL containment (batch-chunking + the
            # work ledger) — iteration-chunking alone is a proven crash
            # at B=1024 (the bisect table above); iter_chunk=None remains
            # the explicit single-dispatch escape hatch
            return solve_batch_wide(model, params, cfg, dt, x0, u0,
                                    params_batched=params_batched,
                                    iter_chunk=int(iter_chunk))
        return solve_batch_chunked(
            model, params, cfg, dt, x0, u0,
            iter_chunk=int(iter_chunk),
            params_batched=params_batched)
    in_axes = (0 if params_batched else None, 0, 0)
    fn = lambda p, x, u: solve(model, p, cfg, dt, x, u)
    return jax.vmap(fn, in_axes=in_axes)(params, x0, u0)


@functools.lru_cache(maxsize=32)
def _get_chunked_fns(model, cfg, iter_chunk, params_batched):
    """jitted (init, step, finish) for the chunked dispatch, cached per
    static configuration (the jits then cache per input shape). The
    cache is BOUNDED: an experiments-style sweep over SolverConfig
    variants would otherwise pin one compiled-executable triple per
    distinct cfg for the process lifetime (host RSS grows per entry)."""
    from jax import lax

    from ilqr_tpu.solver import (
        _cast_params,
        _masked_iteration,
        _solution,
        init_state,
    )

    p_ax = 0 if params_batched else None

    def init(params, dt, x0, u0):
        return jax.vmap(
            lambda p, x, u: init_state(model, p, cfg, dt, x, u),
            in_axes=(p_ax, 0, 0))(params, x0, u0)

    def step(params, dt, state):
        def one(p, s):
            # solve() casts params to the problem dtype before iterating;
            # the chunked body must match (f64 leaves under x64 would
            # otherwise poison the f32 loop carries)
            p = _cast_params(p, s.us.dtype)
            stop_at = s.iteration + iter_chunk

            def cond(ss):
                return jnp.logical_and(
                    jnp.logical_and(~ss.done, ss.iteration < cfg.max_iter),
                    ss.iteration < stop_at)

            return lax.while_loop(
                cond,
                functools.partial(_masked_iteration, model, p, cfg, dt),
                s)

        new = jax.vmap(one, in_axes=(p_ax, 0))(params, state)
        all_done = jnp.all(
            jnp.logical_or(new.done, new.iteration >= cfg.max_iter))
        return new, all_done

    def finish(state):
        return jax.vmap(lambda s: _solution(s, cfg))(state)

    return jax.jit(init), jax.jit(step), jax.jit(finish)


def solve_batch_chunked(
    model: Model,
    params,
    cfg: SolverConfig,
    dt,
    x0,
    u0,
    *,
    iter_chunk: int = SAFE_ITER_CHUNK,
    params_batched: bool = False,
) -> Solution:
    """Batched solve dispatched in host-driven chunks of ``iter_chunk``
    iterations: the SolverState pytree stays on device between dispatches
    and each dispatch runs one bounded ``while_loop``, so results are
    BIT-IDENTICAL to the monolithic :func:`solve_batch` program (the
    masked iteration body is shared and the loop conditions compose).

    This is the safe TPU route for ``m > MAX_STAGE_KERNEL_M`` (see
    :data:`SAFE_ITER_CHUNK`) and also a progress-observable dispatch:
    each chunk returns an all-done flag, and the host loop exits early
    once every lane has converged (the reference's per-iteration host
    loop, ilqr_core.cpp:79-302, recovered at batch scale)."""
    if iter_chunk < 1:
        raise ValueError(f"iter_chunk must be >= 1, got {iter_chunk}")
    if u0.ndim == 2:
        u0 = jnp.broadcast_to(u0[None], (x0.shape[0],) + u0.shape)
    init_j, step_j, finish_j = _get_chunked_fns(
        model, cfg, int(iter_chunk), bool(params_batched))
    x0 = jnp.asarray(x0)
    u0 = jnp.asarray(u0, x0.dtype)
    dt = jnp.asarray(dt, x0.dtype)
    state = init_j(params, dt, x0, u0)
    for _ in range(math.ceil(cfg.max_iter / iter_chunk)):
        state, all_done = step_j(params, dt, state)
        if bool(np.asarray(all_done)):
            break
    return finish_j(state)


def make_batch_solver(model: Model, cfg: SolverConfig, params_batched=False):
    """jit-compiled batched solver."""
    return jax.jit(
        functools.partial(
            solve_batch, model, cfg=cfg, params_batched=params_batched
        )
    )


def convergence_stats(sol: Solution):
    """Batch-level convergence statistics (what the reference prints per-solve
    via SHOWPROGRESS, aggregated)."""
    return {
        "mean_cost": jnp.mean(sol.cost),
        "max_cost": jnp.max(sol.cost),
        "mean_iterations": jnp.mean(sol.iterations.astype(jnp.float32)),
        "converged_frac": jnp.mean((sol.reason != 4).astype(jnp.float32)),
        "mean_gnorm": jnp.mean(sol.gnorm),
    }
