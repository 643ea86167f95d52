"""Whole-iteration Pallas kernel: backward sweep + line search in ONE call.

The fused solver's iteration was two kernels — the merged linearize+backward
sweep (ops/pallas_sweep.py) and the line-search/epilogue kernel
(ops/pallas_rollout.linesearch_packed) — connected through an HBM round-trip
of the gains: the sweep writes k (T,m,·) and K (T,m,n,·) to HBM, the
line-search kernel streams them back twice (candidate sweep + emit phase).
At the flagship shapes (T=499, m=1, n=4, 1024-problem block) that is ~10 MB
written + ~20 MB re-read per solver iteration, plus a second kernel launch
(~100 µs of dispatch + grid machinery on the axon backend — BENCH_NOTES.md).

This kernel runs the ENTIRE iteration in one ``pallas_call`` with grid
(3, NT) — three sequential phases over time blocks:

  phase 0 (backward, reverse time): the merged linearize+backward sweep
    (same math as ops/pallas_sweep — it reuses ``_sweep_step``), except the
    gains are stored to a VMEM scratch buffer covering ALL T timesteps
    (~10 MB at the flagship shapes, within the ~16 MB VMEM budget) instead
    of HBM outputs. At the end of the phase the take/keep gates are computed
    in-register from the sweep's own diverged flag and gradient norm (ref
    src/ilqr_core.cpp:153-159 gradient termination).
  phase 1 (candidate sweep, forward time): every line-search α-candidate
    advanced simultaneously (ref :184-226), reading k/K straight from the
    VMEM scratch — zero HBM traffic for the gains.
  phase 2 (select + emit, forward time): first-accepted-α selection
    (z = dcost/expected vs z_min, ref :199-213), then the post-accept state
    re-emitted with predicated writes: stepping lanes get the new
    trajectory, everyone else re-emits the current one; gains keep the new
    backward result only on keep lanes (ref :242-255 semantics, identical
    to linesearch_packed).

λ-escalation retries re-run the whole kernel with ``live`` restricted to the
failed lanes (the solver's dormant repair loop); with the exactly-symmetric
Vxx update the first attempt fails 0/100 iterations on the benchmark
workload, so the extra line-search phases in a retry are a non-issue.

The VMEM gain buffer bounds applicability: ``iter_scratch_bytes`` estimates
the footprint and the fused solver falls back to the two-kernel path when it
doesn't fit (e.g. long-horizon m=2/m=3 problems).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilqr_tpu.ops.pallas_rollout import _integrate, unpack_params
from ilqr_tpu.ops.pallas_sweep import (
    _model_closures,
    _sweep_step,
    _terminal_init,
)

S = 8
L = 128

# VMEM budget for the resident k/K gain scratch. The v5e core has ~16 MB of
# VMEM; the kernel also needs the pipeline's streamed in/out buffers
# (~2.5 MB at TB=16 for m=1/n=4) and the candidate-state scratch, so the
# gain buffer is capped below the full capacity.
_SCRATCH_BUDGET_BYTES = 11 * 1024 * 1024


def iter_scratch_bytes(T: int, m: int, n: int, time_block: int) -> int:
    """Bytes of VMEM scratch the whole-iteration kernel needs for the
    T-resident gain buffers (k + K) at the given time blocking."""
    TB = max(1, min(int(time_block), T))
    nt = (T + TB - 1) // TB
    t_pad = nt * TB
    tiles = t_pad * m * (1 + n)
    return tiles * S * L * 4


def iter_kernel_fits(T: int, m: int, n: int, time_block: int) -> bool:
    return iter_scratch_bytes(T, m, n, time_block) <= _SCRATCH_BUDGET_BYTES


def _iter_kernel(model, n, m, A, T, TB, NT, integrator, mode, eps,
                 use_limits, clamp, z_min, tol_grad, lam_grad_term,
                 treedef, shapes,
                 params_ref, x0_ref, xs_ref, xterm_ref, us_ref,
                 Kold_ref, kold_ref, alpha_ref, lam_ref, cprev_ref,
                 live_ref,
                 xs_out, us_out, xfin_out, kout_ref, Kout_ref,
                 lscost_out, alpha_out, acc_out, dcost_out, exp_out,
                 div_out, gnorm_out,
                 k_scr, K_scr, vx, vxx, dv, divs, gacc, x_scr, cand_scr,
                 sel_scr):
    b = pl.program_id(0)     # 0 backward | 1 candidate sweep | 2 select+emit
    t = pl.program_id(1)     # time-block index within the phase
    f32 = jnp.float32
    p, dt = unpack_params(params_ref, treedef, shapes)
    step_fn, cost_fn, final_fn, make_dops, use_analytic = _model_closures(
        model, n, m, integrator, mode, eps, p, dt)

    # candidate/final rollout states reset at the start of every phase
    # (only phases 1 and 2 read them; the extra reset in phase 0 is free)
    @pl.when(t == 0)
    def _():
        for a in range(A + 1):
            for i in range(n):
                x_scr[a, i] = x0_ref[i, 0]

    # ---- phase 0: merged linearize+backward sweep, reverse time order,
    # gains stored to the T-resident VMEM scratch (ops/pallas_sweep math).
    @pl.when(b == 0)
    def _():
        rb = NT - 1 - t      # array time-block processed at this step

        @pl.when(t == 0)
        def _():
            _terminal_init(model, n, m, use_analytic, make_dops, final_fn,
                           p, xterm_ref, vx, vxx, dv, divs, gacc)
            for a in range(A):
                cand_scr[a] = jnp.zeros((S, L), f32)

        for _j in reversed(range(TB)):
            row = rb * TB + _j
            valid = row < T
            x = jnp.stack([xs_ref[_j, i, 0] for i in range(n)])
            u = jnp.stack([us_ref[_j, j, 0] for j in range(m)])
            if not use_analytic:
                ei, d1, d2 = make_dops(x, u)

            def store_kK(jj, k_i, Krow, _row=row):
                for jm in range(m):
                    k_scr[_row, jm] = k_i[jm]
                    for i in range(n):
                        K_scr[_row, jm, i] = Krow[jm][i]

            _sweep_step(model, n, m, mode, use_analytic, use_limits, p, dt,
                        lam_ref, vx, vxx, dv, divs, gacc, store_kK,
                        _j, valid, x, u,
                        None if use_analytic else (ei, d1, d2, step_fn,
                                                   cost_fn))

        # end of the backward phase: emit div/gnorm and compute the
        # take/keep gates in-register (fused.py previously computed these
        # host-side between the two kernels). Masks are f32 0/1 carriers
        # (Mosaic rejects selects over boolean values).
        @pl.when(t == NT - 1)
        def _():
            g = gacc[0] * (1.0 / T)
            div_out[0] = divs[0]
            gnorm_out[0] = g
            okf = 1.0 - divs[0]
            gtf = (okf * (g < tol_grad).astype(f32)
                   * (lam_ref[0] < lam_grad_term).astype(f32))
            live = live_ref[0]
            sel_scr[2] = okf * (1.0 - gtf) * live   # gate (take-step)
            sel_scr[3] = okf * live                 # keep (gain-keep)

    def rollout_step(x, u_row, xsr_row, K_row, k_row, alpha, valid):
        """One masked timestep: u from the closed-loop law, cost, step."""
        u = []
        for jm in range(m):
            acc = u_row[jm] + alpha * k_row[jm]
            for i in range(n):
                acc = acc + K_row[jm][i] * (x[i] - xsr_row[i])
            if clamp:
                acc = jnp.clip(acc, p.u_min[jm], p.u_max[jm])
            u.append(acc)
        xv = jnp.stack(x)
        uv = jnp.stack(u)
        c = jnp.where(valid, model.cost_soa(p, xv, uv),
                      jnp.zeros((S, L), f32))
        xn = _integrate(model, integrator, p, xv, uv, dt)
        x_next = [jnp.where(valid, xn[i], x[i]) for i in range(n)]
        return u, c, x_next

    # ---- phase 1: every α-candidate advanced simultaneously, k/K read
    # straight from the VMEM gain scratch (zero HBM traffic for the gains).
    @pl.when(b == 1)
    def _():
        xa = [[x_scr[a, i] for i in range(n)] for a in range(A)]
        ca = [cand_scr[a] for a in range(A)]
        for j in range(TB):
            row = t * TB + j
            valid = row < T
            u_row = [us_ref[j, jm, 0] for jm in range(m)]
            xsr_row = [xs_ref[j, i, 0] for i in range(n)]
            K_row = [[K_scr[row, jm, i] for i in range(n)]
                     for jm in range(m)]
            k_row = [k_scr[row, jm] for jm in range(m)]
            for a in range(A):
                aa = alpha_ref[a, 0]
                _u, c, xa[a] = rollout_step(
                    xa[a], u_row, xsr_row, K_row, k_row, aa, valid)
                ca[a] = ca[a] + c
        for a in range(A):
            cand_scr[a] = ca[a]
            for i in range(n):
                x_scr[a, i] = xa[a][i]

        @pl.when(t == NT - 1)
        def _():
            for a in range(A):
                xTa = jnp.stack([x_scr[a, i] for i in range(n)])
                cand_scr[a] = cand_scr[a] + model.final_cost_soa(p, xTa)

    # ---- phase 2 start: first-accepted-α selection over the candidate
    # totals (ref ilqr_core.cpp:199-213 z-ratio acceptance), gated by the
    # in-kernel take mask from the backward phase.
    @pl.when((b == 2) & (t == 0))
    def _():
        cprev = cprev_ref[0]
        dv0 = dv[0]
        dv1 = dv[1]
        one = jnp.ones((S, L), f32)
        a0 = alpha_ref[0, 0]
        chosen = jnp.zeros((S, L), f32)
        asel = one * a0
        lsc = cand_scr[0]
        ldc = cprev - cand_scr[0]
        lexp = -a0 * (dv0 + a0 * dv1)
        accepted = jnp.zeros((S, L), f32)
        for a in range(A):
            aa = alpha_ref[a, 0]
            dcost = cprev - cand_scr[a]
            expected = -aa * (dv0 + aa * dv1)
            z = jnp.where(expected > 0.0, dcost / expected,
                          jnp.sign(dcost))
            acc_a = z > z_min
            take = acc_a & (chosen < 0.5)
            asel = jnp.where(take, one * aa, asel)
            lsc = jnp.where(take, cand_scr[a], lsc)
            ldc = jnp.where(take, dcost, ldc)
            lexp = jnp.where(take, expected, lexp)
            chosen = jnp.where(acc_a, one, chosen)
            accepted = jnp.maximum(accepted, acc_a.astype(f32))
        sel_scr[0] = asel
        sel_scr[1] = accepted * sel_scr[2]
        lscost_out[0] = lsc
        alpha_out[0] = asel
        acc_out[0] = accepted
        dcost_out[0] = ldc
        exp_out[0] = lexp

    # ---- phase 2: roll out the per-lane selected α with predicated
    # state writes (identical to linesearch_packed's final phase, with the
    # gains read from scratch and the gates from the backward phase).
    @pl.when(b == 2)
    def _():
        take = sel_scr[1] > 0.5
        keepm = sel_scr[3] > 0.5
        alpha = sel_scr[0]
        x = [x_scr[A, i] for i in range(n)]
        for j in range(TB):
            row = t * TB + j
            valid = row < T
            u_row = [us_ref[j, jm, 0] for jm in range(m)]
            xsr_row = [xs_ref[j, i, 0] for i in range(n)]
            K_row = [[K_scr[row, jm, i] for i in range(n)]
                     for jm in range(m)]
            k_row = [k_scr[row, jm] for jm in range(m)]
            for i in range(n):
                xs_out[j, i, 0] = jnp.where(take, x[i], xsr_row[i])
            u, _c, x = rollout_step(
                x, u_row, xsr_row, K_row, k_row, alpha, valid)
            for jm in range(m):
                us_out[j, jm, 0] = jnp.where(take, u[jm], u_row[jm])
                kout_ref[j, jm, 0] = jnp.where(keepm, k_row[jm],
                                               kold_ref[j, jm, 0])
                for i in range(n):
                    Kout_ref[j, jm, i, 0] = jnp.where(
                        keepm, K_row[jm][i], Kold_ref[j, jm, i, 0])
        for i in range(n):
            x_scr[A, i] = x[i]

        @pl.when(t == NT - 1)
        def _():
            for i in range(n):
                xfin_out[i, 0] = jnp.where(take, x_scr[A, i],
                                           xterm_ref[i, 0])


def iteration_packed(model, integrator: str, clamp: bool, packed_params,
                     x0_p, xs_body_p, xterm_p, us_p, kold_p, Kold_p,
                     lam_p, cost_prev, live_p, alphas,
                     mode: str = "jvp", eps: float = 1e-3,
                     use_limits: bool = True, z_min: float = 0.0,
                     tol_grad: float = 1e-6,
                     lambda_grad_term: float = 1e-5,
                     interpret: bool = False, time_block: int = 16,
                     vma_axes: tuple = ()):
    """One full solver iteration (backward sweep + line search + epilogue)
    as a single Pallas call — see the module docstring.

    Single problem-block layout (NB == 1 — the fused solver's chunking).
    Shapes: x0_p (n,1,S,L), xs_body_p (T,n,1,S,L), xterm_p (n,1,S,L),
    us_p (T,m,1,S,L), kold_p (T,m,1,S,L), Kold_p (T,m,n,1,S,L),
    alphas (A,); lam_p, cost_prev, live_p (1,S,L) with the live mask as
    f32 0/1 (lanes with live == 0 pass their state through unchanged).

    Returns (xs_body, us, x_final, k_keep, K_keep, ls_cost, alpha_sel,
    accepted (f32 0/1, raw z-test), dcost, expected, diverged (f32 0/1),
    gnorm).
    """
    params_p, treedef, shapes = packed_params
    T, m, nb = us_p.shape[0], us_p.shape[1], us_p.shape[2]
    n = x0_p.shape[0]
    assert nb == 1, "iteration_packed is single-block (NB == 1)"
    A = int(alphas.shape[0])
    P = params_p.shape[0]
    f32 = jnp.float32
    TB = max(1, min(int(time_block), T))
    if m * n >= 32:
        # large models: phase 0 embeds the ~20k-op sweep step per blocked
        # timestep — keep the unrolled body compile-friendly (matching cap
        # in ops/pallas_sweep.sweep_packed; fused.py's auto mode prefers
        # the two-kernel path entirely for these models)
        TB = min(TB, 2)
    NT = (T + TB - 1) // TB
    t_pad = NT * TB          # gain scratch rows (edge rows masked)

    need = iter_scratch_bytes(T, m, n, TB)
    if need > _SCRATCH_BUDGET_BYTES:
        raise ValueError(
            f"whole-iteration kernel needs {need / 2**20:.1f} MB of VMEM "
            f"gain scratch at T={T}, m={m}, n={n} (budget "
            f"{_SCRATCH_BUDGET_BYTES / 2**20:.1f} MB) — use the two-kernel "
            "path (iter_kernel='split')")

    if params_p.ndim == 4:
        params_spec = pl.BlockSpec((P, 1, S, L), lambda b, t: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
    else:
        params_spec = pl.BlockSpec((P, S, L), lambda b, t: (0, 0, 0),
                                   memory_space=pltpu.VMEM)

    def traj_row(b, t):
        # phase 0 walks the trajectory backwards, phases 1/2 forwards
        return jnp.where(b == 0, NT - 1 - t, t)

    def emit_row(b, t):
        # rows streamed only by the emit phase; pinned elsewhere so no DMA
        # traffic is spent on them during the backward/candidate phases
        return jnp.where(b == 2, t, 0)

    lane_in = pl.BlockSpec((1, S, L), lambda b, t: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    specs_in = [
        params_spec,
        pl.BlockSpec((n, 1, S, L), lambda b, t: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # x0
        pl.BlockSpec((TB, n, 1, S, L),
                     lambda b, t: (traj_row(b, t), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # xs (current trajectory)
        pl.BlockSpec((n, 1, S, L), lambda b, t: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # current terminal state
        pl.BlockSpec((TB, m, 1, S, L),
                     lambda b, t: (traj_row(b, t), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # us (current controls)
        pl.BlockSpec((TB, m, n, 1, S, L),
                     lambda b, t: (emit_row(b, t), 0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # K (previous, keep path)
        pl.BlockSpec((TB, m, 1, S, L),
                     lambda b, t: (emit_row(b, t), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # k (previous, keep path)
        pl.BlockSpec((A, 1), lambda b, t: (0, 0),
                     memory_space=pltpu.SMEM),   # α schedule
        lane_in,                                 # lam
        lane_in,                                 # cost_prev
        lane_in,                                 # live (f32 0/1)
    ]
    lane_out = pl.BlockSpec((1, S, L), lambda b, t: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    specs_out = [
        pl.BlockSpec((TB, n, 1, S, L),
                     lambda b, t: (emit_row(b, t), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # xs[0..T-1]
        pl.BlockSpec((TB, m, 1, S, L),
                     lambda b, t: (emit_row(b, t), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # us
        pl.BlockSpec((n, 1, S, L), lambda b, t: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # final x
        pl.BlockSpec((TB, m, 1, S, L),
                     lambda b, t: (emit_row(b, t), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # k_keep
        pl.BlockSpec((TB, m, n, 1, S, L),
                     lambda b, t: (emit_row(b, t), 0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # K_keep
        lane_out, lane_out, lane_out, lane_out, lane_out,  # ls outputs
        lane_out, lane_out,                      # diverged, gnorm
    ]
    from ilqr_tpu.utils.vma import sds

    out_shape = [
        sds((T, n, nb, S, L), f32, vma_axes),
        sds((T, m, nb, S, L), f32, vma_axes),
        sds((n, nb, S, L), f32, vma_axes),
        sds((T, m, nb, S, L), f32, vma_axes),
        sds((T, m, n, nb, S, L), f32, vma_axes),
        sds((nb, S, L), f32, vma_axes),   # ls_cost
        sds((nb, S, L), f32, vma_axes),   # alpha_sel
        sds((nb, S, L), f32, vma_axes),   # accepted 0/1
        sds((nb, S, L), f32, vma_axes),   # dcost
        sds((nb, S, L), f32, vma_axes),   # expected
        sds((nb, S, L), f32, vma_axes),   # diverged 0/1
        sds((nb, S, L), f32, vma_axes),   # gnorm
    ]
    scratch = [
        pltpu.VMEM((t_pad, m, S, L), f32),       # k (all T, resident)
        pltpu.VMEM((t_pad, m, n, S, L), f32),    # K (all T, resident)
        pltpu.VMEM((n, S, L), f32),              # Vx carry
        pltpu.VMEM((n, n, S, L), f32),           # Vxx carry
        pltpu.VMEM((2, S, L), f32),              # dV
        pltpu.VMEM((1, S, L), f32),              # diverged accumulator
        pltpu.VMEM((1, S, L), f32),              # gnorm accumulator
        pltpu.VMEM((A + 1, n, S, L), f32),       # candidate + final states
        pltpu.VMEM((A, S, L), f32),              # candidate running costs
        pltpu.VMEM((4, S, L), f32),              # (α_sel, take, gate, keep)
    ]
    return pl.pallas_call(
        functools.partial(_iter_kernel, model, n, m, A, T, TB, NT,
                          integrator, mode, float(eps), use_limits, clamp,
                          float(z_min), float(tol_grad),
                          float(lambda_grad_term), treedef, shapes),
        grid=(3, NT),
        in_specs=specs_in,
        out_specs=specs_out,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(params_p, x0_p, xs_body_p, xterm_p, us_p, Kold_p, kold_p,
      jnp.asarray(alphas, f32).reshape(-1, 1), lam_p, cost_prev, live_p)
