"""Fused Pallas TPU kernel for the batched closed-loop rollout.

The rollout (ref: src/ilqr_core.cpp:305-337) is inherently sequential in t;
under ``vmap`` the XLA path runs T scan steps, each dispatching several small
kernels — per-step launch overhead dominates at T=499. This kernel runs the
whole rollout for a block of 1024 problems in one ``pallas_call``:

- batch on the trailing (8, 128) tile (one VPU op per scalar of model math),
- time as the sequential grid axis with per-step (u_ff, x̄, K) streamed
  HBM→VMEM by the Pallas pipeline,
- the state carry and running cost in VMEM scratch,
- the MODEL'S OWN dynamics/cost evaluated inside the kernel via the
  structure-of-arrays contract (models/base.py: ``dynamics_soa`` etc.) —
  elementwise jnp ops lower straight to Mosaic.

The line search (ref :184-226) folds its 11 α-candidates into the batch
axis, so one kernel invocation evaluates every candidate of every problem.

Solver params (goals, masses, limits, dt) are packed into rows of one
(P, 8, 128) VMEM-resident tile and re-materialized as a params pytree of
(…, 8, 128) leaves inside the kernel. Shared (unbatched) params only — the
custom_vmap rules in ops/rollout.py fall back to the XLA path for
per-problem params.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 8
L = 128
BLOCK = S * L


# ---------------------------------------------------------------------------
# Param packing: pytree of scalars/small arrays → rows of one (P, S, L) tile
# ---------------------------------------------------------------------------

def pack_params(params, dt):
    """Returns (packed (P, S, L) f32, treedef, shapes) with dt as the last
    row. Leaves are flattened in tree order; each scalar element is one row
    broadcast across the (8, 128) tile. Shared (unbatched) params."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = tuple(jnp.shape(l) for l in leaves)
    flat = [jnp.ravel(jnp.asarray(l, jnp.float32)) for l in leaves]
    flat.append(jnp.ravel(jnp.asarray(dt, jnp.float32)))
    vec = jnp.concatenate(flat)
    packed = jnp.broadcast_to(vec[:, None, None], (vec.shape[0], S, L))
    return packed, treedef, shapes


def pack_params_batched(params, dt, nb):
    """Per-problem params: every leaf carries a leading batch dim BB =
    nb·1024. Returns (packed (P, NB, S, L) f32, treedef, shapes) where
    ``shapes`` are the per-problem leaf shapes; dt (scalar, shared) is the
    last row."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    bb = jnp.shape(leaves[0])[0]
    shapes = tuple(jnp.shape(l)[1:] for l in leaves)
    rows = []
    for leaf in leaves:
        leaf = jnp.asarray(leaf, jnp.float32).reshape(bb, -1)
        # element axis to the front: each scalar element is one row of
        # (BB,) values, packed to (NB, S, L)
        rows.append(jnp.transpose(leaf))          # (size, BB)
    rows.append(jnp.broadcast_to(
        jnp.asarray(dt, jnp.float32).reshape(1, 1), (1, bb)))
    mat = jnp.concatenate(rows, axis=0)           # (P, BB)
    packed = mat.reshape(mat.shape[0], nb, S, L)
    return packed, treedef, shapes


def unpack_params(ref, treedef, shapes):
    """Inside-kernel inverse of :func:`pack_params` /
    :func:`pack_params_batched`: rebuilds the params pytree with
    (leaf_shape…, S, L) leaves, plus the trailing dt row. Batched packing
    is detected by the ref's rank ((P, 1, S, L) block vs (P, S, L))."""
    batched = len(ref.shape) == 4

    def row(i):
        return ref[i, 0] if batched else ref[i]

    leaves = []
    r = 0
    for shape in shapes:
        size = 1
        for d in shape:
            size *= d
        elems = [row(r + i) for i in range(size)]
        r += size
        if shape == ():
            leaves.append(elems[0])
        else:
            leaves.append(jnp.stack(elems).reshape(shape + (S, L)))
    dt = row(r)
    return jax.tree_util.tree_unflatten(treedef, leaves), dt


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _dyn(model, p, xv, uv):
    return model.dynamics_soa(p, xv, uv)


def _integrate(model, integrator, p, xv, uv, dt):
    if integrator == "euler":
        return xv + _dyn(model, p, xv, uv) * dt
    if integrator == "rk4":
        k1 = _dyn(model, p, xv, uv)
        k2 = _dyn(model, p, xv + 0.5 * dt * k1, uv)
        k3 = _dyn(model, p, xv + 0.5 * dt * k2, uv)
        k4 = _dyn(model, p, xv + dt * k3, uv)
        return xv + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    raise ValueError(f"unknown integrator {integrator!r}")


def _kernel(model, n, m, integrator, clamp, costs_only, alpha_mode, nb,
            treedef, shapes, *refs):
    refs = list(refs)
    params_ref = refs.pop(0)
    x0_ref = refs.pop(0)
    uff_ref = refs.pop(0)
    xsr_ref = refs.pop(0)
    K_ref = refs.pop(0)
    k_ref = refs.pop(0) if alpha_mode else None
    alpha_ref = refs.pop(0) if alpha_mode else None
    if costs_only:
        cost_ref, x_scr, cost_scr = refs
        xs_ref_out = us_ref_out = xfin_ref = None
    else:
        xs_ref_out, us_ref_out, xfin_ref, cost_ref, x_scr, cost_scr = refs
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    p, dt = unpack_params(params_ref, treedef, shapes)

    @pl.when(t == 0)
    def _():
        for i in range(n):
            x_scr[i] = x0_ref[i, 0]
        cost_scr[0] = jnp.zeros((S, L), jnp.float32)

    x = [x_scr[i] for i in range(n)]

    if alpha_mode == "scalar":      # candidate α from SMEM (line search p1)
        # whole (A, 1) schedule is resident in SMEM; candidate id = b // nb
        alpha = alpha_ref[pl.program_id(0) // nb, 0]
    elif alpha_mode == "lane":      # per-lane selected α (line search p2)
        alpha = alpha_ref[0]
    else:
        alpha = None

    # u = u_ff + α·k + K (x − x̄)  (ref :188-195, :316), optional box clamp
    u = []
    for j in range(m):
        acc = uff_ref[0, j, 0]
        if alpha is not None:
            acc = acc + alpha * k_ref[0, j, 0]
        for i in range(n):
            acc = acc + K_ref[0, j, i, 0] * (x[i] - xsr_ref[0, i, 0])
        if clamp:
            acc = jnp.clip(acc, p.u_min[j], p.u_max[j])
        u.append(acc)

    if not costs_only:
        for i in range(n):
            xs_ref_out[0, i, 0] = x[i]
        for j in range(m):
            us_ref_out[0, j, 0] = u[j]

    xv = jnp.stack(x)
    uv = jnp.stack(u)
    cost_scr[0] = cost_scr[0] + model.cost_soa(p, xv, uv)

    xn = _integrate(model, integrator, p, xv, uv, dt)
    for i in range(n):
        x_scr[i] = xn[i]

    @pl.when(t == n_t - 1)
    def _():
        if not costs_only:
            for i in range(n):
                xfin_ref[i, 0] = xn[i]
        cost_ref[0] = cost_scr[0] + model.final_cost_soa(p, xn)


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------

def _pack_tail(x, nb):
    """(BB, T, ...) → (T, ..., NB, S, L)."""
    rest = x.shape[1:]
    perm = tuple(range(1, x.ndim)) + (0,)
    return jnp.transpose(x, perm).reshape(rest + (nb, S, L))


def _unpack_tail(y, bb):
    rest = y.shape[:-3]
    y = y.reshape(rest + (bb,))
    perm = (y.ndim - 1,) + tuple(range(y.ndim - 1))
    return jnp.transpose(y, perm)


def rollout_packed(model, integrator: str, clamp: bool, packed_params,
                   x0_p, uff_p, xsr_p, K_p, interpret: bool = False,
                   costs_only: bool = False, candidates: int = 1,
                   k_p=None, alphas=None, alpha_lanes=None,
                   vma_axes: tuple = ()):
    """Kernel-layout entry point (no relayout) — see
    :func:`backward_sweep_packed` in ops/pallas_backward.py.

    ``packed_params`` = the (array, treedef, shapes) triple from
    :func:`pack_params`. Shapes: x0_p (n,NB,S,L), uff_p (T,m,NB,S,L),
    xsr_p (T,n,NB,S,L), K_p (T,m,n,NB,S,L). Returns packed
    (xs_body (T,n,NB,S,L), us (T,m,NB,S,L), x_final (n,NB,S,L),
    cost (NB,S,L)); with ``costs_only`` just cost — the trajectory is
    neither stored nor written, which makes candidate sweeps (line
    search) HBM-write-free.

    ``candidates`` > 1 evaluates A line-search candidates per problem
    block WITHOUT tiling any input: u_ff = us + α_a·k is formed in-kernel
    from the shared ``uff_p`` (= the current controls), ``k_p`` (the
    feedforward from the backward sweep) and the candidate step ``alphas``
    ((A, 1) array read from SMEM per block); x0/x̄/K/params are indexed
    modulo NB by the grid, so the A-fold sweep reads everything exactly
    once from HBM. ``alpha_lanes`` ((NB, S, L)) instead applies a per-lane
    α (the pass-2 selected-candidate rollout).
    """
    params_p, treedef, shapes = packed_params
    T, m, n, nb, _s, _l = K_p.shape
    P = params_p.shape[0]
    f32 = jnp.float32
    grid_nb = nb * candidates
    pb = (lambda b: b % nb) if candidates > 1 else (lambda b: b)
    assert alphas is None or alpha_lanes is None
    alpha_mode = ("scalar" if alphas is not None
                  else "lane" if alpha_lanes is not None else None)
    if alpha_mode:
        assert k_p is not None

    if params_p.ndim == 4:  # per-problem params (P, NB, S, L)
        params_spec = pl.BlockSpec((P, 1, S, L),
                                   lambda b, t: (0, pb(b), 0, 0),
                                   memory_space=pltpu.VMEM)
    else:                   # shared params (P, S, L), resident
        params_spec = pl.BlockSpec((P, S, L), lambda b, t: (0, 0, 0),
                                   memory_space=pltpu.VMEM)
    # u_ff is per-candidate only when candidates are materialized (no
    # alpha_mode); with in-kernel α it's the shared current controls.
    uff_idx = pb if alpha_mode else (lambda b: b)
    specs_in = [
        params_spec,
        pl.BlockSpec((n, 1, S, L), lambda b, t: (0, pb(b), 0, 0),
                     memory_space=pltpu.VMEM),  # x0
        pl.BlockSpec((1, m, 1, S, L), lambda b, t: (t, 0, uff_idx(b), 0, 0),
                     memory_space=pltpu.VMEM),  # u_ff
        pl.BlockSpec((1, n, 1, S, L), lambda b, t: (t, 0, pb(b), 0, 0),
                     memory_space=pltpu.VMEM),  # xs_ref
        pl.BlockSpec((1, m, n, 1, S, L),
                     lambda b, t: (t, 0, 0, pb(b), 0, 0),
                     memory_space=pltpu.VMEM),  # K
    ]
    inputs = [params_p, x0_p, uff_p, xsr_p, K_p]
    if alpha_mode:
        specs_in.append(
            pl.BlockSpec((1, m, 1, S, L),
                         lambda b, t: (t, 0, pb(b), 0, 0),
                         memory_space=pltpu.VMEM))  # k
        inputs.append(k_p)
        if alpha_mode == "scalar":
            specs_in.append(
                pl.BlockSpec((candidates, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.SMEM))  # full α schedule
            inputs.append(jnp.asarray(alphas, f32).reshape(-1, 1))
        else:
            specs_in.append(
                pl.BlockSpec((1, S, L), lambda b, t: (pb(b), 0, 0),
                             memory_space=pltpu.VMEM))  # α per lane
            inputs.append(jnp.asarray(alpha_lanes, f32))
    cost_spec = pl.BlockSpec((1, S, L), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    from ilqr_tpu.utils.vma import sds

    if costs_only:
        specs_out = cost_spec
        out_shape = sds((grid_nb, S, L), f32, vma_axes)
    else:
        assert candidates == 1, "full outputs require candidates == 1"
        specs_out = [
            pl.BlockSpec((1, n, 1, S, L), lambda b, t: (t, 0, b, 0, 0),
                         memory_space=pltpu.VMEM),  # xs[0..T-1]
            pl.BlockSpec((1, m, 1, S, L), lambda b, t: (t, 0, b, 0, 0),
                         memory_space=pltpu.VMEM),  # us
            pl.BlockSpec((n, 1, S, L), lambda b, t: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),  # final x
            cost_spec,                              # cost
        ]
        out_shape = [
            sds((T, n, nb, S, L), f32, vma_axes),
            sds((T, m, nb, S, L), f32, vma_axes),
            sds((n, nb, S, L), f32, vma_axes),
            sds((nb, S, L), f32, vma_axes),
        ]
    scratch = [
        pltpu.VMEM((n, S, L), f32),
        pltpu.VMEM((1, S, L), f32),
    ]

    return pl.pallas_call(
        functools.partial(_kernel, model, n, m, integrator, clamp,
                          costs_only, alpha_mode, nb, treedef, shapes),
        grid=(grid_nb, T),
        in_specs=specs_in,
        out_specs=specs_out,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(*inputs)


def _ls_kernel(model, n, m, A, T, TB, integrator, clamp, z_min, treedef,
               shapes,
               params_ref, x0_ref, uff_ref, xsr_ref, xterm_ref, K_ref,
               k_ref, Kold_ref, kold_ref, alpha_ref, dv_ref, cprev_ref,
               gate_ref, keep_ref,
               xs_out, us_out, xfin_out, kout_ref, Kout_ref,
               lscost_out, alpha_out, acc_out, dcost_out, exp_out,
               x_scr, cand_scr, sel_scr):
    b = pl.program_id(0)     # 0 = all-candidates sweep, 1 = select+emit
    t = pl.program_id(1)     # time BLOCK index (TB steps per grid step)
    n_t = pl.num_programs(1)
    p, dt = unpack_params(params_ref, treedef, shapes)
    final_phase = b == 1

    # ---- selection epilogue (start of the final phase): first-accepted-α
    # over the candidate totals accumulated in scratch (ref ilqr_core.cpp:
    # 199-213 z-ratio acceptance)
    @pl.when(final_phase & (t == 0))
    def _():
        cprev = cprev_ref[0]
        dv0 = dv_ref[0, 0]
        dv1 = dv_ref[1, 0]
        one = jnp.ones((S, L), jnp.float32)
        a0 = alpha_ref[0, 0]
        chosen = jnp.zeros((S, L), jnp.float32)
        asel = one * a0
        lsc = cand_scr[0]
        ldc = cprev - cand_scr[0]
        lexp = -a0 * (dv0 + a0 * dv1)
        accepted = jnp.zeros((S, L), jnp.float32)
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
            accepted = jnp.maximum(accepted, acc_a.astype(jnp.float32))
        sel_scr[0] = asel
        # the step is taken only through the outer gate (back_ok & ~grad
        # term & live — computed by the solver from the sweep outputs)
        sel_scr[1] = accepted * gate_ref[0]
        lscost_out[0] = lsc
        alpha_out[0] = asel
        acc_out[0] = accepted
        dcost_out[0] = ldc
        exp_out[0] = lexp

    @pl.when(t == 0)
    def _():
        for a in range(A + 1):
            for i in range(n):
                x_scr[a, i] = x0_ref[i, 0]

    @pl.when((t == 0) & (b == 0))
    def _():
        for a in range(A):
            cand_scr[a] = jnp.zeros((S, L), jnp.float32)

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
                      jnp.zeros((S, L), jnp.float32))
        xn = _integrate(model, integrator, p, xv, uv, dt)
        x_next = [jnp.where(valid, xn[i], x[i]) for i in range(n)]
        return u, c, x_next

    # ---- phase 0: every α-candidate advanced simultaneously, their
    # states resident in VMEM scratch — the shared (us, x̄, K, k) rows are
    # read ONCE per timestep for all A candidates (previously once per
    # candidate: 11 full stream passes + 11 phases of grid machinery).
    @pl.when(b == 0)
    def _():
        xa = [[x_scr[a, i] for i in range(n)] for a in range(A)]
        ca = [cand_scr[a] for a in range(A)]
        for j in range(TB):
            valid = t * TB + j < T
            u_row = [uff_ref[j, jm, 0] for jm in range(m)]
            xsr_row = [xsr_ref[j, i, 0] for i in range(n)]
            K_row = [[K_ref[j, jm, i, 0] for i in range(n)]
                     for jm in range(m)]
            k_row = [k_ref[j, jm, 0] for jm in range(m)]
            for a in range(A):
                aa = alpha_ref[a, 0]
                _u, c, xa[a] = rollout_step(
                    xa[a], u_row, xsr_row, K_row, k_row, aa, valid)
                ca[a] = ca[a] + c
        for a in range(A):
            cand_scr[a] = ca[a]
            for i in range(n):
                x_scr[a, i] = xa[a][i]

        @pl.when(t == n_t - 1)
        def _():
            for a in range(A):
                xTa = jnp.stack([x_scr[a, i] for i in range(n)])
                cand_scr[a] = cand_scr[a] + model.final_cost_soa(p, xTa)

    # ---- phase 1: roll out the per-lane selected α with predicated
    # state writes (the iteration's accept/keep bookkeeping, ref
    # :242-255): taken lanes advance to the new trajectory, everyone else
    # re-emits the current one; gains keep the new backward result only
    # on keep lanes (back_ok & live, ref solver.py k_new).
    @pl.when(final_phase)
    def _():
        take = sel_scr[1] > 0.5
        keepm = keep_ref[0] > 0.5
        alpha = sel_scr[0]
        x = [x_scr[A, i] for i in range(n)]
        for j in range(TB):
            valid = t * TB + j < T
            u_row = [uff_ref[j, jm, 0] for jm in range(m)]
            xsr_row = [xsr_ref[j, i, 0] for i in range(n)]
            K_row = [[K_ref[j, jm, i, 0] for i in range(n)]
                     for jm in range(m)]
            k_row = [k_ref[j, jm, 0] for jm in range(m)]
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

        @pl.when(t == n_t - 1)
        def _():
            for i in range(n):
                xfin_out[i, 0] = jnp.where(take, x_scr[A, i],
                                           xterm_ref[i, 0])


def linesearch_packed(model, integrator: str, clamp: bool, packed_params,
                      x0_p, us_p, xsr_p, xterm_p, K_p, k_p, Kold_p, kold_p,
                      alphas, dv_p, cost_prev, gate_p, keep_p,
                      z_min: float, interpret: bool = False,
                      time_block: int = 8, vma_axes: tuple = ()):
    """Line search + iteration epilogue as ONE kernel (ref ilqr_core.cpp:
    184-226, 242-255): grid (A+1, T) — phases 0..A-1 sweep the
    α-candidates with cost-only rollouts accumulated in VMEM scratch,
    phase A computes the first-accepted-α selection in-register
    (z = dcost/expected vs z_min) and re-emits the POST-ACCEPT state with
    predicated writes:

      xs/us ← rolled-out trajectory on lanes taking the step
              (selection & gate_p), current trajectory otherwise;
      k/K   ← the new backward gains on keep_p lanes, the previous gains
              otherwise (solver.py k_new/K_new semantics).

    Replaces the previous two-kernel (cost sweep + pass-2 rollout)
    structure plus every whole-array selection/freeze op in the solver
    loop — on the axon backend each such op costs ~0.1 ms per executed
    thunk (BENCH_NOTES.md loop probes).

    Single problem-block layout (NB == 1 — the fused solver's chunking).
    Shapes: x0_p (n,1,S,L), us_p (T,m,1,S,L), xsr_p (T,n,1,S,L),
    xterm_p (n,1,S,L), K_p/Kold_p (T,m,n,1,S,L), k_p/kold_p (T,m,1,S,L),
    alphas (A,), dv_p (2,1,S,L); cost_prev, gate_p, keep_p (1,S,L) with
    masks as f32 0/1. Returns (xs_body, us, x_final, k_keep, K_keep,
    ls_cost, alpha_sel, accepted (f32 0/1, raw z-test), dcost, expected).
    """
    params_p, treedef, shapes = packed_params
    T, m, nb = us_p.shape[0], us_p.shape[1], us_p.shape[2]
    n = x0_p.shape[0]
    assert nb == 1, "linesearch_packed is single-block (NB == 1)"
    A = int(alphas.shape[0])
    P = params_p.shape[0]
    f32 = jnp.float32
    TB = max(1, min(int(time_block), T))
    if m * n >= 32:
        # large models: the A-candidate per-timestep body is ~2k ops —
        # keep the unrolled grid-step body compile-friendly (see the
        # matching cap in ops/pallas_sweep.sweep_packed)
        TB = min(TB, 4)
    NT = (T + TB - 1) // TB  # time blocks; edge steps masked in-kernel

    if params_p.ndim == 4:
        params_spec = pl.BlockSpec((P, 1, S, L), lambda b, t: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
    else:
        params_spec = pl.BlockSpec((P, S, L), lambda b, t: (0, 0, 0),
                                   memory_space=pltpu.VMEM)

    def traj_row(b, t):
        # write row t only during the final phase (b == 1); the candidate
        # sweep phase stays pinned on block 0
        return jnp.where(b == 1, t, 0)

    lane_in = pl.BlockSpec((1, S, L), lambda b, t: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    specs_in = [
        params_spec,
        pl.BlockSpec((n, 1, S, L), lambda b, t: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # x0
        pl.BlockSpec((TB, m, 1, S, L), lambda b, t: (t, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # us (current controls)
        pl.BlockSpec((TB, n, 1, S, L), lambda b, t: (t, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # xs_ref
        pl.BlockSpec((n, 1, S, L), lambda b, t: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # current terminal state
        pl.BlockSpec((TB, m, n, 1, S, L), lambda b, t: (t, 0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # K (new)
        pl.BlockSpec((TB, m, 1, S, L), lambda b, t: (t, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # k (new)
        # previous gains are only read by the final phase's keep-writes;
        # candidate phases pin the block index so no DMA traffic is spent
        # on them during the 11-candidate sweep
        pl.BlockSpec((TB, m, n, 1, S, L),
                     lambda b, t: (traj_row(b, t), 0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # K (previous)
        pl.BlockSpec((TB, m, 1, S, L),
                     lambda b, t: (traj_row(b, t), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # k (previous)
        pl.BlockSpec((A, 1), lambda b, t: (0, 0),
                     memory_space=pltpu.SMEM),   # α schedule
        pl.BlockSpec((2, 1, S, L), lambda b, t: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # dV
        lane_in,                                 # cost_prev
        lane_in,                                 # gate (take-step mask)
        lane_in,                                 # keep (gain-keep mask)
    ]
    lane_out = pl.BlockSpec((1, S, L), lambda b, t: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    specs_out = [
        pl.BlockSpec((TB, n, 1, S, L),
                     lambda b, t: (traj_row(b, t), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # xs[0..T-1]
        pl.BlockSpec((TB, m, 1, S, L),
                     lambda b, t: (traj_row(b, t), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # us
        pl.BlockSpec((n, 1, S, L), lambda b, t: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # final x
        pl.BlockSpec((TB, m, 1, S, L),
                     lambda b, t: (traj_row(b, t), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # k_keep
        pl.BlockSpec((TB, m, n, 1, S, L),
                     lambda b, t: (traj_row(b, t), 0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),   # K_keep
        lane_out, lane_out, lane_out, lane_out, lane_out,
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
    ]
    scratch = [
        pltpu.VMEM((A + 1, n, S, L), f32),  # candidate + final states
        pltpu.VMEM((A, S, L), f32),         # candidate running costs
        pltpu.VMEM((2, S, L), f32),         # (alpha_sel, take)
    ]
    return pl.pallas_call(
        functools.partial(_ls_kernel, model, n, m, A, T, TB, integrator,
                          clamp, float(z_min), treedef, shapes),
        grid=(2, NT),
        in_specs=specs_in,
        out_specs=specs_out,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(params_p, x0_p, us_p, xsr_p, xterm_p, K_p, k_p, Kold_p, kold_p,
      jnp.asarray(alphas, f32).reshape(-1, 1), dv_p, cost_prev,
      gate_p, keep_p)


def rollout_batched(model, integrator: str, clamp: bool,
                    params, dt, x0, u_ff, xs_ref, K,
                    interpret: bool = False, vma_axes: tuple = ()):
    """Batched fused rollout.

    Args: x0 (B, n), u_ff (B, T, m), xs_ref (B, T+1, n) (row T unused),
    K (B, T, m, n); params shared (unbatched pytree), dt scalar.
    Returns (xs (B, T+1, n), us (B, T, m), cost (B,)) in f32.
    """
    B, T, m = u_ff.shape
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

    x0_p = _pack_tail(prep(x0), nb)               # (n, NB, S, L)
    uff_p = _pack_tail(prep(u_ff), nb)            # (T, m, NB, S, L)
    xsr_p = _pack_tail(prep(xs_ref[:, :-1]), nb)  # (T, n, NB, S, L)
    K_p = _pack_tail(prep(K), nb)                 # (T, m, n, NB, S, L)
    packed_params = pack_params(params, dt)

    xs_body, us_p, xfin, cost_p = rollout_packed(
        model, integrator, clamp, packed_params,
        x0_p, uff_p, xsr_p, K_p, interpret=interpret, vma_axes=vma_axes)

    xs_b = _unpack_tail(xs_body, bb)[:B]    # (B, T, n)
    xf = _unpack_tail(xfin, bb)[:B]         # (B, n)
    xs = jnp.concatenate([xs_b, xf[:, None]], axis=1)
    us = _unpack_tail(us_p, bb)[:B]
    cost = _unpack_tail(cost_p, bb)[:B]
    return xs, us, cost
