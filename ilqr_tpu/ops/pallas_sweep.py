"""Merged linearize+backward Pallas kernel (m ≤ MAX_FUSED_M = 24).

In the fused solver the linearization exists only to feed the backward
recursion — nothing else reads it. Keeping them as two kernels costs a
full HBM round-trip of every per-timestep derivative array (~190 MB per
1024-problem sweep at T=499). This kernel runs BOTH per grid step:

  grid step (b, t)  ≡  timestep T−1−t of block b:
    1. read just (x_t, u_t) — ~20 MB/sweep instead of ~200,
    2. differentiate the model in-registers (forward-mode JVPs, or the
       reference's FD stencils — same modes as ops/pallas_derivs),
    3. immediately consume fx/fu/cx/cu/cxx/cxu/cuu in the control-limited
       DDP backward step (ref src/ilqr_core.cpp:350-401) with the
       V-carries in VMEM scratch.

The control-limited QP is solved exactly in-registers:
  - m = 1: closed form clamp(−Qu/QuuF) (see ops/backward.py),
  - m = 2 / 3 / 4: active-set enumeration — all 3^m (lower/free/upper)^m
    candidate sets solved in closed form with KKT filters (the in-kernel
    version of ops/boxqp.boxqp_enum; at m=4 the 15 per-free-subset
    adjugates are shared across the 81 candidates). Feedback rows come
    from the identity-padded free-subspace inverse, zeroed on clamped
    dims (ref :377-385).
  - 5 ≤ m ≤ 24: fixed-shape projected Newton (the reference's own boxQP
    algorithm, src/boxqp.cpp:26-139) with the free-subspace solves
    through a masked unrolled Cholesky — 3^m enumeration explodes past
    m = 4 (see _qp_pn).
  - unconstrained (``use_limits=False``): plain regularized Newton
    k = −QuuF⁻¹Qu — the infinite-box degenerate
    (ref src/ilqr_core.cpp:369).

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


# --- trace-time constant folding -------------------------------------------
# Models may return plain Python numbers (0.0, 1.0, …) for structurally
# constant Jacobian/Hessian entries (see the SoA contract in models/base.py).
# These helpers fold multiplies/adds with such constants out of the kernel at
# trace time: Mosaic does not algebraically simplify x·0 or x·1 tile ops, and
# the Riccati recursion is dense in structurally sparse fx/fu (e.g.
# point_mass_3d has 3 nonzeros in its 6×6 A; every mechanical model's
# position rows are [0 I]).

def _is_const(v):
    return isinstance(v, (int, float))


def _fmul(a, b):
    if _is_const(a):
        if _is_const(b):
            return a * b
        if a == 0.0:
            return 0.0
        if a == 1.0:
            return b
    if _is_const(b):
        if b == 0.0:
            return 0.0
        if b == 1.0:
            return a
    return a * b


def _fadd(a, b):
    if _is_const(a):
        if _is_const(b):
            return a + b
        if a == 0.0:
            return b
    if _is_const(b) and b == 0.0:
        return a
    return a + b


def _tile(v, like):
    """Materialize a possibly-constant folded value as a tile like ``like``."""
    if _is_const(v):
        return jnp.full_like(like, v)
    return v


def _basis(k, dims, like):
    one = jnp.ones_like(like)
    zero = jnp.zeros_like(like)
    return jnp.stack([one if i == k else zero for i in range(dims)])


def _qp_m1(quuF, qu, lo, hi):
    """Closed-form 1-D box QP on tiles. Returns (k, free, bad)."""
    q11 = quuF[0][0]
    g1 = qu[0]
    bad = q11 <= 0.0
    q_safe = jnp.where(bad, jnp.ones_like(q11), q11)
    x1 = jnp.clip(-g1 * (1.0 / q_safe), lo[0], hi[0])
    gk = q11 * x1 + g1
    clamped = jnp.logical_or(
        jnp.logical_and(x1 <= lo[0], gk > 0.0),
        jnp.logical_and(x1 >= hi[0], gk < 0.0),
    )
    k = [jnp.where(bad, jnp.zeros_like(x1), x1)]
    free = [~clamped & ~bad]
    return k, free, bad


def _qp_m2(quuF, qu, lo, hi):
    """Exact 2-D box QP by active-set enumeration on tiles (9 candidates,
    closed-form solves, KKT filters — the in-kernel boxqp_enum)."""
    a, b, c = quuF[0][0], quuF[0][1], quuF[1][1]
    g0, g1 = qu[0], qu[1]
    det = a * c - b * b
    bad = (a <= 0.0) | (det <= 0.0)
    sa = jnp.where(a <= 0.0, jnp.ones_like(a), a)
    sc = jnp.where(c <= 0.0, jnp.ones_like(c), c)
    sdet = jnp.where(det <= 0.0, jnp.ones_like(det), det)
    rsa, rsc, rsdet = 1.0 / sa, 1.0 / sc, 1.0 / sdet  # shared across the
    # 9 enumeration candidates (one reciprocal each instead of a divide
    # per candidate solve)

    big = jnp.full_like(a, 3.0e38)
    best_v = big
    best0 = jnp.zeros_like(a)
    best1 = jnp.zeros_like(a)
    # free-mask carriers as f32 0/1 — Mosaic rejects selects on bool values
    bf0 = jnp.zeros_like(a)
    bf1 = jnp.zeros_like(a)

    def value(x0, x1):
        return (0.5 * (a * x0 * x0 + 2.0 * b * x0 * x1 + c * x1 * x1)
                + g0 * x0 + g1 * x1)

    for s0 in (0, 1, 2):       # dim 0: lower / free / upper
        for s1 in (0, 1, 2):   # dim 1
            f0 = s0 == 1
            f1 = s1 == 1
            x0c = lo[0] if s0 == 0 else hi[0]
            x1c = lo[1] if s1 == 0 else hi[1]
            if f0 and f1:
                x0 = (-g0 * c + g1 * b) * rsdet
                x1 = (-g1 * a + g0 * b) * rsdet
            elif f0:
                x1 = x1c
                x0 = -(g0 + b * x1) * rsa
            elif f1:
                x0 = x0c
                x1 = -(g1 + b * x0) * rsc
            else:
                x0 = x0c
                x1 = x1c
            gr0 = a * x0 + b * x1 + g0
            gr1 = b * x0 + c * x1 + g1
            ok = jnp.ones_like(a, dtype=bool)
            if f0:
                ok = ok & (x0 >= lo[0]) & (x0 <= hi[0])
            else:
                ok = ok & (gr0 >= 0.0 if s0 == 0 else gr0 <= 0.0)
            if f1:
                ok = ok & (x1 >= lo[1]) & (x1 <= hi[1])
            else:
                ok = ok & (gr1 >= 0.0 if s1 == 0 else gr1 <= 0.0)
            v = value(x0, x1)
            take = ok & (v < best_v)
            best_v = jnp.where(take, v, best_v)
            best0 = jnp.where(take, x0, best0)
            best1 = jnp.where(take, x1, best1)
            bf0 = jnp.where(take, jnp.full_like(bf0, 1.0 * f0), bf0)
            bf1 = jnp.where(take, jnp.full_like(bf1, 1.0 * f1), bf1)

    k = [jnp.where(bad, jnp.zeros_like(best0), best0),
         jnp.where(bad, jnp.zeros_like(best1), best1)]
    free = [(bf0 > 0.5) & ~bad, (bf1 > 0.5) & ~bad]
    return k, free, bad


def _qp_m3(quuF, qu, lo, hi):
    """Exact 3-D box QP by active-set enumeration on tiles: all 27
    (lower/free/upper)³ candidate sets solved in closed form with KKT
    filters — the in-kernel ops/boxqp.boxqp_enum at m=3 (ref boxqp.cpp
    handles arbitrary m; this covers the fused solver to m ≤ 3)."""
    import itertools

    q = quuF
    g = qu
    one = jnp.ones_like(q[0][0])
    zero = jnp.zeros_like(q[0][0])

    def safe(d):
        return jnp.where(d <= 0.0, one, d)

    # Sylvester criterion on leading principal minors
    det2 = q[0][0] * q[1][1] - q[0][1] * q[0][1]
    det3 = (q[0][0] * (q[1][1] * q[2][2] - q[1][2] * q[1][2])
            - q[0][1] * (q[0][1] * q[2][2] - q[1][2] * q[0][2])
            + q[0][2] * (q[0][1] * q[1][2] - q[1][1] * q[0][2]))
    bad = (q[0][0] <= 0.0) | (det2 <= 0.0) | (det3 <= 0.0)

    best_v = jnp.full_like(one, 3.0e38)
    best = [zero, zero, zero]
    # free-mask carriers as f32 0/1 — Mosaic rejects selects on bool values
    bf = [zero, zero, zero]

    # reciprocals shared across the 27 enumeration candidates (one each
    # instead of a divide per candidate solve): the three diagonal 1-D
    # denominators, the three 2x2 pair determinants, and the 3x3 det
    rq = [1.0 / safe(q[i][i]) for i in range(3)]
    rpair = {}
    for i in range(3):
        for j in range(i + 1, 3):
            rpair[(i, j)] = 1.0 / safe(
                q[i][i] * q[j][j] - q[i][j] * q[i][j])

    def value(x):
        v = zero
        for i in range(3):
            v = v + g[i] * x[i] + 0.5 * q[i][i] * x[i] * x[i]
        v = (v + q[0][1] * x[0] * x[1] + q[0][2] * x[0] * x[2]
             + q[1][2] * x[1] * x[2])
        return v

    for combo in itertools.product((0, 1, 2), repeat=3):
        F = [i for i in range(3) if combo[i] == 1]
        xc = [lo[i] if combo[i] == 0 else hi[i] if combo[i] == 2 else None
              for i in range(3)]

        def rhs(i):
            acc = g[i]
            for j in range(3):
                if combo[j] != 1:
                    acc = acc + q[i][j] * xc[j]
            return acc

        x = [None, None, None]
        if len(F) == 0:
            x = list(xc)
        elif len(F) == 1:
            i = F[0]
            x[i] = -rhs(i) * rq[i]
            for j in range(3):
                if j != i:
                    x[j] = xc[j]
        elif len(F) == 2:
            i, j = F
            aa, bb, cc = q[i][i], q[i][j], q[j][j]
            rd = rpair[(i, j)]
            ri, rj = rhs(i), rhs(j)
            x[i] = (-ri * cc + rj * bb) * rd
            x[j] = (-rj * aa + ri * bb) * rd
            kd = ({0, 1, 2} - set(F)).pop()
            x[kd] = xc[kd]
        else:
            a, b, c = q[0][0], q[0][1], q[0][2]
            dd, e, f = q[1][1], q[1][2], q[2][2]
            A00 = dd * f - e * e
            A01 = -(b * f - e * c)
            A02 = b * e - dd * c
            A11 = a * f - c * c
            A12 = -(a * e - b * c)
            A22 = a * dd - b * b
            rdet = 1.0 / safe(a * A00 + b * A01 + c * A02)
            x[0] = -(A00 * g[0] + A01 * g[1] + A02 * g[2]) * rdet
            x[1] = -(A01 * g[0] + A11 * g[1] + A12 * g[2]) * rdet
            x[2] = -(A02 * g[0] + A12 * g[1] + A22 * g[2]) * rdet

        gr = []
        for i in range(3):
            acc = g[i]
            for j in range(3):
                acc = acc + q[i][j] * x[j]
            gr.append(acc)

        ok = jnp.ones_like(one, dtype=bool)
        for i in range(3):
            if combo[i] == 1:
                ok = ok & (x[i] >= lo[i]) & (x[i] <= hi[i])
            elif combo[i] == 0:
                ok = ok & (gr[i] >= 0.0)
            else:
                ok = ok & (gr[i] <= 0.0)

        v = value(x)
        take = ok & (v < best_v)
        best_v = jnp.where(take, v, best_v)
        for i in range(3):
            best[i] = jnp.where(take, x[i], best[i])
            bf[i] = jnp.where(
                take, jnp.full_like(bf[i], 1.0 * (combo[i] == 1)), bf[i])

    k = [jnp.where(bad, zero, best[i]) for i in range(3)]
    free = [(bf[i] > 0.5) & ~bad for i in range(3)]
    return k, free, bad


def _subdet(q, rows, cols):
    """Determinant of the submatrix q[rows][cols] of a nested-list tile
    matrix, by first-row cofactor expansion — fully unrolled at trace time
    (rows/cols are static index tuples, len ≤ 4)."""
    if len(rows) == 1:
        return q[rows[0]][cols[0]]
    acc = None
    for jpos, cj in enumerate(cols):
        minor = _subdet(q, rows[1:], cols[:jpos] + cols[jpos + 1:])
        term = q[rows[0]][cj] * minor
        if acc is None:
            acc = term
        elif jpos % 2 == 0:
            acc = acc + term
        else:
            acc = acc - term
    return acc


def _adj_det(q, idx):
    """Adjugate (as a nested list over positions in ``idx``) and
    determinant of the symmetric submatrix q[idx][idx]. Static index
    tuple, len ≤ 4; symmetry halves the cofactor count."""
    k = len(idx)
    if k == 1:
        return [[jnp.ones_like(q[idx[0]][idx[0]])]], q[idx[0]][idx[0]]
    det = _subdet(q, idx, idx)
    adj = [[None] * k for _ in range(k)]
    for a in range(k):
        for b in range(a, k):
            rows = idx[:b] + idx[b + 1:]
            cols = idx[:a] + idx[a + 1:]
            cof = _subdet(q, rows, cols)
            if (a + b) % 2:
                cof = -cof
            adj[a][b] = adj[b][a] = cof
    return adj, det


def _qp_m4(quuF, qu, lo, hi):
    """Exact 4-D box QP by active-set enumeration on tiles: all 81
    (lower/free/upper)⁴ candidate sets, closed-form subspace solves via
    shared per-free-subset adjugates (15 of them serve all 81 candidates),
    KKT filters — the in-kernel ops/boxqp.boxqp_enum at m=4 (ref boxqp.cpp
    handles arbitrary m; this covers the fused solver to m ≤ 4, e.g. the
    quadrotor's per-rotor thrust box)."""
    import itertools

    q = quuF
    g = qu
    one = jnp.ones_like(q[0][0])
    zero = jnp.zeros_like(q[0][0])

    def safe(d):
        return jnp.where(d <= 0.0, one, d)

    # Sylvester criterion on the four leading principal minors
    bad = q[0][0] <= 0.0
    for k in range(2, 5):
        bad = bad | (_subdet(q, tuple(range(k)), tuple(range(k))) <= 0.0)

    # shared per-free-subset solve data: adjugate + reciprocal determinant
    sub = {}
    for k in range(1, 5):
        for idx in itertools.combinations(range(4), k):
            adj, det = _adj_det(q, idx)
            sub[idx] = (adj, 1.0 / safe(det))

    best_v = jnp.full_like(one, 3.0e38)
    best = [zero, zero, zero, zero]
    # free-mask carriers as f32 0/1 — Mosaic rejects selects on bool values
    bf = [zero, zero, zero, zero]

    for combo in itertools.product((0, 1, 2), repeat=4):
        F = tuple(i for i in range(4) if combo[i] == 1)
        xc = [lo[i] if combo[i] == 0 else hi[i] if combo[i] == 2 else None
              for i in range(4)]
        x = [xc[i] for i in range(4)]
        if F:
            adj, rdet = sub[F]
            rhs = []
            for i in F:
                acc = g[i]
                for j in range(4):
                    if combo[j] != 1:
                        acc = acc + q[i][j] * xc[j]
                rhs.append(acc)
            for a, i in enumerate(F):
                s = adj[a][0] * rhs[0]
                for b in range(1, len(F)):
                    s = s + adj[a][b] * rhs[b]
                x[i] = -s * rdet

        gr = []
        for i in range(4):
            acc = g[i]
            for j in range(4):
                acc = acc + q[i][j] * x[j]
            gr.append(acc)

        ok = None
        for i in range(4):
            if combo[i] == 1:
                c = (x[i] >= lo[i]) & (x[i] <= hi[i])
            elif combo[i] == 0:
                c = gr[i] >= 0.0
            else:
                c = gr[i] <= 0.0
            ok = c if ok is None else ok & c

        v = zero
        for i in range(4):
            v = v + g[i] * x[i] + 0.5 * q[i][i] * x[i] * x[i]
        for i in range(4):
            for j in range(i + 1, 4):
                v = v + q[i][j] * x[i] * x[j]

        take = ok & (v < best_v)
        best_v = jnp.where(take, v, best_v)
        for i in range(4):
            best[i] = jnp.where(take, x[i], best[i])
            bf[i] = jnp.where(
                take, jnp.full_like(bf[i], 1.0 * (combo[i] == 1)), bf[i])

    k_out = [jnp.where(bad, zero, best[i]) for i in range(4)]
    free = [(bf[i] > 0.5) & ~bad for i in range(4)]
    return k_out, free, bad


def _qp_newton(quuF, qu, m):
    """Unconstrained regularized Newton step on tiles: k = −QuuF⁻¹Qu with a
    Sylvester PD check — what boxQP degenerates to with an infinite box
    (ref src/ilqr_core.cpp:369 with no active limits). All dims free."""
    one = jnp.ones_like(quuF[0][0])
    zero = jnp.zeros_like(quuF[0][0])

    def safe(d):
        return jnp.where(d <= 0.0, one, d)

    if m == 1:
        q11 = quuF[0][0]
        bad = q11 <= 0.0
        x = [-qu[0] / safe(q11)]
    elif m == 2:
        a, b, c = quuF[0][0], quuF[0][1], quuF[1][1]
        det = a * c - b * b
        bad = (a <= 0.0) | (det <= 0.0)
        rsdet = 1.0 / safe(det)
        x = [(-qu[0] * c + qu[1] * b) * rsdet,
             (-qu[1] * a + qu[0] * b) * rsdet]
    elif m == 3:
        a, b, c = quuF[0][0], quuF[0][1], quuF[0][2]
        dd, e, f = quuF[1][1], quuF[1][2], quuF[2][2]
        det2 = a * dd - b * b
        A00 = dd * f - e * e
        A01 = -(b * f - e * c)
        A02 = b * e - dd * c
        A11 = a * f - c * c
        A12 = -(a * e - b * c)
        A22 = a * dd - b * b
        det3 = a * A00 + b * A01 + c * A02
        bad = (a <= 0.0) | (det2 <= 0.0) | (det3 <= 0.0)
        rsdet = 1.0 / safe(det3)
        adj = [[A00, A01, A02], [A01, A11, A12], [A02, A12, A22]]
        x = [-(adj[j][0] * qu[0] + adj[j][1] * qu[1] + adj[j][2] * qu[2])
             * rsdet for j in range(3)]
    elif m == 4:
        bad = quuF[0][0] <= 0.0
        for kk in range(2, 5):
            bad = bad | (
                _subdet(quuF, tuple(range(kk)), tuple(range(kk))) <= 0.0)
        adj, det = _adj_det(quuF, (0, 1, 2, 3))
        rsdet = 1.0 / safe(det)
        x = []
        for j in range(4):
            s = adj[j][0] * qu[0]
            for i in range(1, 4):
                s = s + adj[j][i] * qu[i]
            x.append(-s * rsdet)
    elif m <= MAX_FUSED_M:
        # general m: all-free masked Cholesky (pivots double as the PD
        # check) + one unrolled solve
        one_l = [one] * m
        Lr, rdiag, bad = _chol_masked_tiles(quuF, one_l, m)
        x = _chol_solve_tiles(Lr, rdiag, [-g for g in qu], m)
    else:
        raise ValueError(f"in-kernel Newton supports m <= {MAX_FUSED_M}")
    k = [jnp.where(bad, zero, xi) for xi in x]
    free = [~bad for _ in range(m)]
    return k, free, bad


# --- general-m machinery (m > 4): masked Cholesky + projected Newton ------
#
# 3^m active-set enumeration explodes past m = 4 (and the cofactor-expansion
# adjugates grow factorially), so larger control dimensions use the
# reference's actual algorithm — projected-Newton boxQP (src/boxqp.cpp:
# 26-139) — re-designed for tiles: a fixed unrolled iteration count, the
# per-lane active set carried as f32 0/1 masks (Mosaic rejects selects over
# boolean VALUES), and the free-subspace solve through a fully-unrolled
# Cholesky of the identity-padded masked matrix. Compile size is O(m³) per
# Newton iteration, capped at MAX_FUSED_M.
#
# The cap is a Mosaic COMPILE-size wall, not an algorithmic one: the
# in-kernel QP unrolls O(m³) Cholesky ops × (m+6) Newton iterations per
# timestep, and the measured compile trajectory is m=8: 146-209 s,
# m=12: 386 s, m=16: 750 s (6,474 solves/s), m=20: 1,065 s
# (4,104 solves/s), m=24: 2,166 s (2,616 solves/s) — all at B=1024
# T=80, the round-5 m{16,20,24}_fused rows. The wall STEEPENS past
# m=20 (+1,101 s for the last 4-width step vs +315 before — compile an
# m=24 model once and serve it via an AOT blob); every probed width
# passed, so the cap sits at the widest MEASURED width. Past it use
# the vmap path (batch.solve_batch routes it through the contained
# chunked dispatch on TPU — see the worker-fault writeup in batch.py),
# or probe further with experiments/m24_probe.py's pattern before
# raising.

MAX_FUSED_M = 24


def _chol_masked_tiles(q, free_f, m):
    """Unrolled Cholesky of P = mask(q) on tiles, where P has the free
    principal submatrix of ``q`` and exact identity rows/columns on clamped
    dims (P[i][j] = free_i·free_j·q[i][j] + (1−free_i)·δ_ij) — the tile
    version of ops/boxqp.masked_cholesky. The factor preserves the padding
    pattern (clamped rows of L are e_i), so solves pass clamped entries
    through untouched.

    ``free_f``: list of f32 0/1 tiles. Returns (L rows as a nested
    lower-triangular list, rdiag = 1/L[i][i] per row, bad) with ``bad``
    flagging a non-positive pivot on a free dim (non-PD free subspace —
    the reference's Cholesky-failure → divergence signal)."""
    one = jnp.ones_like(q[0][0])
    zero = jnp.zeros_like(q[0][0])
    Lr = [[zero] * m for _ in range(m)]
    rdiag = [None] * m
    bad = None
    for i in range(m):
        d = free_f[i] * q[i][i] + (1.0 - free_f[i])
        for k in range(i):
            d = d - Lr[i][k] * Lr[i][k]
        bad_i = (free_f[i] > 0.5) & (d <= 0.0)
        bad = bad_i if bad is None else (bad | bad_i)
        d_safe = jnp.where(d <= 0.0, one, d)
        rd = jax.lax.rsqrt(d_safe)
        rdiag[i] = rd
        Lr[i][i] = d_safe * rd          # = sqrt(d_safe)
        for j in range(i + 1, m):
            acc = free_f[i] * free_f[j] * q[j][i]
            for k in range(i):
                acc = acc - Lr[j][k] * Lr[i][k]
            Lr[j][i] = acc * rd
    return Lr, rdiag, bad


def _chol_solve_tiles(Lr, rdiag, b, m):
    """Solve L·Lᵀ·x = b by unrolled forward/back substitution on tiles."""
    y = [None] * m
    for i in range(m):
        acc = b[i]
        for k in range(i):
            acc = acc - Lr[i][k] * y[k]
        y[i] = acc * rdiag[i]
    x = [None] * m
    for i in range(m - 1, -1, -1):
        acc = y[i]
        for k in range(i + 1, m):
            acc = acc - Lr[k][i] * x[k]
        x[i] = acc * rdiag[i]
    return x


def _qp_pn(quuF, qu, lo, hi, m):
    """General-m box QP on tiles by projected Newton (ref src/boxqp.cpp:
    26-139 semantics, fixed-shape): start from the box-clamped
    unconstrained Newton point, then m+4 unrolled iterations of
    { KKT active set → masked-Cholesky free-subspace solve → best-of
    {full step, half step} clamped candidates, monotone (keep current x
    when neither improves) }. The full-matrix Cholesky pivots provide the
    PD check (``bad``), like the enum paths' Sylvester minors.

    Returns (k, free, bad) in the _qp_m* contract: k a list of m tiles,
    free a list of m bool tiles (final KKT-free dims — the rows
    _free_solve_rows solves K on), bad a bool tile."""
    one = jnp.ones_like(quuF[0][0])
    zero = jnp.zeros_like(quuF[0][0])

    def val(x):
        v = zero
        for i in range(m):
            v = v + qu[i] * x[i] + 0.5 * quuF[i][i] * x[i] * x[i]
        for i in range(m):
            for j in range(i + 1, m):
                v = v + quuF[i][j] * x[i] * x[j]
        return v

    def grad(x):
        g = []
        for i in range(m):
            acc = qu[i]
            for j in range(m):
                acc = acc + quuF[i][j] * x[j]
            g.append(acc)
        return g

    # init: clamp(−QuuF⁻¹·Qu); the all-free factorization is the PD check
    free_all = [one] * m
    Lr, rdiag, bad = _chol_masked_tiles(quuF, free_all, m)
    x = _chol_solve_tiles(Lr, rdiag, [-g for g in qu], m)
    x = [jnp.clip(x[i], lo[i], hi[i]) for i in range(m)]
    v_cur = val(x)

    for _ in range(m + 6):
        g = grad(x)
        free_f = []
        for i in range(m):
            cl = (((x[i] <= lo[i]) & (g[i] > 0.0))
                  | ((x[i] >= hi[i]) & (g[i] < 0.0)))
            free_f.append(jnp.where(cl, zero, one))
        Lr, rdiag, bad_it = _chol_masked_tiles(quuF, free_f, m)
        bad = bad | bad_it
        rhs = []
        for i in range(m):
            acc = qu[i]
            for j in range(m):
                acc = acc + quuF[i][j] * ((1.0 - free_f[j]) * x[j])
            rhs.append(free_f[i] * acc)
        d = _chol_solve_tiles(Lr, rdiag, rhs, m)
        xn = [free_f[i] * (-d[i]) + (1.0 - free_f[i]) * x[i]
              for i in range(m)]
        # clamped backtracking ladder from the CURRENT x (the reference's
        # Armijo halving, boxqp.cpp:121-139, as parallel candidates): the
        # projection of a long Newton step can be ascent while a shorter
        # step along the same direction descends. Keep the best improving
        # candidate — strict decrease keeps the iteration monotone.
        best = [x[i] for i in range(m)]
        v_best = v_cur
        for step in (1.0, 0.5, 0.25, 0.125, 0.0625):
            c = [jnp.clip(x[i] + step * (xn[i] - x[i]), lo[i], hi[i])
                 for i in range(m)]
            v_c = val(c)
            take = v_c < v_best
            best = [jnp.where(take, c[i], best[i]) for i in range(m)]
            v_best = jnp.where(take, v_c, v_best)
        x = best
        v_cur = v_best

    # final KKT-active set at the converged x
    g = grad(x)
    free = []
    for i in range(m):
        cl = (((x[i] <= lo[i]) & (g[i] > 0.0))
              | ((x[i] >= hi[i]) & (g[i] < 0.0)))
        free.append(~cl & ~bad)
    k = [jnp.where(bad, zero, x[i]) for i in range(m)]
    return k, free, bad


def _free_solve_rows(quuF, free, cols, m):
    """Rows of −(Q_free)⁻¹ · cols with identity padding on clamped dims and
    zeroed clamped rows (ref ilqr_core.cpp:377-385). ``cols`` is a list
    (per state dim) of per-control-row values: cols[j][i] = Qux[j, i]."""
    if m == 1:
        q11 = quuF[0][0]
        q_safe = jnp.where(q11 <= 0.0, jnp.ones_like(q11), q11)
        rq = -(1.0 / q_safe)    # one reciprocal shared by all n columns
        return [[jnp.where(free[0], cols[0][i] * rq,
                           jnp.zeros_like(cols[0][i]))
                 for i in range(len(cols[0]))]]
    if m == 2:
        # identity-padded 2×2 inverse
        a, b, c = quuF[0][0], quuF[0][1], quuF[1][1]
        both = free[0] & free[1]
        ap = jnp.where(free[0], a, jnp.ones_like(a))
        cp = jnp.where(free[1], c, jnp.ones_like(c))
        bp = jnp.where(both, b, jnp.zeros_like(b))
        det = ap * cp - bp * bp
        det = jnp.where(det == 0.0, jnp.ones_like(det), det)
        rdet = 1.0 / det        # one reciprocal shared by all columns
        n_cols = len(cols[0])
        out0 = []
        out1 = []
        for i in range(n_cols):
            v0, v1 = cols[0][i], cols[1][i]
            s0 = (cp * v0 - bp * v1) * rdet
            s1 = (ap * v1 - bp * v0) * rdet
            out0.append(jnp.where(free[0], -s0, jnp.zeros_like(s0)))
            out1.append(jnp.where(free[1], -s1, jnp.zeros_like(s1)))
        return [out0, out1]
    if m == 3:
        # identity-padded 3×3 inverse via the adjugate
        one = jnp.ones_like(quuF[0][0])
        zero = jnp.zeros_like(quuF[0][0])
        a = jnp.where(free[0], quuF[0][0], one)
        dd = jnp.where(free[1], quuF[1][1], one)
        f = jnp.where(free[2], quuF[2][2], one)
        b = jnp.where(free[0] & free[1], quuF[0][1], zero)
        c = jnp.where(free[0] & free[2], quuF[0][2], zero)
        e = jnp.where(free[1] & free[2], quuF[1][2], zero)
        A00 = dd * f - e * e
        A01 = -(b * f - e * c)
        A02 = b * e - dd * c
        A11 = a * f - c * c
        A12 = -(a * e - b * c)
        A22 = a * dd - b * b
        det = a * A00 + b * A01 + c * A02
        det = jnp.where(det == 0.0, one, det)
        rdet = 1.0 / det        # one reciprocal shared by all columns
        adj = [[A00, A01, A02], [A01, A11, A12], [A02, A12, A22]]
        out = [[], [], []]
        for i in range(len(cols[0])):
            v = [cols[0][i], cols[1][i], cols[2][i]]
            for j in range(3):
                s = (adj[j][0] * v[0] + adj[j][1] * v[1]
                     + adj[j][2] * v[2]) * rdet
                out[j].append(jnp.where(free[j], -s, zero))
        return out
    if m > 4:
        # general m: one masked Cholesky of the identity-padded matrix
        # shared by all n columns (clamped rows pass through and are
        # zeroed on output)
        assert m <= MAX_FUSED_M, (
            f"free-subspace rows support m <= {MAX_FUSED_M}")
        zero = jnp.zeros_like(quuF[0][0])
        one = jnp.ones_like(quuF[0][0])
        free_f = [jnp.where(fb, one, zero) for fb in free]
        Lr, rdiag, _bad = _chol_masked_tiles(quuF, free_f, m)
        out = [[] for _ in range(m)]
        for i in range(len(cols[0])):
            v = [cols[jm][i] for jm in range(m)]
            sv = _chol_solve_tiles(Lr, rdiag, v, m)
            for j in range(m):
                out[j].append(jnp.where(free[j], -sv[j], zero))
        return out
    # m == 4: identity-padded 4×4 inverse via the generic adjugate
    one = jnp.ones_like(quuF[0][0])
    zero = jnp.zeros_like(quuF[0][0])
    P = [[None] * 4 for _ in range(4)]
    for i in range(4):
        P[i][i] = jnp.where(free[i], quuF[i][i], one)
        for j in range(i + 1, 4):
            v = jnp.where(free[i] & free[j], quuF[i][j], zero)
            P[i][j] = P[j][i] = v
    adj, det = _adj_det(P, (0, 1, 2, 3))
    det = jnp.where(det == 0.0, one, det)
    rdet = 1.0 / det            # one reciprocal shared by all columns
    out = [[], [], [], []]
    for i in range(len(cols[0])):
        v = [cols[jm][i] for jm in range(4)]
        for j in range(4):
            s = adj[j][0] * v[0]
            for b in range(1, 4):
                s = s + adj[j][b] * v[b]
            out[j].append(jnp.where(free[j], -s * rdet, zero))
    return out


def _model_closures(model, n, m, integrator, mode, eps, p, dt):
    """Model step/cost closures + tangent-derivative helpers over the
    in-kernel params pytree ``p``. Shared by the merged sweep kernel and
    the whole-iteration kernel (ops/pallas_iter.py)."""

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

    def make_dops(x, u):
        tile = x[0]
        zx = jnp.zeros_like(x)
        zu = jnp.zeros_like(u)

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

        return ei, d1, d2

    # Closed-form model derivatives (models/base.py jac_soa contract) cut
    # the per-step vector-op count ~10× vs re-deriving with in-register
    # JVPs; available for the analytic mode with the Euler step (where
    # fx = I + dt·A, fu = dt·B). FD mode keeps the reference stencils.
    use_analytic = (mode == "jvp" and integrator == "euler"
                    and model.has_analytic_soa)
    return step_fn, cost_fn, final_fn, make_dops, use_analytic


def _terminal_init(model, n, m, use_analytic, make_dops, final_fn, p,
                   xsT_ref, vx, vxx, dv, div, gacc):
    """V_T from final_cost, differentiated in-kernel; zero the backward
    accumulators (dv, diverged flag, gnorm accumulator)."""
    xT = jnp.stack([xsT_ref[i, 0] for i in range(n)])
    if use_analytic:
        fcx, fcxx = model.final_cost_derivs_soa(p, xT)

        def bc0(v):
            if _is_const(v):
                return jnp.full((S, L), v, jnp.float32)
            return jnp.broadcast_to(v, (S, L))

        for i in range(n):
            vx[i] = bc0(fcx[i])
            for j in range(n):
                vxx[i, j] = bc0(fcxx[i][j])
    else:
        uT = jnp.zeros((m, S, L), jnp.float32)
        ei, d1, d2 = make_dops(xT, uT)
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
    gacc[0] = jnp.zeros((S, L), jnp.float32)


def _kernel(model, n, m, T, TB, integrator, mode, eps, use_limits, treedef,
            shapes,
            params_ref, xs_ref, xsT_ref, us_ref, lam_ref,
            k_ref, K_ref, dv_ref, div_ref, gnorm_ref,
            vx, vxx, dv, div, gacc):
    t = pl.program_id(1)
    n_t = pl.num_programs(1)  # == NT (time blocks)
    rb = n_t - 1 - t          # array time-block processed at this step
    p, dt = unpack_params(params_ref, treedef, shapes)
    step_fn, cost_fn, final_fn, make_dops, use_analytic = _model_closures(
        model, n, m, integrator, mode, eps, p, dt)

    # --- t == 0: V_T from final_cost, differentiated in-kernel
    @pl.when(t == 0)
    def _():
        _terminal_init(model, n, m, use_analytic, make_dops, final_fn, p,
                       xsT_ref, vx, vxx, dv, div, gacc)

    # --- TB timesteps per grid step, processed in descending time order;
    # steps past T (the edge block, processed FIRST) are masked out of
    # every carried quantity, and their k/K writes land on clipped rows.
    for _j in reversed(range(TB)):
        valid = rb * TB + _j < T
        x = jnp.stack([xs_ref[_j, i, 0] for i in range(n)])
        u = jnp.stack([us_ref[_j, j, 0] for j in range(m)])
        if not use_analytic:
            ei, d1, d2 = make_dops(x, u)

        def store_kK(jj, k_i, Krow):
            for jm in range(m):
                k_ref[jj, jm, 0] = k_i[jm]
                for i in range(n):
                    K_ref[jj, jm, i, 0] = Krow[jm][i]

        _sweep_step(model, n, m, mode, use_analytic, use_limits, p, dt,
                    lam_ref, vx, vxx, dv, div, gacc, store_kK,
                    _j, valid, x, u,
                    None if use_analytic else (ei, d1, d2, step_fn,
                                               cost_fn))

    @pl.when(t == n_t - 1)
    def _():
        dv_ref[0, 0] = dv[0]
        dv_ref[1, 0] = dv[1]
        div_ref[0] = div[0]
        gnorm_ref[0] = gacc[0] * (1.0 / T)


def _sweep_step(model, n, m, mode, use_analytic, use_limits, p, dt,
                lam_ref, vx, vxx, dv, div, gacc, store_kK,
                _j, valid, x, u, dops):
    tile = x[0]
    if use_analytic:
        A, B = model.jac_soa(p, x, u)
        # fx = I + dt·A, fu = dt·B — structural zeros/ones in A, B stay
        # Python constants and fold out of every product below
        fxc = [[_fadd(_fmul(dt, A[r][i]), 1.0 if r == i else 0.0)
                for i in range(n)] for r in range(n)]
        fuc = [[_fmul(dt, B[r][j]) for j in range(m)] for r in range(n)]
        cx1, cu1, cxx1, cxu1, cuu1 = model.cost_derivs_soa(p, x, u)

        def bc(v):
            return v if _is_const(v) else jnp.broadcast_to(v, (S, L))

        cx1 = [bc(v) for v in cx1]
        cu1 = [bc(v) for v in cu1]
        cxx1 = [[bc(v) for v in row] for row in cxx1]
        cxu1 = [[bc(v) for v in row] for row in cxu1]
        cuu1 = [[bc(v) for v in row] for row in cuu1]
    else:
        ei, d1, d2, step_fn, cost_fn = dops
        fxc = [[None] * n for _ in range(n)]
        for i in range(n):
            col = d1(step_fn, ei(i, True))
            for r in range(n):
                fxc[r][i] = col[r]
        fuc = [[None] * m for _ in range(n)]
        for j in range(m):
            col = d1(step_fn, ei(j, False))
            for r in range(n):
                fuc[r][j] = col[r]

        cx1 = [d1(cost_fn, ei(i, True)) for i in range(n)]
        cu1 = [d1(cost_fn, ei(j, False)) for j in range(m)]
        cxx1 = [[None] * n for _ in range(n)]
        for i in range(n):
            for j in range(i, n):
                h = d2(cost_fn, ei(i, True), ei(j, True))
                cxx1[i][j] = h
                cxx1[j][i] = h
        cxu1 = [[d2(cost_fn, ei(i, True), ei(j, False)) for j in range(m)]
                for i in range(n)]
        cuu1 = [[None] * m for _ in range(m)]
        for i in range(m):
            for j in range(i, m):
                h = d2(cost_fn, ei(i, False), ei(j, False))
                cuu1[i][j] = h
                cuu1[j][i] = h

    # --- backward step (ref ilqr_core.cpp:359-393). V-carries preloaded
    # once per step (all entries are consumed below anyway); accumulations
    # go through the constant-folding helpers so structurally-zero fx/fu
    # entries never emit tile ops.
    lam = lam_ref[0]
    vxl = [vx[i] for i in range(n)]
    vxxl = [[vxx[i, j] for j in range(n)] for i in range(n)]
    # fuᵀVxx: (m, n)
    fuT_vxx = [[None] * n for _ in range(m)]
    for jm in range(m):
        for jn_ in range(n):
            acc = 0.0
            for i in range(n):
                acc = _fadd(acc, _fmul(fuc[i][jm], vxxl[i][jn_]))
            fuT_vxx[jm][jn_] = acc

    qu = []
    for jm in range(m):
        acc = cu1[jm]
        for i in range(n):
            acc = _fadd(acc, _fmul(fuc[i][jm], vxl[i]))
        qu.append(_tile(acc, tile))

    quu = [[None] * m for _ in range(m)]
    for im in range(m):
        for jm in range(im, m):
            acc = cuu1[im][jm]
            for i in range(n):
                acc = _fadd(acc, _fmul(fuT_vxx[im][i], fuc[i][jm]))
            acc = _tile(acc, tile)
            quu[im][jm] = acc
            quu[jm][im] = acc
    quuF = [[_tile(_fadd(quu[im][jm], lam if im == jm else 0.0), tile)
             for jm in range(m)] for im in range(m)]

    # qux (m, n) and qx (n)
    qux = [[None] * n for _ in range(m)]
    qx = [None] * n
    for jn_ in range(n):
        accx = cx1[jn_]
        for i in range(n):
            accx = _fadd(accx, _fmul(fxc[i][jn_], vxl[i]))
        qx[jn_] = _tile(accx, tile)
        for jm in range(m):
            accq = cxu1[jn_][jm]
            for i in range(n):
                accq = _fadd(accq, _fmul(fuT_vxx[jm][i], fxc[i][jn_]))
            qux[jm][jn_] = _tile(accq, tile)

    w = [[None] * n for _ in range(n)]
    for kk in range(n):
        for j in range(n):
            acc = 0.0
            for l in range(n):
                acc = _fadd(acc, _fmul(vxxl[kk][l], fxc[l][j]))
            w[kk][j] = acc
    # Qxx = cxx + FxᵀVxxFx is symmetric — compute the upper triangle and
    # mirror (the reference symmetrizes Vxx explicitly, ilqr_core.cpp:393;
    # here symmetry is exact by construction)
    qxx = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i, n):
            acc = cxx1[i][j]
            for kk in range(n):
                acc = _fadd(acc, _fmul(fxc[kk][i], w[kk][j]))
            acc = _tile(acc, tile)
            qxx[i][j] = acc
            if i != j:
                qxx[j][i] = acc

    if not use_limits:
        k_i, free, bad = _qp_newton(quuF, qu, m)
    else:
        lo = [p.u_min[jm] - u[jm] for jm in range(m)]
        hi = [p.u_max[jm] - u[jm] for jm in range(m)]
        if m == 1:
            k_i, free, bad = _qp_m1(quuF, qu, lo, hi)
        elif m == 2:
            k_i, free, bad = _qp_m2(quuF, qu, lo, hi)
        elif m == 3:
            k_i, free, bad = _qp_m3(quuF, qu, lo, hi)
        elif m == 4:
            k_i, free, bad = _qp_m4(quuF, qu, lo, hi)
        elif m <= MAX_FUSED_M:
            k_i, free, bad = _qp_pn(quuF, qu, lo, hi, m)
        else:
            raise ValueError(
                f"merged sweep kernel supports m <= {MAX_FUSED_M}")

    Krow = _free_solve_rows(quuF, free, qux, m)  # (m, n) rows

    zero_t = jnp.zeros((S, L), jnp.float32)
    div[0] = jnp.maximum(
        div[0], jnp.where(valid, bad.astype(jnp.float32), zero_t))
    d0 = zero_t
    for jm in range(m):
        d0 = d0 + k_i[jm] * qu[jm]
    d1_ = zero_t
    for im in range(m):
        for jm in range(m):
            d1_ = d1_ + 0.5 * k_i[im] * quu[im][jm] * k_i[jm]
    dv[0] = dv[0] + jnp.where(valid, d0, zero_t)
    dv[1] = dv[1] + jnp.where(valid, d1_, zero_t)

    # quu·k (m)
    quu_k = []
    for im in range(m):
        acc = quu[im][0] * k_i[0]
        for jm in range(1, m):
            acc = acc + quu[im][jm] * k_i[jm]
        quu_k.append(acc)

    for i in range(n):
        acc = qx[i]
        for c in range(m):
            acc = (acc + Krow[c][i] * quu_k[c] + Krow[c][i] * qu[c]
                   + qux[c][i] * k_i[c])
        vx[i] = jnp.where(valid, acc, vxl[i])
    # Vxx update is symmetric too: upper triangle once, one masked select
    # per entry, written to both mirror slots (vxx stays exactly
    # symmetric across steps, so reading vxx[i, j] for the old value is
    # safe for both).
    for i in range(n):
        for j in range(i, n):
            acc = qxx[i][j]
            for c in range(m):
                for d in range(m):
                    acc = acc + Krow[c][i] * quu[c][d] * Krow[d][j]
                acc = acc + Krow[c][i] * qux[c][j] + qux[c][i] * Krow[c][j]
            v = jnp.where(valid, acc, vxxl[i][j])
            vxx[i, j] = v
            if i != j:
                vxx[j, i] = v

    store_kK(_j, k_i, Krow)

    # gradient-norm epilogue (ref ilqr_core.cpp:153-159): accumulate
    # max_j |k_j|/(|u_j|+1) per step; the mean over t is emitted at the
    # end of the sweep so the solver needs no extra HBM pass over k.
    gstep = jnp.abs(k_i[0]) / (jnp.abs(u[0]) + 1.0)
    for jm in range(1, m):
        gstep = jnp.maximum(gstep, jnp.abs(k_i[jm]) / (jnp.abs(u[jm]) + 1.0))
    gacc[0] = gacc[0] + jnp.where(valid, gstep, zero_t)


def sweep_packed(model, integrator: str, packed_params, xs_body_p, xterm_p,
                 us_p, lam_p, mode: str = "jvp", eps: float = 1e-3,
                 interpret: bool = False, use_limits: bool = True,
                 time_block: int = 8, vma_axes: tuple = ()):
    """Merged linearize+backward sweep in kernel layout.

    Shapes: xs_body_p (T, n, NB, S, L), xterm_p (n, NB, S, L) — the
    trajectory body and terminal state as separate arrays (no slicing
    thunks at the call site), us_p (T, m, NB, S, L), lam_p (NB, S, L).
    Control limits come from the packed params (p.u_min/p.u_max);
    ``use_limits=False`` runs the unconstrained regularized-Newton
    degenerate instead (infinite box). Returns packed (k (T,m,NB,S,L),
    K (T,m,n,NB,S,L), dv (2,NB,S,L), diverged (NB,S,L) f32 0/1,
    gnorm (NB,S,L)).
    """
    params_p, treedef, shapes = packed_params
    T, m, nb = us_p.shape[0], us_p.shape[1], us_p.shape[2]
    n = xs_body_p.shape[1]
    P = params_p.shape[0]
    f32 = jnp.float32
    TB = max(1, min(int(time_block), T))
    if m * n >= 32:
        # Large models (e.g. quadrotor n=12/m=4): the per-timestep body is
        # ~20k ops (n³ Riccati algebra + 3^m QP candidates); at the default
        # blocking the unrolled grid-step body makes the (remote Mosaic or
        # CPU XLA) compile pathological. Grid-step machinery is only
        # ~0.15-0.6 µs/step (BENCH_NOTES.md), so a tiny block is right.
        TB = min(TB, 2)
    NT = (T + TB - 1) // TB  # time blocks, processed in reverse; the edge
    # block (trailing, possibly-partial rows) is masked in-kernel

    if params_p.ndim == 4:
        params_spec = pl.BlockSpec((P, 1, S, L), lambda b, t: (0, b, 0, 0),
                                   memory_space=pltpu.VMEM)
    else:
        params_spec = pl.BlockSpec((P, S, L), lambda b, t: (0, 0, 0),
                                   memory_space=pltpu.VMEM)
    specs_in = [
        params_spec,
        pl.BlockSpec((TB, n, 1, S, L),
                     lambda b, t: (NT - 1 - t, 0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # x rows, reverse blocks
        pl.BlockSpec((n, 1, S, L), lambda b, t: (0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # terminal x (xs row T)
        pl.BlockSpec((TB, m, 1, S, L),
                     lambda b, t: (NT - 1 - t, 0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # u rows, reverse blocks
        pl.BlockSpec((1, S, L), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),  # lam
    ]
    specs_out = [
        pl.BlockSpec((TB, m, 1, S, L),
                     lambda b, t: (NT - 1 - t, 0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # k
        pl.BlockSpec((TB, m, n, 1, S, L),
                     lambda b, t: (NT - 1 - t, 0, 0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # K
        pl.BlockSpec((2, 1, S, L), lambda b, t: (0, b, 0, 0),
                     memory_space=pltpu.VMEM),  # dv
        pl.BlockSpec((1, S, L), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),  # diverged
        pl.BlockSpec((1, S, L), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),  # gnorm
    ]
    from ilqr_tpu.utils.vma import sds

    out_shape = [
        sds((T, m, nb, S, L), f32, vma_axes),
        sds((T, m, n, nb, S, L), f32, vma_axes),
        sds((2, nb, S, L), f32, vma_axes),
        sds((nb, S, L), f32, vma_axes),
        sds((nb, S, L), f32, vma_axes),
    ]
    scratch = [
        pltpu.VMEM((n, S, L), f32),
        pltpu.VMEM((n, n, S, L), f32),
        pltpu.VMEM((2, S, L), f32),
        pltpu.VMEM((1, S, L), f32),
        pltpu.VMEM((1, S, L), f32),
    ]
    return pl.pallas_call(
        functools.partial(_kernel, model, n, m, T, TB, integrator, mode,
                          float(eps), use_limits, treedef, shapes),
        grid=(nb, NT),
        in_specs=specs_in,
        out_specs=specs_out,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(params_p, xs_body_p, xterm_p, us_p, lam_p)
