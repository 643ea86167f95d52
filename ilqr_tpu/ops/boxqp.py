"""Projected-Newton box-constrained QP (Tassa 2014 appendix).

Minimize ½xᵀQx + xᵀc s.t. lower ≤ x ≤ upper.

Semantics match ref src/boxqp.cpp:26-178 step for step, but the reference's
dynamic-size active-set machinery — masked gathers (``subvec_w_ind``), shrunken
free-subspace matrices (``extract_bool_rowsandcols``), Cholesky refactor only
when the active set changes (boxqp.cpp:80-90) — is recast as fixed-shape masked
computation so it runs inside ``lax.scan``/``vmap`` with zero host round-trips:

- the free-subspace matrix is the full m×m matrix with clamped rows/cols
  replaced by identity, so its Cholesky factor solves the free block exactly
  and acts as identity on clamped dims;
- refactoring happens every iteration (a few-flop m×m Cholesky is cheaper on
  TPU than the data-dependent branch it would replace);
- known quirks preserved: the initial value uses xᵀQx + x·c WITHOUT the ½
  (ref boxqp.cpp:36), so the first relative-improvement check is against that
  inflated value.

One deliberate deviation: if the masked Cholesky produces NaN (Q not positive
definite on the free subspace) we return status −1 (failure → backward-pass
divergence → λ escalation), where the reference would silently carry a garbage
factor (boxqp.cpp:86 "I'm not sure why this happens"). This matches the intent
of Tassa's original MATLAB boxQP, which returns result=−1 for a non-PD Hessian.

Status codes (ref boxqp.cpp comment block; "higher is better", <1 = failure):
  -1 non-PD free-subspace Hessian   0 no convergence in max_iter
   2 internal line search failed    4 relative improvement < tol
   5 free-gradient norm < tol       6 all dimensions clamped
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ilqr_tpu.config import BoxQPConfig
from ilqr_tpu.types import BoxQPResult


def clamp_to_limits(x, lower, upper):
    """(ref: include/boxqp.h:48-51)"""
    return jnp.minimum(upper, jnp.maximum(x, lower))


def quad_cost(Q, c, x):
    """½xᵀQx + x·c (ref: include/boxqp.h:53-55)."""
    return 0.5 * x @ (Q @ x) + x @ c


def _chol_small(Q):
    """Fully-unrolled Cholesky–Banachiewicz for the tiny (m ≤ 4) SPD
    matrices of the control-space QP. XLA lowers ``jnp.linalg.cholesky``
    to a LAPACK custom call (CPU) or a blocked loop expansion (TPU) —
    per-call machinery that dwarfs the ~30 flops actually needed at these
    sizes, and that sits inside the backward scan for every m ≥ 2 model.
    The unrolled form is pure elementwise arithmetic (fuses, vmaps,
    lives happily inside Pallas-adjacent code). Non-PD semantics match
    the solver contract: a non-positive pivot produces NaN (explicitly —
    ``sqrt(where(s>0, s, nan))``) which poisons the dependent entries,
    so ``jnp.any(jnp.isnan(...))`` detects failure exactly as with the
    LAPACK path."""
    m = Q.shape[-1]
    nan = jnp.asarray(jnp.nan, Q.dtype)
    L = [[None] * m for _ in range(m)]
    for i in range(m):
        for j in range(i + 1):
            s = Q[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.where(s > 0, s, nan))
            else:
                L[i][j] = s / L[j][j]
    rows = [jnp.stack([L[i][j] if j <= i else jnp.zeros_like(L[i][i])
                       for j in range(m)], axis=-1) for i in range(m)]
    return jnp.stack(rows, axis=-2)


def _cho_solve_small(chol_lower, b):
    """Unrolled forward+back substitution solving L Lᵀ x = b (m ≤ 4)."""
    m = b.shape[-1]
    y = []
    for i in range(m):
        s = b[..., i]
        for k in range(i):
            s = s - chol_lower[..., i, k] * y[k]
        y.append(s / chol_lower[..., i, i])
    x = [None] * m
    for i in reversed(range(m)):
        s = y[i]
        for k in range(i + 1, m):
            s = s - chol_lower[..., k, i] * x[k]
        x[i] = s / chol_lower[..., i, i]
    return jnp.stack(x, axis=-1)


_UNROLL_MAX = 4


def _use_unrolled(dtype, size) -> bool:
    # f32 only: the unrolled factorization's op order rounds differently
    # in the last ulp, which can flip knife-edge termination decisions;
    # f64 parity runs must keep the LAPACK numerics the golden files were
    # produced against. The f32 perf paths have no such contract.
    return size <= _UNROLL_MAX and dtype == jnp.float32


def masked_cholesky(Q, free):
    """Lower Cholesky factor of Q restricted to `free` dims, padded with
    identity on clamped dims. Replaces extract_bool_rowsandcols + LLT
    (ref: boxqp.cpp:80-90) with static shapes. NaN entries signal non-PD."""
    eye = jnp.eye(Q.shape[0], dtype=Q.dtype)
    qf = jnp.where(jnp.outer(free, free), Q, eye)
    if _use_unrolled(Q.dtype, Q.shape[0]):
        return _chol_small(qf)
    return jnp.linalg.cholesky(qf)


def free_solve(chol_lower, b, free, unrolled=None):
    """Solve Q_free z = b on the free subspace; zero on clamped dims.

    ``unrolled=None`` picks the unrolled substitution by the parity rule
    (_use_unrolled: f32, m ≤ 4); True/False forces a specific path (tests
    use this to pin numerics)."""
    if unrolled is None:
        unrolled = _use_unrolled(b.dtype, b.shape[-1])
    bm = jnp.where(free, b, jnp.zeros_like(b))
    if unrolled:
        z = _cho_solve_small(chol_lower, bm)
    else:
        z = jax.scipy.linalg.cho_solve((chol_lower, True), bm)
    return jnp.where(free, z, jnp.zeros_like(z))


def quadclamp_line_search(x0, search, Q, c, lower, upper, cfg: BoxQPConfig):
    """Armijo backtracking with clamping (ref: src/boxqp.cpp:143-178).

    Returns (x_opt, v_opt, failed, n_steps). On a non-descent direction the
    reference returns failed immediately; here the step-1 candidate is
    computed anyway (and ignored by the caller), keeping shapes static.
    """
    dtype = x0.dtype
    grad = Q @ x0 + c
    slope = search @ grad
    bad_direction = slope >= 0

    old_v = quad_cost(Q, c, x0)

    step0 = jnp.asarray(1.0, dtype)
    xc0 = clamp_to_limits(x0 + step0 * search, lower, upper)
    v0 = quad_cost(Q, c, xc0)

    def cond(carry):
        step, _xc, v, failed, _n = carry
        ratio = (v - old_v) / (step * slope)
        return jnp.logical_and(~failed, ratio < cfg.armijo)

    def body(carry):
        step, _xc, _v, _failed, n = carry
        step = step * cfg.step_dec
        xc = clamp_to_limits(x0 + step * search, lower, upper)
        v = quad_cost(Q, c, xc)
        failed = step < cfg.min_step
        return step, xc, v, failed, n + 1

    from ilqr_tpu.utils.vma import vary

    init = vary((step0, xc0, v0, bad_direction, jnp.asarray(0, jnp.int32)),
                cfg.vma_axes)
    _step, xc, v, failed, n = lax.while_loop(cond, body, init)
    return xc, v, failed | bad_direction, n


def boxqp_enum(Q, c, lower, upper) -> BoxQPResult:
    """Exact box QP by active-set enumeration — for small m (≤ 4).

    A strictly convex box QP has a unique KKT point; with m dims there are
    3^m candidate active sets (each dim at lower / free / at upper — 81
    at m=4, the quadrotor's size). All candidates are evaluated with
    fixed shapes and no loops: solve the free subspace in closed form,
    clamp actives, and keep the candidate whose KKT conditions hold
    (primal feasibility on free dims, dual sign on clamped dims).
    Loop-free → trace-light and TPU-friendly, replacing the iterative
    projected Newton (ref src/boxqp.cpp) wholesale for the reference's
    control sizes (m=1, 2). Select with
    ``SolverConfig(boxqp_mode="enum")``.

    Returns the same BoxQPResult contract as :func:`boxqp` (status 5 on
    success, −1 for a non-PD Hessian; chol_free = identity-padded factor
    of the free subspace for the backward pass's K solve).
    """
    import itertools

    m = Q.shape[0]
    assert m <= 4, "active-set enumeration is for m <= 4 (3^m candidates)"
    dtype = Q.dtype

    big = jnp.asarray(jnp.finfo(dtype).max / 8, dtype)
    best_val = big
    best_x = jnp.zeros((m,), dtype)
    best_free = jnp.zeros((m,), bool)
    found = jnp.zeros((), bool)

    # The subspace factor depends only on WHICH dims are free, not on the
    # side clamped dims sit at — 2^m distinct factorizations serve all
    # 3^m candidates (16 vs 81 at m=4).
    chol_cache: dict = {}

    def cached_chol(free_key):
        if free_key not in chol_cache:
            chol_cache[free_key] = masked_cholesky(
                Q, jnp.asarray(free_key, bool))
        return chol_cache[free_key]

    chol_full = cached_chol((True,) * m)
    not_pd = jnp.any(jnp.isnan(chol_full))

    for combo in itertools.product((0, 1, 2), repeat=m):
        free = jnp.asarray([s == 1 for s in combo], bool)
        x_clamp = jnp.asarray(
            [0.0 if s == 1 else (-1.0 if s == 0 else 1.0) for s in combo],
            dtype)
        xc = jnp.where(x_clamp < 0, lower,
                       jnp.where(x_clamp > 0, upper, jnp.zeros_like(lower)))
        # free block solve: Q_ff x_f = -(c_f + Q_fc x_c)
        chol = cached_chol(tuple(s == 1 for s in combo))
        rhs = -(c + Q @ jnp.where(free, jnp.zeros_like(xc), xc))
        xf = free_solve(chol, jnp.where(free, rhs, jnp.zeros_like(rhs)),
                        free)
        x = jnp.where(free, xf, xc)
        g = Q @ x + c
        primal_ok = jnp.all(
            jnp.where(free, (x >= lower) & (x <= upper), True))
        dual_ok = jnp.all(jnp.where(
            free, True,
            jnp.where(x_clamp < 0, g >= 0, g <= 0)))
        valid = primal_ok & dual_ok & ~jnp.any(jnp.isnan(x))
        val = quad_cost(Q, c, x)
        take = valid & (val < best_val)
        best_val = jnp.where(take, val, best_val)
        best_x = jnp.where(take, x, best_x)
        best_free = jnp.where(take, free, best_free)
        found = found | valid

    status = jnp.where(not_pd | ~found, -1, 5).astype(jnp.int32)
    return BoxQPResult(
        x=best_x,
        status=status,
        free=best_free,
        chol_free=masked_cholesky(Q, best_free),
        n_iters=jnp.asarray(1, jnp.int32),
    )


def boxqp_pn(Q, c, lower, upper) -> BoxQPResult:
    """Fixed-shape projected-Newton box QP for ARBITRARY m with zero
    data-dependent control flow — ``boxqp_mode="pn_fixed"``.

    Same algorithm family as the reference's projected Newton
    (ref: src/boxqp.cpp:26-139) but with every data-dependent loop replaced
    by a fixed recipe, so ``vmap(solve)`` never serializes the device the
    way the while_loop ``boxqp`` does on TPU (measured: the m=4 iterative
    path runs at ~6 solves/s vs ~24k fused — BENCH_NOTES.md): start from
    the box-clamped unconstrained Newton point, then m+6 iterations of
    {KKT active set → masked-Cholesky free-subspace solve → best-of-5
    clamped backtracking candidates, monotone keep-best}. This is the
    in-kernel ``ops/pallas_sweep._qp_pn`` recipe (TPU-oracle-tested
    against exact 3^m enumeration up to m=8) in matrix form: the masked
    factor/solves go through jnp.linalg.cholesky / cho_solve on the
    identity-padded matrix (fixed shapes; non-PD signalled by NaN and
    replaced by identity so iterates stay finite). The kernels keep the
    scalar-unrolled form — on the XLA path the same unroll produces a
    many-thousand-op scalar graph that XLA:CPU takes minutes to compile
    (measured 220 s at m=6), while the matrix form compiles in seconds
    and lowers to fixed-trip blocked loops on TPU.

    No warm start (the clamped Newton init is deterministic — unlike the
    reference's k[t+1] seeding) and no tolerance-based early exit: status
    is 5 (converged) unless the free-subspace Hessian loses positive
    definiteness at any iterate (-1 → λ escalation upstream).
    """
    m = Q.shape[-1]
    dtype = Q.dtype
    eye = jnp.eye(m, dtype=dtype)
    ones_f = jnp.ones((m,), dtype)

    def masked(free_f):
        return (free_f[:, None] * free_f[None, :] * Q
                + jnp.diag(jnp.asarray(1.0, dtype) - free_f))

    def chol_safe(P):
        L = jnp.linalg.cholesky(P)
        bad = jnp.any(jnp.isnan(L))
        return jnp.where(bad, eye, L), bad

    def qval(x):
        return 0.5 * x @ (Q @ x) + x @ c

    # init: clamp(−Q⁻¹c); the all-free factorization doubles as the PD check
    L, bad = chol_safe(Q)
    x = jnp.clip(jax.scipy.linalg.cho_solve((L, True), -c), lower, upper)
    v = qval(x)

    for _ in range(m + 6):
        g = Q @ x + c
        cl = ((x <= lower) & (g > 0)) | ((x >= upper) & (g < 0))
        free_f = jnp.where(cl, jnp.zeros_like(ones_f), ones_f)
        L_it, bad_it = chol_safe(masked(free_f))
        bad = bad | bad_it
        rhs = free_f * (c + Q @ ((jnp.asarray(1.0, dtype) - free_f) * x))
        d = jax.scipy.linalg.cho_solve((L_it, True), rhs)
        xn = free_f * (-d) + (jnp.asarray(1.0, dtype) - free_f) * x
        # clamped backtracking ladder, monotone keep-best (see _qp_pn: the
        # 1.0/0.5 pair alone stalls on ~0.2% of lanes)
        best, v_best = x, v
        for step in (1.0, 0.5, 0.25, 0.125, 0.0625):
            cand = jnp.clip(x + step * (xn - x), lower, upper)
            vc = qval(cand)
            take = vc < v_best
            best = jnp.where(take, cand, best)
            v_best = jnp.where(take, vc, v_best)
        x, v = best, v_best

    g = Q @ x + c
    cl = ((x <= lower) & (g > 0)) | ((x >= upper) & (g < 0))
    free = ~cl & ~bad
    x = jnp.where(bad, jnp.zeros_like(x), x)
    free_f = jnp.where(free, ones_f, jnp.zeros_like(ones_f))
    chol, _ = chol_safe(masked(free_f))
    status = jnp.where(bad, -1, 5).astype(jnp.int32)
    return BoxQPResult(x=x, status=status, free=free, chol_free=chol,
                       n_iters=jnp.asarray(m + 6, jnp.int32))


def boxqp(Q, c, x0, lower, upper, cfg: BoxQPConfig = BoxQPConfig()) -> BoxQPResult:
    """Fixed-shape projected-Newton boxQP (ref: src/boxqp.cpp:26-139)."""
    m = x0.shape[0]
    dtype = x0.dtype
    eye = jnp.eye(m, dtype=dtype)

    x_init = clamp_to_limits(x0, lower, upper)
    # Reference quirk: the initial value has no ½ factor (boxqp.cpp:36).
    val_init = x_init @ (Q @ x_init) + x_init @ c

    def approx_eq(a, b):
        return jnp.abs(a - b) < cfg.clamp_tol

    def cond(carry):
        it, _x, _val, _oldval, _clamped, _chol, status = carry
        return jnp.logical_and(status == 0, it <= cfg.max_iter)

    # The reference's tolerances assume double precision; in f32 a
    # min_rel_improve of 1e-8 is below machine epsilon and the loop could
    # spin on last-bit oscillation. Floor the tolerance at ~10 ULP (no-op
    # in f64, where 1e-8 >> 2.2e-15).
    rel_improve_tol = max(cfg.min_rel_improve,
                          10.0 * float(jnp.finfo(dtype).eps))

    def body(carry):
        it, x, val, oldval, clamped, chol, _status = carry

        # --- break 1: stopped improving (checked before anything updates,
        #     ref boxqp.cpp:54-57; skipped on the first iteration)
        s_improve = jnp.logical_and(
            it > 0, (oldval - val) < rel_improve_tol * jnp.abs(oldval)
        )

        grad = Q @ x + c
        oldval_new = val  # ref :59 — only reached when not breaking on s_improve

        # --- active set (ref :61-71)
        new_clamped = jnp.logical_or(
            jnp.logical_and(approx_eq(x, lower), grad > 0),
            jnp.logical_and(approx_eq(x, upper), grad < 0),
        )
        free = ~new_clamped

        # --- break 2: everything clamped (ref :74-77) — note the factor is
        #     NOT updated in this case (factorization comes after the check)
        s_all_clamped = jnp.all(new_clamped)

        chol_new = masked_cholesky(Q, free)
        s_not_pd = jnp.any(jnp.isnan(chol_new))

        # --- break 3: free-subspace gradient small (ref :92-97)
        gnorm = jnp.linalg.norm(jnp.where(free, grad, jnp.zeros_like(grad)))
        s_small_grad = gnorm < cfg.min_grad

        # --- Newton step on free dims (ref :99-119)
        grad_clamped = Q @ jnp.where(new_clamped, x, jnp.zeros_like(x)) + c
        search = jnp.where(
            free, -free_solve(chol_new, grad_clamped, free) - x, jnp.zeros_like(x)
        )

        xc, v, ls_failed, _n = quadclamp_line_search(
            x, search, Q, c, lower, upper, cfg
        )

        # Break priority mirrors the reference's statement order.
        status_new = jnp.where(
            s_improve, 4,
            jnp.where(
                s_all_clamped, 6,
                jnp.where(
                    s_not_pd, -1,
                    jnp.where(s_small_grad, 5, jnp.where(ls_failed, 2, 0)),
                ),
            ),
        ).astype(jnp.int32)

        # Stage the state exactly as the reference leaves it at each break:
        #   s_improve: nothing below the check ran
        #   s_all_clamped: active set updated, factor NOT updated
        #   otherwise: factor updated; x/val update only if line search passed
        clamped_out = jnp.where(s_improve, clamped, new_clamped)
        chol_out = jnp.where(s_improve | s_all_clamped, chol, chol_new)
        take_step = status_new == 0
        x_out = jnp.where(take_step, xc, x)
        val_out = jnp.where(take_step, v, val)
        oldval_out = jnp.where(s_improve, oldval, oldval_new)

        return (it + 1, x_out, val_out, oldval_out, clamped_out, chol_out,
                status_new)

    from ilqr_tpu.utils.vma import vary

    init = vary((
        jnp.asarray(0, jnp.int32),
        x_init,
        val_init,
        jnp.zeros((), dtype),
        jnp.zeros((m,), bool),
        eye,
        jnp.asarray(0, jnp.int32),
    ), cfg.vma_axes)
    it, x, _val, _oldval, clamped, chol, status = lax.while_loop(cond, body, init)

    return BoxQPResult(
        x=x, status=status, free=~clamped, chol_free=chol, n_iters=it
    )
