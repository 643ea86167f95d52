"""Parallel-in-time backward pass via ``lax.associative_scan`` — O(log T)
depth instead of the serial T-step recursion.

The reference (and ops/backward.py) runs the Riccati/DDP recursion strictly
serially in t (ref: src/ilqr_core.cpp:358, SURVEY §3.3 "inherently
sequential"). For the *unconstrained* (no control box) case the recursion is
an LQR sweep, and LQR value functions compose associatively: following
Särkkä & García-Fernández, "Temporal Parallelization of Bayesian Smoothers"
(IEEE TAC 2021), §IV (parallel LQT), the conditional value function of a
time interval [t, s),

    V_{t→s}(x, z) = max_λ { λᵀ(z − A x − b) − ½ λᵀ C λ } + ½ xᵀ J x − xᵀ η,

is closed under composition, so suffix value functions for ALL t come from
one ``associative_scan`` (log₂ T parallel combine rounds of tiny-matrix
algebra — exactly what vmapped XLA batches well), and the gains k/K for all
t follow in one fully parallel step. This is the trajectory-optimization
analogue of sequence parallelism (SURVEY §5).

Element composition (i = earlier interval, j = later), derived by
minimizing over the interface state; G = (I + C_i J_j)⁻¹, t₁ = G(b_i+C_iη_j):

    A = A_j G A_i            b = A_j t₁ + b_j       C = C_j + A_j G C_i A_jᵀ
    η = η_i + A_iᵀ(η_j − J_j t₁)                    J = J_i + A_iᵀ J_j G A_i

Per-step initialization eliminates u from the quadratized stage cost
(completing the square over the cross term cxu and linear term cu) with the
λ-REGULARIZED control Hessian U = cuu + λI, i.e. this computes the value
functions of the Levenberg-Marquardt-regularized LQR subproblem. The serial
reference instead mixes regularized gains with unregularized V updates
(ilqr_core.cpp:367 vs :388-393), so iterates differ at λ > 0 — both are
valid LM schemes with the same λ→0 fixed points; at λ = 0 this matches the
serial sweep exactly (see tests/test_assoc_backward.py).

Enabled with ``SolverConfig(use_control_limits=False,
backward_mode="assoc")``; for control-limited problems the per-step boxQP
clamping destroys associativity DIRECTLY, but not conditionally: with the
active set FROZEN per (t, dim), clamped controls become constants (an
affine drift through the dynamics and a linear/const fold into the stage
cost) and the free subspace is an unconstrained LQR again — so the
composition stays associative. ``backward_pass_assoc_frozen`` exploits
this as projected Newton at the TRAJECTORY level: an unconstrained assoc
sweep proposes active sets, then a fixed number of refinement sweeps
(``cfg.assoc_refine_sweeps``) re-freeze the sets by the KKT rule and
re-sweep, each in O(log T) depth (``backward_mode="assoc_frozen"``).
Research-grade: the serial sweep remains the constrained default; the
iLQR line search + λ escalation guard the (rare) case of an unconverged
active set.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ilqr_tpu.config import SolverConfig
from ilqr_tpu.ops.boxqp import _chol_small, _cho_solve_small, _use_unrolled
from ilqr_tpu.types import BackwardResult, Derivs


def _chol_batched(M):
    """(..., m, m) SPD Cholesky — unrolled at the tiny f32 sizes of the
    control Hessian (see ops/boxqp._chol_small), LAPACK otherwise."""
    if _use_unrolled(M.dtype, M.shape[-1]):
        return _chol_small(M)
    return jnp.linalg.cholesky(M)


def _cho_solve_batched(chol, rhs):
    """Solve L Lᵀ X = rhs for matrix rhs (..., m, k), batched over T."""
    if _use_unrolled(rhs.dtype, rhs.shape[-2]):
        z = _cho_solve_small(chol[..., None, :, :],
                             jnp.swapaxes(rhs, -1, -2))
        return jnp.swapaxes(z, -1, -2)
    return jax.vmap(
        lambda c, r: jax.scipy.linalg.cho_solve((c, True), r))(chol, rhs)


class _Elem(NamedTuple):
    A: jnp.ndarray    # (n, n)
    b: jnp.ndarray    # (n,)
    C: jnp.ndarray    # (n, n)
    eta: jnp.ndarray  # (n,)
    J: jnp.ndarray    # (n, n)


def _combine(ei: _Elem, ej: _Elem) -> _Elem:
    """Compose earlier element ei with later element ej (batched over any
    leading axes by associative_scan)."""
    n = ei.A.shape[-1]
    eye = jnp.eye(n, dtype=ei.A.dtype)
    G = jnp.linalg.solve(eye + ei.C @ ej.J, eye)   # (I + C_i J_j)⁻¹
    AjG = ej.A @ G
    t1 = G @ (ei.b[..., None] + ei.C @ ej.eta[..., None])
    A = AjG @ ei.A
    b = (ej.A @ t1)[..., 0] + ej.b
    C = ej.C + AjG @ ei.C @ jnp.swapaxes(ej.A, -1, -2)
    AiT = jnp.swapaxes(ei.A, -1, -2)
    eta = ei.eta + (AiT @ (ej.eta[..., None] - ej.J @ t1))[..., 0]
    J = ei.J + AiT @ ej.J @ G @ ei.A
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    return _Elem(A=A, b=b, C=C, eta=eta, J=J)


def backward_pass_assoc(
    derivs: Derivs, us, lam, cfg: SolverConfig
) -> BackwardResult:
    """Unconstrained backward sweep in O(log T) depth. Same output contract
    as ops/backward.backward_pass (k, K, dV, diverged)."""
    T, m = us.shape
    n = derivs.cx.shape[-1]
    dtype = us.dtype
    eye_m = jnp.eye(m, dtype=dtype)
    eye_n = jnp.eye(n, dtype=dtype)

    F = derivs.fx                      # (T, n, n)
    L = derivs.fu                      # (T, n, m)
    LT = jnp.swapaxes(L, -1, -2)
    X = derivs.cxx[:-1]                # (T, n, n)
    alpha = derivs.cx[:-1]             # (T, n)
    M = derivs.cxu                     # (T, n, m)
    MT = jnp.swapaxes(M, -1, -2)
    beta = derivs.cu                   # (T, m)
    U = derivs.cuu + lam * eye_m       # (T, m, m) regularized

    # PD check on the regularized control Hessian (divergence signal, the
    # analogue of the serial sweep's non-PD QuuF detection).
    chol_U = _chol_batched(U)
    diverged = jnp.any(jnp.isnan(chol_U))

    Uinv = _cho_solve_batched(
        chol_U, jnp.broadcast_to(eye_m, U.shape))       # (T, m, m)
    LUinv = L @ Uinv                   # (T, n, m)
    UinvMT = Uinv @ MT                 # (T, m, n)

    # per-step elements after eliminating u (complete the square):
    A1 = F - L @ UinvMT                                    # F̃
    b1 = -(LUinv @ beta[..., None])[..., 0]
    C1 = LUinv @ LT
    Xt = X - M @ UinvMT
    alpha_t = alpha - (M @ (Uinv @ beta[..., None]))[..., 0]
    elems = _Elem(A=A1, b=b1, C=C1, eta=-alpha_t, J=Xt)

    # suffix compositions → V_{t+1} for every t, fully parallel
    vx, Vxx, bad_scan = _suffix_values(elems, derivs.cx[-1], derivs.cxx[-1])
    diverged = diverged | bad_scan

    LT_Vxx = LT @ Vxx
    qu = beta + (LT @ vx[..., None])[..., 0]
    quu = derivs.cuu + LT_Vxx @ L
    quuF = quu + lam * eye_m
    qux = MT + LT_Vxx @ F

    chol_q = _chol_batched(quuF)
    diverged = diverged | jnp.any(jnp.isnan(chol_q))
    sol = _cho_solve_batched(
        chol_q, jnp.concatenate([qu[..., None], qux], axis=-1))
    k = -sol[..., 0]                   # (T, m)
    K = -sol[..., 1:]                  # (T, m, n)
    k = jnp.where(jnp.isnan(k), jnp.zeros_like(k), k)
    K = jnp.where(jnp.isnan(K), jnp.zeros_like(K), K)

    dV = jnp.stack([
        jnp.sum(jnp.einsum("tm,tm->t", k, qu)),
        0.5 * jnp.sum(jnp.einsum("tm,tmp,tp->t", k, quu, k)),
    ])
    return BackwardResult(k=k, K=K, dV=dV, diverged=diverged)


# --- control-limited extension: frozen-active-set refinement sweeps -------


def _pad_ff(M, freef):
    """Identity-pad the free-free principal block of batched (T, m, m)
    matrices: clamped rows/cols replaced by e_i (the batched twin of
    ops/boxqp.masked_cholesky's padding)."""
    m = M.shape[-1]
    eye = jnp.eye(m, dtype=M.dtype)
    return (freef[..., :, None] * freef[..., None, :] * M
            + eye * (1.0 - freef)[..., :, None])


def _suffix_values(elems, cx_T, cxx_T):
    """Append the terminal element and run the reverse associative scan;
    returns (vx, Vxx) = V_{t+1} for every t (see backward_pass_assoc)."""
    n = cx_T.shape[-1]
    dtype = cx_T.dtype
    zero_n = jnp.zeros((1, n, n), dtype)
    term = _Elem(A=zero_n, b=jnp.zeros((1, n), dtype), C=zero_n,
                 eta=-cx_T[None], J=cxx_T[None])
    all_elems = jax.tree_util.tree_map(
        lambda a, t: jnp.concatenate([a, t], axis=0), elems, term)
    # suffix compositions: comb[t] = e_t ⊗ e_{t+1} ⊗ … ⊗ e_T.
    # associative_scan(reverse=True) flips the sequence but keeps the
    # operator's positional order, so the operands arrive (later, earlier)
    # — swap them to keep ⊗'s (earlier, later) orientation.
    comb = lax.associative_scan(
        lambda a, b: _combine(b, a), all_elems, reverse=True, axis=0)
    bad = jnp.any(jnp.isnan(comb.J)) | jnp.any(jnp.isnan(comb.eta))
    return -comb.eta[1:], comb.J[1:], bad


def backward_pass_assoc_frozen(
    derivs: Derivs, us, lam, u_min, u_max, cfg: SolverConfig
) -> BackwardResult:
    """Control-limited backward sweep in O(log T) depth via frozen active
    sets (module docstring; the serial analogue is ops/backward.py +
    boxQP clamping, ref src/ilqr_core.cpp:358-401 + boxqp.cpp:26-139).

    Scheme (projected Newton lifted to the trajectory level):
      0. unconstrained assoc sweep → propose clamped dims where the
         unconstrained gains leave the box;
      1..R. freeze the sets: clamped (t, i) contribute a constant control
         (an affine drift L·k_c through the dynamics, linear/const folds
         into the stage cost), complete the square over the FREE dims
         through the identity-padded masked control Hessian, assoc-scan
         the resulting elements, and re-derive the sets from the KKT rule
         at the new gains (R = ``cfg.assoc_refine_sweeps``);
      final. gains from the last sweep's values, k clamped into the box,
         K zero on clamped rows (ref :377-385 semantics).

    Exact (vs the serial constrained sweep at λ=0) whenever the active
    sets converge: on a random LQR with ~52% of (t, dim) pairs on a face,
    agreement reaches machine precision (max|Δk| = 6.8e-16) after 5
    refinement sweeps (tests/test_assoc_backward.py). The default R=2 is
    the cheap approximate setting — a non-converged set yields a descent-
    direction approximation that the iLQR line search and λ escalation
    absorb, exactly like the reference's tolerance-limited boxQP iterate.
    """
    T, m = us.shape
    dtype = us.dtype
    eye_m = jnp.eye(m, dtype=dtype)

    lo = u_min[None] - us                  # (T, m) box on delta-u
    hi = u_max[None] - us

    F = derivs.fx
    L = derivs.fu
    LT = jnp.swapaxes(L, -1, -2)
    X = derivs.cxx[:-1]
    alpha = derivs.cx[:-1]
    M = derivs.cxu
    beta = derivs.cu
    cuu = derivs.cuu
    U_reg = cuu + lam * eye_m

    def frozen_sweep(freef, uc):
        """One assoc value sweep with the active set frozen: freef (T, m)
        f32 0/1, uc (T, m) the clamped dims' control (0 on free dims).
        Returns (k, K, dV, diverged, qu, quuF) — gains at the new values."""
        Upad = _pad_ff(U_reg, freef)
        chol_U = _chol_batched(Upad)
        bad = jnp.any(jnp.isnan(chol_U))
        Uinv = _cho_solve_batched(
            chol_U, jnp.broadcast_to(eye_m, Upad.shape))
        Lf = L * freef[:, None, :]         # clamped columns zeroed
        Mf = M * freef[:, None, :]
        MfT = jnp.swapaxes(Mf, -1, -2)
        # clamped controls fold into linear/const terms
        beta_t = (beta + (cuu @ uc[..., None])[..., 0]) * freef
        alpha0 = alpha + (M @ uc[..., None])[..., 0]
        b0 = (L @ uc[..., None])[..., 0]   # affine drift through dynamics
        LUinv = Lf @ Uinv
        UinvMfT = Uinv @ MfT
        A1 = F - Lf @ UinvMfT
        b1 = b0 - (LUinv @ beta_t[..., None])[..., 0]
        C1 = LUinv @ jnp.swapaxes(Lf, -1, -2)
        Xt = X - Mf @ UinvMfT
        alpha_t = alpha0 - (Mf @ (Uinv @ beta_t[..., None]))[..., 0]
        elems = _Elem(A=A1, b=b1, C=C1, eta=-alpha_t, J=Xt)

        vx, Vxx, bad_scan = _suffix_values(
            elems, derivs.cx[-1], derivs.cxx[-1])

        LT_Vxx = LT @ Vxx
        qu = beta + (LT @ vx[..., None])[..., 0]
        quu = cuu + LT_Vxx @ L
        quuF = quu + lam * eye_m
        qux = jnp.swapaxes(M, -1, -2) + LT_Vxx @ F

        Qpad = _pad_ff(quuF, freef)
        chol_q = _chol_batched(Qpad)
        bad = bad | bad_scan | jnp.any(jnp.isnan(chol_q))
        rhs_k = ((qu + (quuF @ uc[..., None])[..., 0]) * freef)
        kf = -_cho_solve_batched(chol_q, rhs_k[..., None])[..., 0]
        k = freef * kf + uc
        qux_f = qux * freef[..., :, None]  # clamped rows zeroed
        K = -_cho_solve_batched(chol_q, qux_f) * freef[..., :, None]
        k = jnp.where(jnp.isnan(k), jnp.zeros_like(k), k)
        K = jnp.where(jnp.isnan(K), jnp.zeros_like(K), K)
        dV = jnp.stack([
            jnp.sum(jnp.einsum("tm,tm->t", k, qu)),
            0.5 * jnp.sum(jnp.einsum("tm,tmp,tp->t", k, quu, k)),
        ])
        return k, K, dV, bad, qu, quuF

    # sweep 0: unconstrained proposal
    res0 = backward_pass_assoc(derivs, us, lam, cfg)
    diverged = res0.diverged
    cl_lo = res0.k < lo
    cl_hi = res0.k > hi

    k = K = dV = None
    for _ in range(max(int(cfg.assoc_refine_sweeps), 1)):
        freef = jnp.where(cl_lo | cl_hi, jnp.zeros_like(us),
                          jnp.ones_like(us))
        uc = jnp.where(cl_lo, lo, jnp.where(cl_hi, hi, jnp.zeros_like(us)))
        k, K, dV, bad, qu, quuF = frozen_sweep(freef, uc)
        diverged = diverged | bad
        # KKT re-freeze at the clamped candidate
        kcl = jnp.clip(k, lo, hi)
        g = qu + (quuF @ kcl[..., None])[..., 0]
        cl_lo = (kcl <= lo) & (g > 0)
        cl_hi = (kcl >= hi) & (g < 0)

    return BackwardResult(k=jnp.clip(k, lo, hi), K=K, dV=dV,
                          diverged=diverged)
