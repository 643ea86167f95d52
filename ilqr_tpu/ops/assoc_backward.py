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
backward_mode="assoc")``; control-limited problems need the serial sweep
(the per-step boxQP clamping destroys associativity).
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

    # terminal element: V_T(x) = ½xᵀ cxx_T x + xᵀ cx_T
    zero_n = jnp.zeros((1, n, n), dtype)
    term = _Elem(
        A=zero_n, b=jnp.zeros((1, n), dtype), C=zero_n,
        eta=-derivs.cx[-1][None], J=derivs.cxx[-1][None],
    )
    all_elems = jax.tree_util.tree_map(
        lambda a, t: jnp.concatenate([a, t], axis=0), elems, term)

    # suffix compositions: comb[t] = e_t ⊗ e_{t+1} ⊗ … ⊗ e_T.
    # associative_scan(reverse=True) flips the sequence but keeps the
    # operator's positional order, so the operands arrive (later, earlier)
    # — swap them to keep ⊗'s (earlier, later) orientation.
    comb = lax.associative_scan(
        lambda a, b: _combine(b, a), all_elems, reverse=True, axis=0)

    # V_{t+1} for every t, fully parallel
    Vxx = comb.J[1:]                   # (T, n, n)
    vx = -comb.eta[1:]                 # (T, n)

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
    diverged = diverged | jnp.any(jnp.isnan(comb.J)) | jnp.any(jnp.isnan(comb.eta))
    return BackwardResult(k=k, K=K, dV=dV, diverged=diverged)
