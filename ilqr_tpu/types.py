"""Core pytree types threaded through the solver.

The reference mutates member arrays of a stateful ``iLQR`` object in place and
keeps the Levenberg-Marquardt state in file-scope statics shared by every
instance (ref: include/ilqr.h:17-18, 56-85). Here everything is an immutable
pytree so the whole solve vmaps/shards/checkpoints for free.
"""

from __future__ import annotations

import enum
from typing import NamedTuple

import jax.numpy as jnp


class TerminationReason(enum.IntEnum):
    """Why the outer loop stopped (ref termination sites in ilqr_core.cpp)."""

    RUNNING = 0
    GRAD_TOL = 1      # gradient norm < tolGrad with small λ (ref :153-159)
    FUN_TOL = 2       # cost improvement < tolFun (ref :257-262)
    LAMBDA_MAX = 3    # λ exceeded λmax (ref :276-281 and backward :146)
    MAX_ITER = 4      # iteration cap (ref :285)


class Derivs(NamedTuple):
    """Linearization of dynamics and quadratization of cost along (xs, us).

    Shapes (T = horizon, n = state dims, m = control dims):
      fx  (T, n, n)   Jacobian of the DISCRETE step wrt x  (≈ I + A·dt)
      fu  (T, n, m)   Jacobian of the discrete step wrt u
      cx  (T+1, n)    running-cost gradient; row T is the final-cost gradient
      cu  (T, m)
      cxx (T+1, n, n) row T is the final-cost Hessian
      cxu (T, n, m)
      cuu (T, m, m)

    The reference allocates T+1 entries for everything and leaves fx/fu[T],
    cu/cxu/cuu[T] zero or garbage that the backward pass never reads
    (ref: src/derivatives.cpp:15-74); we simply don't store them.

    ``fxx``/``fxu``/``fuu`` are the second-order dynamics tensors used by
    full DDP (``SolverConfig.full_ddp``) — the ``full_DDP`` option of Tassa's
    original MATLAB iLQG that the reference never implemented (it is
    Gauss-Newton iLQR only; ref src/ilqr_core.cpp:359-363 has no
    second-order terms). ``None`` (an empty pytree subtree) unless enabled:
      fxx (T, n, n, n)  fxx[t, i, j, k] = ∂²f_i/∂x_j∂x_k of the discrete step
      fxu (T, n, n, m)  ∂²f_i/∂x_j∂u_k
      fuu (T, n, m, m)  ∂²f_i/∂u_j∂u_k
    """

    fx: jnp.ndarray
    fu: jnp.ndarray
    cx: jnp.ndarray
    cu: jnp.ndarray
    cxx: jnp.ndarray
    cxu: jnp.ndarray
    cuu: jnp.ndarray
    fxx: jnp.ndarray = None
    fxu: jnp.ndarray = None
    fuu: jnp.ndarray = None


class BoxQPResult(NamedTuple):
    """Result of the projected-Newton boxQP (ref: include/boxqp.h:35-43).

    ``status`` follows the reference's code convention ("higher is better"):
      <1 : failure → backward pass treats as divergence (ref ilqr_core.cpp:371)
       2 : internal line search failed (still accepted by the caller!)
       4 : relative improvement below tolerance
       5 : free-subspace gradient norm below tolerance
       6 : all dimensions clamped
    ``chol_free`` is the Cholesky factor (lower) of Q restricted to the free
    subspace, padded to m×m with identity on clamped dims so shapes are static
    (replaces the reference's dynamic-size R_free + masked gather/scatter,
    ref: include/eigen_helpers.h:15-61).
    """

    x: jnp.ndarray
    status: jnp.ndarray
    free: jnp.ndarray       # bool (m,) — free (unclamped) dimensions
    chol_free: jnp.ndarray  # (m, m) lower-triangular padded factor
    n_iters: jnp.ndarray


class BackwardResult(NamedTuple):
    """Output of one backward sweep (ref: src/ilqr_core.cpp:350-401)."""

    k: jnp.ndarray        # (T, m) feedforward
    K: jnp.ndarray        # (T, m, n) feedback gains
    dV: jnp.ndarray       # (2,) expected cost reduction coefficients
    diverged: jnp.ndarray  # bool — any timestep failed (non-PD Quu / QP fail)


class SolverState(NamedTuple):
    """Full solver state — a small pytree, trivially checkpointable."""

    xs: jnp.ndarray       # (T+1, n)
    us: jnp.ndarray       # (T, m)
    cost: jnp.ndarray     # scalar
    lam: jnp.ndarray      # scalar λ (ref's mutable static `lambda`)
    dlam: jnp.ndarray     # scalar dλ
    k: jnp.ndarray        # (T, m)
    K: jnp.ndarray        # (T, m, n)
    derivs: Derivs
    flg_change: jnp.ndarray  # bool — trajectory changed, re-linearize
    iteration: jnp.ndarray   # int
    done: jnp.ndarray        # bool
    reason: jnp.ndarray      # int (TerminationReason)
    gnorm: jnp.ndarray       # scalar — last gradient norm
    dcost: jnp.ndarray       # scalar — last accepted cost reduction
    expected: jnp.ndarray    # scalar — last expected reduction
    step_accepted: jnp.ndarray  # bool — last iteration took a step


class Solution(NamedTuple):
    """What a solve returns; also the warm-start payload for MPC."""

    xs: jnp.ndarray
    us: jnp.ndarray
    k: jnp.ndarray
    K: jnp.ndarray
    cost: jnp.ndarray
    lam: jnp.ndarray
    dlam: jnp.ndarray
    iterations: jnp.ndarray
    reason: jnp.ndarray
    gnorm: jnp.ndarray
