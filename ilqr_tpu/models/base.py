"""Model abstraction: pure functions over pytree parameters.

Replaces the reference's abstract base class with virtual dispatch
(ref: include/model.h:6-21). A model is three pure functions —
``dynamics(params, x, u) -> dx``, ``cost(params, x, u) -> scalar``,
``final_cost(params, x) -> scalar`` — plus static dims. Parameters (goal,
masses, control limits, …) live in a pytree so a single compiled solver can be
vmapped over thousands of different goals/limits, which virtual dispatch can
never do.

Control limits are part of the *params* (``u_min``/``u_max`` arrays, matching
ref model data members model.h:17-18) so they batch too.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax.numpy as jnp

Array = jnp.ndarray
DynamicsFn = Callable[[Any, Array, Array], Array]
CostFn = Callable[[Any, Array, Array], Array]
FinalCostFn = Callable[[Any, Array], Array]


@dataclasses.dataclass(frozen=True)
class Model:
    """Static model definition. Hashable → usable as a jit static argument.

    The optional ``*_soa`` functions are structure-of-arrays variants used
    by the fused Pallas rollout kernel (ops/pallas_rollout): they receive
    ``x`` of shape (n, *batch), ``u`` of shape (m, *batch) and params whose
    leaves carry trailing ``*batch`` dims, index only leading axes, and use
    only elementwise jnp ops (no jnp.linalg, no matmul) so they lower inside
    a TPU kernel where every scalar of the model math is one full-width VPU
    op over a (8, 128) tile of problems. Models without SoA variants still
    work everywhere — they just don't get the fused rollout.
    """

    name: str
    n: int  # state dims   (ref: model.h:19 x_dims)
    m: int  # control dims (ref: model.h:20 u_dims)
    dynamics: DynamicsFn
    cost: CostFn
    final_cost: FinalCostFn
    default_params: Callable[[], Any]
    dynamics_soa: Any = None
    cost_soa: Any = None
    final_cost_soa: Any = None
    # Optional ANALYTIC SoA derivatives — hand-written closed forms the
    # merged sweep kernel (ops/pallas_sweep) uses instead of in-register
    # JVP re-derivation (which unrolls ~10× the vector ops per timestep).
    # Same SoA conventions (elementwise ops on (…, *batch) tiles):
    #   jac_soa(p, x, u) -> (A, B): A[i][j] = ∂f_i/∂x_j (n×n nested
    #     lists of tiles), B[i][j] = ∂f_i/∂u_j (n×m) — CONTINUOUS-time
    #     Jacobians of ``dynamics``; the kernel forms the discrete-step
    #     fx = I + dt·A, fu = dt·B (Euler).
    #   cost_derivs_soa(p, x, u) -> (cx[n], cu[m], cxx[n][n],
    #     cxu[n][m], cuu[m][m]) — derivatives of ``cost``.
    #   final_cost_derivs_soa(p, x) -> (cx[n], cxx[n][n]).
    # Entries that are STRUCTURALLY constant (zeros, the [0 I] velocity
    # rows, …) should be plain Python floats, not tiles: the sweep kernel
    # folds x·0 / x·1 / +0 with such constants out of the trace
    # (ops/pallas_sweep.py _fmul/_fadd) — Mosaic does not algebraically
    # simplify them, and mechanical models are mostly structural zeros.
    jac_soa: Any = None
    cost_derivs_soa: Any = None
    final_cost_derivs_soa: Any = None

    @property
    def has_soa(self) -> bool:
        return (self.dynamics_soa is not None and self.cost_soa is not None
                and self.final_cost_soa is not None)

    @property
    def has_analytic_soa(self) -> bool:
        return (self.jac_soa is not None
                and self.cost_derivs_soa is not None
                and self.final_cost_derivs_soa is not None)

    def __hash__(self):  # identity of the registered functions
        return hash((self.name, self.n, self.m))


def euler_step(model: Model, params, x: Array, u: Array, dt) -> Array:
    """Explicit Euler: x + f(x,u)·dt (ref: include/model.h:12-15)."""
    return x + model.dynamics(params, x, u) * dt


def rk4_step(model: Model, params, x: Array, u: Array, dt) -> Array:
    """Classic RK4 with zero-order-hold control — a corrected-mode option the
    reference lacks (its README warns dt must be small for Euler stability,
    ref: src/run_ilqr.cpp:44)."""
    f = lambda xx: model.dynamics(params, xx, u)
    k1 = f(x)
    k2 = f(x + 0.5 * dt * k1)
    k3 = f(x + 0.5 * dt * k2)
    k4 = f(x + dt * k3)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


_INTEGRATORS = {"euler": euler_step, "rk4": rk4_step}


def get_integrator(name: str):
    try:
        return _INTEGRATORS[name]
    except KeyError:
        raise ValueError(
            f"unknown integrator {name!r}; have {sorted(_INTEGRATORS)}"
        ) from None
