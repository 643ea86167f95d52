"""Planar rigid body with a ring of M one-sided thrusters — the wide-m
model family (extra models; no reference counterpart, following the Model
contract of include/model.h:8-20).

  state   = [px, py, θ, vx, vy, ω]       (n = 6)
  control = u_0 … u_{M-1}, thrust in [0, f_max] each   (m = M)

M thrusters sit on a body-fixed ring at angles φ_i = 2πi/M:
even-indexed ones point radially inward (pure force through the center of
mass, zero torque), odd-indexed ones point tangentially with alternating
handedness (i ≡ 1 mod 4 spin +, i ≡ 3 mod 4 spin −), so both force
directions and both torque signs are reachable with one-sided actuators.
Body force rotates into the world frame through θ — the only nonlinearity,
giving fx live sin/cos entries.

Registered instances (``build_ring_model`` makes any multiple of 4):

- ``thruster_ring`` (M = 12): TPU-measured at 12,025-16,941 fused
  solves/s; also the workload for the wide-m vmap-route probes
  (the worker-fault bisect, BENCH_NOTES round 5).
- ``thruster_ring16`` (M = 16): 6,474 fused solves/s, 750 s Mosaic
  compile (the round-5 compile-wall probe that raised the cap 12→16).
- ``thruster_ring20`` (M = 20): 4,104 fused solves/s, 1,065 s compile.
- ``thruster_ring24`` (M = 24) sits AT the fused kernels' MAX_FUSED_M
  = 24 cap (ops/pallas_sweep.py — the largest in-kernel
  projected-Newton QP; measured 2,616 fused solves/s at 2,166 s Mosaic
  compile, B=1024 T=80 ≤40 iters — serve it via an AOT blob, the
  compile is 36 min). The contained any-m vmap route
  (batch.solve_batch_wide) is exercised by dataclasses-widened test
  models past the cap and by these models with path="vmap" pinned.

One-sided boxes + a linear fuel cost keep ~2/3 of the controls pinned at
their lower bound, so the QP's active-set machinery does real work every
timestep (like omni_thruster, scaled up).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ilqr_tpu.models.base import Model

_RING_RADIUS = 0.5


def _ring_geometry(m):
    """Body-frame thrust directions (m, 2) and torque arms (m,) — numpy
    trace-time constants (converted at use to the input dtype so x64 runs
    don't get silently promoted f32 literals)."""
    dirs = np.zeros((m, 2))
    torque = np.zeros((m,))
    for i in range(m):
        phi = 2.0 * math.pi * i / m
        if i % 2 == 0:                      # radial, inward: force only
            dirs[i] = (-math.cos(phi), -math.sin(phi))
            torque[i] = 0.0
        else:                               # tangential: force + torque
            s = 1.0 if i % 4 == 1 else -1.0
            dirs[i] = (-s * math.sin(phi), s * math.cos(phi))
            torque[i] = s * _RING_RADIUS
    # cos/sin of multiples of π/2 leave ~1e-16 residue — snap to exact
    # zeros so the SoA structural-zero folding (and the kernels'
    # trace-time constant elimination) actually fires on them.
    dirs[np.abs(dirs) < 1e-12] = 0.0
    return dirs, torque


class ThrusterRingParams(NamedTuple):
    goal: jnp.ndarray       # (6,) [px, py, θ, vx, vy, ω]
    mass: jnp.ndarray       # scalar
    inertia: jnp.ndarray    # scalar
    drag: jnp.ndarray       # scalar linear translational drag
    drag_w: jnp.ndarray     # scalar linear rotational drag
    w_state: jnp.ndarray    # (6,) running weights
    w_control: jnp.ndarray  # (M,) quadratic control weights
    w_fuel: jnp.ndarray     # scalar linear fuel cost per unit thrust
    w_final: jnp.ndarray    # (6,)
    u_min: jnp.ndarray      # (M,) zeros — thrusters are one-sided
    u_max: jnp.ndarray      # (M,)


def build_ring_model(m_thrusters: int, name: str):
    """Returns ``(Model, default_params)`` for an ``m_thrusters``-ring.

    ``m_thrusters`` must be a multiple of 4 (the alternating tangential
    handedness then balances torque authority in both signs)."""
    if m_thrusters % 4:
        raise ValueError(
            f"m_thrusters must be a multiple of 4, got {m_thrusters}")
    M = int(m_thrusters)
    DIRS, TORQUE = _ring_geometry(M)

    def default_params(goal=(1.5, -1.0, 0.8, 0.0, 0.0, 0.0)
                       ) -> ThrusterRingParams:
        return ThrusterRingParams(
            goal=jnp.asarray(goal, dtype=jnp.result_type(float)),
            mass=jnp.asarray(1.0),
            inertia=jnp.asarray(0.1),
            drag=jnp.asarray(0.1),
            drag_w=jnp.asarray(0.05),
            w_state=jnp.asarray([0.5, 0.5, 0.5, 0.05, 0.05, 0.05]),
            w_control=jnp.asarray([0.02] * M),
            w_fuel=jnp.asarray(0.05),
            w_final=jnp.asarray([200.0, 200.0, 200.0, 20.0, 20.0, 20.0]),
            u_min=jnp.zeros(M),
            u_max=jnp.asarray([8.0] * M),
        )

    def dynamics(p: ThrusterRingParams, x, u):
        # Build the ring-geometry "constants" from scalar literals × a
        # varying params scalar, NEVER as bare array constants: an
        # invariant array created inside the solver's while_loop body is
        # hoisted as a constvar, auto-promoted to varying by jax 0.9's
        # shard_map invariant→varying insertion, and any pvary already
        # staged on it (auto OR explicit) then re-applies and fails
        # ("pvary is a invariant->variant collective") on the sharded
        # vmap path (shard_map(check_vma=True) + vmap(jacfwd)). Scalar
        # literals are inlined into the jaxpr — no constvar, no
        # promotion, no mis-fire — and XLA folds the multiplies. See
        # parallel/mesh.py for the params/dt half of this story.
        one = jnp.ones_like(p.mass)
        dirs = jnp.stack([
            jnp.stack([float(DIRS[i, 0]) * one, float(DIRS[i, 1]) * one])
            for i in range(M)])
        arms = jnp.stack([float(TORQUE[i]) * one for i in range(M)])
        fb = dirs.T @ u                          # (2,) body-frame force
        ct, st = jnp.cos(x[2]), jnp.sin(x[2])
        inv_m = 1.0 / p.mass
        ax = (ct * fb[0] - st * fb[1]) * inv_m - p.drag * x[3]
        ay = (st * fb[0] + ct * fb[1]) * inv_m - p.drag * x[4]
        aw = (arms @ u) / p.inertia - p.drag_w * x[5]
        return jnp.stack([x[3], x[4], x[5], ax, ay, aw])

    def cost(p: ThrusterRingParams, x, u):
        e = p.goal - x
        return (jnp.dot(e * p.w_state, e) + jnp.dot(u * p.w_control, u)
                + p.w_fuel * jnp.sum(u))

    def final_cost(p: ThrusterRingParams, x):
        e = p.goal - x
        return jnp.dot(e * p.w_final, e)

    # --- SoA variants (elementwise only; (dims, *batch) layout) --------
    #
    # The ring geometry enters as Python-float coefficients (many exactly
    # 0, ±1, ±½, ±√3/2), so the sweep kernel's trace-time constant
    # folding (ops/pallas_sweep._fmul/_fadd) drops the structural zeros.

    def _d(i, a):
        return float(DIRS[i, a])

    def _fb(u):
        """Body-frame force components Σᵢ dᵢ·uᵢ as elementwise sums,
        skipping zero coefficients at trace time."""
        fb0 = None
        fb1 = None
        for i in range(M):
            if _d(i, 0) != 0.0:
                t = _d(i, 0) * u[i]
                fb0 = t if fb0 is None else fb0 + t
            if _d(i, 1) != 0.0:
                t = _d(i, 1) * u[i]
                fb1 = t if fb1 is None else fb1 + t
        return fb0, fb1

    def dynamics_soa(p: ThrusterRingParams, x, u):
        ct, st = jnp.cos(x[2]), jnp.sin(x[2])
        fb0, fb1 = _fb(u)
        inv_m = 1.0 / p.mass
        ax = (ct * fb0 - st * fb1) * inv_m - p.drag * x[3]
        ay = (st * fb0 + ct * fb1) * inv_m - p.drag * x[4]
        aw = None
        for i in range(M):
            if float(TORQUE[i]) != 0.0:
                t = float(TORQUE[i]) * u[i]
                aw = t if aw is None else aw + t
        aw = aw / p.inertia - p.drag_w * x[5]
        return jnp.stack([x[3], x[4], x[5], ax, ay, aw])

    def cost_soa(p: ThrusterRingParams, x, u):
        acc = None
        for i in range(6):
            e = p.goal[i] - x[i]
            t = e * p.w_state[i] * e
            acc = t if acc is None else acc + t
        for j in range(M):
            acc = acc + u[j] * (p.w_control[j] * u[j] + p.w_fuel)
        return acc

    def final_cost_soa(p: ThrusterRingParams, x):
        acc = None
        for i in range(6):
            e = p.goal[i] - x[i]
            t = e * p.w_final[i] * e
            acc = t if acc is None else acc + t
        return acc

    def jac_soa(p: ThrusterRingParams, x, u):
        """Closed-form continuous-time Jacobians. Live entries: the θ
        column of the accelerations (the rotation is the only
        nonlinearity), the diagonal drags, and the rotated
        thrust-direction columns of B; everything else is a structural
        Python-float constant."""
        ct, st = jnp.cos(x[2]), jnp.sin(x[2])
        fb0, fb1 = _fb(u)
        inv_m = 1.0 / p.mass
        A = [[0.0] * 6 for _ in range(6)]
        for a in range(3):
            A[a][3 + a] = 1.0
        A[3][2] = (-st * fb0 - ct * fb1) * inv_m
        A[4][2] = (ct * fb0 - st * fb1) * inv_m
        A[3][3] = -1.0 * p.drag
        A[4][4] = -1.0 * p.drag
        A[5][5] = -1.0 * p.drag_w
        B = [[0.0] * M for _ in range(6)]
        for i in range(M):
            d0, d1 = _d(i, 0), _d(i, 1)
            B[3][i] = (ct * d0 - st * d1) * inv_m
            B[4][i] = (st * d0 + ct * d1) * inv_m
            if float(TORQUE[i]) != 0.0:
                B[5][i] = float(TORQUE[i]) / p.inertia
        return A, B

    def cost_derivs_soa(p: ThrusterRingParams, x, u):
        cx = [-2.0 * p.w_state[i] * (p.goal[i] - x[i]) for i in range(6)]
        cu = [2.0 * p.w_control[j] * u[j] + p.w_fuel for j in range(M)]
        cxx = [[2.0 * p.w_state[i] if i == j else 0.0
                for j in range(6)] for i in range(6)]
        cxu = [[0.0] * M for _ in range(6)]
        cuu = [[2.0 * p.w_control[i] if i == j else 0.0
                for j in range(M)] for i in range(M)]
        return cx, cu, cxx, cxu, cuu

    def final_cost_derivs_soa(p: ThrusterRingParams, x):
        cx = [-2.0 * p.w_final[i] * (p.goal[i] - x[i]) for i in range(6)]
        cxx = [[2.0 * p.w_final[i] if i == j else 0.0
                for j in range(6)] for i in range(6)]
        return cx, cxx

    model = Model(
        name=name,
        n=6,
        m=M,
        dynamics=dynamics,
        cost=cost,
        final_cost=final_cost,
        default_params=default_params,
        dynamics_soa=dynamics_soa,
        cost_soa=cost_soa,
        final_cost_soa=final_cost_soa,
        jac_soa=jac_soa,
        cost_derivs_soa=cost_derivs_soa,
        final_cost_derivs_soa=final_cost_derivs_soa,
    )
    return model, default_params


MODEL, default_params = build_ring_model(12, "thruster_ring")
MODEL16, default_params16 = build_ring_model(16, "thruster_ring16")
MODEL20, default_params20 = build_ring_model(20, "thruster_ring20")
MODEL24, default_params24 = build_ring_model(24, "thruster_ring24")
