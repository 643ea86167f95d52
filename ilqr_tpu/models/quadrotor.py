"""Quadrotor hover/waypoint: the generic-m (m=4) workload.

The reference's boxQP machinery supports ARBITRARY control dimension
(ref src/boxqp.cpp:26-139, include/boxqp.h:45-46), but neither of its
shipped models goes past m=2, and this repo's other models stop at m=3
(the in-kernel enumeration limit). This model is the first to drive the
generic-m leg end-to-end: at m=4 the backward pass uses the iterative
masked projected-Newton boxQP (ops/boxqp.boxqp — the re-design of ref
src/boxqp.cpp:26-139) with per-timestep warm starts, on the vmap/XLA
path (the fused Pallas solver requires m ≤ 3 and rejects it).

Per-rotor thrusts also make the box ASYMMETRIC (u ∈ [0, f_max] — rotors
cannot push down), unlike every other model's symmetric ±limit, so the
clamped-set logic is exercised off-center.

  state   = [p (3), v (3), φ θ ψ (ZYX Euler), ω (3)]   (n = 12)
  control = per-rotor thrusts [f1, f2, f3, f4]          (m = 4)

  ṗ = v
  v̇ = (F/m)·R(φ,θ,ψ)e₃ − g·e₃          F = Σfᵢ
  [φ̇, θ̇, ψ̇] = W(φ,θ)·ω                 (body rates → Euler rates)
  ω̇ = J⁻¹(τ − ω × Jω)                   diagonal J, '+'-configuration:
      τx = L(f₂ − f₄), τy = L(f₃ − f₁), τz = c_τ(f₁ − f₂ + f₃ − f₄)

  cost = (g−x)ᵀHx(g−x) + (u−u_hover)ᵀHu(u−u_hover), final = s·(g−x)ᵀHx(g−x)
  (the quadratic structure of double_integrator.h:39-48, control cost
  centered on hover thrust so "do nothing" is cheap at the goal).

The Euler-rate map W has the usual tan θ / sec θ singularity at
θ = ±π/2; hover/waypoint tasks stay far from it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ilqr_tpu.models.base import Model


class QuadrotorParams(NamedTuple):
    goal: jnp.ndarray         # (12,)
    mass: jnp.ndarray         # scalar
    gravity: jnp.ndarray      # scalar
    arm: jnp.ndarray          # scalar rotor arm length L
    c_tau: jnp.ndarray        # scalar thrust→yaw-torque coefficient
    inertia: jnp.ndarray      # (3,) diagonal of J
    hx_diag: jnp.ndarray      # (12,) diagonal of Hx
    hu_diag: jnp.ndarray      # (4,) diagonal of Hu
    final_scale: jnp.ndarray  # scalar
    u_min: jnp.ndarray        # (4,)
    u_max: jnp.ndarray        # (4,)


def default_params(
    goal=(1.0, 0.5, 0.8, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
) -> QuadrotorParams:
    """500 g '+'-frame quadrotor. Hover thrust mg/4 ≈ 1.23 N per rotor is
    well inside the [0, 3] N box."""
    return QuadrotorParams(
        goal=jnp.asarray(goal, dtype=jnp.result_type(float)),
        mass=jnp.asarray(0.5),
        gravity=jnp.asarray(9.81),
        arm=jnp.asarray(0.17),
        c_tau=jnp.asarray(0.016),
        inertia=jnp.asarray([2.3e-3, 2.3e-3, 4.0e-3]),
        hx_diag=jnp.asarray([2.0, 2.0, 2.0,          # position
                             0.2, 0.2, 0.2,          # velocity
                             1.0, 1.0, 1.0,          # attitude
                             0.05, 0.05, 0.05]),     # body rates
        hu_diag=jnp.asarray([0.2, 0.2, 0.2, 0.2]),
        final_scale=jnp.asarray(25.0),
        u_min=jnp.asarray([0.0, 0.0, 0.0, 0.0]),
        u_max=jnp.asarray([3.0, 3.0, 3.0, 3.0]),
    )


def hover_control(p: QuadrotorParams) -> jnp.ndarray:
    """The per-rotor thrust that exactly cancels gravity (mg/4 each)."""
    return jnp.full((4,), p.mass * p.gravity / 4.0,
                    dtype=jnp.result_type(float))


def dynamics(p: QuadrotorParams, x, u):
    v = x[3:6]
    phi, theta, psi = x[6], x[7], x[8]
    om = x[9:12]

    F = u[0] + u[1] + u[2] + u[3]
    tau = jnp.stack([
        p.arm * (u[1] - u[3]),
        p.arm * (u[2] - u[0]),
        p.c_tau * (u[0] - u[1] + u[2] - u[3]),
    ])

    sph, cph = jnp.sin(phi), jnp.cos(phi)
    sth, cth = jnp.sin(theta), jnp.cos(theta)
    sps, cps = jnp.sin(psi), jnp.cos(psi)

    # world-frame thrust direction: third column of R_zyx(ψ, θ, φ)
    acc = (F / p.mass) * jnp.stack([
        cph * sth * cps + sph * sps,
        cph * sth * sps - sph * cps,
        cph * cth,
    ]) - jnp.stack([0.0 * F, 0.0 * F, p.gravity])

    tth = sth / cth
    eul_rate = jnp.stack([
        om[0] + sph * tth * om[1] + cph * tth * om[2],
        cph * om[1] - sph * om[2],
        (sph * om[1] + cph * om[2]) / cth,
    ])

    J = p.inertia
    om_dot = jnp.stack([
        (tau[0] - (J[2] - J[1]) * om[1] * om[2]) / J[0],
        (tau[1] - (J[0] - J[2]) * om[2] * om[0]) / J[1],
        (tau[2] - (J[1] - J[0]) * om[0] * om[1]) / J[2],
    ])

    return jnp.concatenate([v, acc, eul_rate, om_dot])


def cost(p: QuadrotorParams, x, u):
    e = p.goal - x
    du = u - p.mass * p.gravity / 4.0
    return jnp.dot(e * p.hx_diag, e) + jnp.dot(du * p.hu_diag, du)


def final_cost(p: QuadrotorParams, x):
    e = p.goal - x
    return p.final_scale * jnp.dot(e * p.hx_diag, e)


def dynamics_soa(p: QuadrotorParams, x, u):
    """SoA variant (see models/base.py): x (12, *batch), u (4, *batch),
    elementwise ops only — lets batched quadrotor solves use the fused
    rollout/derivative kernels (the backward pass stays on the XLA
    iterative boxQP; the fused solver itself requires m <= 3)."""
    inv_m = 1.0 / p.mass
    F = u[0] + u[1] + u[2] + u[3]
    taux = p.arm * (u[1] - u[3])
    tauy = p.arm * (u[2] - u[0])
    tauz = p.c_tau * (u[0] - u[1] + u[2] - u[3])

    sph, cph = jnp.sin(x[6]), jnp.cos(x[6])
    sth, cth = jnp.sin(x[7]), jnp.cos(x[7])
    sps, cps = jnp.sin(x[8]), jnp.cos(x[8])

    Fm = F * inv_m
    inv_cth = 1.0 / cth
    tth = sth * inv_cth
    Jx, Jy, Jz = p.inertia[0], p.inertia[1], p.inertia[2]

    return jnp.stack([
        x[3], x[4], x[5],
        Fm * (cph * sth * cps + sph * sps),
        Fm * (cph * sth * sps - sph * cps),
        Fm * (cph * cth) - p.gravity * jnp.ones_like(F),
        x[9] + sph * tth * x[10] + cph * tth * x[11],
        cph * x[10] - sph * x[11],
        (sph * x[10] + cph * x[11]) * inv_cth,
        (taux - (Jz - Jy) * x[10] * x[11]) / Jx,
        (tauy - (Jx - Jz) * x[11] * x[9]) / Jy,
        (tauz - (Jy - Jx) * x[9] * x[10]) / Jz,
    ])


def cost_soa(p: QuadrotorParams, x, u):
    hov = p.mass * p.gravity * 0.25
    e = p.goal[0] - x[0]
    acc = e * p.hx_diag[0] * e
    for i in range(1, 12):
        e = p.goal[i] - x[i]
        acc = acc + e * p.hx_diag[i] * e
    for j in range(4):
        du = u[j] - hov
        acc = acc + du * p.hu_diag[j] * du
    return acc


def final_cost_soa(p: QuadrotorParams, x):
    e = p.goal[0] - x[0]
    acc = e * p.hx_diag[0] * e
    for i in range(1, 12):
        e = p.goal[i] - x[i]
        acc = acc + e * p.hx_diag[i] * e
    return p.final_scale * acc


def jac_soa(p: QuadrotorParams, x, u):
    """Closed-form continuous-time Jacobians of :func:`dynamics` (see
    models/base.py). Structural zeros/ones stay Python floats so the
    merged sweep kernel folds them out at trace time — A has 23 live
    entries of 144, B has 20 of 48."""
    inv_m = 1.0 / p.mass
    F = u[0] + u[1] + u[2] + u[3]
    Fm = F * inv_m

    sph, cph = jnp.sin(x[6]), jnp.cos(x[6])
    sth, cth = jnp.sin(x[7]), jnp.cos(x[7])
    sps, cps = jnp.sin(x[8]), jnp.cos(x[8])
    inv_cth = 1.0 / cth
    tth = sth * inv_cth
    sec2 = inv_cth * inv_cth
    w1, w2, w3 = x[9], x[10], x[11]
    Jx, Jy, Jz = p.inertia[0], p.inertia[1], p.inertia[2]

    # world-frame thrust direction (third column of R_zyx)
    rx = cph * sth * cps + sph * sps
    ry = cph * sth * sps - sph * cps
    rz = cph * cth

    A = [[0.0] * 12 for _ in range(12)]
    for i in range(3):
        A[i][i + 3] = 1.0
    # v̇ rows: angle sensitivities of the thrust direction
    A[3][6] = Fm * (-sph * sth * cps + cph * sps)
    A[3][7] = Fm * (cph * cth * cps)
    A[3][8] = Fm * (-cph * sth * sps + sph * cps)
    A[4][6] = Fm * (-sph * sth * sps - cph * cps)
    A[4][7] = Fm * (cph * cth * sps)
    A[4][8] = Fm * rx
    A[5][6] = Fm * (-sph * cth)
    A[5][7] = Fm * (-cph * sth)
    # Euler-rate rows: W(φ,θ)ω sensitivities
    A[6][6] = (cph * w2 - sph * w3) * tth
    A[6][7] = (sph * w2 + cph * w3) * sec2
    A[6][9] = 1.0
    A[6][10] = sph * tth
    A[6][11] = cph * tth
    A[7][6] = -sph * w2 - cph * w3
    A[7][10] = cph
    A[7][11] = -sph
    A[8][6] = (cph * w2 - sph * w3) * inv_cth
    A[8][7] = (sph * w2 + cph * w3) * sth * sec2
    A[8][10] = sph * inv_cth
    A[8][11] = cph * inv_cth
    # body-rate rows: gyroscopic coupling
    A[9][10] = -(Jz - Jy) * w3 / Jx
    A[9][11] = -(Jz - Jy) * w2 / Jx
    A[10][9] = -(Jx - Jz) * w3 / Jy
    A[10][11] = -(Jx - Jz) * w1 / Jy
    A[11][9] = -(Jy - Jx) * w2 / Jz
    A[11][10] = -(Jy - Jx) * w1 / Jz

    B = [[0.0] * 4 for _ in range(12)]
    for j in range(4):
        B[3][j] = rx * inv_m
        B[4][j] = ry * inv_m
        B[5][j] = rz * inv_m
    LJx = p.arm / Jx
    LJy = p.arm / Jy
    cJz = p.c_tau / Jz
    B[9][1] = LJx
    B[9][3] = -LJx
    B[10][0] = -LJy
    B[10][2] = LJy
    B[11][0] = cJz
    B[11][1] = -cJz
    B[11][2] = cJz
    B[11][3] = -cJz
    return A, B


def cost_derivs_soa(p: QuadrotorParams, x, u):
    hov = p.mass * p.gravity * 0.25
    cx = [-2.0 * p.hx_diag[i] * (p.goal[i] - x[i]) for i in range(12)]
    cu = [2.0 * p.hu_diag[j] * (u[j] - hov) for j in range(4)]
    cxx = [[2.0 * p.hx_diag[i] if i == j else 0.0 for j in range(12)]
           for i in range(12)]
    cxu = [[0.0] * 4 for _ in range(12)]
    cuu = [[2.0 * p.hu_diag[i] if i == j else 0.0 for j in range(4)]
           for i in range(4)]
    return cx, cu, cxx, cxu, cuu


def final_cost_derivs_soa(p: QuadrotorParams, x):
    fs = p.final_scale
    cx = [-2.0 * fs * p.hx_diag[i] * (p.goal[i] - x[i]) for i in range(12)]
    cxx = [[2.0 * fs * p.hx_diag[i] if i == j else 0.0 for j in range(12)]
           for i in range(12)]
    return cx, cxx


MODEL = Model(
    name="quadrotor",
    n=12,
    m=4,
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
