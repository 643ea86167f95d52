"""Model-level value oracles (ref: test/test_dynamicsmodels.cpp).

The reference asserts DoubleIntegrator dynamics/integration/cost against hand
values and only prints for the acrobot; here the acrobot also gets real
oracles (energy conservation of the passive Lagrangian system, and the
torque-only running cost).
"""

import pytest
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.models import get_model, list_models
from ilqr_tpu.models import acrobot, double_integrator
from ilqr_tpu.models.base import euler_step, rk4_step


def test_registry():
    models = list_models()
    assert "double_integrator" in models
    assert "acrobot" in models
    assert "cartpole" in models
    assert "pendulum" in models
    assert "point_mass_3d" in models
    assert "free_flyer" in models
    assert "omni_thruster" in models
    assert "power_mass" in models
    assert "quadrotor" in models
    assert "thruster_ring" in models


def test_double_integrator_dynamics():
    # ref test_dynamicsmodels.cpp:32-38: dx = [v, u/mass]
    m = get_model("double_integrator")
    p = double_integrator.default_params(goal=(1.0, 1.0, 0.0, 0.0))
    x = jnp.array([0.0, 0.0, 0.5, 0.1])
    u = jnp.array([1.0, -1.0])
    np.testing.assert_allclose(
        m.dynamics(p, x, u), [0.5, 0.1, 1.0, -1.0], atol=1e-6
    )


def test_double_integrator_integration():
    # ref test_dynamicsmodels.cpp:40-47: Euler x + dt·f
    m = get_model("double_integrator")
    p = double_integrator.default_params(goal=(1.0, 1.0, 0.0, 0.0))
    x = jnp.array([0.0, 0.0, 0.5, 0.1])
    u = jnp.array([1.0, -1.0])
    dt = 0.05
    expected = x + dt * m.dynamics(p, x, u)
    np.testing.assert_allclose(euler_step(m, p, x, u, dt), expected, atol=1e-6)


def test_double_integrator_cost():
    # ref test_dynamicsmodels.cpp:49-60: cost((.1,.1,.5,.1),(.1,-1)) ≈ 2.682
    m = get_model("double_integrator")
    p = double_integrator.default_params(goal=(1.0, 1.0, 0.0, 0.0))
    c = float(m.cost(p, jnp.array([0.1, 0.1, 0.5, 0.1]), jnp.array([0.1, -1.0])))
    assert abs(c - 2.682) < 0.001


def test_acrobot_rest_state_dynamics():
    """At rest hanging down with zero torque the acrobot stays put."""
    m = get_model("acrobot")
    p = acrobot.default_params()
    dx = m.dynamics(p, jnp.zeros(4), jnp.zeros(1))
    np.testing.assert_allclose(dx, np.zeros(4), atol=1e-12)


@pytest.mark.slow
def test_acrobot_energy_conservation():
    """Passive (u=0) dynamics conserve total energy — a physics oracle the
    reference lacks. Integrated with RK4 at small dt to isolate model error."""
    m = get_model("acrobot")
    p = acrobot.default_params()

    def energy(x):
        q, qd = x[:2], x[2:]
        i1, i2 = p.inertia
        l1 = p.lengths[0]
        m1, m2 = p.masses
        lc1, lc2 = p.lc
        g = p.gravity
        c2 = jnp.cos(q[1])
        h_off = i2 + m2 * l1 * lc2 * c2
        H = jnp.array([
            [i1 + i2 + m2 * l1 * l1 + 2.0 * m2 * l1 * lc2 * c2, h_off],
            [h_off, i2],
        ])
        ke = 0.5 * qd @ (H @ qd)
        # height measured from the pivot, θ measured from the DOWN axis
        pe = -m1 * g * lc1 * jnp.cos(q[0]) - m2 * g * (
            l1 * jnp.cos(q[0]) + lc2 * jnp.cos(q[0] + q[1])
        )
        return ke + pe

    x = jnp.array([0.3, -0.2, 0.1, 0.4])
    e0 = float(energy(x))
    dt = 1e-3
    for _ in range(200):
        x = rk4_step(m, p, x, jnp.zeros(1), dt)
    assert abs(float(energy(x)) - e0) < 1e-6


def test_acrobot_cost_is_torque_only():
    # ref acrobot.h:83-92: running cost = (0.1)²·u²; state error free
    m = get_model("acrobot")
    p = acrobot.default_params()
    c = float(m.cost(p, jnp.array([1.0, 2.0, 3.0, 4.0]), jnp.array([2.0])))
    assert abs(c - 0.01 * 4.0) < 1e-12


def test_acrobot_final_cost():
    # ref acrobot.h:94-100: 400·(‖q_err‖² + ‖q̇_err‖²)
    m = get_model("acrobot")
    p = acrobot.default_params()
    x = jnp.array([3.1415, 0.0, 0.0, 0.0])
    assert float(m.final_cost(p, x)) < 1e-12
    x2 = jnp.array([3.1415 - 0.1, 0.0, 0.0, 0.0])
    assert abs(float(m.final_cost(p, x2)) - 400.0 * 0.01) < 1e-9


def test_analytic_soa_jacobians():
    """Models providing closed-form SoA derivatives must match jacfwd of
    their own dynamics/cost to numerical precision — the oracle for the
    merged sweep kernel's analytic linearization path."""
    import jax
    import jax.numpy as jnp

    for name in list_models():
        m = get_model(name)
        if not getattr(m, "has_analytic_soa", False):
            continue
        p = m.default_params()
        rng = np.random.default_rng(7)
        for _ in range(3):
            x = jnp.asarray(rng.normal(size=m.n))
            u = jnp.asarray(rng.normal(size=m.m))
            A_ref = jax.jacfwd(m.dynamics, argnums=1)(p, x, u)
            B_ref = jax.jacfwd(m.dynamics, argnums=2)(p, x, u)
            A, B = m.jac_soa(p, x[:, None], u[:, None])
            for i in range(m.n):
                for j in range(m.n):
                    np.testing.assert_allclose(
                        float(jnp.broadcast_to(A[i][j], (1,))[0]),
                        float(A_ref[i, j]), atol=1e-8,
                        err_msg=f"{name} A[{i}][{j}]")
                for j in range(m.m):
                    np.testing.assert_allclose(
                        float(jnp.broadcast_to(B[i][j], (1,))[0]),
                        float(B_ref[i, j]), atol=1e-8,
                        err_msg=f"{name} B[{i}][{j}]")
            cx_r = jax.grad(m.cost, argnums=1)(p, x, u)
            cu_r = jax.grad(m.cost, argnums=2)(p, x, u)
            cxx_r = jax.hessian(m.cost, argnums=1)(p, x, u)
            cxu_r = jax.jacfwd(jax.grad(m.cost, argnums=1), argnums=2)(
                p, x, u)
            cuu_r = jax.hessian(m.cost, argnums=2)(p, x, u)
            cx, cu, cxx, cxu, cuu = m.cost_derivs_soa(
                p, x[:, None], u[:, None])
            for i in range(m.n):
                assert abs(float(jnp.broadcast_to(cx[i], (1,))[0])
                           - float(cx_r[i])) < 1e-8, (name, "cx", i)
                for j in range(m.n):
                    assert abs(float(jnp.broadcast_to(cxx[i][j], (1,))[0])
                               - float(cxx_r[i, j])) < 1e-8
                for j in range(m.m):
                    assert abs(float(jnp.broadcast_to(cxu[i][j], (1,))[0])
                               - float(cxu_r[i, j])) < 1e-8
            for i in range(m.m):
                assert abs(float(jnp.broadcast_to(cu[i], (1,))[0])
                           - float(cu_r[i])) < 1e-8
                for j in range(m.m):
                    assert abs(float(jnp.broadcast_to(cuu[i][j], (1,))[0])
                               - float(cuu_r[i, j])) < 1e-8
            fx_r = jax.grad(m.final_cost, argnums=1)(p, x)
            fxx_r = jax.hessian(m.final_cost, argnums=1)(p, x)
            fcx, fcxx = m.final_cost_derivs_soa(p, x[:, None])
            for i in range(m.n):
                assert abs(float(jnp.broadcast_to(fcx[i], (1,))[0])
                           - float(fx_r[i])) < 1e-8
                for j in range(m.n):
                    assert abs(float(jnp.broadcast_to(fcxx[i][j], (1,))[0])
                               - float(fxx_r[i, j])) < 1e-8


def test_pendulum_and_cartpole_shapes():
    """New models beyond the reference: dynamics/cost evaluate and have the
    declared dims."""
    for name in ("pendulum", "cartpole"):
        m = get_model(name)
        p = m.default_params()
        x = jnp.zeros(m.n) + 0.1
        u = jnp.zeros(m.m) + 0.1
        assert m.dynamics(p, x, u).shape == (m.n,)
        assert m.cost(p, x, u).shape == ()
        assert m.final_cost(p, x).shape == ()


def test_jac_soa_structural_constants_are_python_floats():
    """The SoA derivative contract (models/base.py): structurally-constant
    Jacobian/Hessian entries must be plain Python floats so the merged
    sweep kernel can fold them at trace time. Guards the velocity-form
    structure of every registered analytic model."""
    import jax.numpy as jnp

    for name in list_models():
        m = get_model(name)
        if not getattr(m, "has_analytic_soa", False):
            continue
        p = m.default_params()
        x = jnp.zeros((m.n, 1)) + 0.1
        u = jnp.zeros((m.m, 1)) + 0.1
        A, B = m.jac_soa(p, x, u)
        # position rows of a mechanical model are [0 I]: at least one
        # structural constant must exist and be a float
        consts = [v for row in A for v in row if isinstance(v, float)]
        assert consts, f"{name}: jac_soa returned no folded constants"
        _cx, _cu, cxx, cxu, _cuu = m.cost_derivs_soa(p, x, u)
        if name == "power_mass":
            # power_mass exists precisely to give the kernels LIVE cost
            # cross terms — its cxu/cxx-velocity-block entries must be
            # tiles, not folded floats (but position rows stay folded).
            live = [v for row in cxu for v in row
                    if not isinstance(v, float)]
            assert live, "power_mass: cxu must carry live tiles"
            assert all(isinstance(v, float) for row in cxu[:2] for v in row)
            continue
        offdiag = [cxx[i][j] for i in range(m.n) for j in range(m.n)
                   if i != j]
        assert all(isinstance(v, float) for v in offdiag), (
            f"{name}: cxx off-diagonals should be folded Python floats")
        assert all(isinstance(v, float) for row in cxu for v in row), (
            f"{name}: cxu should be folded Python floats")


def test_sweep_fold_helpers():
    """_fmul/_fadd fold 0/1 constants at trace time and match dense
    arithmetic on traced values."""
    import jax.numpy as jnp

    from ilqr_tpu.ops.pallas_sweep import _fadd, _fmul, _tile

    t = jnp.asarray([2.0, -3.0])
    assert _fmul(0.0, t) == 0.0 and _fmul(t, 0.0) == 0.0
    assert _fmul(1.0, t) is t and _fmul(t, 1.0) is t
    assert _fmul(2.0, 3.0) == 6.0
    np.testing.assert_allclose(np.asarray(_fmul(2.0, t)), [4.0, -6.0])
    assert _fadd(0.0, t) is t and _fadd(t, 0.0) is t
    assert _fadd(1.5, 2.5) == 4.0
    np.testing.assert_allclose(np.asarray(_fadd(t, t)), [4.0, -6.0])
    np.testing.assert_allclose(np.asarray(_tile(2.0, t)), [2.0, 2.0])
    assert _tile(t, t) is t


def test_quadrotor_hover_equilibrium():
    """At rest attitude with hover thrust (mg/4 per rotor) the quadrotor is
    in exact equilibrium; with zero thrust it free-falls at -g."""
    from ilqr_tpu.models import quadrotor

    m = get_model("quadrotor")
    p = quadrotor.default_params()
    x = jnp.zeros(12)
    dx = m.dynamics(p, x, quadrotor.hover_control(p))
    np.testing.assert_allclose(np.asarray(dx), np.zeros(12), atol=1e-7)
    dx0 = m.dynamics(p, x, jnp.zeros(4))
    np.testing.assert_allclose(np.asarray(dx0[5]), -float(p.gravity),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jnp.delete(dx0, 5)), np.zeros(11), atol=1e-7)


def test_quadrotor_mixer_torque_signs():
    """'+'-configuration mixer: raising one rotor above hover tilts the
    right axis the right way (f2 > f4 -> +roll rate, f3 > f1 -> +pitch,
    f1+f3 > f2+f4 -> +yaw)."""
    from ilqr_tpu.models import quadrotor

    m = get_model("quadrotor")
    p = quadrotor.default_params()
    x = jnp.zeros(12)
    h = quadrotor.hover_control(p)
    d = jnp.asarray([0.0, 0.1, 0.0, 0.0])
    assert float(m.dynamics(p, x, h + d)[9]) > 0       # om_x dot
    d = jnp.asarray([0.0, 0.0, 0.1, 0.0])
    assert float(m.dynamics(p, x, h + d)[10]) > 0      # om_y dot
    d = jnp.asarray([0.1, 0.0, 0.1, 0.0])
    assert float(m.dynamics(p, x, h + d)[11]) > 0      # om_z dot


def test_quadrotor_fd_matches_autodiff_jacobian():
    """Cross-validates the trig/mixer algebra: central-difference Jacobian
    of the Euler step matches jacfwd on a generic state."""
    import jax

    from ilqr_tpu.models import quadrotor
    from ilqr_tpu.models.base import euler_step

    m = get_model("quadrotor")
    p = quadrotor.default_params()
    rng = np.random.default_rng(3)
    x = jnp.asarray(0.2 * rng.normal(size=12), jnp.float64) \
        if jax.config.jax_enable_x64 else \
        jnp.asarray(0.2 * rng.normal(size=12), jnp.float32)
    u = quadrotor.hover_control(p) + jnp.asarray(
        0.1 * rng.normal(size=4), x.dtype)
    dt = 0.02
    fx = jax.jacfwd(lambda xx: euler_step(m, p, xx, u, dt))(x)
    eps = 1e-3
    fd = np.zeros((12, 12))
    for j in range(12):
        e = np.zeros(12)
        e[j] = eps
        fd[:, j] = (np.asarray(euler_step(m, p, x + e, u, dt))
                    - np.asarray(euler_step(m, p, x - e, u, dt))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(fx), fd, atol=5e-4)


def test_quadrotor_m4_waypoint_solve():
    """End-to-end m=4 solve — the first workload on the ITERATIVE
    projected-Newton boxQP leg (ops/boxqp.boxqp; m=1 has a closed form and
    m<=3 the enumeration, so no other model reaches it with
    boxqp_mode='auto'). Must reach the waypoint with every thrust inside
    the ASYMMETRIC box [0, u_max], and the upper limit must actually
    clamp somewhere (the task saturates rotors during the initial climb)."""
    from ilqr_tpu import SolverConfig, solve
    from ilqr_tpu.models import quadrotor

    m = get_model("quadrotor")
    p = quadrotor.default_params()
    T = 80
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=40)
    u0 = jnp.tile(quadrotor.hover_control(p)[None], (T, 1))
    sol = solve(m, p, cfg, 0.02, jnp.zeros(12), u0)
    xf = np.asarray(sol.xs[-1])
    np.testing.assert_allclose(xf[:3], np.asarray(p.goal[:3]), atol=0.05)
    assert np.linalg.norm(xf[3:6]) < 0.1          # arrives near rest
    us = np.asarray(sol.us)
    assert us.min() >= -1e-6 and us.max() <= 3.0 + 1e-6
    assert us.max() > 2.99                        # box actually active


def test_bicycle_lane_change_solve():
    """Kinematic bicycle (m=2): reach a displaced pose from rest. The
    analytic SoA derivatives are covered by test_analytic_soa_jacobians;
    this drives the full solve — goal position reached at rest, controls
    inside the ASYMMETRIC accel box [-4, 2] and the steering box,
    throttle limit actually active during the launch. (Final heading is
    deliberately not pinned: iLQR settles into the angled-arrival local
    minimum for this maneuver.)"""
    from ilqr_tpu import SolverConfig, solve
    from ilqr_tpu.models import bicycle as bc

    m = get_model("bicycle")
    p = bc.default_params(goal=(5.0, 2.0, 0.0, 0.0))
    T = 100
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=60)
    sol = solve(m, p, cfg, 0.05, jnp.zeros(4), jnp.zeros((T, 2)))
    xf = np.asarray(sol.xs[-1])
    np.testing.assert_allclose(xf[:2], [5.0, 2.0], atol=0.15)
    assert abs(xf[3]) < 0.25                      # ends near rest
    us = np.asarray(sol.us)
    assert us[:, 0].min() >= -4.0 - 1e-6 and us[:, 0].max() <= 2.0 + 1e-6
    assert np.abs(us[:, 1]).max() <= 0.55 + 1e-6
    assert us[:, 0].max() > 1.99                  # throttle limit binds


def test_power_mass_dynamics_and_cost():
    """Power-limited point mass: hand values for dynamics and the
    quadratic mechanical-power cost term (v·u)²."""
    from ilqr_tpu.models import power_mass as pm

    m = get_model("power_mass")
    p = pm.default_params(goal=(3.0, 2.0, 0.0, 0.0))
    x = jnp.array([0.5, -0.2, 1.0, -0.5])
    u = jnp.array([2.0, 1.0])
    # v̇ = u/m − drag·v with m=1, drag=0.15
    np.testing.assert_allclose(
        m.dynamics(p, x, u),
        [1.0, -0.5, 2.0 - 0.15 * 1.0, 1.0 - 0.15 * (-0.5)], atol=1e-7)
    # s = 1·2 + (−0.5)·1 = 1.5; power term = 0.05·1.5² = 0.1125
    e = np.array([3.0 - 0.5, 2.0 + 0.2, -1.0, 0.5])
    expect = (0.5 * e[0] ** 2 + 0.5 * e[1] ** 2
              + 0.05 * e[2] ** 2 + 0.05 * e[3] ** 2
              + 0.1 * (4.0 + 1.0) + 0.05 * 1.5 ** 2)
    np.testing.assert_allclose(float(m.cost(p, x, u)), expect, rtol=1e-6)


def test_power_mass_reaches_goal_with_live_cxu():
    """Full solve of the only model with nonzero state-dependent cxu:
    reaches the goal at rest, controls stay inside the asymmetric box
    [-1.5, 2.5], and the forward-thrust limit binds during the launch."""
    from ilqr_tpu import SolverConfig, solve
    from ilqr_tpu.models import power_mass as pm

    m = get_model("power_mass")
    p = pm.default_params()
    T = 120
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=60)
    sol = solve(m, p, cfg, 0.05, jnp.zeros(4), jnp.zeros((T, 2)))
    xf = np.asarray(sol.xs[-1])
    np.testing.assert_allclose(xf[:2], [3.0, 2.0], atol=0.05)
    assert np.linalg.norm(xf[2:]) < 0.15          # arrives near rest
    us = np.asarray(sol.us)
    assert us.min() >= -1.5 - 1e-6 and us.max() <= 2.5 + 1e-6
    assert us.max() > 2.49                        # thrust limit binds
    # The power penalty must actually shape the solution: without it the
    # same problem uses strictly more peak mechanical power.
    p0 = p._replace(w_power=jnp.zeros(()))
    sol0 = solve(m, p0, cfg, 0.05, jnp.zeros(4), jnp.zeros((T, 2)))
    power = np.abs(np.asarray(sol.xs)[:-1, 2:] * np.asarray(sol.us)).sum(-1)
    power0 = np.abs(np.asarray(sol0.xs)[:-1, 2:]
                    * np.asarray(sol0.us)).sum(-1)
    assert power.max() < power0.max()


def test_omni_thruster_reaches_goal_with_one_sided_thrust():
    """m=6 model: the craft must fly to the goal with every control
    inside its one-sided [0, f_max] box on the clamped rollout, idle
    thrusters pinned at exactly 0 by the linear fuel cost, and the +z
    thruster carrying gravity."""
    import jax

    from ilqr_tpu import SolverConfig, solve
    from ilqr_tpu.models import omni_thruster as ot

    m = get_model("omni_thruster")
    p = ot.default_params()
    T = 80
    u0 = jnp.tile(ot.hover_control(p)[None], (T, 1))
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=60)
    sol = solve(m, p, cfg, 0.05, jnp.zeros(6), u0)
    xs = np.asarray(sol.xs)
    np.testing.assert_allclose(xs[-1][:3], np.asarray(p.goal)[:3],
                               atol=0.08)
    us = np.asarray(sol.us)
    assert us.min() >= -1e-6 and us.max() <= float(p.u_max[0]) + 1e-5
    # one-sided thrusters: a solid fraction of controls sit exactly on
    # the lower bound (opposing thrusters idle)
    assert (us <= 1e-6).mean() > 0.25, (us <= 1e-6).mean()
    # hover against gravity: the +z thruster (index 4) works hardest
    assert us[:, 4].mean() > us[:, 5].mean() + 1.0


def test_free_flyer_thruster_mixing():
    """m=8 model: opposing cube-corner thrusters cancel exactly; a single
    thruster accelerates along its diagonal at u/(√3·mass); zero thrust in
    microgravity leaves only drag."""
    import math

    from ilqr_tpu.models import free_flyer as ff

    m = get_model("free_flyer")
    p = ff.default_params()
    x = jnp.zeros(6)
    # all thrusters equal → forces cancel pairwise, craft stays at rest
    dx = m.dynamics(p, x, jnp.full(8, 2.0))
    np.testing.assert_allclose(dx, np.zeros(6), atol=1e-7)
    # thruster 7 is corner (+1,+1,+1): accel = u/(√3·mass) on each axis
    u = jnp.zeros(8).at[7].set(1.5)
    dx = m.dynamics(p, x, u)
    a = 1.5 / (math.sqrt(3.0) * float(p.mass))
    np.testing.assert_allclose(dx[3:], [a, a, a], rtol=1e-6)
    # moving with zero thrust: quadratic drag only (no gravity term)
    xv = jnp.zeros(6).at[3].set(2.0)
    dx = m.dynamics(p, xv, jnp.zeros(8))
    np.testing.assert_allclose(
        dx, [2.0, 0.0, 0.0, -float(p.drag) * 4.0, 0.0, 0.0], atol=1e-7)


def test_free_flyer_reaches_goal_at_m8_cap():
    """m=8 model: flies to the goal with every control in its one-sided
    [0, f_max] box; in microgravity the linear fuel cost pins the large
    majority of controls at exactly 0 (the redundancy-resolving workload
    for the fused solver's m=8 projected-Newton boxQP)."""
    from ilqr_tpu import SolverConfig, solve
    from ilqr_tpu.models import free_flyer as ff

    m = get_model("free_flyer")
    assert m.m == 8  # was the round-3 MAX_FUSED_M cap (now 16)
    p = ff.default_params()
    T = 80
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=60)
    sol = solve(m, p, cfg, 0.05, jnp.zeros(6), jnp.zeros((T, 8)))
    xs = np.asarray(sol.xs)
    np.testing.assert_allclose(xs[-1][:3], np.asarray(p.goal)[:3],
                               atol=0.05)
    us = np.asarray(sol.us)
    assert us.min() >= -1e-6 and us.max() <= float(p.u_max[0]) + 1e-5
    # microgravity + fuel cost: most thrusters idle at exactly 0
    assert (us <= 1e-6).mean() > 0.6, (us <= 1e-6).mean()
    # the upper bound binds during the initial burn
    assert us.max() > float(p.u_max[0]) - 1e-3
