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
