"""MPC (receding-horizon) tests — the warm-start capability the reference
exposes but never drives (ref: src/ilqr_core.cpp:65-76, notes.md:11)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu import SolverConfig, get_model
from ilqr_tpu.models import double_integrator as di
from ilqr_tpu.mpc import MPCState, make_mpc_controller, mpc_init, mpc_step, run_mpc


def _setup():
    m = get_model("double_integrator")
    p = di.default_params(goal=(1.0, 0.5, 0.0, 0.0))
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True, max_iter=30)
    return m, p, cfg


def test_mpc_converges_to_goal():
    m, p, cfg = _setup()
    dt = 0.05
    x0 = jnp.array([-1.0, 0.0, 0.0, 0.0])
    u0 = jnp.zeros((40, 2))
    state, (xs_hist, costs) = run_mpc(m, p, cfg, dt, x0, u0, n_steps=150)
    final = np.asarray(state.x)
    assert np.abs(final[:2] - np.array([1.0, 0.5])).max() < 0.05
    # replanning cost decreases as the plant approaches the goal
    assert float(costs[-1]) < float(costs[0])


@pytest.mark.slow
def test_mpc_warm_start_is_cheap():
    """After the first plan, replans take very few iterations."""
    m, p, cfg = _setup()
    dt = 0.05
    state = mpc_init(m, p, cfg, dt, jnp.array([-1.0, 0.0, 0.0, 0.0]),
                     jnp.zeros((40, 2)))
    iters = []
    for _ in range(5):
        state = mpc_step(m, p, cfg, dt, state)
        iters.append(int(state.plan.iterations))
    assert max(iters[1:]) <= 10  # warm-started replans are cheap


def test_mpc_feedback_rejects_disturbance():
    m, p, cfg = _setup()
    dt = 0.05
    state = mpc_init(m, p, cfg, dt, jnp.array([-1.0, 0.0, 0.0, 0.0]),
                     jnp.zeros((40, 2)))
    import functools

    step = jax.jit(functools.partial(mpc_step, m, p, cfg, dt))
    step_kick = jax.jit(
        functools.partial(mpc_step, m, p, cfg, dt,
                          disturbance=jnp.array([0.1, -0.1, 0.0, 0.0]))
    )
    for i in range(120):
        state = step_kick(state) if i == 3 else step(state)
    final = np.asarray(state.x)
    assert np.abs(final[:2] - np.array([1.0, 0.5])).max() < 0.1


def test_mpc_controller_jits_and_vmaps():
    """A fleet of controllers stepping in lock-step — the batched-MPC config
    (BASELINE.json)."""
    m, p, cfg = _setup()
    dt = 0.05
    B = 4
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(size=(B, 4)) * 0.3)
    u0 = jnp.zeros((30, 2))

    batched_init = jax.jit(jax.vmap(
        lambda x0: mpc_init(m, p, cfg, dt, x0, u0)
    ))
    batched_step = jax.jit(jax.vmap(
        lambda s: mpc_step(m, p, cfg, dt, s)
    ))
    fleet = batched_init(x0s)
    fleet = batched_step(fleet)
    assert fleet.x.shape == (B, 4)
    assert int(fleet.t[0]) == 1


@pytest.mark.slow
def test_fleet_mpc_fused():
    """Fleet MPC on the fused solver: warm replans are cheap and the fleet
    moves toward the goal."""
    import jax.numpy as jnp

    from ilqr_tpu.models import pendulum as pend
    from ilqr_tpu.mpc import fleet_init, fleet_step

    m = get_model("pendulum")
    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), pend.default_params())
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=6)
    dt = 0.05
    B = 3
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(size=(B, 2)) * 0.2, jnp.float32)
    fleet = fleet_init(m, p, cfg, dt, x0s, jnp.zeros((12, 1), jnp.float32))
    err0 = np.abs(np.asarray(fleet.plan.cost)).mean()
    for _ in range(3):
        fleet = fleet_step(m, p, cfg, dt, fleet)
    assert fleet.x.shape == (B, 2)
    assert int(fleet.t[0]) == 3
    assert int(np.asarray(fleet.plan.iterations).max()) <= 6
    assert np.all(np.isfinite(np.asarray(fleet.plan.cost)))


def test_mpc_state_checkpoint_roundtrip(tmp_path):
    """MPC fleet state snapshots and restores bit-exactly (SURVEY §5
    checkpoint/resume)."""
    from ilqr_tpu.utils.checkpoint import restore, save

    m, p, cfg = _setup()
    dt = 0.05
    state = mpc_init(m, p, cfg, dt, jnp.array([-1.0, 0.0, 0.0, 0.0]),
                     jnp.zeros((20, 2)))
    state = mpc_step(m, p, cfg, dt, state)
    path = str(tmp_path / "mpc.npz")
    save(path, state)
    restored = restore(path, state)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # resumed controller continues identically
    s1 = mpc_step(m, p, cfg, dt, state)
    s2 = mpc_step(m, p, cfg, dt, restored)
    assert np.allclose(np.asarray(s1.x), np.asarray(s2.x))


def test_mpc_step_mixed_dtype_params():
    """Under jax_enable_x64 (this suite), default_params() leaves are f64;
    replanning an f32 controller with them must not poison the loop-carry
    dtypes (regression: while_loop carry dtype error in mpc_step)."""
    m, p, cfg = _setup()
    dt = 0.05
    x0 = jnp.asarray([-1.0, 0.0, 0.0, 0.0], jnp.float32)
    state = mpc_init(m, p, cfg, dt, x0, jnp.zeros((20, 2), jnp.float32))
    assert state.plan.us.dtype == jnp.float32
    nxt = mpc_step(m, p, cfg, dt, state)   # p still carries f64 leaves
    assert nxt.plan.us.dtype == jnp.float32
    assert np.isfinite(float(nxt.plan.cost))
