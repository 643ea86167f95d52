"""Fused Pallas rollout-kernel tests (interpret mode on CPU) and the SoA
model contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu import SolverConfig, get_model
from ilqr_tpu.models import list_models
from ilqr_tpu.ops.pallas_rollout import (
    pack_params,
    rollout_batched,
    rollout_packed,
)
from ilqr_tpu.ops.rollout import _rollout_scan


def _f32_params(model):
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), model.default_params()
    )


@pytest.mark.parametrize("name", ["acrobot", "double_integrator",
                                  "pendulum", "cartpole", "point_mass_3d",
                                  "quadrotor", "thruster_ring"])
def test_soa_matches_aos(name):
    """SoA model functions agree with the per-problem versions on a tile."""
    mo = get_model(name)
    assert mo.has_soa
    p = _f32_params(mo)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(mo.n, 4)), jnp.float32)
    U = jnp.asarray(rng.normal(size=(mo.m, 4)), jnp.float32)

    dx = mo.dynamics_soa(p, X, U)
    c = mo.cost_soa(p, X, U)
    f = mo.final_cost_soa(p, X)
    for b in range(4):
        np.testing.assert_allclose(
            np.asarray(dx[:, b]), np.asarray(mo.dynamics(p, X[:, b], U[:, b])),
            atol=1e-4, err_msg=f"{name} dynamics lane {b}",
        )
        assert abs(float(c[b]) - float(mo.cost(p, X[:, b], U[:, b]))) < 1e-3
        assert abs(float(f[b]) - float(mo.final_cost(p, X[:, b]))) < 1e-2


@pytest.mark.parametrize("name,clamp,integ", [
    ("acrobot", True, "euler"),
    ("acrobot", False, "rk4"),
    ("double_integrator", False, "euler"),
    ("pendulum", True, "euler"),
    ("cartpole", False, "euler"),
    ("quadrotor", True, "euler"),
])
def test_kernel_matches_scan(name, clamp, integ):
    mo = get_model(name)
    p = _f32_params(mo)
    rng = np.random.default_rng(1)
    B, T = 3, 9
    x0 = jnp.asarray(rng.normal(size=(B, mo.n)) * 0.3, jnp.float32)
    uff = jnp.asarray(rng.normal(size=(B, T, mo.m)) * 0.5, jnp.float32)
    xsr = jnp.asarray(rng.normal(size=(B, T + 1, mo.n)) * 0.3, jnp.float32)
    K = jnp.asarray(rng.normal(size=(B, T, mo.m, mo.n)) * 0.2, jnp.float32)

    cfg = SolverConfig(clamp_forward=clamp, integrator=integ)
    xs_k, us_k, c_k = rollout_batched(
        mo, integ, clamp, p, 0.02, x0, uff, xsr, K, interpret=True)
    ref = jax.vmap(
        lambda a, b, c, d: _rollout_scan(mo, p, cfg, 0.02, a, b, c, d)
    )(x0, uff, xsr, K)
    np.testing.assert_allclose(np.asarray(xs_k), np.asarray(ref[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(us_k), np.asarray(ref[1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(ref[2]), rtol=1e-5)


def test_pack_params_roundtrip_structure():
    mo = get_model("acrobot")
    p = _f32_params(mo)
    packed, treedef, shapes = pack_params(p, 0.02)
    n_scalars = sum(int(np.prod(s)) if s else 1 for s in shapes)
    assert packed.shape == (n_scalars + 1, 8, 128)  # +1 = dt row
    # dt lives in the last row, broadcast across the tile
    np.testing.assert_allclose(np.asarray(packed[-1]), 0.02)


def test_candidate_sweep_in_kernel_alphas():
    """costs_only + candidates + in-kernel α: cost of candidate a equals a
    plain rollout at u_ff = us + α_a·k."""
    from ilqr_tpu.ops.pallas_rollout import pack_params

    mo = get_model("acrobot")
    p = _f32_params(mo)
    rng = np.random.default_rng(5)
    T = 7
    x0 = jnp.asarray(rng.normal(size=(1024, mo.n)) * 0.2, jnp.float32)
    us = jnp.asarray(rng.normal(size=(1024, T, 1)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.normal(size=(1024, T, 1)) * 0.1, jnp.float32)
    xsr = jnp.asarray(rng.normal(size=(1024, T + 1, mo.n)) * 0.2,
                      jnp.float32)
    K = jnp.asarray(rng.normal(size=(1024, T, 1, mo.n)) * 0.1, jnp.float32)
    alphas = jnp.asarray([1.0, 0.5, 0.1], jnp.float32)

    from ilqr_tpu.ops.pallas_rollout import (
        _pack_tail as pt, _unpack_tail as ut)

    pp = pack_params(p, 0.02)
    costs = rollout_packed(
        mo, "euler", True, pp, pt(x0, 1), pt(us, 1), pt(xsr[:, :T], 1),
        pt(K, 1), interpret=True, costs_only=True, candidates=3,
        k_p=pt(k, 1), alphas=alphas)
    costs = costs.reshape(3, 1024)  # candidate-major; lanes in pack order

    for a in range(3):
        _xs, _us, ref = rollout_batched(
            mo, "euler", True, p, 0.02, x0, us + alphas[a] * k, xsr, K,
            interpret=True)
        np.testing.assert_allclose(np.asarray(costs[a]), np.asarray(ref),
                                   rtol=2e-5, err_msg=f"alpha {a}")


def test_lane_alpha_rollout():
    """alpha_lanes: per-lane α applied in-kernel equals per-lane manual
    feedforwards."""
    from ilqr_tpu.ops.pallas_rollout import (
        _pack_tail as pt, _unpack_tail as ut, pack_params)

    mo = get_model("pendulum")
    p = _f32_params(mo)
    rng = np.random.default_rng(6)
    B, T = 1024, 6
    x0 = jnp.asarray(rng.normal(size=(B, 2)) * 0.2, jnp.float32)
    us = jnp.asarray(rng.normal(size=(B, T, 1)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, 1)) * 0.1, jnp.float32)
    xsr = jnp.zeros((B, T + 1, 2), jnp.float32)
    K = jnp.zeros((B, T, 1, 2), jnp.float32)
    al = jnp.asarray(rng.uniform(0, 1, size=(B,)), jnp.float32)

    pp = pack_params(p, 0.05)
    xs_b, us_b, xf, cost = rollout_packed(
        mo, "euler", False, pp, pt(x0, 1), pt(us, 1), pt(xsr[:, :T], 1),
        pt(K, 1), interpret=True, k_p=pt(k, 1), alpha_lanes=pt(al, 1))
    got_us = ut(us_b, B)
    want_us = us + al[:, None, None] * k
    np.testing.assert_allclose(np.asarray(got_us), np.asarray(want_us),
                               atol=1e-6)
    _xs2, _us2, ref_cost = rollout_batched(
        mo, "euler", False, p, 0.05, x0, want_us, xsr, K, interpret=True)
    np.testing.assert_allclose(np.asarray(ut(cost, B)), np.asarray(ref_cost),
                               rtol=2e-5)


def test_linesearch_packed_selection_semantics():
    """Direct unit test of the single-pass line-search/epilogue kernel:
    candidate totals, first-accepted-α selection (z-ratio vs z_min, ref
    ilqr_core.cpp:199-213), gate/keep-predicated state writes — all
    checked against a plain jnp reference built from rollout_batched."""
    from ilqr_tpu.ops.pallas_rollout import (
        _pack_tail as pt, _unpack_tail as ut, linesearch_packed,
        pack_params)

    mo = get_model("pendulum")
    p = _f32_params(mo)
    rng = np.random.default_rng(9)
    B, T, n, m = 1024, 7, 2, 1
    dt = 0.05
    x0 = jnp.asarray(rng.normal(size=(B, n)) * 0.2, jnp.float32)
    us = jnp.asarray(rng.normal(size=(B, T, m)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, m)) * 0.2, jnp.float32)
    K = jnp.asarray(rng.normal(size=(B, T, m, n)) * 0.1, jnp.float32)
    kold = jnp.asarray(rng.normal(size=(B, T, m)), jnp.float32)
    Kold = jnp.asarray(rng.normal(size=(B, T, m, n)), jnp.float32)
    xsr = jnp.asarray(rng.normal(size=(B, T + 1, n)) * 0.2, jnp.float32)
    alphas = jnp.asarray([1.0, 0.5, 0.1], jnp.float32)
    A = 3
    dv = jnp.asarray(
        np.stack([-np.abs(rng.normal(size=B)) * 5.0,
                  rng.normal(size=B) * 0.1]), jnp.float32)  # (2, B)
    # gate half the lanes; keep an independent half
    gate = jnp.asarray((rng.uniform(size=B) > 0.5), jnp.float32)
    keep = jnp.asarray((rng.uniform(size=B) > 0.5), jnp.float32)

    # reference: candidate costs via plain rollouts
    cand = []
    for a in range(A):
        _x, _u, c = rollout_batched(
            mo, "euler", True, p, dt, x0, us + alphas[a] * k, xsr, K,
            interpret=True)
        cand.append(np.asarray(c))
    cand = np.stack(cand)                      # (A, B)
    cprev = cand[0] + np.asarray(
        rng.normal(size=B), np.float32)        # arbitrary previous cost
    dvn = np.asarray(dv)
    expected = -np.asarray(alphas)[:, None] * (
        dvn[0][None] + np.asarray(alphas)[:, None] * dvn[1][None])
    dcost = cprev[None] - cand
    z = np.where(expected > 0, dcost / expected, np.sign(dcost))
    accept = z > 0.0
    any_acc = accept.any(axis=0)
    first = np.argmax(accept, axis=0)          # first-accepted index
    sel = np.where(any_acc, first, 0)
    alpha_ref = np.asarray(alphas)[sel]

    pp = pack_params(p, dt)
    out = linesearch_packed(
        mo, "euler", True, pp, pt(x0, 1), pt(us, 1), pt(xsr[:, :T], 1),
        pt(xsr[:, T], 1), pt(K, 1), pt(k, 1), pt(Kold, 1), pt(kold, 1),
        alphas, pt(dv.T, 1), pt(jnp.asarray(cprev), 1), pt(gate, 1),
        pt(keep, 1), 0.0, interpret=True, time_block=4)
    (xs_b, us_o, xfin, k_out, K_out, ls_cost, alpha_sel, acc_f,
     dcost_o, exp_o) = out

    np.testing.assert_array_equal(np.asarray(ut(acc_f, B)) > 0.5, any_acc)
    np.testing.assert_allclose(np.asarray(ut(alpha_sel, B)), alpha_ref,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(ut(ls_cost, B)),
                               cand[sel, np.arange(B)], rtol=2e-5)
    np.testing.assert_allclose(np.asarray(ut(dcost_o, B)),
                               dcost[sel, np.arange(B)],
                               rtol=2e-4, atol=1e-4)

    # predicated writes: taken lanes get the selected-α rollout, others
    # re-emit the current trajectory; keep lanes get the new gains
    take = any_acc & (np.asarray(gate) > 0.5)
    xs_sel, us_sel, _c = rollout_batched(
        mo, "euler", True, p, dt, x0,
        us + jnp.asarray(alpha_ref)[:, None, None] * k, xsr, K,
        interpret=True)
    got_xs = np.asarray(ut(xs_b, B))           # (B, T, n)
    got_us = np.asarray(ut(us_o, B))
    np.testing.assert_allclose(got_xs[take], np.asarray(xs_sel)[take, :T],
                               atol=1e-5)
    np.testing.assert_allclose(got_us[take], np.asarray(us_sel)[take],
                               atol=1e-5)
    np.testing.assert_allclose(got_xs[~take],
                               np.asarray(xsr)[~take, :T], atol=1e-6)
    np.testing.assert_allclose(got_us[~take], np.asarray(us)[~take],
                               atol=1e-6)
    keepb = np.asarray(keep) > 0.5
    np.testing.assert_allclose(np.asarray(ut(k_out, B))[keepb],
                               np.asarray(k)[keepb], atol=1e-7)
    np.testing.assert_allclose(np.asarray(ut(k_out, B))[~keepb],
                               np.asarray(kold)[~keepb], atol=1e-7)
    np.testing.assert_allclose(np.asarray(ut(K_out, B))[keepb],
                               np.asarray(K)[keepb], atol=1e-7)
    np.testing.assert_allclose(np.asarray(ut(K_out, B))[~keepb],
                               np.asarray(Kold)[~keepb], atol=1e-7)


@pytest.mark.slow
def test_fused_line_search_matches_plain():
    """Batched line search through the custom_vmap fused rule equals the
    plain per-problem implementation."""
    from ilqr_tpu.ops.rollout import line_search
    from ilqr_tpu.solver import init_state

    mo = get_model("acrobot")
    p = _f32_params(mo)
    rng = np.random.default_rng(2)
    B, T = 3, 9
    cfg_x = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                         rollout_kernel="xla")
    cfg_p = cfg_x.replace(rollout_kernel="pallas")
    x0 = jnp.asarray(rng.normal(size=(B, mo.n)) * 0.1, jnp.float32)
    u0 = jnp.asarray(rng.normal(size=(B, T, mo.m)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, mo.m)) * 0.1, jnp.float32)
    K = jnp.zeros((B, T, mo.m, mo.n), jnp.float32)
    dV = jnp.broadcast_to(jnp.asarray([-1.0, 0.1], jnp.float32), (B, 2))

    def run(cfg):
        def one(x0b, u0b, kb, Kb):
            st = init_state(mo, p, cfg, 0.02, x0b, u0b)
            return line_search(mo, p, cfg, 0.02, x0b, st.xs, st.us, kb, Kb,
                               dV[0], st.cost)
        return jax.vmap(one)(x0, u0, k, K)

    rx = run(cfg_x)
    rp = run(cfg_p)
    np.testing.assert_allclose(np.asarray(rx.cost), np.asarray(rp.cost),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rx.alpha), np.asarray(rp.alpha))
    np.testing.assert_array_equal(np.asarray(rx.accepted),
                                  np.asarray(rp.accepted))
    np.testing.assert_allclose(np.asarray(rx.us), np.asarray(rp.us),
                               atol=1e-5)
