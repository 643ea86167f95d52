"""Closed-loop rollout and the batched line search.

The reference's forward pass (ref: src/ilqr_core.cpp:305-337) mutates the
trajectory in place mid-rollout and must restore it on rejection
(:215-219). Here the rollout is a pure ``lax.scan`` returning fresh arrays.

The reference's line search (ref: src/ilqr_core.cpp:184-226) is a serial
backtracking loop over 11 step sizes. Here ALL candidates are evaluated as
one batched rollout (leading dim 11 → one fused device step) and the first
acceptable candidate is selected — identical acceptance semantics, no serial
host loop.

Fused path: for models with SoA functions (models/base.py) in f32, batched
rollouts dispatch — via ``custom_vmap`` — to the fused Pallas kernel
(ops/pallas_rollout), which runs the whole T-step rollout for 1024 problems
per block inside one kernel. The line search folds its α-candidates into
the kernel's batch axis. ``SolverConfig.rollout_kernel`` controls this:
"auto" (TPU only), "pallas" (force, interpreter off-TPU), "xla" (never).

Parity note: the reference does NOT clamp controls to the box during rollout
(ilqr_core.cpp:322-329, "This is the wrong way, but the only way that works
right now"). ``clamp=False`` reproduces that; ``clamp=True`` is the corrected
behavior.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ilqr_tpu.config import SolverConfig
from ilqr_tpu.models.base import Model, get_integrator


class LineSearchResult(NamedTuple):
    xs: jnp.ndarray        # (T+1, n) trajectory of the chosen candidate
    us: jnp.ndarray        # (T, m)
    cost: jnp.ndarray      # scalar
    dcost: jnp.ndarray     # actual cost reduction of the chosen candidate
    expected: jnp.ndarray  # expected reduction −α(dV₀+α·dV₁)
    z: jnp.ndarray         # dcost/expected ratio
    alpha: jnp.ndarray     # chosen step size (0.0 = all rejected, ref :224)
    accepted: jnp.ndarray  # bool


# TPU-proven envelope for the per-stage kernels on the vmap path: m ≤ 8
# (auto-engaged in the m=4 bench modes and the m=6/m=8 equivalence legs,
# all rc=0 on device). At m=12 the vmap-path solve crashed the TPU
# worker ("kernel fault") BOTH with the kernels auto-engaged and with
# them pinned off (experiments/round4_log.txt, 2026-08-20 11:53 and
# 12:41; the same program runs fine on CPU), so the fault is in the
# XLA:TPU backend at that shape, not necessarily these kernels — but
# "auto" still caps at the proven width as defense in depth; explicit
# "pallas" forces engagement (e.g. to re-probe after a backend fix).
MAX_STAGE_KERNEL_M = 8


def _use_fused(model: Model, cfg: SolverConfig, dtype) -> bool:
    return (
        model.has_soa
        and dtype == jnp.float32
        and cfg.rollout_kernel != "xla"
        and (cfg.rollout_kernel == "pallas"
             or (jax.default_backend() == "tpu"
                 and model.m <= MAX_STAGE_KERNEL_M))
    )


_INTERPRET_OVERRIDE = None  # tests only: force compiled (False) or
# interpreter (True) kernel dispatch regardless of backend — lets CPU
# tests TRACE the Mosaic-path program (e.g. the check_vma typing) without
# TPU hardware. None = backend rule.


def _interpret() -> bool:
    if _INTERPRET_OVERRIDE is not None:
        return _INTERPRET_OVERRIDE
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# XLA (lax.scan) implementations
# ---------------------------------------------------------------------------

def _rollout_scan(model: Model, params, cfg: SolverConfig, dt, x0, u_ff,
                  xs_ref, K):
    integ = get_integrator(cfg.integrator)

    def step(x, inp):
        u_ff_t, x_ref_t, k_mat = inp
        u = u_ff_t + k_mat @ (x - x_ref_t)
        if cfg.clamp_forward:
            u = jnp.minimum(params.u_max, jnp.maximum(u, params.u_min))
        c = model.cost(params, x, u)
        x_next = integ(model, params, x, u, dt)
        return x_next, (x_next, u, c)

    _xT, (xs_tail, us_new, costs) = lax.scan(step, x0, (u_ff, xs_ref[:-1], K))
    xs_new = jnp.concatenate([x0[None], xs_tail], axis=0)
    total = jnp.sum(costs) + model.final_cost(params, xs_new[-1])
    return xs_new, us_new, total


def _line_search_impl(model, params, cfg, dt, x0, xs, us, k, K, dV, cost_s):
    dtype = x0.dtype
    alphas = jnp.asarray(cfg.alphas, dtype)

    def try_alpha(alpha):
        u_ff = us + alpha * k
        xs_new, us_new, new_cost = rollout(
            model, params, cfg, dt, x0, u_ff, xs_ref=xs, K=K
        )
        dcost = cost_s - new_cost
        expected = -alpha * (dV[0] + alpha * dV[1])
        z = jnp.where(expected > 0, dcost / expected, jnp.sign(dcost))
        return xs_new, us_new, new_cost, dcost, expected, z

    xs_all, us_all, costs, dcosts, expecteds, zs = jax.vmap(try_alpha)(alphas)

    accept = zs > cfg.z_min
    accepted = jnp.any(accept)
    idx = jnp.argmax(accept)  # index of the first True (largest α first)

    return LineSearchResult(
        xs=xs_all[idx],
        us=us_all[idx],
        cost=costs[idx],
        dcost=dcosts[idx],
        expected=expecteds[idx],
        z=zs[idx],
        alpha=jnp.where(accepted, alphas[idx], jnp.zeros((), dtype)),
        accepted=accepted,
    )


# ---------------------------------------------------------------------------
# custom_vmap dispatch to the fused Pallas kernel
# ---------------------------------------------------------------------------

def _params_axes(in_batched_tree):
    return jax.tree_util.tree_map(
        lambda b: 0 if b else None, in_batched_tree
    )


@functools.lru_cache(maxsize=None)
def _get_rollout_cv(model: Model, cfg: SolverConfig):
    from ilqr_tpu.ops.pallas_rollout import rollout_batched

    @jax.custom_batching.custom_vmap
    def _cv(params, dt, x0, u_ff, xs_ref, K):
        # Single-problem path: still use the kernel on TPU (B=1 block,
        # ~0.1 ms vs T scan dispatches) — the real-time MPC latency path.
        if jax.default_backend() == "tpu":
            xs, us, cost = rollout_batched(
                model, cfg.integrator, cfg.clamp_forward, params, dt,
                x0[None], u_ff[None], xs_ref[None], K[None],
                vma_axes=cfg.vma_axes,
            )
            return xs[0], us[0], cost[0]
        return _rollout_scan(model, params, cfg, dt, x0, u_ff, xs_ref, K)

    @_cv.def_vmap
    def _rule(axis_size, in_batched, params, dt, x0, u_ff, xs_ref, K):
        pb, dtb, x0b, uffb, xsb, Kb = in_batched
        if any(jax.tree_util.tree_leaves(pb)) or dtb:
            # per-problem params: XLA scan path, plainly vmapped
            out = jax.vmap(
                lambda p_, d_, a, b, c, dd: _rollout_scan(
                    model, p_, cfg, d_, a, b, c, dd),
                in_axes=(_params_axes(pb), 0 if dtb else None,
                         0 if x0b else None, 0 if uffb else None,
                         0 if xsb else None, 0 if Kb else None),
                axis_size=axis_size,
            )(params, dt, x0, u_ff, xs_ref, K)
            return out, (True, True, True)

        def bc(a, b):
            return a if b else jnp.broadcast_to(
                a[None], (axis_size,) + a.shape)

        out = rollout_batched(
            model, cfg.integrator, cfg.clamp_forward, params, dt,
            bc(x0, x0b), bc(u_ff, uffb), bc(xs_ref, xsb), bc(K, Kb),
            interpret=_interpret(), vma_axes=cfg.vma_axes,
        )
        return out, (True, True, True)

    return _cv


@functools.lru_cache(maxsize=None)
def _get_line_search_cv(model: Model, cfg: SolverConfig):
    from ilqr_tpu.ops.pallas_rollout import rollout_batched

    @jax.custom_batching.custom_vmap
    def _cv(params, dt, x0, xs, us, k, K, dV, cost_s):
        return _line_search_impl(
            model, params, cfg, dt, x0, xs, us, k, K, dV, cost_s)

    @_cv.def_vmap
    def _rule(axis_size, in_batched, params, dt, x0, xs, us, k, K, dV,
              cost_s):
        pb, dtb = in_batched[0], in_batched[1]
        if any(jax.tree_util.tree_leaves(pb)) or dtb:
            out = jax.vmap(
                lambda p_, d_, *a: _line_search_impl(
                    model, p_, cfg, d_, *a),
                in_axes=(_params_axes(pb), 0 if dtb else None)
                        + tuple(0 if b else None for b in in_batched[2:]),
                axis_size=axis_size,
            )(params, dt, x0, xs, us, k, K, dV, cost_s)
            return out, jax.tree_util.tree_map(lambda _: True, out)

        B = axis_size
        f32 = jnp.float32
        alphas = jnp.asarray(cfg.alphas, f32)
        A = alphas.shape[0]

        def bc(a, b):
            return a if b else jnp.broadcast_to(a[None], (B,) + a.shape)

        x0 = bc(x0, in_batched[2])
        xs = bc(xs, in_batched[3])
        us = bc(us, in_batched[4])
        k = bc(k, in_batched[5])
        K = bc(K, in_batched[6])
        dV = bc(dV, in_batched[7])
        cost_s = bc(cost_s, in_batched[8])

        # Fold the α axis into the batch: candidate (b, a) at row b*A + a.
        u_ff = us[:, None] + alphas[None, :, None, None] * k[:, None]
        BA = B * A

        def tile(a):
            return jnp.broadcast_to(
                a[:, None], (B, A) + a.shape[1:]
            ).reshape((BA,) + a.shape[1:])

        xs_new, us_new, costs = rollout_batched(
            model, cfg.integrator, cfg.clamp_forward, params, dt,
            tile(x0), u_ff.reshape((BA,) + us.shape[1:]), tile(xs), tile(K),
            interpret=_interpret(), vma_axes=cfg.vma_axes,
        )
        xs_new = xs_new.reshape((B, A) + xs_new.shape[1:])
        us_new = us_new.reshape((B, A) + us_new.shape[1:])
        costs = costs.reshape(B, A)

        dcost = cost_s[:, None] - costs
        expected = -alphas[None, :] * (dV[:, 0:1] + alphas[None, :] * dV[:, 1:2])
        z = jnp.where(expected > 0, dcost / expected, jnp.sign(dcost))
        accept = z > cfg.z_min
        accepted = jnp.any(accept, axis=1)
        idx = jnp.argmax(accept, axis=1)

        pick = jax.vmap(lambda arr, i: arr[i])
        out = LineSearchResult(
            xs=pick(xs_new, idx),
            us=pick(us_new, idx),
            cost=pick(costs, idx),
            dcost=pick(dcost, idx),
            expected=pick(expected, idx),
            z=pick(z, idx),
            alpha=jnp.where(accepted, alphas[idx], jnp.zeros((), f32)),
            accepted=accepted,
        )
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return _cv


# ---------------------------------------------------------------------------
# Public API (same signatures as before)
# ---------------------------------------------------------------------------

def rollout(model: Model, params, cfg: SolverConfig, dt, x0, u_ff, xs_ref, K):
    """Closed-loop rollout u_t = u_ff_t + K_t (x_t − x̄_t) (ref :314-332).

    Returns (xs, us, total_cost) where ``us`` are the controls actually
    applied (the reference stores them back into ``us`` in place, :323).
    """
    if _use_fused(model, cfg, jnp.asarray(x0).dtype):
        fn = _get_rollout_cv(model, cfg)
        return fn(params, jnp.asarray(dt, jnp.float32), x0, u_ff, xs_ref, K)
    return _rollout_scan(model, params, cfg, dt, x0, u_ff, xs_ref, K)


def open_loop_rollout(model: Model, params, cfg: SolverConfig, dt, x0, us):
    """Initial rollout with no feedback (ref init_traj, ilqr_core.cpp:20 —
    K is empty there so forward_pass degenerates to open loop)."""
    T, m = us.shape
    n = x0.shape[0]
    zero_K = jnp.zeros((T, m, n), x0.dtype)
    xs_ref = jnp.zeros((T + 1, n), x0.dtype)
    return rollout(model, params, cfg, dt, x0, us, xs_ref, zero_K)


def line_search(
    model: Model, params, cfg: SolverConfig, dt, x0, xs, us, k, K, dV, cost_s
) -> LineSearchResult:
    """All-α batched line search (ref: src/ilqr_core.cpp:184-226).

    Acceptance: z = dcost/expected > z_min where expected = −α(dV₀+α·dV₁);
    when expected ≤ 0, z = sign(dcost) (ref :199-213 incl. the warning case).
    The first (largest-α) acceptable candidate wins, exactly like the serial
    backtracking order.
    """
    if _use_fused(model, cfg, jnp.asarray(x0).dtype):
        fn = _get_line_search_cv(model, cfg)
        return fn(params, jnp.asarray(dt, jnp.float32), x0, xs, us, k, K,
                  dV, cost_s)
    return _line_search_impl(
        model, params, cfg, dt, x0, xs, us, k, K, dV, cost_s)
