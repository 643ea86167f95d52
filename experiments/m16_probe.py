"""MAX_FUSED_M=16 compile-wall probe (VERDICT r4 item 6): can Mosaic
compile the fused iteration kernel with the 16×16 masked-Cholesky
projected-Newton in-kernel QP, and at what compile cost?

The tile algebra (_qp_pn/_chol_masked_tiles) is generic in m; the cap is
a constant. This probe patches ops.pallas_sweep.MAX_FUSED_M to 16 (all
guard sites read the module global at trace time) and runs the
registered m=16 ring model (models/thruster_ring.MODEL16) through
solve_batch_fused at the m12_fused workload shape (B=1024, T=80,
≤40 iters). Outcome either way closes the item: a measured
(compile_s, solves/s) row, or a documented compile-wall negative
(timeout/compiler error — the chain records rc and stderr).

Compile estimate: m=12 took 386 s; the QP unroll is O(m³)-ish in ops →
m=16 plausibly 700-1200 s. The chain runs this with a large timeout and
NEVER near a round boundary (a timeout-kill mid-compile can wedge the
tunnel — CLAUDE.md).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import ilqr_tpu.ops.pallas_sweep as ps

ps.MAX_FUSED_M = max(ps.MAX_FUSED_M, 16)  # no-op since the round-5
# cap raise landed; kept so the probe is self-contained historically

from ilqr_tpu import SolverConfig, get_model  # noqa: E402
from ilqr_tpu.fused import solve_batch_fused  # noqa: E402
from ilqr_tpu.models import thruster_ring as tr  # noqa: E402

MODE = os.environ.get("M16_MODE", "perf")  # perf | equiv
B = int(os.environ.get("M16_B", "64" if MODE == "equiv" else "1024"))
# equiv x0 scale: 0.2 = the perf workload (lanes hit the 40-iter cap, so
# per-QP f32 tile-vs-jnp noise compounds — measured 5.2e-3 max rel
# dcost); 0.02 = a converging workload (both paths reach the same
# optimum, the equivalence gauge proper)
SCALE = float(os.environ.get("M16_SCALE", "0.2"))
T = 80

model = get_model("thruster_ring16")
# M16_EASY=1: a NEAR goal (problems converge well inside the 40-iter
# cap) — the equivalence gauge proper: both paths reach the same
# optimum, so per-QP f32 noise cannot compound through capped iterates
_goal = ((0.15, -0.1, 0.08, 0.0, 0.0, 0.0)
         if os.environ.get("M16_EASY") == "1"
         else (1.5, -1.0, 0.8, 0.0, 0.0, 0.0))
params = jax.tree_util.tree_map(
    lambda a: jnp.asarray(a, jnp.float32), tr.default_params16(_goal))
cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                   max_iter=40, boxqp_mode="auto")
rng = np.random.default_rng(0)
x0 = jnp.asarray(SCALE * rng.normal(size=(B, 6)), jnp.float32)
u0 = jnp.zeros((T, 16), jnp.float32)

t0 = time.perf_counter()
sol = solve_batch_fused(model, params, cfg, 0.05, x0, u0)
cost = np.asarray(sol.cost)
first = time.perf_counter() - t0

if MODE == "equiv":
    # on-device fused-vs-vmap equivalence at m=16 (the m12 equiv_tpu
    # discipline): the contained chunked vmap route, same inputs.
    # 64 lanes x 40 iters = 2,560 lane-iterations — inside the wide-m
    # per-process ledger budget. M16_QP chooses the vmap-side QP:
    # "pn_fixed" = the SAME projected-Newton recipe as the kernel
    # (apples-to-apples iterates); "iterative" = the reference-semantics
    # solver (cross-algorithm — unconverged capped lanes then diverge at
    # the 1e-2 level by iterate tie-breaking, measured in round 5).
    vcfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                        max_iter=40,
                        boxqp_mode=os.environ.get("M16_QP", "pn_fixed"),
                        backward_kernel="xla", rollout_kernel="xla",
                        deriv_kernel="xla")
    from ilqr_tpu.batch import solve_batch

    t0 = time.perf_counter()
    vsol = solve_batch(model, params, vcfg, 0.05, x0, u0)  # auto→wide
    vcost = np.asarray(vsol.cost)
    v_s = time.perf_counter() - t0
    rel = np.abs(cost - vcost) / (np.abs(vcost) + 1e-9)
    print(json.dumps({
        "mode": "m16_equiv", "B": B, "T": T, "scale": SCALE,
        "easy_goal": os.environ.get("M16_EASY") == "1",
        "vmap_qp": vcfg.boxqp_mode,
        "fused_first_s": round(first, 1), "vmap_s": round(v_s, 1),
        "fused_mean_cost": round(float(cost.mean()), 4),
        "vmap_mean_cost": round(float(vcost.mean()), 4),
        "max_rel_dcost": float(rel.max()),
        "mean_iters_fused": round(float(np.asarray(sol.iterations).mean()), 1),
        "mean_iters_vmap": round(float(np.asarray(vsol.iterations).mean()), 1),
    }), flush=True)
else:
    reps = []
    for _ in range(3):
        x0r = jnp.asarray(0.2 * rng.normal(size=(B, 6)), jnp.float32)
        t0 = time.perf_counter()
        sol = solve_batch_fused(model, params, cfg, 0.05, x0r, u0)
        np.asarray(sol.cost)
        reps.append(time.perf_counter() - t0)
    us = np.asarray(sol.us)
    print(json.dumps({
        "mode": "m16_fused", "B": B, "T": T,
        "solves_per_s": round(B / min(reps), 1),
        "best_s": round(min(reps), 4), "first_s": round(first, 1),
        "mean_cost": round(float(np.asarray(sol.cost).mean()), 4),
        "mean_iters": round(float(np.asarray(sol.iterations).mean()), 1),
        "frac_at_lower": round(float((us <= 1e-6).mean()), 3),
    }), flush=True)
