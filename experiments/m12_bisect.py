"""Bisect the m=12 vmap-path XLA:TPU worker fault boundary in B.

Round-4 facts (BENCH_NOTES "m=12 paths"): thruster_ring (n=6, m=12) on
the pure-XLA vmap path with boxqp_mode="pn_fixed" RUNS at B=64 (127 s /
batch, ≤40 iters) but reproducibly CRASHED the TPU worker ("kernel
fault") at B=1024 — with per-stage kernels engaged AND pinned off, while
the same program is CPU-valid. This probe runs ONE such solve at an
env-chosen (B, max_iter, qp-mode) so a chain script can bisect the
boundary: each invocation is its own TPU process (a crash kills only
that process; round-4 observed the pool recovers in ~2 min).

Env:
  MB_B      batch size (default 512)
  MB_ITERS  max_iter   (default 4 — cheap probe; the fault fired at the
            program/shape level in round 4, but the chain re-confirms
            the boundary point at 40 iters)
  MB_QP     pn_fixed | iterative (default pn_fixed)
  MB_CHUNK  none (default — the monolithic single-dispatch program the
            bisect maps) | auto | an int: iteration-chunked dispatch
            (batch.SAFE_ITER_CHUNK mitigation validation)
  MB_BSPLIT 0 (default) | an int S: split the batch into sequential
            S-lane sub-solves in THIS process (batch-chunking probe —
            does executing several proven-safe shapes back-to-back
            accumulate to the B>=512 worker crash?)

Prints one JSON row on success; a crash never reaches the print (the
chain records rc + the stderr tail instead).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu import SolverConfig, get_model
from ilqr_tpu.batch import solve_batch
from ilqr_tpu.models import thruster_ring as tr

B = int(os.environ.get("MB_B", "512"))
ITERS = int(os.environ.get("MB_ITERS", "4"))
QP = os.environ.get("MB_QP", "pn_fixed")
CHUNK = os.environ.get("MB_CHUNK", "none")
CHUNK = None if CHUNK == "none" else (CHUNK if CHUNK == "auto"
                                      else int(CHUNK))
BSPLIT = int(os.environ.get("MB_BSPLIT", "0"))

model = get_model("thruster_ring")
params = jax.tree_util.tree_map(
    lambda a: jnp.asarray(a, jnp.float32), tr.default_params())
# Same config family as secondary_bench m12_pn: pure XLA scan path
# (kernels pinned off — the per-stage kernels at m=12 crashed on first
# contact in round 4 and are auto-capped at m<=8 anyway).
cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                   max_iter=ITERS, boxqp_mode=QP,
                   backward_kernel="xla", rollout_kernel="xla",
                   deriv_kernel="xla")
T = 80
rng = np.random.default_rng(0)
x0 = jnp.asarray(0.2 * rng.normal(size=(B, 6)), jnp.float32)
u0 = jnp.zeros((T, 12), jnp.float32)

t0 = time.perf_counter()
if BSPLIT:
    costs, iters_parts = [], []
    for c in range(0, B, BSPLIT):
        sol = solve_batch(model, params, cfg, 0.05, x0[c:c + BSPLIT], u0,
                          iter_chunk=CHUNK)
        costs.append(np.asarray(sol.cost))   # D2H per sub-batch
        iters_parts.append(np.asarray(sol.iterations))
    cost = np.concatenate(costs)
    iters_arr = np.concatenate(iters_parts)
else:
    sol = solve_batch(model, params, cfg, 0.05, x0, u0, iter_chunk=CHUNK)
    cost = np.asarray(sol.cost)  # full D2H — where a lazy fault surfaces
    iters_arr = np.asarray(sol.iterations)
first = time.perf_counter() - t0
print(json.dumps({
    "mode": "m12_bisect", "B": B, "iters": ITERS, "qp": QP,
    "chunk": str(CHUNK), "bsplit": BSPLIT, "status": "ok",
    "first_s": round(first, 1),
    "mean_cost": round(float(cost.mean()), 4),
    "mean_iters": round(float(iters_arr.mean()), 1),
}), flush=True)
