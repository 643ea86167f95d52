"""TPU evidence for the SHARDED AOT executable (VERDICT r4 item 2):
serialize the mesh dispatch program and reload it in a fresh process.

Phase save (MA_MODE=save): compile_solver(mesh=1-device-TPU-mesh,
warm=True, fields=(us, cost, iterations, reason)) — the full warm
serving dispatch as ONE sharded executable — save the blob, solve a
reference burst through SolverService(mesh=, aot=) in-process, record
per-request costs.

Phase serve (MA_MODE=serve): a fresh process loads the blob into
SolverService(mesh=, aot=), serves the same burst, and compares costs
BIT-exactly against the save phase (the lane_probe discipline applied
to the sharded executable). Timed: process start -> first served
solution, zero compiles.

Mesh-size independence of the sharding/vma typing means the 1-device
pass validates the multi-chip executable contract Mosaic-side (see
parallel/mesh.py); the 8-device CPU-mesh legs live in
tests/test_aot.py::TestShardedAot.
"""

import json
import os
import sys
import time

import numpy as np

MODE = os.environ.get("MA_MODE", "save")
BLOB = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "mesh_warm.aotexec")
COSTS = BLOB + ".costs.npy"
B_MAX, T, MAX_ITER, REQS = 256, 99, 10, 8
# xs/K/lam/dlam must stay in the payload for warm chaining (prev=sol)
FIELDS = ("us", "xs", "K", "lam", "dlam", "cost", "iterations", "reason")

PROC_T0 = time.perf_counter()


def _burst(svc):
    rng = np.random.default_rng(23)
    x0s = (0.05 * rng.normal(size=(REQS, 4))).astype(np.float32)
    t0 = time.perf_counter()
    first = svc.solve(x0s[0], timeout=1800)
    first_s = time.perf_counter() - t0
    futs = [svc.submit(x) for x in x0s[1:]]
    costs = [float(first.cost)] + [float(f.result(timeout=600).cost)
                                   for f in futs]
    # one warm replan through the executable as well
    prev = first
    t0 = time.perf_counter()
    warm = svc.solve(x0s[0] + np.float32(0.01), prev=prev, timeout=600)
    warm_s = time.perf_counter() - t0
    return costs + [float(warm.cost)], first_s, warm_s


def main():
    import jax

    t0 = time.perf_counter()
    import jax.numpy as jnp

    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[mesh_aot] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.models import acrobot as ac
    from ilqr_tpu.parallel.mesh import make_mesh
    from ilqr_tpu.serve import SolverService

    model = get_model("acrobot")
    params = ac.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=MAX_ITER)
    mesh = make_mesh()
    out = {"mode": f"mesh_aot_{MODE}", "B": B_MAX, "T": T,
           "mesh_size": int(mesh.size), "max_iter": MAX_ITER}

    if MODE == "save":
        from ilqr_tpu.aot import compile_solver

        t0 = time.perf_counter()
        aot = compile_solver(model, params, cfg, 0.02, B_MAX, T,
                             path="fused", warm=True, fields=FIELDS,
                             mesh=mesh)
        out["compile_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        aot.save(BLOB)
        out["save_s"] = round(time.perf_counter() - t0, 2)
        out["blob_mb"] = round(os.path.getsize(BLOB) / 1e6, 1)
        svc = SolverService(model, params, cfg, dt=0.02, horizon=T,
                            max_batch=B_MAX, max_wait_ms=2.0,
                            path="fused", warm=True, fields=FIELDS,
                            mesh=mesh, aot=aot)
        costs, first_s, warm_s = _burst(svc)
        svc.close(timeout=60)
        np.save(COSTS, np.asarray(costs, np.float64))
        out.update(first_s=round(first_s, 2), warm_replan_s=round(warm_s, 3),
                   mean_cost=round(float(np.mean(costs)), 6))
    else:
        svc = SolverService(model, params, cfg, dt=0.02, horizon=T,
                            max_batch=B_MAX, max_wait_ms=2.0,
                            path="fused", warm=True, fields=FIELDS,
                            mesh=mesh, aot=BLOB)
        out["construct_s"] = round(time.perf_counter() - PROC_T0, 1)
        costs, first_s, warm_s = _burst(svc)
        svc.close(timeout=60)
        out.update(
            first_s=round(first_s, 2),
            start_to_first_solution_s=round(
                out["construct_s"] + first_s, 1),
            warm_replan_s=round(warm_s, 3))
        ref = np.load(COSTS)
        deltas = np.abs(np.asarray(costs, np.float64) - ref)
        out["max_abs_dcost_vs_save"] = float(deltas.max())
        out["bit_exact"] = bool(deltas.max() == 0.0)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
