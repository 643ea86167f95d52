"""TPU evidence for the m=24 deployment guidance ("compile once, serve
from the AOT blob"): the widest fused model's 36-min Mosaic compile is
paid exactly once, after which a fresh process serves it in seconds.

Phase save (M24_MODE=save): compile_solver(thruster_ring24, B=256,
path='fused', fields=...) — pays the m=24 compile wall (~2.2 ks,
m24_fused row) — saves the blob and records a reference burst of
per-request costs through SolverService(aot=).

Phase serve (M24_MODE=serve): a fresh process loads the blob into
SolverService(aot=), serves the same burst with ZERO compiles, and
compares costs BIT-exactly (the lane_probe discipline). Timed: process
start -> first served solution.
"""

import json
import os
import sys
import time

import numpy as np

MODE = os.environ.get("M24_MODE", "save")
BLOB = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "m24_serve.aotexec")
COSTS = BLOB + ".costs.npy"
B_MAX, T, MAX_ITER, REQS = 256, 80, 20, 8
FIELDS = ("us", "cost", "iterations", "reason")

PROC_T0 = time.perf_counter()


def _burst(svc):
    rng = np.random.default_rng(24)
    x0s = (0.2 * rng.normal(size=(REQS, 6))).astype(np.float32)
    t0 = time.perf_counter()
    first = svc.solve(x0s[0], timeout=5400)
    first_s = time.perf_counter() - t0
    futs = [svc.submit(x) for x in x0s[1:]]
    costs = [float(first.cost)] + [float(f.result(timeout=600).cost)
                                   for f in futs]
    return costs, first_s


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[m24_aot] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.models import thruster_ring as tr
    from ilqr_tpu.serve import SolverService

    model = get_model("thruster_ring24")
    params = tr.default_params24()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=MAX_ITER)
    out = {"mode": f"m24_aot_{MODE}", "B": B_MAX, "T": T,
           "max_iter": MAX_ITER}

    if MODE == "save":
        from ilqr_tpu.aot import compile_solver

        t0 = time.perf_counter()
        aot = compile_solver(model, params, cfg, 0.05, B_MAX, T,
                             path="fused", fields=FIELDS)
        out["compile_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        aot.save(BLOB)
        out["save_s"] = round(time.perf_counter() - t0, 2)
        out["blob_mb"] = round(os.path.getsize(BLOB) / 1e6, 1)
        svc = SolverService(model, params, cfg, dt=0.05, horizon=T,
                            max_batch=B_MAX, max_wait_ms=2.0,
                            path="fused", fields=FIELDS, aot=aot)
        costs, first_s = _burst(svc)
        svc.close(timeout=60)
        np.save(COSTS, np.asarray(costs, np.float64))
        out.update(first_s=round(first_s, 2),
                   mean_cost=round(float(np.mean(costs)), 6))
    else:
        svc = SolverService(model, params, cfg, dt=0.05, horizon=T,
                            max_batch=B_MAX, max_wait_ms=2.0,
                            path="fused", fields=FIELDS, aot=BLOB)
        out["construct_s"] = round(time.perf_counter() - PROC_T0, 1)
        costs, first_s = _burst(svc)
        svc.close(timeout=60)
        out.update(
            first_s=round(first_s, 2),
            start_to_first_solution_s=round(
                out["construct_s"] + first_s, 1))
        ref = np.load(COSTS)
        deltas = np.abs(np.asarray(costs, np.float64) - ref)
        out["max_abs_dcost_vs_save"] = float(deltas.max())
        out["bit_exact"] = bool(deltas.max() == 0.0)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
