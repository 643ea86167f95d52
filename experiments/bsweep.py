"""Single-chip batch-size sweep: dispatch-overlap efficiency (VERDICT r2
item 5, the TPU half of the scaling artifact).

The fused solver compiles ONE 1024-lane block program and host-loops
chunks, so a single process sweeps every B with one Mosaic compile. The
sweep quantifies how chunk dispatches overlap: at B=1024 the ~26 ms
dispatch+D2H round trip (BENCH_NOTES cost model) is exposed; at B>=2048
consecutive chunks overlap it and throughput approaches device-true.

Appends one JSON line per B to stdout (chain redirects to
experiments/bsweep_results.jsonl).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[bsweep] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.fused import solve_batch_fused
    from ilqr_tpu.models import acrobot as ac

    model = get_model("acrobot")
    params = ac.default_params()
    max_iter = int(os.environ.get("BS_MAX_ITER", 100))
    T = 499
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       use_control_limits=True, max_iter=max_iter)
    rng = np.random.default_rng(0)

    # Warm-up at the largest B (same block program for every B; two calls
    # absorb the axon second-call recompile, see bench.py).
    Bmax = 8192
    u0 = jnp.zeros((Bmax, T, 1), jnp.float32)
    x0 = jnp.asarray(0.05 * rng.normal(size=(Bmax, 4)), jnp.float32)
    t0 = time.perf_counter()
    sol = solve_batch_fused(model, params, cfg, 0.02, x0, u0)
    np.asarray(sol.cost)
    first = time.perf_counter() - t0
    sol = solve_batch_fused(model, params, cfg, 0.02, x0, u0)
    np.asarray(sol.cost)
    print(f"[bsweep] compile+first {first:.1f}s", file=sys.stderr,
          flush=True)

    results = []
    for B in (1024, 2048, 4096, 8192):
        x0b = jnp.asarray(0.05 * rng.normal(size=(B, 4)), jnp.float32)
        u0b = jnp.zeros((B, T, 1), jnp.float32)
        reps = []
        for _ in range(4):
            t0 = time.perf_counter()
            sol = solve_batch_fused(model, params, cfg, 0.02, x0b, u0b)
            np.asarray(sol.cost)
            reps.append(time.perf_counter() - t0)
        best = min(reps)
        rate = B / best
        results.append((B, rate))
        print(json.dumps({
            "probe": "bsweep", "B": B, "T": T, "max_iter": max_iter,
            "best_s": round(best, 4),
            "solves_per_s": round(rate, 1),
            "per_chunk_ms": round(best / (B // 1024) * 1e3, 1),
        }), flush=True)

    b0, r0 = results[0]
    for B, r in results[1:]:
        print(json.dumps({
            "probe": "bsweep_efficiency", "B": B,
            "throughput_vs_B1024": round(r / r0, 3),
            "overlap_efficiency": round((r / B) / (r0 / b0), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
