"""Capture ONE real profiler trace of the fused iteration (VERDICT r3
item 6) and reconcile the per-phase device timeline against the fitted
cost model (BENCH_NOTES: ~330 us line-search sweep per iteration, ~26 ms
dispatch floor inferred from wall-clock probe matrices).

One process, one program: compile the flagship fused acrobot solve at
the bench shape, warm it, then run a few solves under
``jax.profiler.trace``. The xplane artifact is parsed with TF's
xplane_pb2 (tensorboard_plugin_profile ships in the image) and the
per-plane event aggregate is printed as JSON + a table; the raw
xplane.pb is copied under experiments/traces/ when small enough to
commit.

Env: TRACE_B (4096), TRACE_T (499), TRACE_MAXIT (100), TRACE_REPS (2).
"""

import glob
import json
import os
import shutil
import sys
import time

B = int(os.environ.get("TRACE_B", "4096"))
T = int(os.environ.get("TRACE_T", "499"))
MAX_ITER = int(os.environ.get("TRACE_MAXIT", "100"))
REPS = int(os.environ.get("TRACE_REPS", "2"))
HERE = os.path.dirname(os.path.abspath(__file__))


def summarize_xspace(trace_dir, top=40):
    """Now lives in the package: ilqr_tpu.utils.timing.summarize_trace."""
    from ilqr_tpu.utils.timing import summarize_trace

    try:
        return summarize_trace(trace_dir, top=top)
    except FileNotFoundError as e:
        return {"error": str(e)}, None


def main():
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp
    import numpy as np

    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[trace] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.fused import solve_batch_fused
    from ilqr_tpu.models import acrobot as ac

    model = get_model("acrobot")
    params = ac.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=MAX_ITER)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(0.05 * rng.normal(size=(B, 4)), jnp.float32)
    u0 = jnp.zeros((B, T, 1), jnp.float32)

    t0 = time.perf_counter()
    sol = solve_batch_fused(model, params, cfg, 0.02, x0, u0)
    np.asarray(sol.cost)
    first = time.perf_counter() - t0
    print(f"[trace] compile+first {first:.1f}s", file=sys.stderr,
          flush=True)

    trace_dir = os.path.join(HERE, "trace_tmp")
    shutil.rmtree(trace_dir, ignore_errors=True)
    reps = []
    try:
        with jax.profiler.trace(trace_dir):
            for _ in range(REPS):
                t0 = time.perf_counter()
                sol = solve_batch_fused(model, params, cfg, 0.02, x0, u0)
                np.asarray(sol.cost)
                reps.append(round(time.perf_counter() - t0, 4))
    except Exception as e:  # noqa: BLE001 — "tracing unsupported" IS a result
        print(json.dumps({"mode": "trace", "B": B, "T": T,
                          "trace_error": repr(e)[:400],
                          "first_s": round(first, 1), "reps_s": reps}),
              flush=True)
        return

    planes, path = summarize_xspace(trace_dir)
    kept = None
    if path and os.path.getsize(path) < 60e6:
        dst = os.path.join(HERE, "traces")
        os.makedirs(dst, exist_ok=True)
        kept = os.path.join(dst, "fused_acrobot.xplane.pb")
        shutil.copy(path, kept)
    print(json.dumps({
        "mode": "trace", "B": B, "T": T, "max_iter": MAX_ITER,
        "first_s": round(first, 1), "reps_s": reps,
        "solves_per_s_best": round(B / min(reps), 1) if reps else None,
        "xplane_path": kept or path,
        "xplane_mb": round(os.path.getsize(path) / 1e6, 1) if path else 0,
        "planes": planes,
    }), flush=True)


if __name__ == "__main__":
    main()
