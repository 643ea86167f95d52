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
    """Aggregate event durations by (plane, event name) from the xplane
    protobuf dump jax.profiler writes."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return {"error": f"no xplane.pb under {trace_dir}"}, None
    path = max(paths, key=os.path.getsize)
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    planes = {}
    for plane in xspace.planes:
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        agg = {}
        n_events = 0
        span_lo, span_hi = None, 0
        for line in plane.lines:
            for ev in line.events:
                n_events += 1
                name = meta.get(ev.metadata_id, f"id{ev.metadata_id}")
                dur_us = ev.duration_ps / 1e6
                a = agg.setdefault(name, [0.0, 0])
                a[0] += dur_us
                a[1] += 1
                t0 = line.timestamp_ns * 1e3 + ev.offset_ps / 1.0
                if span_lo is None or t0 < span_lo:
                    span_lo = t0
                if t0 + ev.duration_ps > span_hi:
                    span_hi = t0 + ev.duration_ps
        top_events = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
        planes[plane.name] = {
            "n_events": n_events,
            "n_lines": len(plane.lines),
            "span_ms": (round((span_hi - span_lo) / 1e9, 3)
                        if span_lo is not None else 0.0),
            "top_events": [
                {"name": k[:120], "total_us": round(v[0], 1),
                 "count": v[1],
                 "mean_us": round(v[0] / max(v[1], 1), 2)}
                for k, v in top_events],
        }
    return planes, path


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
