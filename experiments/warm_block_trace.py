"""Where does the 0.592 s full-block warm dispatch go? (soak follow-up)

The round-5 soak measured 0.592 s per 1024-lane warm batch where the
round-4 extrapolation assumed ~0.28 s. This probe loads the no-compile
soak blob, drives the SAME service dispatch path (pad + single-transfer
H2D + block solve + packed D2H + unpack) at full 1024-lane batches, and
captures one ``jax.profiler.trace`` across a few dispatches; the xplane
aggregate splits device time vs transfer vs host so BENCH_NOTES can
state the full-block budget as a measurement, not a guess. Also times
the host-side phases (payload stack / pad / unpack) with perf_counter
for the non-device share.
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
BLOB = os.path.join(HERE, "serve_warm1024.aotexec")
B, T, N, M = 1024, 199, 4, 1


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[wbt] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.models import acrobot as ac
    from ilqr_tpu.serve import SolverService

    model = get_model("acrobot")
    params = ac.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=10)
    FIELDS = ("us", "xs", "K", "lam", "dlam", "cost", "iterations")
    svc = SolverService(model, params, cfg, dt=0.02, horizon=T,
                        max_batch=B, max_wait_ms=0.0, path="fused",
                        warm=True, fields=FIELDS, aot=BLOB,
                        autostart=False)

    rng = np.random.default_rng(0)
    x0 = (0.05 * rng.normal(size=(B, N))).astype(np.float32)
    us = np.zeros((B, T, M), np.float32)
    xs = np.zeros((B, T + 1, N), np.float32)
    K = np.zeros((B, T, M, N), np.float32)
    lam = np.full((B,), cfg.lambda_init, np.float32)
    dlam = np.full((B,), cfg.dlambda_init, np.float32)

    # warm the dispatch once (no compile — AOT), then time phases
    sol = svc._solve(x0, us, xs, K, lam, dlam)
    # chain real warm payloads for realism
    warm_in = (x0, np.ascontiguousarray(sol.us),
               np.ascontiguousarray(sol.xs), np.ascontiguousarray(sol.K),
               np.ascontiguousarray(sol.lam), np.ascontiguousarray(sol.dlam))

    reps = []
    for _ in range(6):
        t0 = time.perf_counter()
        svc._solve(*warm_in)
        reps.append(time.perf_counter() - t0)

    trace_dir = os.path.join(HERE, "trace_tmp", "warm_block")
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(4):
            svc._solve(*warm_in)

    from ilqr_tpu.utils.timing import summarize_trace

    try:
        planes, xplane = summarize_trace(trace_dir, top=12)
        planes_small = {
            name: {"span_ms": p["span_ms"],
                   "top": [{k: e[k] for k in ("name", "total_us", "count")}
                           for e in p["top_events"][:6]]}
            for name, p in planes.items()}
    except Exception as e:  # noqa: BLE001
        planes_small, xplane = {"error": str(e)}, None

    print(json.dumps({
        "mode": "warm_block_trace", "B": B, "T": T,
        "dispatch_s": [round(r, 3) for r in reps],
        "dispatch_best_s": round(min(reps), 3),
        "planes": planes_small,
    }), flush=True)


if __name__ == "__main__":
    main()
