"""Benchmark: batched acrobot iLQR solves/s on one chip.

North-star metric (BASELINE.json): batched acrobot solves/s; baseline is the
reference C++/Eigen binary at ~0.52 s per solve (measured single-core, see
golden/acrobot_log.txt — 100 iterations, T=499, dt=0.02), i.e. ~1.92 solves/s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N}

Environment knobs:
  BENCH_BATCH     batch size (default 1024)
  BENCH_MAX_ITER  solver iterations (default 100, same as the reference)
  BENCH_HORIZON   horizon T (default 499, same as the reference)
  BENCH_BACKEND   'cpu' to force CPU (default: whatever jax picks, i.e. TPU)
"""

import functools
import json
import os
import subprocess
import sys
import time


def _wait_tpu_healthy(budget_s: float) -> None:
    """Block until the axon tunnel answers a tiny matmul, or the budget runs
    out. The remote TPU pool sometimes wedges for hours (CLAUDE.md: every
    process then blocks in device init); probing from a SUBPROCESS with a
    150 s timeout keeps this process clean — if we ran the probe in-process
    and the tunnel was wedged, the main bench below would hang before its
    first timed rep. 150 s (not 45): device init takes 45-60 s in the
    tunnel's slow state (measured 2026-08-20), a 45 s probe then reads
    permanently "wedged" — and the timeout-kill lands mid-device-init,
    which is itself the pattern that wedges the pool. Probes are spaced
    8 min apart to avoid hammering it. Controlled by BENCH_WAIT_HEALTHY=0
    (skip) / BENCH_HEALTH_BUDGET_S.
    """
    probe = ("import jax, jax.numpy as jnp, numpy as np\n"
             "x = jnp.ones((256, 256))\n"
             "assert np.asarray(x @ x)[0, 0] == 256.0\n"
             "print('HEALTHY')\n")
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                text=True, timeout=150)
            if "HEALTHY" in out.stdout:
                if attempt > 1:
                    print(f"[bench] tunnel healthy after {attempt} probes",
                          file=sys.stderr)
                return
        except subprocess.TimeoutExpired:
            pass
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            print(f"[bench] tunnel still wedged after {attempt} probes; "
                  "proceeding anyway", file=sys.stderr)
            return
        print(f"[bench] tunnel wedged (probe {attempt}); retrying in 8 min "
              f"({remaining / 60:.0f} min of budget left)", file=sys.stderr)
        time.sleep(min(480.0, remaining))


# Persistent compilation cache: the axon PJRT plugin stores/reuses compiled
# programs across processes (experiments/compile_cache_probe.py — a hit cuts
# the fused solve's compile+first from ~209 s to ~146 s; tracing and part of
# the remote pipeline remain). Point it at a repo-local dir (gitignored) so a
# pre-warmed bench program survives into the driver's round-end run. Must be
# in the environment before jax initializes its config.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import jax

if os.environ.get("BENCH_BACKEND"):
    jax.config.update("jax_platforms", os.environ["BENCH_BACKEND"])

import jax.numpy as jnp
import numpy as np

from ilqr_tpu import SolverConfig, get_model
from ilqr_tpu.models import acrobot as ac

# Reference binary: acrobot swing-up, T=499, maxIter=100 → 0.47-0.58 s/solve
# on this machine (golden/acrobot_log.txt). Midpoint as the baseline rate.
REF_SECONDS_PER_SOLVE = 0.52
BASELINE_SOLVES_PER_S = 1.0 / REF_SECONDS_PER_SOLVE


def main():
    # Don't call jax.default_backend() here: backend init in THIS process
    # is exactly what hangs when the tunnel is wedged. Gate on env only;
    # on a CPU-only machine the subprocess probe succeeds instantly.
    if (os.environ.get("BENCH_WAIT_HEALTHY", "1") != "0"
            and not os.environ.get("BENCH_BACKEND")):
        _wait_tpu_healthy(
            float(os.environ.get("BENCH_HEALTH_BUDGET_S", 5400)))

    # Default B=8192: the host-chunked fused solver overlaps each 1024-
    # lane chunk's ~26 ms dispatch+D2H round trip (axon tunnel latency,
    # BENCH_NOTES.md) with the previous chunk's compute, so larger
    # batches measure the device throughput rather than the RPC floor —
    # the B-sweep (experiments/bsweep_results.jsonl) shows per-chunk time
    # saturating at ~33 ms by B=8192 (vs 60.6 ms exposed at B=1024).
    B = int(os.environ.get("BENCH_BATCH", 8192))
    max_iter = int(os.environ.get("BENCH_MAX_ITER", 100))
    T = int(os.environ.get("BENCH_HORIZON", 499))

    model = get_model("acrobot")
    params = ac.default_params()
    # The perf-path configuration: analytic derivatives (exact, cheaper than
    # FD), corrected clamped rollout, control-limited boxQP backward pass —
    # the same algorithmic work per iteration as the reference, same horizon.
    cfg = SolverConfig(
        deriv_mode="analytic",
        clamp_forward=True,
        use_control_limits=True,
        max_iter=max_iter,
    )

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(0.05 * rng.normal(size=(B, 4)), jnp.float32)
    u0 = jnp.zeros((B, T, 1), jnp.float32)

    # The fully-fused batch solver keeps all state in kernel layout —
    # no per-iteration relayout (see ilqr_tpu/fused.py). Set BENCH_VMAP=1
    # to bench the composable vmap(solve) path instead.
    if os.environ.get("BENCH_VMAP") or jax.default_backend() != "tpu":
        # composable path (also the CPU fallback — the fused solver's
        # off-TPU mode is the Pallas interpreter, far too slow to bench)
        from ilqr_tpu.solver import solve

        solver = jax.jit(jax.vmap(
            lambda x, u: solve(model, params, cfg, 0.02, x, u)
        ))
    else:
        # solve_batch_fused jits its single-block program internally and
        # host-loops chunks of 1024 — do NOT wrap it in jax.jit (that
        # would inline the chunk loop into one huge program, and on the
        # axon backend large remote compiles are slow/fragile).
        from ilqr_tpu.fused import solve_batch_fused

        solver = functools.partial(
            solve_batch_fused, model, params, cfg, 0.02)

    fallback = False
    # Warm-up / compile. TWO warm-up calls with distinct inputs: on the
    # axon backend a second (and only the second) invocation of a fresh
    # fused-solve program reliably triggers another multi-minute remote
    # compile (cause unknown — no jax-level recompile is logged and CPU
    # shows nothing); absorbing it here keeps every timed rep clean.
    t0 = time.perf_counter()
    try:
        sol = solver(x0, u0)
        jax.block_until_ready(sol.cost)
    except Exception as e:  # noqa: BLE001 — safety net for the headline run
        # If the flagship whole-iteration kernel fails to compile on this
        # backend (it is new; Mosaic has device-only failure modes the
        # interpreter can't catch, e.g. boolean selects), fall back to the
        # proven two-kernel path rather than record nothing.
        if os.environ.get("BENCH_VMAP") or jax.default_backend() != "tpu":
            raise
        print(f"[bench] default config failed ({type(e).__name__}: {e}); "
              "retrying with iter_kernel='split'", file=sys.stderr)
        cfg = SolverConfig(
            deriv_mode="analytic", clamp_forward=True,
            use_control_limits=True, max_iter=max_iter,
            iter_kernel="split")
        fallback = True
        solver = functools.partial(
            solve_batch_fused, model, params, cfg, 0.02)
        t0 = time.perf_counter()
        sol = solver(x0, u0)
        jax.block_until_ready(sol.cost)
    compile_and_first = time.perf_counter() - t0
    x0w = jnp.asarray(0.05 * rng.normal(size=(B, 4)), jnp.float32)
    t0 = time.perf_counter()
    sol = solver(x0w, u0)
    jax.block_until_ready(sol.cost)
    second = time.perf_counter() - t0

    # Timed runs on fresh initial states (no cached solutions possible).
    # The timed section ends with a full device→host copy of the costs —
    # block_until_ready alone proved unreliable under the axon backend's
    # async dispatch (timings far below the HBM speed-of-light bound).
    times = []
    for rep in range(5):
        x0r = jnp.asarray(0.05 * rng.normal(size=(B, 4)), jnp.float32)
        t0 = time.perf_counter()
        sol = solver(x0r, u0)
        costs_host = np.asarray(sol.cost)
        times.append(time.perf_counter() - t0)
        assert np.all(np.isfinite(costs_host))

    best = min(times)
    solves_per_s = B / best
    # Executed-path provenance (VERDICT r2): the silent split-kernel
    # fallback above must never masquerade as the flagship merged-kernel
    # number, so the JSON records which configuration actually ran.
    if os.environ.get("BENCH_VMAP") or jax.default_backend() != "tpu":
        path = "vmap"
        iter_kernel = "n/a"
    else:
        from ilqr_tpu.fused import _use_iter_kernel

        path = "fused"
        iter_kernel = ("merged" if _use_iter_kernel(model, cfg, T, model.n)
                       else "split")
    result = {
        "metric": "batched_acrobot_solves_per_s",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
        "config": {
            "backend": jax.default_backend(), "path": path,
            "iter_kernel": iter_kernel, "fallback": fallback,
            "sweep_kernel": cfg.sweep_kernel, "boxqp_mode": cfg.boxqp_mode,
            "B": B, "T": T, "max_iter": max_iter,
        },
    }
    # Context to stderr; the contract line alone on stdout.
    print(
        f"[bench] backend={jax.default_backend()} B={B} T={T} "
        f"max_iter={max_iter} first={compile_and_first:.1f}s "
        f"second={second:.1f}s "
        f"times={[f'{t:.3f}' for t in times]} "
        f"mean_cost={float(jnp.mean(sol.cost)):.4g} "
        f"mean_iters={float(jnp.mean(sol.iterations)):.1f}",
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
