"""Measure the rollout kernel's per-call device-side cost (round-2 item 1).

Round-1 finding (BENCH_NOTES.md): the rollout kernel costs ~800 µs nearly
independent of T. This probe times N chained kernel calls INSIDE one jitted
fori_loop (serial data dependency), so the number is pure device-side
per-call cost — no host dispatch, no RPC, no async-timing ambiguity.

One process = one probe configuration = one compiled program (axon tunnel
discipline, see CLAUDE.md). Driven by experiments/run_probes.sh.

Env:
  PROBE_MODE  full | sweep | trivial   (default full)
     full    = rollout_packed with full outputs (pass-2 line search shape)
     sweep   = costs_only, candidates=11 (pass-1 cost sweep shape)
     trivial = full outputs but a trivial SoA model (dynamics=-x) — isolates
               body-size / unpack cost from stream structure
  PROBE_T     horizon (default 499)
  PROBE_N     chained calls per timing rep (default 64)
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

MODE = os.environ.get("PROBE_MODE", "full")
T = int(os.environ.get("PROBE_T", "499"))
N = int(os.environ.get("PROBE_N", "64"))


def health_check():
    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    b = (a @ a).block_until_ready()
    dt = time.perf_counter() - t0
    print(f"[probe] health ok in {dt:.1f}s sum={float(b.sum()):.3g}",
          file=sys.stderr, flush=True)


def main():
    from ilqr_tpu import get_model
    from ilqr_tpu.models import acrobot as ac
    from ilqr_tpu.models.base import Model
    from ilqr_tpu.ops.pallas_rollout import S, L, pack_params, rollout_packed

    health_check()

    if MODE == "trivial":
        def dyn_soa(p, x, u):
            return jnp.stack([-x[i] + 0.01 * u[0] for i in range(4)])

        def cost_soa(p, x, u):
            return x[0] * x[0] + u[0] * u[0]

        def fin_soa(p, x):
            return x[0] * x[0]

        base = get_model("acrobot")
        model = Model(
            name="trivial", n=4, m=1, dynamics=base.dynamics,
            cost=base.cost, final_cost=base.final_cost,
            default_params=ac.default_params, dynamics_soa=dyn_soa,
            cost_soa=cost_soa, final_cost_soa=fin_soa)
    else:
        model = get_model("acrobot")

    params = ac.default_params()
    packed = pack_params(params, 0.02)
    n, m, nb = 4, 1, 1
    f32 = jnp.float32
    rng = np.random.default_rng(0)

    x0 = jnp.asarray(rng.normal(size=(n, nb, S, L)) * 0.05, f32)
    uff = jnp.zeros((T, m, nb, S, L), f32)
    xsr = jnp.zeros((T, n, nb, S, L), f32)
    K = jnp.asarray(rng.normal(size=(T, m, n, nb, S, L)) * 0.01, f32)
    k = jnp.asarray(rng.normal(size=(T, m, nb, S, L)) * 0.01, f32)
    alphas = jnp.asarray(
        [1.0, 0.5012, 0.2512, 0.1259, 0.0631, 0.0316, 0.0158, 0.0079,
         0.004, 0.002, 0.001], f32)

    if MODE == "sweep":
        def one(x0c):
            costs = rollout_packed(
                model, "euler", True, packed, x0c, uff, xsr, K,
                costs_only=True, candidates=11, k_p=k, alphas=alphas)
            # feed a reduction back into x0 to serialize the chain
            fb = jnp.mean(costs, axis=0)  # (S, L)
            return x0c + 1e-9 * fb[None, None]
    else:
        def one(x0c):
            xs_b, us_o, xfin, cost = rollout_packed(
                model, "euler", True, packed, x0c, uff, xsr, K)
            return x0c + 1e-9 * xfin

    @jax.jit
    def chain(x0c):
        return lax.fori_loop(0, N, lambda i, c: one(c), x0c)

    t0 = time.perf_counter()
    out = chain(x0)
    np.asarray(out)  # full D2H
    compile_s = time.perf_counter() - t0
    print(f"[probe] compile+first {compile_s:.1f}s", file=sys.stderr,
          flush=True)

    reps = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = chain(x0)
        np.asarray(out)
        reps.append(time.perf_counter() - t0)

    best = min(reps)
    per_call_us = best / N * 1e6
    print(json.dumps({
        "mode": MODE, "T": T, "N": N,
        "per_call_us": round(per_call_us, 1),
        "reps_s": [round(r, 4) for r in reps],
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
