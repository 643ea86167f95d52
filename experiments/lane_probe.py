"""Lane-coupling probe (round 4): does a lane's result depend on what is
co-batched with it in the fused block?

Background: serve_aot_serve measured |cost(lane0 of distinct batch) -
cost(lane0 padded-replicated batch)| = 2.6e-3 (~2.7e-6 relative) on the
SAME deserialized executable — not bit-equal, though CPU interpret mode
is exactly lane-independent and the kernels contain no cross-lane value
ops (only batch-ANY loop conditions). This probe localizes it: load the
chain-G AOT blob (no compile needed), solve (a) the save-phase distinct
batch, (b) lane0 replicated 1024x, (c) lane0 + a DIFFERENT random tail,
and report per-variant lane-0 cost/us deltas, iterations, and reasons.
If (a)!=(b) but (b)==(c) the coupling is content-independent (loop
counts); if (a)!=(b)!=(c) lane content leaks; if all equal, chain G's
delta came from its inputs after all.
"""

import json
import os
import sys
import time

import numpy as np

BLOB = os.environ.get("SA_BLOB", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "serve_aot.aotexec"))
COSTS = BLOB + ".costs.npy"
B, T = 1024, 199


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[lane] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from ilqr_tpu.aot import load

    solver = load(BLOB)
    rng = np.random.default_rng(7)  # the chain-G draw
    x0 = (0.05 * rng.normal(size=(B, 4))).astype(np.float32)
    u0 = np.zeros((B, T, 1), np.float32)

    def run(x):
        sol = solver(jnp.asarray(x), jnp.asarray(u0))
        return sol

    distinct = run(x0)                      # (a) the save-phase batch
    rep = np.broadcast_to(x0[0], (B, 4)).copy()
    replicated = run(rep)                   # (b) lane0 everywhere
    tail = x0.copy()
    tail[1:] = (0.05 * np.random.default_rng(99).normal(
        size=(B - 1, 4))).astype(np.float32)
    other_tail = run(tail)                  # (c) lane0 + different tail

    def lane0(sol):
        return (float(sol.cost[0]), int(sol.iterations[0]),
                int(sol.reason[0]),
                np.asarray(sol.us[0]))

    ca, ia, ra, ua = lane0(distinct)
    cb, ib, rb, ub = lane0(replicated)
    cc, ic, rc, uc = lane0(other_tail)
    out = {
        "mode": "lane_probe", "B": B, "T": T,
        "cost_a_distinct": ca, "cost_b_replicated": cb,
        "cost_c_othertail": cc,
        "iters": [ia, ib, ic], "reasons": [ra, rb, rc],
        "d_ab": abs(ca - cb), "d_ac": abs(ca - cc), "d_bc": abs(cb - cc),
        "us_d_ab": float(np.abs(ua - ub).max()),
        "us_d_ac": float(np.abs(ua - uc).max()),
        # determinism control: run (a) twice
        "d_aa_rerun": abs(ca - float(run(x0).cost[0])),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__" and os.environ.get("LANE_SVC") != "1":
    main()


def service_variant():
    """Chain-J follow-up: chain G's serve phase (via SolverService)
    measured lane-0 cost = saved[0] +/- 2.6e-3 while the direct-call
    probe above is bit-exact. Reproduce the service path precisely and
    print the exact bits + the padded input checksums."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[lane-svc] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.models import acrobot as ac
    from ilqr_tpu.serve import SolverService

    model = get_model("acrobot")
    params = ac.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=10)
    svc = SolverService(model, params, cfg, dt=0.02, horizon=T,
                        max_batch=B, max_wait_ms=2.0, path="fused",
                        aot=BLOB)
    rng = np.random.default_rng(7)
    x0_all = (0.05 * rng.normal(size=(B, 4))).astype(np.float32)
    first = svc.solve(x0_all[0], timeout=600)
    second = svc.solve(x0_all[0], timeout=600)  # repeat for determinism
    svc.close(timeout=60)
    saved = np.load(COSTS) if os.path.exists(COSTS) else None
    out = {
        "mode": "lane_probe_service", "B": B, "T": T,
        "first_cost_hex": float(first.cost).hex(),
        "first_cost": float(first.cost),
        "second_delta": abs(float(first.cost) - float(second.cost)),
        "saved0": None if saved is None else float(saved[0]),
        "d_vs_saved0": None if saved is None else
        abs(float(first.cost) - float(saved[0])),
        "x0_checksum": float(np.float64(x0_all[0]).sum()),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__" and os.environ.get("LANE_SVC") == "1":
    service_variant()
