"""AOT executable-serialization probe (VERDICT r3 item 4).

The axon tunnel charges 10-600 s of remote compile PER PROCESS per
program, and the persistent compilation cache only cut compile+first
209 -> 146 s (CLAUDE.md). This probe tests the stronger escape hatch:
``jax.experimental.serialize_executable`` — AOT-compile the fused solve
once, serialize the PJRT *executable* (not StableHLO), and in a later
process deserialize_and_load + run with NO XLA/Mosaic compile at all.

Two phases (axon discipline — one TPU process each):
  AOT_MODE=save  jit(...).lower(args).compile()   [pays the compile]
                 -> serialize -> experiments/aot_exec.bin (+ pickled
                 arg/out trees), run once, print timings.
  AOT_MODE=load  read the blob, deserialize_and_load, run on fresh
                 inputs, compare costs against the values stamped by the
                 save phase, print timings.

Either outcome is recorded: if the axon PJRT plugin refuses executable
serialization / cross-process reload, the exact failure mode is the
result.
"""

import json
import os
import pickle
import sys
import time

BLOB = os.environ.get("AOT_BLOB", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "aot_exec.bin"))
MODE = os.environ.get("AOT_MODE", "save")
B = int(os.environ.get("AOT_B", "1024"))
T = int(os.environ.get("AOT_T", "99"))
MAX_ITER = int(os.environ.get("AOT_MAXIT", "10"))


def build():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.fused import solve_batch_fused
    from ilqr_tpu.models import acrobot as ac

    model = get_model("acrobot")
    params = ac.default_params()
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=MAX_ITER)

    def fn(x0, u0):
        sol = solve_batch_fused(model, params, cfg, 0.02, x0, u0)
        return sol.cost, sol.iterations

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(0.05 * rng.normal(size=(B, 4)), jnp.float32)
    u0 = jnp.zeros((B, T, 1), jnp.float32)
    return jax.jit(fn), (x0, u0)


def main():
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp
    import numpy as np

    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[aot] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from jax.experimental.serialize_executable import (deserialize_and_load,
                                                       serialize)

    out = {"mode": f"aot_{MODE}", "B": B, "T": T, "max_iter": MAX_ITER,
           "backend": jax.default_backend()}
    jit_fn, args = build()

    if MODE == "save":
        t0 = time.perf_counter()
        lowered = jit_fn.lower(*args)
        out["lower_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        compiled = lowered.compile()
        out["compile_s"] = round(time.perf_counter() - t0, 1)
        try:
            t0 = time.perf_counter()
            payload, in_tree, out_tree = serialize(compiled)
            out["serialize_s"] = round(time.perf_counter() - t0, 2)
            blob = pickle.dumps(
                {"payload": payload, "in_tree": in_tree,
                 "out_tree": out_tree})
            with open(BLOB, "wb") as f:
                f.write(blob)
            out["blob_mb"] = round(len(blob) / 1e6, 2)
        except Exception as e:  # noqa: BLE001 — the negative IS the result
            out["serialize_error"] = repr(e)[:400]
        t0 = time.perf_counter()
        cost, iters = compiled(*args)
        np.asarray(cost)
        out["first_exec_s"] = round(time.perf_counter() - t0, 2)
        out["mean_cost"] = round(float(jnp.mean(cost)), 4)
        out["mean_iters"] = round(float(jnp.mean(iters)), 2)
    else:
        with open(BLOB, "rb") as f:
            d = pickle.loads(f.read())
        try:
            t0 = time.perf_counter()
            compiled = deserialize_and_load(
                d["payload"], d["in_tree"], d["out_tree"])
            out["deserialize_s"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            cost, iters = compiled(*args)
            np.asarray(cost)
            out["first_exec_s"] = round(time.perf_counter() - t0, 2)
            out["mean_cost"] = round(float(jnp.mean(cost)), 4)
            out["mean_iters"] = round(float(jnp.mean(iters)), 2)
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                cost, iters = compiled(*args)
                np.asarray(cost)
                reps.append(time.perf_counter() - t0)
            out["best_s"] = round(min(reps), 4)
        except Exception as e:  # noqa: BLE001
            out["load_error"] = repr(e)[:400]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
