"""TPU benchmark: parallel-in-time (associative-scan) backward vs the
serial lax.scan sweep (VERDICT r1 item 4 — first TPU numbers for the
assoc path). Unconstrained double integrator, vmapped over B problems.

Env: AB_B (batch, default 256), AB_T (horizon, default 499),
AB_MODE (assoc | scan | both | frozen_pair). frozen_pair benches the
round-4 control-LIMITED extension: backward_mode="assoc_frozen" (frozen
active-set refinement sweeps in O(log T) depth, R=2) vs the serial scan
with the iterative boxQP, both with limits ON.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("AB_B", "256"))
T = int(os.environ.get("AB_T", "499"))
MODE = os.environ.get("AB_MODE", "both")


def main():
    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[assoc] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.models import double_integrator as di
    from ilqr_tpu.ops.backward import backward_pass
    from ilqr_tpu.ops.derivatives import compute_derivs
    from ilqr_tpu.solver import init_state

    model = get_model("double_integrator")
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32),
        di.default_params(goal=(1.0, 0.5, 0.0, 0.0)))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, 4)) * 0.3, jnp.float32)
    u0 = jnp.zeros((B, T, 2), jnp.float32)

    results = {}
    if MODE == "both":
        modes = ["assoc", "scan"]
    elif MODE == "frozen_pair":
        modes = ["assoc_frozen", "scan_lim"]
    else:
        modes = [MODE]
    for mode in modes:
        limited = mode in ("assoc_frozen", "scan_lim")
        cfg = SolverConfig(deriv_mode="analytic",
                           use_control_limits=limited,
                           backward_mode=("scan" if mode == "scan_lim"
                                          else mode),
                           backward_kernel="xla",
                           rollout_kernel="xla", deriv_kernel="xla")

        def one(x0b, u0b):
            st = init_state(model, params, cfg, 0.02, x0b, u0b)
            d = compute_derivs(model, params, cfg, 0.02, st.xs, st.us)
            br = backward_pass(d, st.us, jnp.asarray(1.0, jnp.float32),
                               params.u_min, params.u_max, cfg,
                               prev_k_last=st.k[-1])
            return br.k, br.K, br.dV

        fn = jax.jit(jax.vmap(one))
        t0 = time.perf_counter()
        out = fn(x0, u0)
        np.asarray(out[0])
        compile_s = time.perf_counter() - t0
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(x0, u0)
            np.asarray(out[0])
            reps.append(time.perf_counter() - t0)
        results[mode] = {"best_s": round(min(reps), 4),
                         "compile_s": round(compile_s, 1)}
        # sanity: both modes must produce the same gains
        results[mode]["k00"] = round(float(out[0][0, 0, 0]), 6)

    print(json.dumps({"B": B, "T": T, **results}), flush=True)


if __name__ == "__main__":
    main()
