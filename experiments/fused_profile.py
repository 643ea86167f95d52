"""Per-kernel device-time profile of the fused solver's iteration.

Times N chained invocations of each stage inside one jitted fori_loop
(subtract the ~26 ms dispatch floor: stage_us ≈ (t_total − t_empty)/N).

PROBE_STAGE: sweep | ls | iter | empty
PROBE_T, PROBE_N as usual.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

STAGE = os.environ.get("PROBE_STAGE", "iter")
T = int(os.environ.get("PROBE_T", "499"))
N = int(os.environ.get("PROBE_N", "32"))
TB = int(os.environ.get("PROBE_TB", "32"))
STB = int(os.environ.get("PROBE_STB", "32"))


def main():
    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.models import acrobot as ac
    from ilqr_tpu.ops.pallas_rollout import (
        S, L, linesearch_packed, pack_params, rollout_packed)
    from ilqr_tpu.ops.pallas_sweep import sweep_packed

    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[prof] health ok {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    model = get_model("acrobot")
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       ls_time_block=TB)
    params = ac.default_params()
    packed = pack_params(params, 0.02)
    n, m, nb = 4, 1, 1
    f32 = jnp.float32
    rng = np.random.default_rng(0)

    x0 = jnp.asarray(rng.normal(size=(n, nb, S, L)) * 0.05, f32)
    us = jnp.zeros((T, m, nb, S, L), f32)
    ref0 = jnp.zeros((T, n, nb, S, L), f32)
    K0 = jnp.zeros((T, m, n, nb, S, L), f32)
    xs_body, us_p, x_fin, cost = rollout_packed(
        model, "euler", True, packed, x0, us, ref0, K0)
    lam = jnp.full((nb, S, L), 1.0, f32)
    alphas = jnp.asarray([1.0, 0.5012, 0.2512, 0.1259, 0.0631, 0.0316,
                          0.0158, 0.0079, 0.004, 0.002, 0.001], f32)
    gate = jnp.ones((nb, S, L), f32)
    keep = jnp.ones((nb, S, L), f32)

    if STAGE == "empty":
        @jax.jit
        def chain(c):
            return lax.fori_loop(0, N, lambda i, cc: cc * 0.9999 + 1e-6, c)

        arg = cost
    elif STAGE == "sweep":
        @jax.jit
        def chain(c):
            def body(i, carry):
                xb, xt = carry
                k, K, dv, div, g = sweep_packed(
                    model, "euler", packed, xb, xt, us_p, lam,
                    time_block=STB)
                return (xb + 1e-9 * jnp.mean(k), xt + 1e-9 * g[None])

            return lax.fori_loop(0, N, body, c)

        arg = (xs_body, x_fin)
    elif STAGE == "ls":
        k, K, dv, div, g = sweep_packed(
            model, "euler", packed, xs_body, x_fin, us_p, lam)
        k = jax.block_until_ready(k)

        @jax.jit
        def chain(c):
            def body(i, carry):
                xb, xt = carry
                out = linesearch_packed(
                    model, "euler", True, packed, x0, us_p, xb, xt,
                    K, k, K, k, alphas, dv, cost, gate, keep, 0.0,
                    time_block=TB)
                return (out[0], out[2])

            return lax.fori_loop(0, N, body, c)

        arg = (xs_body, x_fin)
    elif STAGE == "iter":
        from ilqr_tpu.fused import FusedState, _iteration
        import functools

        u_min = jnp.asarray(params.u_min, f32)
        u_max = jnp.asarray(params.u_max, f32)
        state = FusedState(
            xs_body=xs_body, x_term=x_fin, us=us_p, cost=cost, lam=lam,
            dlam=jnp.full((nb, S, L), 1.0, f32),
            k=jnp.zeros((T, m, nb, S, L), f32),
            K=jnp.zeros((T, m, n, nb, S, L), f32),
            iteration=jnp.zeros((nb, S, L), jnp.int32),
            done=jnp.zeros((nb, S, L), bool),
            reason=jnp.zeros((nb, S, L), jnp.int32),
            gnorm=jnp.zeros((nb, S, L), f32),
            dcost=jnp.zeros((nb, S, L), f32),
            expected=jnp.zeros((nb, S, L), f32),
        )
        step = functools.partial(_iteration, model, cfg, packed,
                                 u_min, u_max, False, x0)

        @jax.jit
        def chain(st):
            return lax.fori_loop(0, N, lambda i, s: step(s), st)

        arg = state
    else:
        raise SystemExit(f"bad stage {STAGE}")

    t0 = time.perf_counter()
    out = chain(arg)
    jax.tree_util.tree_map(np.asarray, out)
    compile_s = time.perf_counter() - t0
    reps = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = chain(arg)
        jax.tree_util.tree_map(np.asarray, out)
        reps.append(time.perf_counter() - t0)
    print(json.dumps({
        "stage": STAGE, "T": T, "N": N, "TB": TB, "STB": STB,
        "total_s": round(min(reps), 4),
        "per_call_us_incl_floor": round(min(reps) / N * 1e6, 1),
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
