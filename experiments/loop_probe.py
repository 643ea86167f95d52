"""Separate per-loop-iteration overhead from per-kernel-call overhead.

PROBE_MODE:
  none   — fori_loop body is pure carry arithmetic (no pallas)
  one    — body = 1 trivial pallas call ((1,T) grid, 1 small stream)
  eight  — body = 8 chained trivial pallas calls
  while_ — lax.while_loop version of 'one' (data-dependent cond)
PROBE_T: grid T for the kernel (default 499)
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, L = 8, 128
MODE = os.environ.get("PROBE_MODE", "none")
T = int(os.environ.get("PROBE_T", "499"))
N = int(os.environ.get("PROBE_N", "64"))


def _kernel(carry_ref, x_ref, out_ref, acc):
    t = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        acc[0] = carry_ref[0]

    acc[0] = acc[0] * 0.9999 + x_ref[0, 0, 0] * 1e-6

    @pl.when(t == n_t - 1)
    def _():
        out_ref[0] = acc[0]


def kcall(c, x):
    return pl.pallas_call(
        _kernel,
        grid=(1, T),
        in_specs=[
            pl.BlockSpec((1, S, L), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 1, S, L), lambda b, t: (t, 0, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, L), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, S, L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, S, L), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(c, x)


def main():
    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[loop] health ok {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T, 4, 1, S, L)) * 1e-3, jnp.float32)
    z = jnp.zeros((1, S, L), jnp.float32)

    if MODE == "none":
        @jax.jit
        def chain(c0):
            return lax.fori_loop(
                0, N, lambda i, c: c * 0.9999 + 1e-6, c0)
    elif MODE == "one":
        @jax.jit
        def chain(c0):
            return lax.fori_loop(0, N, lambda i, c: kcall(c, x), c0)
    elif MODE == "eight":
        @jax.jit
        def chain(c0):
            def body(i, c):
                for _ in range(8):
                    c = kcall(c, x)
                return c
            return lax.fori_loop(0, N, body, c0)
    elif MODE == "unrolled":
        @jax.jit
        def chain(c0):
            c = c0
            for _ in range(N):
                c = c * 0.9999 + 1e-6
            return c
    elif MODE == "unrolled_k":
        # N unrolled kernel calls, no loop at all
        @jax.jit
        def chain(c0):
            c = c0
            for _ in range(N):
                c = kcall(c, x)
            return c
    elif MODE == "scan":
        @jax.jit
        def chain(c0):
            def body(c, _):
                return c * 0.9999 + 1e-6, ()
            return lax.scan(body, c0, None, length=N)[0]
    elif MODE == "nested":
        @jax.jit
        def chain(c0):
            def inner(c):
                return lax.fori_loop(0, 8, lambda i, cc: cc * 0.9999 + 1e-6,
                                     c)
            return lax.fori_loop(0, N // 8, lambda i, cc: inner(cc), c0)
    elif MODE == "chunk4":
        # while-loop whose body is 4 unrolled kernel calls (the planned
        # fused-solver restructure): per-kernel cost with loop/4 overhead
        @jax.jit
        def chain(c0):
            def body(i, c):
                for _ in range(4):
                    c = kcall(c, x)
                return c
            return lax.fori_loop(0, N // 4, body, c0)
    elif MODE == "cond":
        # fori body = never-taken lax.cond wrapping a while_loop (the
        # planned λ-retry structure) + carry arithmetic: marginal cost of
        # a dormant cond+while vs mode 'none'
        @jax.jit
        def chain(c0):
            def body(i, c):
                c = c * 0.9999 + 1e-6
                pred = c[0, 0, 0] > 1e9  # never true

                def retry(cc):
                    return lax.while_loop(
                        lambda s: s[0, 0, 0] > 2e9,
                        lambda s: s * 0.5, cc)

                return lax.cond(pred, retry, lambda cc: cc, c)
            return lax.fori_loop(0, N, body, c0)
    elif MODE == "while_":
        @jax.jit
        def chain(c0):
            def cond(s):
                i, c = s
                return (i < N) & (c[0, 0, 0] < 1e9)

            def body(s):
                i, c = s
                return i + 1, kcall(c, x)

            return lax.while_loop(cond, body, (0, c0))[1]
    else:
        raise SystemExit(f"bad mode {MODE}")

    t0 = time.perf_counter()
    np.asarray(chain(z))
    compile_s = time.perf_counter() - t0
    reps = []
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(chain(z))
        reps.append(time.perf_counter() - t0)
    per_iter = min(reps) / N * 1e6
    print(json.dumps({
        "mode": MODE, "T": T, "N": N,
        "per_iter_us": round(per_iter, 1),
        "reps_s": [round(r, 4) for r in reps],
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
