"""Isolate the Mosaic kernel per-call fixed cost vs input-stream count.

Kernel: J inputs of shape (T, 4, 1, S, L), grid (1, T), body sums the
rows into VMEM scratch, one (1, S, L) output written at the last step.
Everything else (grid, block shapes, scratch) is held fixed; J varies.

Env: PROBE_J (stream count), PROBE_T (default 499), PROBE_N (chained
calls, default 64).
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
J = int(os.environ.get("PROBE_J", "5"))
T = int(os.environ.get("PROBE_T", "499"))
N = int(os.environ.get("PROBE_N", "64"))


def _kernel(j_count, *refs):
    carry_ref = refs[0]
    in_refs = refs[1:1 + j_count]
    out_ref = refs[1 + j_count]
    acc = refs[2 + j_count]
    t = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        acc[0] = carry_ref[0]

    s = acc[0]
    for r in in_refs:
        for i in range(4):
            s = s + r[0, i, 0]
    acc[0] = s * 0.9999

    @pl.when(t == n_t - 1)
    def _():
        out_ref[0] = acc[0]


def run_once(carry, xs):
    specs_in = [
        pl.BlockSpec((1, S, L), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec((1, 4, 1, S, L), lambda b, t: (t, 0, b, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(J)
    ]
    return pl.pallas_call(
        functools.partial(_kernel, J),
        grid=(1, T),
        in_specs=specs_in,
        out_specs=pl.BlockSpec((1, S, L), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, S, L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, S, L), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(carry, *xs)


def main():
    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[streams] health ok {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.normal(size=(T, 4, 1, S, L)) * 1e-3, jnp.float32)
          for _ in range(J)]

    @jax.jit
    def chain(c0):
        def body(i, c):
            out = run_once(c, xs)
            return out * 0.5

        return lax.fori_loop(0, N, body, c0)

    z = jnp.zeros((1, S, L), jnp.float32)
    t0 = time.perf_counter()
    np.asarray(chain(z))
    compile_s = time.perf_counter() - t0
    reps = []
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(chain(z))
        reps.append(time.perf_counter() - t0)
    print(json.dumps({
        "J": J, "T": T, "N": N,
        "per_call_us": round(min(reps) / N * 1e6, 1),
        "reps_s": [round(r, 4) for r in reps],
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
