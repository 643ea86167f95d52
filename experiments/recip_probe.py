"""Probe: Mosaic lowering cost + accuracy of reciprocal variants.

RESULT (v5e, 2026-08-17, experiments/recip_log.txt): on a dependency
chain over one (8,128) tile, marginal cost vs a multiply chain is
div +10 ns/op, pl.reciprocal +36, approx +23, approx+Newton +40 — the
exact divide is the CHEAPEST variant in this Mosaic lowering, and an
approx+Newton "fast reciprocal" in the real sweep kernel measured a
~300 µs/iteration PESSIMIZATION (964 vs 662 µs/iter at A=11) while
perturbing converged lanes (~1.6e-5 rel err before refinement). Dead
end; do not retry. Accuracy: recip 1.1e-7, approx 1.6e-5,
approx+Newton 1.3e-7 max rel err.

Four kernels, each doing N_OPS dependent reciprocal-ish steps per element
on one resident (8,128) tile (dependency-chained so the op cost can't be
hidden), timed as K chained calls inside one jitted fori_loop with a
trailing D2H copy (the BENCH_NOTES methodology — subtract the 'nop'
variant to remove the dispatch floor):

  div     : y = a / x            (the current lowering)
  recip   : y = pl.reciprocal(x) (exact flag)
  recipa  : y = pl.reciprocal(x, approx=True)
  recipan : approx + one Newton refinement r*(2 - x*r)
  nop     : y = a * x            (baseline multiply chain)

Accuracy: max rel error vs f64 on logspace values, printed per variant.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_OPS = 64          # chained steps per kernel call
N_CALLS = 256       # kernel calls inside the fori_loop


def make_kernel(variant):
    def body(x_ref, o_ref):
        x = x_ref[0]
        acc = x
        for _ in range(N_OPS):
            if variant == "div":
                acc = 1.0 / (acc + 1.5)
            elif variant == "recip":
                acc = pl.reciprocal(acc + 1.5)
            elif variant == "recipa":
                acc = pl.reciprocal(acc + 1.5, approx=True)
            elif variant == "recipan":
                y = acc + 1.5
                r = pl.reciprocal(y, approx=True)
                acc = r * (2.0 - y * r)
            elif variant == "nop":
                acc = acc * 1.0000001 + 0.5
            else:
                raise ValueError(variant)
        o_ref[0] = acc

    spec = pl.BlockSpec((1, 8, 128), lambda: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        body, grid=(), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.float32))


def timed(variant, x):
    k = make_kernel(variant)

    @jax.jit
    def run(x):
        def step(i, v):
            return k(v)
        return jax.lax.fori_loop(0, N_CALLS, step, x)

    out = run(x)
    np.asarray(out)                      # compile + settle
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = run(x)
        np.asarray(out)
        reps.append(time.perf_counter() - t0)
    return min(reps)


def accuracy():
    """Max relative error of each variant vs f64, single kernel call."""
    vals = np.logspace(-3, 3, 1024).astype(np.float32).reshape(1, 8, 128)
    res = {}
    for variant in ("recip", "recipa", "recipan"):
        def body(x_ref, o_ref, _v=variant):
            y = x_ref[0]
            if _v == "recip":
                o_ref[0] = pl.reciprocal(y)
            elif _v == "recipa":
                o_ref[0] = pl.reciprocal(y, approx=True)
            else:
                r = pl.reciprocal(y, approx=True)
                o_ref[0] = r * (2.0 - y * r)
        spec = pl.BlockSpec((1, 8, 128), lambda: (0, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            body, grid=(), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.float32))(
                jnp.asarray(vals))
        exact = 1.0 / vals.astype(np.float64)
        rel = np.abs(np.asarray(out).astype(np.float64) - exact) / exact
        res[variant] = float(rel.max())
    return res


def main():
    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[recip] health {time.perf_counter()-t0:.1f}s", file=sys.stderr,
          flush=True)

    x = jnp.full((1, 8, 128), 0.7, jnp.float32)
    out = {"N_OPS": N_OPS, "N_CALLS": N_CALLS}
    base = None
    for variant in ("nop", "div", "recip", "recipa", "recipan"):
        s = timed(variant, x)
        out[variant + "_s"] = round(s, 5)
        per_op_ns = s / N_CALLS / N_OPS * 1e9
        out[variant + "_ns_per_op"] = round(per_op_ns, 2)
        if variant == "nop":
            base = s
        else:
            extra = (s - base) / N_CALLS / N_OPS * 1e9
            out[variant + "_extra_ns_vs_mul"] = round(extra, 2)
    out["max_rel_err"] = accuracy()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
