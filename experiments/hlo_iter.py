"""Compile the fused block solve and count per-iteration thunks: how much
non-kernel residue (fusions, copies) runs in the while body."""

import re
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.fused import _get_block_solver
    from ilqr_tpu.models import acrobot as ac
    from ilqr_tpu.ops.pallas_rollout import pack_params

    model = get_model("acrobot")
    cfg = SolverConfig(deriv_mode="analytic", clamp_forward=True,
                       max_iter=100)
    params = ac.default_params()
    arr, treedef, shapes = pack_params(
        jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32),
                               params), 0.02)
    T, n = 499, 4
    solve_block = _get_block_solver(model, cfg, False, T, n, treedef,
                                    shapes)
    B = 1024
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(0.05 * rng.normal(size=(B, 4)), jnp.float32)
    u0 = jnp.zeros((B, T, 1), jnp.float32)
    pad = jnp.zeros((B,), bool)
    u_min = jnp.asarray(params.u_min, jnp.float32)
    u_max = jnp.asarray(params.u_max, jnp.float32)

    t0 = time.perf_counter()
    compiled = solve_block.lower(arr, u_min, u_max, x0, u0, pad).compile()
    print(f"[hlo] compiled {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)
    txt = compiled.as_text()
    with open("experiments/solve_block.hlo.txt", "w") as f:
        f.write(txt)

    # find the while body computation and count ops inside
    bodies = re.findall(r"%while_body[^\s]*", txt)
    print("while computations:", set(bodies.__iter__()) if bodies else None)
    # global counts
    for op in ("fusion", "custom-call", "copy(", "while(", "transpose",
               "conditional("):
        print(op, len(re.findall(re.escape(op), txt)))
    # rough per-computation op histogram for the biggest computations
    comps = re.split(r"\n\n", txt)
    sizes = sorted(((len(c.splitlines()), c.splitlines()[0][:100])
                    for c in comps), reverse=True)[:12]
    for nlines, head in sizes:
        print(nlines, head)


if __name__ == "__main__":
    main()
