"""Dump compiled HLO of the chained rollout-kernel loop and look for
layout-conversion copies/transposes around the Mosaic custom call — the
prime suspect for the ~450 µs T-independent per-call cost."""

import os
import re
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    from ilqr_tpu import get_model
    from ilqr_tpu.models import acrobot as ac
    from ilqr_tpu.ops.pallas_rollout import S, L, pack_params, rollout_packed

    model = get_model("acrobot")
    params = ac.default_params()
    packed = pack_params(params, 0.02)
    T, n, m, nb = 499, 4, 1, 1
    f32 = jnp.float32
    rng = np.random.default_rng(0)

    x0 = jnp.asarray(rng.normal(size=(n, nb, S, L)) * 0.05, f32)
    uff = jnp.zeros((T, m, nb, S, L), f32)
    xsr = jnp.zeros((T, n, nb, S, L), f32)
    K = jnp.asarray(rng.normal(size=(T, m, n, nb, S, L)) * 0.01, f32)

    def one(x0c):
        xs_b, us_o, xfin, cost = rollout_packed(
            model, "euler", True, packed, x0c, uff, xsr, K)
        return x0c + 1e-9 * xfin

    @jax.jit
    def chain(x0c):
        return lax.fori_loop(0, 64, lambda i, c: one(c), x0c)

    t0 = time.perf_counter()
    compiled = chain.lower(x0).compile()
    print(f"[hlo] compiled in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    txt = compiled.as_text()
    with open("experiments/rollout_chain.hlo.txt", "w") as f:
        f.write(txt)

    n_copy = len(re.findall(r"= [^ ]*copy\(", txt))
    n_transpose = len(re.findall(r"transpose", txt))
    n_custom = len(re.findall(r"custom-call", txt))
    n_fusion = len(re.findall(r"= [^ ]*fusion\(", txt))
    print(f"copies={n_copy} transposes={n_transpose} "
          f"custom_calls={n_custom} fusions={n_fusion}")
    for line in txt.splitlines():
        if ("copy(" in line or "transpose" in line) and "f32[" in line:
            print(line.strip()[:240])


if __name__ == "__main__":
    main()
