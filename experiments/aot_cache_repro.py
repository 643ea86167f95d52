"""Minimal repro for the XLA:CPU trap (c) interaction between the
persistent compile cache and deserialized executables (aot.py docstring;
surfaced 2026-08-21 as warm-cache test_aot failures).

Usage: python experiments/aot_cache_repro.py <variant>
  full        cache on, rehydrate solve() from cache, then load+exec blob
  flip        same, but set jax_compilation_cache_dir=None right before load
  noprewarm   cache on, do NOT run solve() first, load+exec blob
  flipearly   cache on for solve() prewarm, cache off BEFORE compile_solver

Exits 0 if the restored executable runs, nonzero on the Buffer
Definition Event death.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np
import jax.numpy as jnp

from ilqr_tpu import SolverConfig, get_model, solve
from ilqr_tpu.aot import compile_solver, load
from ilqr_tpu.models import double_integrator as di

variant = sys.argv[1]
B, T = 3, 30
model = get_model("double_integrator")
params = di.default_params()
cfg = SolverConfig(deriv_mode="analytic", max_iter=15)

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(B, 4)), jnp.float32)
u0 = jnp.zeros((B, T, 2), jnp.float32)

if variant == "pytestorder":
    # Match the pytest sequence exactly: fixture compiles+saves FIRST,
    # then test_aot_matches_direct_solve executes the original and
    # rehydrates per-lane solve() from the cache, then roundtrip loads.
    aot = compile_solver(model, params, cfg, 0.05, B, T, path="vmap")
    path = "/tmp/aot_cache_repro.aotexec"
    aot.save(path)
    sol = aot(x0, u0)
    for i in range(B):
        r = solve(model, params, cfg, 0.05, x0[i], u0[i])
        np.testing.assert_allclose(np.asarray(sol.cost)[i],
                                   np.asarray(r.cost), rtol=1e-5)
    print("direct-match leg ok", flush=True)
    x1 = jnp.asarray(np.random.default_rng(1).normal(size=(B, 4)),
                     jnp.float32)
    restored = load(path)
    a = np.asarray(aot(x1, u0).cost)
    b = np.asarray(restored(x1, u0).cost)
    print("restored exec ok:", a, b, flush=True)
    sys.exit(0)

if variant in ("full", "flip"):
    # Rehydrate the per-lane solve program from the (warm) persistent cache.
    s = solve(model, params, cfg, 0.05, x0[0], u0[0])
    print("prewarm solve cost:", float(s.cost), flush=True)

if variant == "flipearly":
    s = solve(model, params, cfg, 0.05, x0[0], u0[0])
    print("prewarm solve cost:", float(s.cost), flush=True)
    jax.config.update("jax_compilation_cache_dir", None)

aot = compile_solver(model, params, cfg, 0.05, B, T, path="vmap")
path = "/tmp/aot_cache_repro.aotexec"
aot.save(path)

if variant == "flip":
    jax.config.update("jax_compilation_cache_dir", None)

restored = load(path)
out = np.asarray(restored(x0, u0).cost)
print("restored exec ok, costs:", out, flush=True)
