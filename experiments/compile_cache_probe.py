"""Probe: does jax's persistent compilation cache work through the axon
PJRT plugin?

The axon remote pool compiles 10-600 s PER NEW PROGRAM and (by default)
nothing is cached across processes (CLAUDE.md). jax's persistent cache
(jax_compilation_cache_dir) serializes compiled executables keyed by HLO +
flags; whether it helps here depends on the plugin supporting executable
serialization. If it does, every multi-process measurement chain and the
driver's round-end bench stop paying the recompile tax.

Run TWICE in separate processes:
  CACHE_DIR=/root/repo/.jax_cache python experiments/compile_cache_probe.py
The program is deliberately "new" (a shape unlikely to be in any other
probe) so the first run measures a genuine compile. Prints one JSON line
with the compile+first-call time; a second-process time ~100x smaller
means the cache works end-to-end.
"""

import json
import os
import sys
import time

cache_dir = os.environ.get("CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np


def main():
    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    health = time.perf_counter() - t0
    print(f"[cc] health {health:.1f}s", file=sys.stderr, flush=True)

    # A distinctive program: odd shapes + a fori_loop so it isn't trivially
    # in the plugin's own warm state from other probes.
    @jax.jit
    def f(x):
        def body(i, acc):
            return jnp.tanh(acc @ x) + 0.01 * i
        return jax.lax.fori_loop(0, 7, body, x)

    x = jnp.full((333, 333), 0.01, jnp.float32)
    t0 = time.perf_counter()
    np.asarray(f(x))
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(f(x))
    second = time.perf_counter() - t0
    n_entries = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
    print(json.dumps({
        "probe": "compile_cache",
        "backend": jax.default_backend(),
        "health_s": round(health, 2),
        "compile_plus_first_s": round(first, 2),
        "steady_s": round(second, 4),
        "cache_dir_entries": n_entries,
    }), flush=True)


if __name__ == "__main__":
    main()
