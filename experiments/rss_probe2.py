"""RSS leak, round 2: rss_probe isolated the axon client leak to the
H2D path (every fresh host→device transfer leaks ~its own size in host
RSS; D2H reuse leg was flat). This probe tries the cheap workarounds,
all no-compile (reuses serve_warm1024.aotexec):

  gc        fresh jnp.asarray + gc.collect() every call — is the
            staging buffer in an uncollected cycle?
  dput      jax.device_put(np, device) instead of jnp.asarray
  np_view   transfer a VIEW of one preallocated host buffer mutated in
            place (does the client key/cache staging by base buffer?)

Whichever leg is flat becomes the service-side fix; if none, the leak
is unavoidable client-side and process recycling is the answer
(documented in BENCH_NOTES round 5).
"""

import gc
import json
import os
import sys
import time

import numpy as np


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return round(int(line.split()[1]) / 1024.0, 1)
    return -1.0


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    a = jnp.ones((256, 256), jnp.float32)
    (a @ a).block_until_ready()
    print(f"[rss2] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from ilqr_tpu.aot import load

    blob = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "serve_warm1024.aotexec")
    aot = load(blob)
    size = aot.meta["dispatch"]["flat_in_size"]
    rng = np.random.default_rng(0)
    base = (0.01 * rng.normal(size=(size,))).astype(np.float32)
    dev = jax.devices()[0]
    host_buf = np.array(base)  # the np_view leg mutates this in place

    def make_x(kind, i):
        if kind == "gc":
            x = jnp.asarray(base + np.float32(i * 1e-6))
            return x
        if kind == "dput":
            return jax.device_put(base + np.float32(i * 1e-6), dev)
        if kind == "np_view":
            host_buf[0] = np.float32(i)  # mutate, transfer same buffer
            return jnp.asarray(host_buf)
        raise ValueError(kind)

    def leg(kind, reps=60):
        r_start = rss_mb()
        for i in range(reps):
            x = make_x(kind, i)
            out = aot.compiled(x)
            np.asarray(out)
            if kind == "gc":
                gc.collect()
        return {"leg": kind, "rss_start": r_start, "rss_end": rss_mb(),
                "mb_per_call": round((rss_mb() - r_start) / reps, 2)}

    out = {"mode": "rss_probe2",
           "legs": [leg("gc"), leg("dput"), leg("np_view")]}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
