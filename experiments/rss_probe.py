"""Attribute the TPU soak's RSS growth (~7.5 MB/dispatch — one flat
buffer per batch; BENCH_NOTES round 5 soak row). The CPU mini-soak is
FLAT (400k replans, zero growth), so the leak is in the TPU/axon client
layer. This probe reuses the no-compile soak blob
(serve_warm1024.aotexec) and isolates the direction:

  leg A (fresh_in):  100 calls, fresh flat input array each call
                     (H2D + D2H per call — the service's pattern)
  leg B (reused_in): 100 calls, ONE device-committed input reused
                     (D2H only per call)

If A grows and B doesn't → H2D transfer buffers leak; if both grow →
D2H; if neither → the leak needs the full service stack (threads).
"""

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
    print(f"[rss] health {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    from ilqr_tpu.aot import load

    blob = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "serve_warm1024.aotexec")
    aot = load(blob)
    size = aot.meta["dispatch"]["flat_in_size"]
    rng = np.random.default_rng(0)
    base = (0.01 * rng.normal(size=(size,))).astype(np.float32)

    def leg(name, reps, fresh_in):
        committed = jnp.asarray(base)
        jax.block_until_ready(committed)
        r_start = rss_mb()
        samples = []
        for i in range(reps):
            if fresh_in:
                x = jnp.asarray(base + np.float32(i * 1e-6))
            else:
                x = committed
            out = aot.compiled(x)
            np.asarray(out)  # D2H
            if i % 10 == 0:
                samples.append(rss_mb())
        return {"leg": name, "rss_start": r_start, "rss_end": rss_mb(),
                "samples": samples}

    out = {"mode": "rss_probe",
           "legs": [leg("fresh_in", 100, True),
                    leg("reused_in", 100, False)]}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
