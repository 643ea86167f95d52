"""Real multi-process distributed test (VERDICT r1 item 5).

The reference is strictly single-process (SURVEY §2: no MPI/NCCL/Gloo);
the TPU-native scaling story is a mesh spanning hosts via
``jax.distributed``. The 8-virtual-device tests in test_sharding.py cover
the ICI-analogue single-process path; THIS test covers the cross-process
leg: 2 coordinated CPU processes (localhost coordinator = the DCN control
plane stand-in), a global mesh over 2×4 devices, per-process local shards,
and psum/pmax stats reduced across process boundaries.

The cross-process result must agree with a plain single-process solve of
the same batch — scaling must not change the math.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_mean_cost():
    import jax
    import jax.numpy as jnp

    from ilqr_tpu import SolverConfig, get_model
    from ilqr_tpu.batch import solve_batch
    from ilqr_tpu.models import double_integrator as di

    model = get_model("double_integrator")
    params = di.default_params(goal=(1.0, 0.5, 0.0, 0.0))
    cfg = SolverConfig(deriv_mode="analytic", max_iter=10)
    rng = np.random.default_rng(0)  # same seed as distributed_worker.py
    B = 16
    x0 = jnp.asarray(rng.normal(size=(B, 4)) * 0.3)
    u0 = jnp.zeros((B, 20, 2))
    sol = solve_batch(model, params, cfg, 0.02, x0, u0)
    return float(jnp.mean(sol.cost))


@pytest.mark.slow
def test_two_process_mesh_matches_single_process(repo_root):
    nproc = 2
    port = _free_port()
    # Strip TPU-plugin env: the image's sitecustomize registers the axon
    # PJRT plugin at interpreter startup (a JAX backend init), which must
    # not happen before jax.distributed.initialize in the workers.
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "PALLAS_AXON_POOL_IPS")}
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(repo_root, "tests",
                                          "distributed_worker.py"),
             str(i), str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    stats = [ln for o in outs for ln in o.splitlines()
             if ln.startswith("STATS ")]
    assert len(stats) == nproc, outs
    means = [float(s.split()[1]) for s in stats]
    ns = [int(s.split()[2]) for s in stats]
    # both processes must see the same globally-reduced stats
    assert ns == [16, 16]
    assert abs(means[0] - means[1]) < 1e-12

    # and the cross-process math must equal the single-process solve
    ref = _single_process_mean_cost()
    assert abs(means[0] - ref) < 1e-6, (means[0], ref)
