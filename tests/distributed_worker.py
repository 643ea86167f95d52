"""Worker for tests/test_distributed_multiprocess.py.

Runs as one of N coordinated processes (jax.distributed over localhost —
the CPU stand-in for a multi-host TPU pod's DCN control plane). Each
process owns 4 virtual CPU devices; the mesh spans all N·4 global devices;
each process feeds its local shard of the batch and the convergence stats
are reduced with psum/pmax across processes.

Usage: python distributed_worker.py <process_id> <num_processes> <port>
Prints "STATS <mean_cost> <n>" on success.
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from ilqr_tpu import SolverConfig, get_model  # noqa: E402
from ilqr_tpu.models import double_integrator as di  # noqa: E402
from ilqr_tpu.parallel.mesh import (  # noqa: E402
    BATCH_AXIS,
    init_distributed,
    make_mesh,
    sharded_convergence_stats,
)


def main():
    init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_local == 4, n_local
    assert n_global == 4 * nproc, n_global
    # a second call must be a no-op, not an error
    init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )

    mesh = make_mesh()  # spans ALL global devices across processes
    model = get_model("double_integrator")
    params = di.default_params(goal=(1.0, 0.5, 0.0, 0.0))
    cfg = SolverConfig(deriv_mode="analytic", max_iter=10)

    B = 2 * n_global
    rng = np.random.default_rng(0)  # same seed everywhere → same global data
    x0_all = rng.normal(size=(B, 4)) * 0.3
    u0_all = np.zeros((B, 20, 2))

    shard = B // nproc
    sh = NamedSharding(mesh, P(BATCH_AXIS))
    x0 = jax.make_array_from_process_local_data(
        sh, x0_all[pid * shard:(pid + 1) * shard], global_shape=(B, 4))
    u0 = jax.make_array_from_process_local_data(
        sh, u0_all[pid * shard:(pid + 1) * shard], global_shape=(B, 20, 2))

    stats_fn = sharded_convergence_stats(model, cfg, mesh)
    stats = stats_fn(params, 0.02, x0, u0)
    jax.block_until_ready(stats["mean_cost"])
    assert int(stats["n"]) == B, stats["n"]
    print(f"STATS {float(stats['mean_cost']):.10f} {int(stats['n'])}",
          flush=True)


if __name__ == "__main__":
    main()
