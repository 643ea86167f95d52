from ilqr_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_solver,
    sharded_convergence_stats,
)

__all__ = ["make_mesh", "make_sharded_solver", "sharded_convergence_stats"]
