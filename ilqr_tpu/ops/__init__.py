from ilqr_tpu.ops.boxqp import boxqp, clamp_to_limits, quad_cost, quadclamp_line_search
from ilqr_tpu.ops.derivatives import analytic_derivs, compute_derivs, fd_derivs
from ilqr_tpu.ops.backward import backward_pass, gradient_norm
from ilqr_tpu.ops.rollout import line_search, open_loop_rollout, rollout

__all__ = [
    "boxqp",
    "clamp_to_limits",
    "quad_cost",
    "quadclamp_line_search",
    "analytic_derivs",
    "compute_derivs",
    "fd_derivs",
    "backward_pass",
    "gradient_norm",
    "line_search",
    "open_loop_rollout",
    "rollout",
]
