"""Math helpers with reference parity (ref: include/common.h:37-92,
include/eigen_helpers.h:86-89).

The reference's masked-indexing helpers (eigen_helpers.h:15-61) have no
direct counterpart here: their entire purpose was dynamic-size active-set
extraction for boxQP, which this framework replaces with fixed-shape
``jnp.where`` masking (see ops/boxqp.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def sqr(x):
    """x² (ref: common.h:37-40)."""
    return x * x


def cube(x):
    """x³ (ref: common.h:42-45)."""
    return x * x * x


def sgn(x):
    """Sign with sgn(0) = 0 (ref: common.h:47-49)."""
    return jnp.sign(x)


def smooth_abs(x, alpha=1.0):
    """Pseudo-Huber smooth |x|: sqrt(x² + α²) − α (ref: common.h:51-54 and
    the vector version eigen_helpers.h:86-89). Differentiable everywhere —
    the reference uses it for smooth cost shaping."""
    return jnp.sqrt(x * x + alpha * alpha) - alpha


def wrap_to_pi(angle):
    """Wrap angle(s) to [−π, π) (ref: common.h:56-71, via the float Mod
    helper :73-92). Elementwise; jit/vmap-safe (jnp.mod is always
    non-negative for a positive modulus, unlike C's fmod)."""
    return jnp.mod(angle + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def angle_diff(a, b):
    """Shortest signed angular difference a − b, in (−π, π]."""
    return wrap_to_pi(a - b)
