"""Fast in-kernel sine/cosine with a shared range reduction.

Model dynamics dominate the fused kernels' per-step op count, and their
transcendentals are roughly half of it: Mosaic lowers each ``jnp.sin`` /
``jnp.cos`` to an independent ~18-op polynomial evaluation (measured via
the per-candidate-step cycle accounting in BENCH_NOTES.md). Models that
need several trig values of the SAME angle (acrobot needs sin/cos of q2,
sin/cos of q1, and sin/cos of q1+q2) can instead:

  * reduce each angle ONCE (Cody-Waite two-constant reduction mod pi),
  * evaluate one odd sin-poly and one even cos-poly on the reduced range
    [-pi/2, pi/2] per angle,
  * derive sums/differences by the angle-addition identities (3 ops
    instead of a fresh ~18-op polynomial).

Accuracy: poly max-error 3e-8 (sin) / 7e-10 (cos) in exact arithmetic;
in f32 the arithmetic rounding dominates (~1-2 ulp, measured 1.6e-7 max
abs) — the same class as the XLA lowering, and well inside the f32
tolerance the fused-vs-XLA tests already absorb. The reduction is exact
for |x| up to ~2e3 (|k| < 4096 keeps k*PI_HI exact in f32); beyond that
accuracy degrades gracefully (values stay bounded) — divergent-rollout
territory where candidates are rejected on cost anyway.

The f64 AoS model functions (golden-parity path) do NOT use this module.
"""

from __future__ import annotations

import jax.numpy as jnp

# pi split into a coarse part with 12 trailing zero bits in its f32
# mantissa (so k * PI_HI is exact for |k| < 4096) plus the remainder.
_PI_HI = 3.140625
_PI_LO = 9.676535897932795e-4

_S3 = -1.6666663906e-01
_S5 = 8.3331795301e-03
_S7 = -1.9817977073e-04
_S9 = 2.6244125769e-06

_C0 = 9.9999999985e-01
_C2 = -4.9999999512e-01
_C4 = 4.1666641882e-02
_C6 = -1.3888432404e-03
_C8 = 2.4763770582e-05
_C10 = -2.6115023872e-07


def sincos(x):
    """Returns (sin(x), cos(x)) with one shared range reduction.

    ~26 ops for the pair vs ~36 for two independent XLA lowerings; the
    win compounds when callers derive further angles via
    :func:`sin_add` / :func:`cos_add`.

    f64 inputs (x64 test/parity runs — never the TPU kernels) get the
    exact XLA lowering instead: the f32-targeted poly would cap their
    accuracy at ~3e-8. Off-TPU (CPU tests, interpret-mode kernels) the
    exact lowering is used too — there jnp.sin is ONE interpreter op
    while the poly is ~26, a pure slowdown with no issue-rate win; the
    trace-time backend check makes that choice static.
    """
    import jax

    if (jnp.result_type(x) == jnp.float64
            or jax.default_backend() != "tpu"):
        return jnp.sin(x), jnp.cos(x)
    k = jnp.round(x * (1.0 / jnp.pi))
    r = (x - k * _PI_HI) - k * _PI_LO          # r in [-pi/2, pi/2]
    # (-1)^k as f32: k mod 2 == 0 -> +1 else -1 (masks stay f32 —
    # boolean vregs don't survive the Mosaic remote compiler)
    sgn = 1.0 - 2.0 * (k - 2.0 * jnp.floor(0.5 * k))
    r2 = r * r
    sp = _S9
    sp = sp * r2 + _S7
    sp = sp * r2 + _S5
    sp = sp * r2 + _S3
    s = r + r * (r2 * sp)
    cp = _C10
    cp = cp * r2 + _C8
    cp = cp * r2 + _C6
    cp = cp * r2 + _C4
    cp = cp * r2 + _C2
    c = _C0 + r2 * cp
    return sgn * s, sgn * c


def sin_add(s1, c1, s2, c2):
    """sin(a+b) from the parts' sincos values (3 ops)."""
    return s1 * c2 + c1 * s2


def cos_add(s1, c1, s2, c2):
    """cos(a+b) from the parts' sincos values (3 ops)."""
    return c1 * c2 - s1 * s2
