"""Math-utility parity tests (ref: include/common.h hand semantics)."""

import jax.numpy as jnp
import numpy as np

from ilqr_tpu.utils.math import (
    angle_diff,
    cube,
    sgn,
    smooth_abs,
    sqr,
    wrap_to_pi,
)


def test_sqr_cube_sgn():
    assert float(sqr(3.0)) == 9.0
    assert float(cube(-2.0)) == -8.0
    assert float(sgn(-5.0)) == -1.0
    assert float(sgn(0.0)) == 0.0
    assert float(sgn(2.5)) == 1.0


def test_smooth_abs():
    # sqrt(x²+α²)−α; at 0 → 0; for |x|≫α → ≈|x|−α
    assert float(smooth_abs(0.0)) == 0.0
    assert abs(float(smooth_abs(100.0, alpha=1.0)) - 99.005) < 1e-2
    # smooth and even
    np.testing.assert_allclose(
        np.asarray(smooth_abs(jnp.asarray([-2.0, 2.0]))),
        np.full(2, float(smooth_abs(2.0))),
    )


def test_wrap_to_pi():
    vals = jnp.asarray([0.0, np.pi / 2, np.pi + 0.1, -np.pi - 0.1,
                        7 * np.pi, -6 * np.pi + 0.3])
    wrapped = np.asarray(wrap_to_pi(vals))
    assert np.all(wrapped >= -np.pi - 1e-12)
    assert np.all(wrapped < np.pi + 1e-12)
    np.testing.assert_allclose(
        np.cos(wrapped), np.cos(np.asarray(vals)), atol=1e-9)
    np.testing.assert_allclose(
        np.sin(wrapped), np.sin(np.asarray(vals)), atol=1e-9)


def test_angle_diff():
    assert abs(float(angle_diff(0.1, 2 * np.pi - 0.1)) - 0.2) < 1e-9
    assert abs(float(angle_diff(-3.0, 3.0)) - (2 * np.pi - 6.0)) < 1e-9
