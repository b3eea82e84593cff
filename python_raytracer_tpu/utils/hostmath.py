"""Host-side scalar math: pure-Python float64 twins of utils/mathutils.py.

Used in the authoring / orchestration layer (object camera attach, physics)
where values are plain Python floats and pulling in jnp would add dispatch
overhead and f32 rounding. The formulas carry the same reference citations as
their jnp twins (reference lib.py:310-376).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple


def euler_to_quat_h(euler_deg: Sequence[float]) -> Tuple[float, float, float, float]:
    """Euler degrees -> quaternion (x, y, z, w), reference lib.py:322-338."""
    rx, ry, rz = (math.radians(a) for a in euler_deg)
    sin_x, cos_x = math.sin(rx / 2), math.cos(rx / 2)
    sin_y, cos_y = math.sin(ry / 2), math.cos(ry / 2)
    sin_z, cos_z = math.sin(rz / 2), math.cos(rz / 2)
    x = sin_x * cos_y * cos_z - cos_x * sin_y * sin_z
    y = cos_x * sin_y * cos_z - sin_x * cos_y * sin_z
    z = cos_x * cos_y * sin_z + sin_x * sin_y * cos_z
    w = cos_x * cos_y * cos_z + sin_x * sin_y * sin_z
    return (x, y, z, w)


def quat_multiply_h(a, b) -> Tuple[float, float, float, float]:
    """Quaternion composition, reference convention (lib.py:353-358)."""
    x = a[3] * b[0] + a[2] * b[1] - a[1] * b[2] + a[0] * b[3]
    y = a[2] * b[0] + a[3] * b[1] + a[0] * b[2] + a[1] * b[3]
    z = a[1] * b[0] - a[0] * b[1] + a[3] * b[2] + a[2] * b[3]
    w = a[0] * b[0] - a[1] * b[1] - a[2] * b[2] + a[3] * b[3]
    return (x, y, z, w)


def quat_vec_right_h(q) -> Tuple[float, float, float]:
    """Reference lib.py:360-364."""
    return (
        1 - 2 * (q[1] ** 2 + q[0] ** 2),
        2 * (q[2] * q[1] + q[3] * q[0]),
        2 * (q[2] * q[0] - q[3] * q[1]),
    )


def quat_vec_up_h(q) -> Tuple[float, float, float]:
    """Reference lib.py:366-370."""
    return (
        2 * (q[2] * q[1] - q[3] * q[0]),
        1 - 2 * (q[2] ** 2 + q[0] ** 2),
        2 * (q[1] * q[0] + q[3] * q[2]),
    )


def quat_vec_forward_h(q) -> Tuple[float, float, float]:
    """Reference lib.py:372-376."""
    return (
        2 * (q[2] * q[0] + q[3] * q[1]),
        2 * (q[1] * q[0] - q[3] * q[2]),
        1 - 2 * (q[2] ** 2 + q[1] ** 2),
    )


def cheb_normalize_h(v) -> Tuple[float, float, float]:
    """Chebyshev-norm normalize (reference lib.py:310-314)."""
    ref = max(abs(v[0]), abs(v[1]), abs(v[2]))
    if ref and ref != 1:
        return (v[0] / ref, v[1] / ref, v[2] / ref)
    return (v[0], v[1], v[2])
