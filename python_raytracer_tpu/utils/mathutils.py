"""Vector / quaternion math with the reference engine's exact conventions.

The reference implements its own small math layer (``lib.py:7-445``). The
TPU build replaces the per-component Python classes with array functions that
work identically on host (NumPy) and device (jax.numpy) — vectors are arrays
of shape ``(..., 3)``, quaternions ``(..., 4)`` in ``(x, y, z, w)`` order.

Conventions preserved from the reference (cited per function):

* **Chebyshev normalize** — divide by the max absolute component so that at
  least one axis is exactly +-1 ("speed of light is 1 per step",
  ``lib.py:310-314``, ``init.py:39-40``).
* **euler -> quaternion** — the reference's own (non-standard) composition
  (``lib.py:322-338``); angles in degrees.
* **quaternion multiply / basis vectors** — ``lib.py:353-376``. The formulas
  are reproduced semantically (they are the reference's public rotation ABI —
  camera and ray directions depend on them bit-for-bit).
"""

from __future__ import annotations

import jax.numpy as jnp


def cheb_normalize(v):
    """Chebyshev-norm normalization (reference lib.py:310-314).

    ref = max(|v|); return v / ref unless ref == 0 (zero vector unchanged).
    """
    ref = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
    return jnp.where(ref != 0, v / jnp.where(ref != 0, ref, 1), v)


def euler_to_quat(euler_deg):
    """Euler degrees (x, y, z) -> quaternion (x, y, z, w), reference lib.py:322-338."""
    rad = jnp.deg2rad(euler_deg)
    half = rad * 0.5
    sin_x, cos_x = jnp.sin(half[..., 0]), jnp.cos(half[..., 0])
    sin_y, cos_y = jnp.sin(half[..., 1]), jnp.cos(half[..., 1])
    sin_z, cos_z = jnp.sin(half[..., 2]), jnp.cos(half[..., 2])
    x = sin_x * cos_y * cos_z - cos_x * sin_y * sin_z
    y = cos_x * sin_y * cos_z - sin_x * cos_y * sin_z
    z = cos_x * cos_y * sin_z + sin_x * sin_y * cos_z
    w = cos_x * cos_y * cos_z + sin_x * sin_y * sin_z
    return jnp.stack([x, y, z, w], axis=-1)


def quat_multiply(a, b):
    """Quaternion composition with the reference's convention (lib.py:353-358)."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    x = aw * bx + az * by - ay * bz + ax * bw
    y = az * bx + aw * by + ax * bz + ay * bw
    z = ay * bx - ax * by + aw * bz + az * bw
    w = ax * bx - ay * by - az * bz + aw * bw
    return jnp.stack([x, y, z, w], axis=-1)


def quat_vec_right(q):
    """Right basis vector of a rotation (reference lib.py:360-364)."""
    x_, y_, z_, w_ = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    x = 1 - 2 * (y_**2 + x_**2)
    y = 2 * (z_ * y_ + w_ * x_)
    z = 2 * (z_ * x_ - w_ * y_)
    return jnp.stack([x, y, z], axis=-1)


def quat_vec_up(q):
    """Up basis vector of a rotation (reference lib.py:366-370)."""
    x_, y_, z_, w_ = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    x = 2 * (z_ * y_ - w_ * x_)
    y = 1 - 2 * (z_**2 + x_**2)
    z = 2 * (y_ * x_ + w_ * z_)
    return jnp.stack([x, y, z], axis=-1)


def quat_vec_forward(q):
    """Forward basis vector of a rotation (reference lib.py:372-376)."""
    x_, y_, z_, w_ = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    x = 2 * (z_ * x_ + w_ * y_)
    y = 2 * (y_ * x_ - w_ * z_)
    z = 1 - 2 * (z_**2 + y_**2)
    return jnp.stack([x, y, z], axis=-1)


def snapped(v, unit):
    """Snap to a grid: floor-division times unit (reference lib.py:316-320)."""
    return jnp.floor_divide(v, unit) * unit


def mix(a, b, bias):
    """Linear blend a*(1-bias) + b*bias (reference lib.py:437-439)."""
    return a * (1 - bias) + b * bias


def normalize01(x, x_min, x_max):
    """Clamp-remap x into [0, 1] over [x_min, x_max] (reference lib.py:442-445)."""
    return jnp.where(
        x_min >= x_max, 0.0, jnp.clip((x - x_min) / jnp.where(x_min >= x_max, 1, x_max - x_min), 0, 1)
    )
