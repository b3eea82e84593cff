"""Camera ray generation: lens distortion + DOF jitter -> ray batch.

Replicates the reference's per-pixel ray setup (``Camera.trace`` preamble,
reference ``init.py:37-59`` and the pixel/sample loop of ``Camera.tile``,
``init.py:126-143``) as batched array math:

* screen direction dir in [-1, 1) per axis from the pixel grid
  (init.py:131-132),
* edge LOD ``detail = 1 - |dir_x * dir_y| * lod_edge`` (init.py:133),
* lens angles in *degrees*: ``lens_x = (dir_x / proportions) * lens + rand(dof)``
  (init.py:41-42), euler (0, -lens_x, +lens_y) -> quaternion composed with
  the camera rotation, forward vector = ray velocity (init.py:43-45),
* ray starts at ``cam_pos + vel * dist_min`` with life
  ``(dist_max - dist_min) * ray_detail`` (init.py:53-56).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.ops.march import RayBatch
from python_raytracer_tpu.utils.mathutils import euler_to_quat, quat_multiply, quat_vec_forward


def pixel_grid(settings: Settings, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Screen directions and edge-LOD detail for every pixel.

    Returns (dirs [H*W, 2], detail [H*W]) with pixel index p = y * W + x, so
    results reshape directly to [H, W].
    """
    w, h = settings.width, settings.height
    x = jax.lax.broadcasted_iota(dtype, (h, w), 1).reshape(-1)
    y = jax.lax.broadcasted_iota(dtype, (h, w), 0).reshape(-1)
    dir_x = -1 + (x / w) * 2
    dir_y = -1 + (y / h) * 2
    detail = 1 - jnp.abs(dir_x * dir_y) * settings.lod_edge
    return jnp.stack([dir_x, dir_y], axis=-1), detail


def generate_rays(
    settings: Settings,
    cam_pos: jnp.ndarray,
    cam_rot: jnp.ndarray,
    dirs: jnp.ndarray,
    ray_detail: jnp.ndarray,
    u_dof: Optional[jnp.ndarray] = None,
    lens: Optional[float] = None,
) -> RayBatch:
    """Build the ray batch for given screen directions.

    Args:
      cam_pos: [3] camera position; cam_rot: [4] camera quaternion.
      dirs: [N, 2] screen directions; ray_detail: [N] life scale.
      u_dof: [N, 2] uniforms in [0,1) for the DOF angle jitter, or None when
        settings.dof == 0 (the reference draws nothing then, lib.py:431-434).
      lens: camera lens value; defaults to fov * pi / 8 (init.py:17, mutable
        at runtime via mouse wheel in the reference, init.py:282).
    """
    dtype = dirs.dtype
    lens_val = settings.lens if lens is None else lens
    prop = settings.proportions
    lens_x = (dirs[:, 0] / prop) * lens_val
    lens_y = (dirs[:, 1] * prop) * lens_val
    if settings.dof and u_dof is not None:
        lens_x = lens_x + (-1 + u_dof[:, 0] * 2) * settings.dof
        lens_y = lens_y + (-1 + u_dof[:, 1] * 2) * settings.dof
    euler = jnp.stack([jnp.zeros_like(lens_x), -lens_x, +lens_y], axis=-1)
    ray_rot = quat_multiply(cam_rot[None, :].astype(dtype), euler_to_quat(euler))
    vel = quat_vec_forward(ray_rot)
    pos = cam_pos[None, :].astype(dtype) + vel * settings.dist_min
    life = (settings.dist_max - settings.dist_min) * ray_detail
    return RayBatch(pos=pos, vel=vel, life=life)
