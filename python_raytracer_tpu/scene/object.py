"""Object: a world entity placing a Sprite, with physics and camera attach.

API-compatible re-design of the reference ``Object`` (``data.py:430-624``).
Objects register into a :class:`~python_raytracer_tpu.scene.scene.Scene`
(passed in or the current default scene) instead of a module-global dict.

Physics itself lives in ``physics/engine.py``; objects only carry the state
(pos/rot/vel/weight/AABB) and the update orchestration.
"""

from __future__ import annotations

import copy as _copy
import math
import random
from typing import Optional

from python_raytracer_tpu.scene.sprite import Sprite


def _ceil3(p):
    return (math.ceil(p[0]), math.ceil(p[1]), math.ceil(p[2]))


def _floor3(p):
    return (math.floor(p[0]), math.floor(p[1]), math.floor(p[2]))


class Object:
    def __init__(self, **settings):
        from python_raytracer_tpu.scene.scene import current_scene

        self.scene = settings.get("scene") or current_scene()
        self.pos = tuple(settings.get("pos", (0.0, 0.0, 0.0)))
        self.rot = tuple(settings.get("rot", (0.0, 0.0, 0.0)))
        self.vel = tuple(settings.get("vel", (0.0, 0.0, 0.0)))
        self.physics = settings.get("physics", False)
        self.function = settings.get("function", None)

        self.id = random.getrandbits(64)
        self.visible = False
        self.redraw = True
        self.size = (0, 0, 0)
        self.mins = (0, 0, 0)
        self.maxs = (0, 0, 0)
        self.weight = 0.0
        self.sprite: Optional[Sprite] = None
        self.cam_vec = (0.0, 0.0)
        self.cam_pos = (0.0, 0.0, 0.0)
        self.cam_rot = (0.0, 0.0, 0.0, 0.0)
        self._update_bounds()
        self.scene.objects[self.id] = self

    # --- lifecycle ---

    def remove(self):
        """Deregister from the scene (reference data.py:455-456)."""
        del self.scene.objects[self.id]

    def copy(self) -> "Object":
        new = _copy.copy(self)
        new.sprite = self.sprite.copy() if self.sprite else None
        new.id = random.getrandbits(64)
        self.scene.objects[new.id] = new
        return new

    # --- geometry ---

    def _update_bounds(self):
        cp, fp = _ceil3(self.pos), _floor3(self.pos)
        self.mins = (cp[0] - self.size[0], cp[1] - self.size[1], cp[2] - self.size[2])
        self.maxs = (fp[0] + self.size[0], fp[1] + self.size[1], fp[2] + self.size[2])

    def intersects(self, pos_min, pos_max) -> bool:
        """AABB overlap test, inclusive (reference data.py:463-464)."""
        return (
            pos_min[0] <= self.maxs[0]
            and pos_min[1] <= self.maxs[1]
            and pos_min[2] <= self.maxs[2]
            and pos_max[0] >= self.mins[0]
            and pos_max[1] >= self.mins[1]
            and pos_max[2] >= self.mins[2]
        )

    def rotate(self, rot):
        """Rotate by euler degrees; flags redraw when a 90-degree sprite step
        is crossed (reference data.py:467-479)."""
        if rot[0] or rot[1] or rot[2]:
            old = tuple(round(a / 90) % 4 for a in self.rot)
            self.rot = tuple((a + d) % 360 for a, d in zip(self.rot, rot))
            new = tuple(round(a / 90) % 4 for a in self.rot)
            if old != new:
                self.redraw = True
            self.set_camera_pos()

    def move(self, pos):
        """Teleport to a new origin (reference data.py:482-488)."""
        pos = tuple(pos)
        if pos != self.pos:
            self.pos = pos
            self._update_bounds()
            self.redraw = True
            self.set_camera_pos()

    def accelerate(self, vel):
        """Add velocity (reference data.py:491-492)."""
        self.vel = (self.vel[0] + vel[0], self.vel[1] + vel[1], self.vel[2] + vel[2])

    # --- per-frame update (reference data.py:564-587) ---

    def update(self, pos_cam, ticks_ms: float = 0.0,
               skip_physics: bool = False):
        """``skip_physics``: visibility/anim/function only — the caller runs
        physics for ALL movers in one jitted dispatch afterwards
        (runtime/engine.py jit_physics; physics/jit_engine.py)."""
        settings = self.scene.settings
        dist = math.dist(self.pos, pos_cam)

        visible_old = self.visible
        self.visible = bool(self.sprite) and dist <= settings.dist_max + max(self.size)
        if visible_old != self.visible:
            self.redraw = True

        if self.visible and dist <= settings.dist_move:
            spr = self.get_sprite()
            frame_old = spr.frame
            spr.anim_update(ticks_ms)
            if frame_old != spr.frame:
                self.redraw = True
                self.set_weight()

            if self.physics and not skip_physics:
                from python_raytracer_tpu.physics.engine import update_physics

                update_physics(self, self.scene)
            if self.function:
                self.function(self)

    # --- sprite / weight / camera (reference data.py:591-624) ---

    def set_sprite(self, sprite: Optional[Sprite]):
        self.size = (0, 0, 0)
        self.mins = self.maxs = (0, 0, 0)
        if sprite:
            self.sprite = sprite
            self.size = (sprite.size[0] // 2, sprite.size[1] // 2, sprite.size[2] // 2)
            self._update_bounds()
        self.redraw = True
        self.set_weight()

    def get_sprite(self) -> Optional[Sprite]:
        return self.sprite

    def set_weight(self):
        """Total voxel weight of the active frame (reference data.py:607-611)."""
        self.weight = 0.0
        if self.sprite:
            for mat in self.sprite.get_voxels(None).values():
                self.weight += mat.weight

    def set_camera_pos(self):
        """Refresh world camera position/rotation for camera objects
        (reference data.py:614-618)."""
        if self.cam_vec[0] or self.cam_vec[1]:
            from python_raytracer_tpu.utils.hostmath import euler_to_quat_h, quat_vec_forward_h

            self.cam_rot = euler_to_quat_h(self.rot)
            d = quat_vec_forward_h(euler_to_quat_h((0.0, self.rot[1], 0.0)))
            self.cam_pos = (
                self.pos[0] + self.cam_vec[0] * d[0],
                self.pos[1] + self.cam_vec[1],
                self.pos[2] + self.cam_vec[0] * d[2],
            )

    def set_camera(self, pos):
        """Attach the camera to this object at a (forward, up) offset
        (reference data.py:622-624)."""
        self.cam_vec = (pos[0], pos[1])
        self.set_camera_pos()
