"""Sprite: an animated voxel model made of Frames.

API-compatible re-design of the reference ``Sprite`` (``data.py:253-427``):
a list of Frames (animation frames), even-forced size, Goxel text import with
the engine's coordinate transform, 90-degree-step rotated reads, mirrored
reads, a wall-clock animation state machine, and a voxel edit API.

TPU-first difference: the Goxel importer parses with a native C parser
(python_raytracer_tpu/native) instead of a per-line Python loop, and every (frame, rotation) pair can
be compiled to a dense uint16 id grid (``to_dense``) that the scene compiler
scatters into the device-resident world grid. Animation time is injected by
the runtime clock instead of reading a global Pygame ticker.
"""

from __future__ import annotations

import gzip
import math
from typing import Dict, List, Optional

import numpy as np

from python_raytracer_tpu.scene.frame import Frame
from python_raytracer_tpu.scene.material import Material, MaterialRegistry


def _even(v: float) -> int:
    """Round down and force even (reference data.py:258-262 semantics)."""
    t = math.trunc(v)
    return t + 1 if t % 2 != 0 else t


class Sprite:
    def __init__(self, **settings):
        size = settings.get("size", (0, 0, 0))
        self.lod: int = settings.get("lod", 0)
        sx, sy, sz = size[0], size[1], size[2]
        if sx % 2 or sy % 2 or sz % 2:
            print(
                "Warning: Sprite size "
                + f"{sx},{sy},{sz}"
                + " contains a float or odd number in one or more directions,"
                + " affected axes will be rounded and enlarged by one unit."
            )
            sx, sy, sz = _even(sx), _even(sy), _even(sz)
        self.size = (int(sx), int(sy), int(sz))

        # Animation state machine (reference data.py:265-268)
        self.frame = 0
        self.frame_time = 0.0
        self.frame_start = 0
        self.frame_end = 0
        self.frames: List[Frame] = [
            Frame(packed=False, resolution=self.lod + 1) for _ in range(settings.get("frames", 1))
        ]

    # --- content import ---

    def load(self, files: List[str], materials: Dict[str, Material]):
        """Import Goxel text exports ("X Y Z RRGGBB" lines, '#' comments).

        Applies the engine coordinate transform: X mirrored against sprite
        width, Y and Z swapped (Goxel is Z-up, the engine is Y-up) — reference
        data.py:271-289 (``post = size.x - x, z, y``).
        """
        from python_raytracer_tpu.native import parse_goxel_text

        for fi in range(min(len(files), len(self.frames))):
            path = files[fi]
            ext = path.split(".")[-1]
            if ext == "txt":
                data = open(path, "rb").read()
            elif ext == "gz":
                data = gzip.open(path, "rb").read()
            else:
                print(f"Warning: Cannot open sprite {path}, make sure the path and extension are correct.")
                return
            xs, ys, zs, cols = parse_goxel_text(data)
            # Engine coordinate transform (reference data.py:287) vectorized;
            # colors not present in the materials dict are skipped
            # (reference's `params[3] in materials` guard).
            px = self.size[0] - xs
            voxels: Dict[tuple, Material] = {}
            for i, col in enumerate(cols):
                mat = materials.get(col)
                if mat is not None:
                    voxels[(int(px[i]), int(zs[i]), int(ys[i]))] = mat
            self.get_frame(fi).set_voxels(voxels, True)

    def copy(self) -> "Sprite":
        import copy as _copy

        return _copy.deepcopy(self)

    # --- animation (reference data.py:297-306) ---

    def anim_set(self, frame_start: int, frame_end: int, frame_time: float):
        """Set animation range and per-frame duration in seconds."""
        self.frame = 0
        self.frame_time = frame_time * 1000
        self.frame_start = min(frame_start, len(self.frames))
        self.frame_end = min(frame_end, len(self.frames))

    def anim_update(self, ticks_ms: float):
        """Advance the active frame from a runtime-supplied clock (the
        reference reads the global pygame ticker, data.py:304-306)."""
        if self.frame_time and len(self.frames) > 1:
            self.frame = math.trunc(
                self.frame_start
                + (ticks_ms // self.frame_time) % (self.frame_end - self.frame_start + 1)
            )

    def mix(self, other: "Sprite", force: bool):
        """Overlay another same-size sprite's frames into this one.

        Reference ``Sprite.mix`` (data.py:311-321): sizes must match on every
        axis (warns and returns otherwise); only the overlapping frame range
        is mixed; ``None``/empty voxels in the other sprite never erase —
        empty space does not override. ``force`` is forwarded to the per-voxel
        write (reference: overwrite existing voxels vs keep them).
        """
        if self.size != other.size:
            print(
                "Warning: Can't mix sprites of uneven size, "
                + f"{self.size} and {other.size} are not equal."
            )
            return
        for f in range(min(len(self.frames), len(other.frames))):
            for post, mat in other.frames[f].get_voxels().items():
                if mat:
                    self.set_voxel(f, post, mat, force)

    # --- transforms (reference data.py:325-371) ---

    def pos_flipped(self, pos, x: bool, y: bool, z: bool):
        """Mirror a read position on the chosen axes."""
        ex, ey, ez = self.size[0] - 1, self.size[1] - 1, self.size[2] - 1
        px, py, pz = pos[0], pos[1], pos[2]
        if x:
            px = ex - px
        if y:
            py = ey - py
        if z:
            pz = ez - pz
        return (px, py, pz)

    def pos_rotated(self, pos, rot):
        """Remap a read position through 90-degree-step rotations.

        Each axis rotation only applies when the two perpendicular axes are
        equal in size (reference data.py:338-371).
        """
        ex, ey, ez = self.size[0] - 1, self.size[1] - 1, self.size[2] - 1
        px, py, pz = pos[0], pos[1], pos[2]
        ax = round(rot[0] / 90) % 4
        ay = round(rot[1] / 90) % 4
        az = round(rot[2] / 90) % 4

        if ax and self.size[1] == self.size[2]:
            if ax == 1:
                px, py, pz = px, ez - pz, py
            elif ax == 2:
                px, py, pz = px, ey - py, ez - pz
            elif ax == 3:
                px, py, pz = px, pz, ey - py

        if ay and self.size[0] == self.size[2]:
            if ay == 1:
                px, py, pz = pz, py, ex - px
            elif ay == 2:
                px, py, pz = ex - px, py, ez - pz
            elif ay == 3:
                px, py, pz = ez - pz, py, px

        if az and self.size[0] == self.size[1]:
            if az == 1:
                px, py, pz = ey - py, px, pz
            elif az == 2:
                px, py, pz = ex - px, ey - py, pz
            elif az == 3:
                px, py, pz = py, ex - px, pz

        return (px, py, pz)

    # --- frame access / edits (reference data.py:374-427) ---

    def get_frame(self, frame: Optional[int]) -> Frame:
        if isinstance(frame, int):
            return self.frames[frame]
        return self.frames[self.frame]

    def set_voxel(self, frame: Optional[int], pos, mat: Optional[Material], force: bool):
        x, y, z = pos[0], pos[1], pos[2]
        if x < 0 or x >= self.size[0] or y < 0 or y >= self.size[1] or z < 0 or z >= self.size[2]:
            print(f"Warning: Attempted to set voxel outside of object boundaries at position {x},{y},{z}.")
            return
        self.get_frame(frame).set_voxel(pos, mat, force)

    def set_voxels(self, frame: Optional[int], voxels: dict, force: bool = True):
        for (x, y, z) in voxels:
            if x < 0 or x >= self.size[0] or y < 0 or y >= self.size[1] or z < 0 or z >= self.size[2]:
                print(
                    "Warning: Attempted to set voxel list containing voxels outside of object"
                    f" boundaries at position {x},{y},{z}."
                )
                return
        self.get_frame(frame).set_voxels(voxels, force)

    def set_voxels_area(self, frame: Optional[int], pos_min, pos_max, mat: Optional[Material], force: bool):
        if (
            pos_min[0] < 0
            or pos_max[0] >= self.size[0]
            or pos_min[1] < 0
            or pos_max[1] >= self.size[1]
            or pos_min[2] < 0
            or pos_max[2] >= self.size[2]
        ):
            print(
                "Warning: Attempted to set voxel area outside of object boundaries between positions "
                f"{pos_min[0]},{pos_min[1]},{pos_min[2]} and {pos_max[0]},{pos_max[1]},{pos_max[2]}."
            )
            return
        voxels = {}
        for x in range(math.trunc(pos_min[0]), math.trunc(pos_max[0] + 1)):
            for y in range(math.trunc(pos_min[1]), math.trunc(pos_max[1] + 1)):
                for z in range(math.trunc(pos_min[2]), math.trunc(pos_max[2] + 1)):
                    voxels[(x, y, z)] = mat
        self.get_frame(frame).set_voxels(voxels, force)

    def get_voxel(self, frame: Optional[int], pos, rot) -> Optional[Material]:
        """Read a voxel at a local position under the given object rotation."""
        return self.get_frame(frame).get_voxel(self.pos_rotated(pos, rot))

    def get_voxels(self, frame: Optional[int]) -> dict:
        return self.get_frame(frame).get_voxels()

    def clear(self, frame: Optional[int]):
        self.get_frame(frame).clear()

    # --- TPU compile path ---

    def to_dense(self, registry: MaterialRegistry, frame: Optional[int] = None, rot=(0, 0, 0)) -> np.ndarray:
        """Dense uint16 id grid of shape ``size`` for one frame and rotation.

        The rotation remap is applied by *reading through* pos_rotated, so the
        result matches what the renderer's per-voxel fetch path would see
        (reference init.py:421 reads via spr.get_voxel(None, pos, obj.rot)).
        Results are cached per (frame, rotation step, content version) so the
        runtime's chunk rebuilds don't re-walk voxel dicts every tick.
        """
        f = self.get_frame(frame)
        rot_step = (round(rot[0] / 90) % 4, round(rot[1] / 90) % 4, round(rot[2] / 90) % 4)
        cache_key = (id(f), f._version, rot_step, id(registry))
        cache = getattr(self, "_dense_cache", None)
        if cache is not None and cache[0] == cache_key:
            return cache[1]
        out = self._to_dense_uncached(registry, f, rot)
        self._dense_cache = (cache_key, out)
        return out

    def _to_dense_uncached(self, registry: MaterialRegistry, f: Frame, rot) -> np.ndarray:
        base = f.to_dense(registry, self.size)
        ax = round(rot[0] / 90) % 4
        ay = round(rot[1] / 90) % 4
        az = round(rot[2] / 90) % 4
        if not (ax or ay or az):
            return base

        # pos_rotated transforms the read position through the X remap, then Y,
        # then Z, and reads the frame at the final position: out[p] =
        # base[Rz(Ry(Rx(p)))]. Composing with array stages o'[p] = o[R(p)]
        # requires applying the stages in reverse order: Z first, then Y, then
        # X. Each stage is a transpose + flip implementing its index map
        # (verified against pos_rotated in tests/test_sprite.py).
        out = base
        if az and self.size[0] == self.size[1]:
            if az == 1:
                # o[x,y,z] = src[ey - y, x, z]
                out = np.flip(out.transpose(1, 0, 2), axis=1)
            elif az == 2:
                out = np.flip(np.flip(out, axis=0), axis=1)
            elif az == 3:
                # o[x,y,z] = src[y, ex - x, z]
                out = np.flip(out.transpose(1, 0, 2), axis=0)
        if ay and self.size[0] == self.size[2]:
            if ay == 1:
                # o[x,y,z] = src[z, y, ex - x]
                out = np.flip(out.transpose(2, 1, 0), axis=0)
            elif ay == 2:
                out = np.flip(np.flip(out, axis=0), axis=2)
            elif ay == 3:
                # o[x,y,z] = src[ez - z, y, x]
                out = np.flip(out.transpose(2, 1, 0), axis=2)
        if ax and self.size[1] == self.size[2]:
            if ax == 1:
                # o[x,y,z] = src[x, ez - z, y]
                out = np.flip(out.transpose(0, 2, 1), axis=2)
            elif ax == 2:
                out = np.flip(np.flip(out, axis=1), axis=2)
            elif ax == 3:
                # o[x,y,z] = src[x, z, ey - y]
                out = np.flip(out.transpose(0, 2, 1), axis=1)
        return np.ascontiguousarray(out)
