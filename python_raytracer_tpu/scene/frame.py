"""Frame: a sparse voxel container with optional greedy box compression.

API-compatible re-design of the reference's ``Frame`` (reference
``data.py:96-250``): voxels live either as single points (``data3``, keyed by
``(x, y, z)``) or as filled boxes (``data6``, keyed by
``(x0, y0, z0, x1, y1, z1)``, inclusive corners). A ``resolution`` >= 1 divides
coordinates so less data represents a greater area (the LOD storage scheme,
data.py:99,137).

Differences from the reference (deliberate, latent defects not replicated —
see SURVEY.md §2.1 "known latent defects"):

* ``set_voxel`` divides the position by ``resolution`` exactly once (the
  reference divides twice on the force=False path, data.py:151-152);
* deleting a missing voxel is a no-op instead of a KeyError (data.py:158);
* ``pack`` produces an equivalent (round-trip identical) box decomposition via
  the same greedy growth order (-X, +X, -Y, +Y, -Z, +Z with restart,
  data.py:192-250) but implemented with clean slab checks.

In the TPU build, Frames are **authoring-side only**: the renderer never walks
them. ``to_dense`` compiles a frame to a dense uint16 material-id grid which
the scene compiler uploads to device memory.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from python_raytracer_tpu.scene.material import Material, MaterialRegistry

Post3 = Tuple[int, int, int]
Post6 = Tuple[int, int, int, int, int, int]


class Frame:
    def __init__(self, **settings):
        self.packed: bool = settings.get("packed", False)
        self.resolution: int = settings.get("resolution", 1)
        self.data3: Dict[Post3, Material] = {}
        self.data6: Dict[Post6, Material] = {}
        self._version = 0  # bumped on edits; invalidates dense caches

    # --- queries ---

    def clear(self):
        """Remove all voxels (reference data.py:109-111)."""
        self.data3 = {}
        self.data6 = {}
        self._version += 1

    def get_voxels(self) -> Dict[Post3, Material]:
        """Expand to a dict of world-position -> material.

        Points and boxes stored at resolution r expand to r-sized cubes of
        world cells (reference data.py:119-133).
        """
        res = self.resolution
        voxels: Dict[Post3, Material] = {}
        for (px, py, pz), mat in self.data3.items():
            for x in range(px * res, px * res + res):
                for y in range(py * res, py * res + res):
                    for z in range(pz * res, pz * res + res):
                        voxels[(x, y, z)] = mat
        for (x0, y0, z0, x1, y1, z1), mat in self.data6.items():
            for x in range(x0 * res, x1 * res + res):
                for y in range(y0 * res, y1 * res + res):
                    for z in range(z0 * res, z1 * res + res):
                        voxels[(x, y, z)] = mat
        return voxels

    def get_voxel(self, pos) -> Optional[Material]:
        """Material at a world position: O(1) point hit, else box scan
        (reference data.py:136-145). ``pos`` is any 3-sequence of ints/floats.
        """
        x, y, z = int(pos[0]), int(pos[1]), int(pos[2])
        if self.resolution > 1:
            x, y, z = x // self.resolution, y // self.resolution, z // self.resolution
        hit = self.data3.get((x, y, z))
        if hit is not None:
            return hit
        for (x0, y0, z0, x1, y1, z1), mat in self.data6.items():
            if x0 <= x <= x1 and y0 <= y <= y1 and z0 <= z <= z1:
                return mat
        return None

    # --- edits ---

    def _store(self, post: Post3, mat: Optional[Material]):
        self._version += 1
        self.unpack(post)
        if mat is not None:
            self.data3[post] = mat
        else:
            self.data3.pop(post, None)

    def set_voxel(self, pos, mat: Optional[Material], force: bool):
        """Set/clear one voxel; positions not valid at this resolution are
        ignored (reference data.py:149-159)."""
        x, y, z = int(pos[0]), int(pos[1]), int(pos[2])
        res = self.resolution
        if res <= 1 or (x % res == 0 and y % res == 0 and z % res == 0):
            if force or self.get_voxel((x, y, z)) is None:
                if res > 1:
                    x, y, z = x // res, y // res, z // res
                self._store((x, y, z), mat)
                self.pack()

    def set_voxels(self, voxels: Dict[Post3, Optional[Material]], force: bool):
        """Bulk voxel set in data3 format, packing once at the end
        (reference data.py:163-175)."""
        res = self.resolution
        if force and res <= 1 and not self.data6 and all(
            m is not None for m in voxels.values()
        ):
            # Bulk fast path (model import): no resolution filtering, no box
            # unpacking, no per-voxel deletes — a plain dict update is
            # semantically identical and C-speed.
            self._version += 1
            self.data3.update(voxels)
            self.pack()
            return
        for (x, y, z), mat in voxels.items():
            if res <= 1 or (x % res == 0 and y % res == 0 and z % res == 0):
                if force or self.get_voxel((x, y, z)) is None:
                    px, py, pz = (x // res, y // res, z // res) if res > 1 else (x, y, z)
                    self._store((px, py, pz), mat)
        self.pack()

    def mix(self, other: "Frame", force: bool):
        """Blend another frame's voxels into this one (reference data.py:114-116)."""
        self.set_voxels(other.get_voxels(), force)

    # --- box compression ---

    def unpack(self, pos):
        """Decompress the box containing ``pos`` (in divided coordinates) back
        to points so it can be edited (reference data.py:178-187)."""
        x, y, z = int(pos[0]), int(pos[1]), int(pos[2])
        for post6 in list(self.data6.keys()):
            x0, y0, z0, x1, y1, z1 = post6
            if x0 <= x <= x1 and y0 <= y <= y1 and z0 <= z <= z1:
                mat = self.data6.pop(post6)
                for px in range(x0, x1 + 1):
                    for py in range(y0, y1 + 1):
                        for pz in range(z0, z1 + 1):
                            self.data3[(px, py, pz)] = mat
                break

    def _slab_uniform(self, x0, y0, z0, x1, y1, z1, mat) -> bool:
        """True iff every cell of the (inclusive) box is a data3 point of ``mat``."""
        for x in range(x0, x1 + 1):
            for y in range(y0, y1 + 1):
                for z in range(z0, z1 + 1):
                    if self.data3.get((x, y, z)) is not mat:
                        return False
        return True

    def pack(self):
        """Greedy point->box compression when ``packed`` is enabled.

        Grows a box from each seed point one slab at a time in the order
        -X, +X, -Y, +Y, -Z, +Z, each direction extended until a slab is not
        uniformly the seed's material; restarts the scan whenever a box is
        extracted (reference data.py:192-250 semantics; round-trip equality
        with get_voxels is the contract, tested in tests/test_frame.py).
        """
        if not self.packed:
            return
        restart = True
        while restart:
            restart = False
            for seed, mat in self.data3.items():
                mn = list(seed)
                mx = list(seed)
                for axis, sign in ((0, -1), (0, +1), (1, -1), (1, +1), (2, -1), (2, +1)):
                    while True:
                        lo, hi = mn.copy(), mx.copy()
                        if sign < 0:
                            lo[axis] = hi[axis] = mn[axis] - 1
                        else:
                            lo[axis] = hi[axis] = mx[axis] + 1
                        if not self._slab_uniform(lo[0], lo[1], lo[2], hi[0], hi[1], hi[2], mat):
                            break
                        if sign < 0:
                            mn[axis] -= 1
                        else:
                            mx[axis] += 1
                if mn != list(seed) or mx != list(seed):
                    # A real box was grown: move its points to data6 and rescan.
                    for x in range(mn[0], mx[0] + 1):
                        for y in range(mn[1], mx[1] + 1):
                            for z in range(mn[2], mx[2] + 1):
                                del self.data3[(x, y, z)]
                    self.data6[(mn[0], mn[1], mn[2], mx[0], mx[1], mx[2])] = mat
                    restart = True
                    break

    # --- TPU compile path ---

    def bounds(self) -> Optional[Tuple[Post3, Post3]]:
        """World-space (min, max) inclusive bounds of the content, or None."""
        posts = list(self.data3.keys())
        boxes = list(self.data6.keys())
        if not posts and not boxes:
            return None
        res = self.resolution
        xs, ys, zs = [], [], []
        xe, ye, ze = [], [], []
        for (x, y, z) in posts:
            xs.append(x * res); ys.append(y * res); zs.append(z * res)
            xe.append(x * res + res - 1); ye.append(y * res + res - 1); ze.append(z * res + res - 1)
        for (x0, y0, z0, x1, y1, z1) in boxes:
            xs.append(x0 * res); ys.append(y0 * res); zs.append(z0 * res)
            xe.append(x1 * res + res - 1); ye.append(y1 * res + res - 1); ze.append(z1 * res + res - 1)
        return (min(xs), min(ys), min(zs)), (max(xe), max(ye), max(ze))

    def to_dense(self, registry: MaterialRegistry, size) -> np.ndarray:
        """Compile to a dense uint16 material-id grid of shape ``size``.

        World cell (x, y, z) in [0, size) gets the id of its material; empty
        cells get 0. The r-cube expansion of get_voxels is applied, i.e. the
        dense grid is in full-resolution world cells.
        """
        grid = np.zeros(tuple(int(s) for s in size), dtype=np.uint16)
        for (x, y, z), mat in self.get_voxels().items():
            if 0 <= x < grid.shape[0] and 0 <= y < grid.shape[1] and 0 <= z < grid.shape[2]:
                grid[x, y, z] = registry.register(mat)
        return grid
