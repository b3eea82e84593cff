"""Scene compiler: authored Scene -> device-resident arrays.

This is the TPU-first replacement for the reference's per-frame chunk
pipeline. The reference rebuilds Python ``Frame`` dicts per chunk and ships
the whole chunk dict to every worker with every dispatch (reference
``init.py:389-452`` build, ``init.py:205`` pickle broadcast). Here the world
is compiled ONCE into dense device arrays and updated incrementally:

* ``world_ids``  — uint16 material-id grid at full voxel resolution, the
  composite of all visible objects' sprites (reference pass 1+2,
  init.py:398-446);
* ``chunk_res``  — per-chunk march resolution (lod+1), 0 = chunk absent
  (empty / culled), implementing distance LOD select + occlusion culling
  (reference pass 3, init.py:447-452);
* ``baked_ids``  — the grid the marcher actually reads: every cell holds the
  id its chunk's LOD decimation would return, i.e.
  ``baked[w] = world[(w // r) * r]`` masked to the chunk (the dense
  equivalent of Frame.get_voxel at resolution r, reference data.py:136-145
  with storage filtering data.py:163-175);
* ``material_table`` — the differentiable [K, NUM_PARAMS] float32 table.

``bake_chunks`` is jittable and cheap (one reshape-reduce + one gather over
the grid), so LOD/culling updates run on device at chunk_rate without
recompilation — no per-frame host->device scene transfer.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.scene.material import MaterialRegistry, NUM_PARAMS
from python_raytracer_tpu.scene.scene import Scene


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Static geometry of the compiled world grid (hashable, jit-static)."""

    origin: Tuple[int, int, int]  # world coords of grid cell (0,0,0); chunk-aligned
    shape: Tuple[int, int, int]  # grid extent in voxels; multiple of chunk_size
    chunk_size: int
    num_lods: int  # chunk_lod + 1 lod levels, resolutions 1..num_lods

    @property
    def chunk_shape(self) -> Tuple[int, int, int]:
        cs = self.chunk_size
        return (self.shape[0] // cs, self.shape[1] // cs, self.shape[2] // cs)

    @property
    def num_cells(self) -> int:
        return self.shape[0] * self.shape[1] * self.shape[2]

    @property
    def num_chunks(self) -> int:
        c = self.chunk_shape
        return c[0] * c[1] * c[2]

    def cell_flat(self, gx, gy, gz):
        """Flatten grid-cell indices (arrays ok) to 1D for fast gathers."""
        return (gx * self.shape[1] + gy) * self.shape[2] + gz

    def chunk_flat(self, cx, cy, cz):
        c = self.chunk_shape
        return (cx * c[1] + cy) * c[2] + cz


# cell_word bit layout: one int32 per grid cell carrying everything the
# marcher needs in a single 1D gather (TPU gathers of full rows are slow;
# element gathers are fast — see bench notes in ops/march.py).
WORD_ID_BITS = 12          # material id (0 = empty / inactive chunk)
WORD_RES_BITS = 3          # chunk resolution 0..7 (0 = no chunk)
WORD_SKIP_BITS = 5         # Chebyshev empty-space distance, capped
WORD_ID_MASK = (1 << WORD_ID_BITS) - 1
WORD_RES_SHIFT = WORD_ID_BITS
WORD_RES_MASK = (1 << WORD_RES_BITS) - 1
WORD_SKIP_SHIFT = WORD_ID_BITS + WORD_RES_BITS
WORD_SKIP_MASK = (1 << WORD_SKIP_BITS) - 1
WORD_IORCLS_SHIFT = 20     # 4-bit IOR equality class (0 = ior 0 / no branch)
WORD_IORCLS_MASK = 0xF
WORD_ROUGH_SHIFT = 24      # 1 bit: authored roughness != 0 (RNG draw count)
WORD_FACE_SHIFT = 25       # 6 bits: per-face IOR flip decision, precomputed
# face bit index = WORD_FACE_SHIFT + axis*2 + (0 if + neighbor else 1)
SKIP_CAP = 15              # max useful skip distance (<= chunk_size)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SceneArrays:
    """Device arrays the renderer reads. A pytree; ``material_table`` is the
    differentiable leaf."""

    world_ids: jax.Array  # uint16 [X, Y, Z]
    baked_ids: jax.Array  # int32 flat [X*Y*Z]
    chunk_res: jax.Array  # int32 flat [CX*CY*CZ]
    cell_word: jax.Array  # int32 flat [X*Y*Z]: id | res<<12 | skip<<15
    material_table: jax.Array  # float32 [K, NUM_PARAMS]
    has_roughness: jax.Array  # int32 [K]
    has_ior: jax.Array  # int32 [K]
    program: jax.Array  # int32 [K]
    mat_bits: jax.Array  # int32 [K]: ior_class | has_roughness << 4


@dataclasses.dataclass
class CompiledScene:
    spec: GridSpec
    arrays: SceneArrays
    registry: MaterialRegistry
    background: Optional[str]
    # Static tuple of material program ids present in the scene; the march
    # dispatches over exactly these (ops/programs.py dispatch).
    programs_used: Tuple[int, ...] = (0,)


def _snap(v: int, unit: int) -> int:
    return (v // unit) * unit


def compute_grid_spec(scene: Scene, margin_chunks: int = 2) -> GridSpec:
    """World bounds = union of object AABBs, chunk-aligned, plus margin for
    object movement. Object content spans [mins, maxs) (reference
    init.py:413-414 clips voxel gather to that box)."""
    cfg = scene.settings
    cs = cfg.chunk_size
    mins = [0, 0, 0]
    maxs = [cs, cs, cs]
    first = True
    for obj in scene.objects.values():
        if obj.sprite is None:
            continue
        if first:
            mins = list(obj.mins)
            maxs = list(obj.maxs)
            first = False
        else:
            mins = [min(a, b) for a, b in zip(mins, obj.mins)]
            maxs = [max(a, b) for a, b in zip(maxs, obj.maxs)]
    lo = [_snap(m, cs) - margin_chunks * cs for m in mins]
    hi = [_snap(m, cs) + cs + margin_chunks * cs for m in maxs]
    shape = tuple(h - l for l, h in zip(lo, hi))
    return GridSpec(
        origin=tuple(lo), shape=shape, chunk_size=cs, num_lods=cfg.chunk_lod + 1
    )


def build_world_ids(scene: Scene, spec: GridSpec, registry: MaterialRegistry,
                    cam_pos=None) -> np.ndarray:
    """Composite all (visible) objects' dense sprite grids into the world grid.

    Objects are scattered in registry insertion order with non-empty voxels
    overriding, matching the reference's chunk merge where later objects'
    dicts override earlier ones (init.py:437-439). Visibility: when cam_pos
    is given, objects farther than dist_max + max(size) are excluded
    (reference data.py:569).
    """
    world = np.zeros(spec.shape, dtype=np.uint16)
    cfg = scene.settings
    for obj in scene.objects.values():
        if obj.sprite is None:
            continue
        if cam_pos is not None:
            dist = math.dist(obj.pos, cam_pos)
            if dist > cfg.dist_max + max(obj.size):
                continue
        dense = obj.sprite.to_dense(registry, None, obj.rot)  # active frame
        lo = [m - o for m, o in zip(obj.mins, spec.origin)]
        # Content spans [mins, maxs) — at fractional positions the reference
        # box shrinks to 2*size-1 cells (mins=ceil-size, maxs=floor+size,
        # data.py:485-486) and the voxel gather drops the far shell
        # (init.py:413-414 range excludes maxs); clip the paste the same way.
        hi = [min(l + s, mx - o)
              for l, s, mx, o in zip(lo, dense.shape, obj.maxs, spec.origin)]
        # Clip to grid
        src_lo = [max(0, -l) for l in lo]
        dst_lo = [max(0, l) for l in lo]
        dst_hi = [min(spec.shape[i], hi[i]) for i in range(3)]
        if any(dst_hi[i] <= dst_lo[i] for i in range(3)):
            continue
        src_hi = [src_lo[i] + (dst_hi[i] - dst_lo[i]) for i in range(3)]
        src = dense[src_lo[0] : src_hi[0], src_lo[1] : src_hi[1], src_lo[2] : src_hi[2]]
        dst = world[dst_lo[0] : dst_hi[0], dst_lo[1] : dst_hi[1], dst_lo[2] : dst_hi[2]]
        np.copyto(dst, src, where=src > 0)
    return world


def bake_chunks(spec: GridSpec, settings: Settings, world_ids, cam_pos, traversed,
                mat_bits=None):
    """Device-side chunk LOD select + culling + LOD bake (jittable).

    Args:
      world_ids: uint16 [X, Y, Z] full-res composite grid.
      cam_pos: f32 [3] camera position (chunk LOD distance reference,
        reference init.py:448-449).
      traversed: bool [CX, CY, CZ] chunks crossed by rays last frame, the
        occlusion-culling feedback (reference init.py:447). Ignored when
        culling is off.

    Returns:
      (baked_ids int32 flat [X*Y*Z], chunk_res int32 flat [CX*CY*CZ])
    """
    cs = spec.chunk_size
    CX, CY, CZ = spec.chunk_shape
    X, Y, Z = spec.shape
    origin = jnp.array(spec.origin, dtype=jnp.float32)

    occupied = (world_ids > 0).reshape(CX, cs, CY, cs, CZ, cs).any(axis=(1, 3, 5))

    # Distance LOD per chunk: lod = min(trunc(dist(corner + radius, cam) /
    # (dist_max / (1 + chunk_lod))), chunk_lod)  (reference init.py:448-449)
    cxi = jax.lax.broadcasted_iota(jnp.float32, (CX, CY, CZ), 0)
    cyi = jax.lax.broadcasted_iota(jnp.float32, (CX, CY, CZ), 1)
    czi = jax.lax.broadcasted_iota(jnp.float32, (CX, CY, CZ), 2)
    corner = jnp.stack([cxi, cyi, czi], axis=-1) * cs + origin
    center = corner + settings.chunk_radius
    dist = jnp.linalg.norm(center - cam_pos, axis=-1)
    lod_div = settings.dist_max / (1 + settings.chunk_lod)
    lod = jnp.minimum(jnp.trunc(dist / lod_div), settings.chunk_lod).astype(jnp.int32)
    res = lod + 1

    if settings.culling:
        active = occupied & traversed
    else:
        active = occupied
    chunk_res = jnp.where(active, res, 0)

    # LOD bake: cell at absolute world pos w reads world[(w // r) * r] where r
    # is its chunk's resolution, masked to the chunk (a chunk Frame only
    # stores voxels inside its own box — reference init.py:417-424 gather +
    # data.py:163-175 resolution filtering).
    gx = jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 0)
    gy = jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 1)
    gz = jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 2)
    iorigin = jnp.array(spec.origin, dtype=jnp.int32)
    w = jnp.stack([gx, gy, gz], axis=-1) + iorigin  # absolute world coords
    r = jnp.repeat(jnp.repeat(jnp.repeat(res, cs, 0), cs, 1), cs, 2)[..., None]  # [X,Y,Z,1]
    src_w = jnp.floor_divide(w, r) * r
    corner_w = jnp.floor_divide(w, cs) * cs
    valid = jnp.all(src_w >= corner_w, axis=-1)  # src within own chunk (src <= w always)
    src_g = src_w - iorigin
    src_flat = (src_g[..., 0] * Y + src_g[..., 1]) * Z + src_g[..., 2]
    baked = jnp.where(valid, world_ids.reshape(-1)[src_flat].astype(jnp.int32), 0)

    # Pack the marcher's per-cell word: id (zeroed in inactive chunks so the
    # marcher and the skip field see only renderable voxels), the chunk's
    # resolution, and the Chebyshev distance to the nearest renderable voxel
    # for empty-space skipping (the dense generalization of the reference's
    # void skip, init.py:114).
    active_cell = jnp.repeat(jnp.repeat(jnp.repeat(chunk_res, cs, 0), cs, 1), cs, 2)
    vis_id = jnp.where(active_cell > 0, baked, 0)
    skip = _skip_field(vis_id > 0)
    word = vis_id | (active_cell << WORD_RES_SHIFT) | (skip << WORD_SKIP_SHIFT)
    if mat_bits is not None:
        # Per-material discrete bits (IOR class, roughness flag) folded into
        # the word so the marcher needs no per-material flag gathers.
        cellbits = mat_bits[vis_id]
        word = word | (cellbits << WORD_IORCLS_SHIFT)

        # Precomputed per-face IOR flip decisions (reference init.py:97-111):
        # for each of the 6 axis neighbors, flip iff the neighbor is empty or
        # its IOR differs ("a material considers its neighbors solid if they
        # have the same IOR", init.py:89). A hit cell always lies inside its
        # chunk's content, so its neighbors read their true cells — the
        # active-chunk hysteresis can only differ at measure-zero exact
        # boundary positions (analysis in ops/march.py notes). This removes
        # every neighbor gather from the march inner loop.
        cls_grid = cellbits & WORD_IORCLS_MASK
        occ = vis_id > 0
        for axis in range(3):
            for sign_idx, shift in ((0, +1), (1, -1)):  # bit 0: + neighbor
                # neighbor value at p is grid[p + (+1|-1) on axis]
                n_occ = jnp.roll(occ, -shift, axis=axis)
                n_cls = jnp.roll(cls_grid, -shift, axis=axis)
                # roll wraps; mask the wrapped border to "empty neighbor"
                idx = jax.lax.broadcasted_iota(jnp.int32, occ.shape, axis)
                dim = occ.shape[axis]
                valid = (idx + shift >= 0) & (idx + shift < dim)
                flip = (~n_occ) | (n_cls != cls_grid) | (~valid)
                bit = WORD_FACE_SHIFT + axis * 2 + sign_idx
                word = word | (flip.astype(jnp.int32) << bit)
    return baked.reshape(-1), chunk_res.reshape(-1), word.reshape(-1)


def _skip_field(occupied):
    """Chebyshev empty-space distance, capped — single-pass Pallas kernel on
    TPU (ops/pallas_dt.py: one HBM read + write vs the XLA relaxation's ~45
    grid passes), XLA reduce_window fallback elsewhere. Equality asserted in
    tests/test_pallas_dt.py (interpret) and tools/tpu_checks.py (hardware).
    """
    if jax.default_backend() == "tpu" and occupied.shape[0] % 16 == 0:
        from python_raytracer_tpu.ops.pallas_dt import cheb_distance_pallas

        return cheb_distance_pallas(occupied, cap=SKIP_CAP, tile=16)
    return _cheb_distance(occupied, SKIP_CAP)


def _cheb_distance(occupied, cap: int):
    """Chebyshev distance transform, clamped to ``cap``.

    Iterative relaxation: D <- min(D, 3x3x3-minpool(D) + 1), done with three
    separable 1D min reduce_windows per round; after k rounds distances up to
    k are exact, everything farther saturates at cap.
    """
    big = jnp.int32(cap)
    d = jnp.where(occupied, jnp.int32(0), big)

    def minpool1(x, axis):
        return jax.lax.reduce_window(
            x, jnp.int32(2**30), jax.lax.min,
            window_dimensions=[3 if i == axis else 1 for i in range(3)],
            window_strides=[1, 1, 1],
            padding=[(1, 1) if i == axis else (0, 0) for i in range(3)],
        )

    def body(_, d):
        m = minpool1(minpool1(minpool1(d, 0), 1), 2)
        return jnp.minimum(d, jnp.minimum(m + 1, big))

    return jax.lax.fori_loop(0, cap, body, d)


def compile_scene(scene: Scene, margin_chunks: int = 2, cam_pos=None,
                  traversed: Optional[np.ndarray] = None) -> CompiledScene:
    """Full host-side compile: registry + world grid + initial bake.

    ``traversed`` defaults to all-True so a single compiled frame renders the
    whole world even with culling enabled (the reference reaches that state
    after its first chunk_update feedback cycle, init.py:447).
    """
    spec = compute_grid_spec(scene, margin_chunks)
    registry = MaterialRegistry()
    world = build_world_ids(scene, spec, registry, cam_pos)
    table = registry.table()
    flags = registry.flags()
    mat_bits = flags["ior_class"] | (flags["has_roughness"] << 4)

    if traversed is None:
        traversed_arr = jnp.ones(spec.chunk_shape, dtype=bool)
    else:
        traversed_arr = jnp.asarray(traversed, dtype=bool)
    cam = jnp.zeros((3,), jnp.float32) if cam_pos is None else jnp.asarray(cam_pos, jnp.float32)

    world_dev = jnp.asarray(world)
    baked, chunk_res, cell_word = jax.jit(bake_chunks, static_argnums=(0, 1))(
        spec, scene.settings, world_dev, cam, traversed_arr, jnp.asarray(mat_bits)
    )
    arrays = SceneArrays(
        world_ids=world_dev,
        baked_ids=baked,
        chunk_res=chunk_res,
        cell_word=cell_word,
        material_table=jnp.asarray(table),
        has_roughness=jnp.asarray(flags["has_roughness"]),
        has_ior=jnp.asarray(flags["has_ior"]),
        program=jnp.asarray(flags["program"]),
        mat_bits=jnp.asarray(mat_bits),
    )
    programs_used = tuple(sorted(set(int(x) for x in flags["program"]))) or (0,)
    return CompiledScene(
        spec=spec, arrays=arrays, registry=registry,
        background=scene.background, programs_used=programs_used,
    )
