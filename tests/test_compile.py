"""Scene compiler semantics: the baked grid must agree with the reference's
Frame-based chunk/LOD lookup rules on randomized scenes (SURVEY.md §4 item 5
"chunk rebuild equivalence vs brute-force")."""

import jax
import jax.numpy as jnp
import numpy as np

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.scene import Material, Object, Scene, Sprite
from python_raytracer_tpu.scene.compile import bake_chunks, compile_scene
from python_raytracer_tpu.scene.frame import Frame


def _small_scene(chunk_lod=2, seed=0):
    rng = np.random.default_rng(seed)
    st = Settings(chunk_size=16, chunk_lod=chunk_lod, dist_max=64, culling=False)
    scene = Scene(st)
    with scene:
        mats = [Material(albedo=(i, i, i), solidity=1) for i in range(1, 4)]
        spr = Sprite(size=(20, 12, 8), frames=1)
        vox = {}
        for _ in range(300):
            p = (int(rng.integers(0, 20)), int(rng.integers(0, 12)), int(rng.integers(0, 8)))
            vox[p] = mats[int(rng.integers(0, 3))]
        spr.get_frame(0).set_voxels(vox, True)
        obj = Object(pos=(3, -5, 7))
        obj.set_sprite(spr)
    return scene, obj


def test_baked_matches_frame_lod_semantics():
    """For every grid cell, baked_ids must equal what a reference-style chunk
    Frame at the chunk's resolution would return from get_voxel
    (reference data.py:136-175 storage/lookup rules)."""
    scene, obj = _small_scene()
    cam_pos = np.array([0.0, 0.0, 0.0])
    cs = compile_scene(scene, cam_pos=cam_pos)
    spec = cs.spec
    world = np.asarray(cs.arrays.world_ids)
    baked = np.asarray(cs.arrays.baked_ids).reshape(spec.shape)
    chunk_res = np.asarray(cs.arrays.chunk_res).reshape(spec.chunk_shape)
    csz = spec.chunk_size

    # Brute force: per chunk, rebuild a Frame at the selected resolution from
    # the world voxels and compare every lookup.
    id_to_mat = {}
    for (cx, cy, cz), res in np.ndenumerate(chunk_res):
        lo = np.array(spec.origin) + np.array([cx, cy, cz]) * csz
        sub = world[
            (lo[0] - spec.origin[0]) : (lo[0] - spec.origin[0] + csz),
            (lo[1] - spec.origin[1]) : (lo[1] - spec.origin[1] + csz),
            (lo[2] - spec.origin[2]) : (lo[2] - spec.origin[2] + csz),
        ]
        if res == 0:
            assert sub.max() == 0, "occupied chunk must be active when culling is off"
            continue
        frame = Frame(packed=False, resolution=int(res))
        vox = {}
        for (x, y, z), vid in np.ndenumerate(sub):
            if vid:
                mat = id_to_mat.setdefault(int(vid), Material())
                vox[(int(lo[0] + x), int(lo[1] + y), int(lo[2] + z))] = mat
        frame.set_voxels(vox, True)
        for (x, y, z), _ in np.ndenumerate(sub):
            w = (int(lo[0] + x), int(lo[1] + y), int(lo[2] + z))
            m = frame.get_voxel(w)
            want = 0
            if m is not None:
                want = next(k for k, v in id_to_mat.items() if v is m)
            got = baked[w[0] - spec.origin[0], w[1] - spec.origin[1], w[2] - spec.origin[2]]
            assert got == want, (w, res)


def test_lod_distance_select():
    """Chunk resolution = trunc(dist / (dist_max / (1+lod))) + 1, clamped
    (reference init.py:448-449)."""
    scene, obj = _small_scene()
    st = scene.settings
    # Distance inside visibility (dist_max + obj size, reference data.py:569)
    # but in the top LOD band: lod = trunc(dist / (dist_max / (1 + chunk_lod)))
    # = trunc(~60 / 21.3) = 2 -> resolution 3 (reference init.py:448-449).
    cam_pos = np.array([63.0, -5.0, 7.0])
    cs = compile_scene(scene, cam_pos=cam_pos)
    res = np.asarray(cs.arrays.chunk_res)
    assert res.max() == st.chunk_lod + 1
    # And close up every occupied chunk is full resolution.
    cs2 = compile_scene(scene, cam_pos=np.array([3.0, -5.0, 7.0]))
    res2 = np.asarray(cs2.arrays.chunk_res)
    assert set(np.unique(res2)) <= {0, 1}


def test_culling_masks_chunks():
    scene, obj = _small_scene()
    scene.settings = scene.settings.replace(culling=True)
    cam = np.zeros(3)
    traversed = np.zeros((1, 1, 1), bool)  # wrong shape ok via compile path below
    cs = compile_scene(scene, cam_pos=cam)  # traversed defaults to all-True
    all_active = int((np.asarray(cs.arrays.chunk_res) > 0).sum())
    assert all_active > 0
    none_trav = jnp.zeros(cs.spec.chunk_shape, bool)
    baked, res, _word = jax.jit(bake_chunks, static_argnums=(0, 1))(
        cs.spec, scene.settings, cs.arrays.world_ids, jnp.asarray(cam, jnp.float32), none_trav
    )
    assert int((np.asarray(res) > 0).sum()) == 0


def test_object_overlap_override():
    """Later objects override earlier ones where both have voxels
    (reference init.py:437-439 dict union order)."""
    st = Settings(chunk_size=16, dist_max=64)
    scene = Scene(st)
    with scene:
        m1 = Material(albedo=(1, 1, 1), solidity=1)
        m2 = Material(albedo=(2, 2, 2), solidity=1)
        s1 = Sprite(size=(4, 4, 4), frames=1)
        s1.get_frame(0).set_voxels({(x, y, z): m1 for x in range(4) for y in range(4) for z in range(4)}, True)
        s2 = Sprite(size=(4, 4, 4), frames=1)
        s2.get_frame(0).set_voxels({(0, 0, 0): m2}, True)
        o1 = Object(pos=(0, 0, 0)); o1.set_sprite(s1)
        o2 = Object(pos=(0, 0, 0)); o2.set_sprite(s2)
    cs = compile_scene(scene, cam_pos=np.zeros(3))
    spec = cs.spec
    world = np.asarray(cs.arrays.world_ids)
    g = np.array(o2.mins) - np.array(spec.origin)
    id2 = cs.registry.register(m2)
    assert world[g[0], g[1], g[2]] == id2
