"""BASELINE config 5: chunked flythrough with culling and physics-displaced
voxels — dynamic-grid consistency.

The strong invariant: after any number of engine frames (camera motion,
physics displacement, chunk re-bakes, culling churn), rendering with the
engine's *incrementally maintained* device arrays must equal rendering with
arrays *compiled fresh* from the current scene state. This is the TPU
equivalent of the reference's chunk-rebuild-equivalence check
(SURVEY.md §4 item 5) and catches stale-bake/invalidation bugs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from python_raytracer_tpu.models.default import build_default_scene, default_settings
from python_raytracer_tpu.ops.render import render_frame
from python_raytracer_tpu.runtime.engine import Engine
from python_raytracer_tpu.scene.compile import bake_chunks, build_world_ids


def test_incremental_bake_matches_fresh_compile():
    st = default_settings().replace(width=16, height=12, dof=0.0, lod_random=0.0,
                                    static=False, culling=True)
    scene = build_default_scene(st)
    engine = Engine(scene)

    # Fly: rotate & push the player while frames advance (physics displaces
    # it; chunk updates run at chunk_rate).
    for i in range(10):
        engine.apply_input((0, 0, 1), (0, 15, 0), (0, 0), dt=1 / 24)
        engine.step(1 / 24)

    # Fresh world build + bake from the *current* object states with the same
    # traversed mask must reproduce the engine's arrays bit-for-bit.
    world = build_world_ids(scene, engine.compiled.spec, engine.compiled.registry,
                            engine.cam_pos)
    baked, chunk_res, cell_word = jax.jit(bake_chunks, static_argnums=(0, 1))(
        engine.compiled.spec, st, jnp.asarray(world),
        jnp.asarray(engine.cam_pos, jnp.float32), engine._traversed,
        engine.compiled.arrays.mat_bits,
    )
    # The engine may have pending redraws not yet consumed (chunk_rate gate);
    # force one chunk tick to flush, then compare.
    engine.timer = st.chunk_time
    engine.chunk_update(st.chunk_time)
    np.testing.assert_array_equal(
        np.asarray(engine.compiled.arrays.cell_word), np.asarray(cell_word)
    )

    # And the rendered image from those arrays matches a direct render.
    img_engine, _ = render_frame(
        st, engine.compiled.spec, engine.compiled.arrays, engine.cam_pos,
        engine.cam_rot, key=jax.random.PRNGKey(5),
    )
    arrays_fresh = dataclasses.replace(
        engine.compiled.arrays, baked_ids=baked, chunk_res=chunk_res, cell_word=cell_word
    )
    img_fresh, _ = render_frame(
        st, engine.compiled.spec, arrays_fresh, engine.cam_pos,
        engine.cam_rot, key=jax.random.PRNGKey(5),
    )
    np.testing.assert_array_equal(np.asarray(img_engine), np.asarray(img_fresh))


def test_culling_changes_with_camera():
    st = default_settings().replace(width=16, height=12, culling=True, static=False)
    scene = build_default_scene(st)
    engine = Engine(scene)
    engine.step(1 / 24)
    engine.timer = st.chunk_time
    engine.chunk_update(st.chunk_time)
    active_before = int((np.asarray(engine.compiled.arrays.chunk_res) > 0).sum())

    # Turn the camera around: different chunks become visible.
    engine.scene.player.rotate((0, 180, 0))
    for _ in range(3):
        engine.step(1 / 24)
    engine.timer = st.chunk_time
    engine.chunk_update(st.chunk_time)
    active_after = int((np.asarray(engine.compiled.arrays.chunk_res) > 0).sum())
    assert active_before > 0 and active_after > 0
    trav = np.asarray(engine._traversed)
    assert trav.sum() < trav.size, "culling should keep only traversed chunks"


def test_material_refresh_retints():
    st = default_settings().replace(width=16, height=12, dof=0.0, static=False)
    scene = build_default_scene(st)
    # pipeline=False: compare the frame rendered *after* the retint (the
    # default async pipeline hands back the previous frame, init.py:193-205
    # semantics).
    engine = Engine(scene, pipeline=False)
    img1 = engine.step(1 / 24)
    # Retint every registered material (reference README.md:77 semantics)
    for i in range(1, len(engine.compiled.registry)):
        mat = engine.compiled.registry.material(i)
        mat.albedo = (255, 0, 0)
    engine.refresh_materials()
    engine.canvas = jnp.zeros_like(engine.canvas)
    img2 = engine.step(1 / 24)
    assert not np.allclose(img1, img2)
