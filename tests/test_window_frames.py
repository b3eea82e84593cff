"""Multi-frame golden: the Window-loop cadence vs the reference.

Validates the full occlusion-culling feedback cycle end-to-end against the
real reference engine: first frames render pure sky (no chunks assigned),
ray feedback populates the traversed set, the chunk_rate timer triggers the
assignment pass, and the scene appears — frame-by-frame bit-exact
(reference init.py:455-471 loop; golden from
tools/reference_oracle.render_window_frames)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from python_raytracer_tpu.models.default import build_default_scene, default_settings
from python_raytracer_tpu.ops.render import render_frame
from python_raytracer_tpu.scene.compile import bake_chunks, compile_scene
from python_raytracer_tpu.utils.tape import make_static_tape

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden",
                      "window_frames.npz")


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden not generated")
def test_window_loop_culling_cadence_exact():
    import dataclasses

    import jax

    g = np.load(GOLDEN)
    ref_frames = g["frames"]
    ref_updates = set(int(i) for i in g["updates"])
    n_frames = ref_frames.shape[0]
    dt = 1 / 24

    st = default_settings().replace(gravity=0.0, dof=0.0, lod_random=0.0)
    scene = build_default_scene(st)
    cam_pos = np.array(scene.player.cam_pos)
    cam_rot = np.array(scene.player.cam_rot)
    cs = compile_scene(scene, cam_pos=cam_pos)
    tape = make_static_tape(st)

    bake = jax.jit(bake_chunks, static_argnums=(0, 1))
    # Start like the reference: culling on, nothing traversed -> no chunks.
    traversed = jnp.zeros(cs.spec.chunk_shape, bool)
    _, res0, word0 = bake(cs.spec, st, cs.arrays.world_ids,
                          jnp.asarray(cam_pos, jnp.float32), traversed,
                          cs.arrays.mat_bits)
    arrays = dataclasses.replace(cs.arrays, chunk_res=res0, cell_word=word0)

    timer = 0.0
    updates = set()
    for fi in range(n_frames):
        img, trav = render_frame(st, cs.spec, arrays, cam_pos, cam_rot,
                                 tape=tape, record_traversed=True,
                                 dtype=jnp.float64,
                                 programs_used=cs.programs_used)
        img = np.asarray(img)
        diff = np.abs(img - ref_frames[fi]).max(axis=-1)
        assert int((diff > 0).sum()) == 0, (
            f"frame {fi}: {(diff > 0).sum()} pixels differ (max {diff.max()})"
        )
        traversed = trav

        timer += dt
        if timer >= st.chunk_time:
            timer -= max(st.chunk_time, dt)
            updates.add(fi)
            _, res_i, word_i = bake(cs.spec, st, cs.arrays.world_ids,
                                    jnp.asarray(cam_pos, jnp.float32),
                                    jnp.asarray(traversed), cs.arrays.mat_bits)
            arrays = dataclasses.replace(arrays, chunk_res=res_i, cell_word=word_i)

    assert updates == ref_updates
