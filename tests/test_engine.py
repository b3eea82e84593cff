"""Runtime engine integration: frame loop, culling feedback, physics motion,
chunk rebuilds (reference Window semantics, init.py:153-474)."""

import numpy as np
import pytest

from python_raytracer_tpu.models.default import build_default_scene, default_settings
from python_raytracer_tpu.runtime.engine import Engine


@pytest.fixture(scope="module")
def engine():
    # Small frame budget config for test speed: quarter resolution.
    st = default_settings().replace(width=32, height=24, samples=1, dof=0.0)
    scene = build_default_scene(st)
    return Engine(scene)


def test_first_frames_and_culling_feedback(engine):
    img1 = engine.step(1 / 24)
    assert img1 is not None
    st = engine.settings
    assert img1.shape == (st.window_scaled[1], st.window_scaled[0], 4)
    # culling on: first frame rendered with no chunks -> pure sky, but the
    # traversed mask must be populated by ray feedback (init.py:447)
    assert int(np.asarray(engine._traversed).sum()) > 0

    # run past chunk_time so chunks appear, then the image changes
    img2 = None
    for _ in range(6):
        img2 = engine.step(1 / 24)
    active = int(np.asarray(engine.compiled.arrays.chunk_res).max())
    assert active > 0, "chunks should become active after culling feedback"
    assert not np.allclose(img1, img2), "scene should appear after warmup"


def test_physics_objects_fall(engine):
    scene = engine.scene
    movers = [o for o in scene.objects.values() if o.physics]
    before = {o.id: o.pos for o in movers}
    for _ in range(4):
        engine.step(1 / 24)
    # The floating cubes rest on castle geometry (blocked + friction-damped)
    # and distant ones are asleep past dist_move (data.py:575) — but the
    # player hangs in the air and must fall under gravity.
    moved = sum(1 for o in movers if o.pos != before[o.id])
    assert moved >= 1, "gravity should displace at least one physics object"
    assert scene.player.pos[1] < before[scene.player.id][1], "player falls"


def test_chunk_rebuild_after_move(engine):
    scene = engine.scene
    # displaced objects mark redraw; after a chunk tick the world grid updates
    any_redraw = any(o.redraw for o in scene.objects.values())
    engine.step(1.0)  # dt > chunk_time forces a chunk update
    if any_redraw:
        assert all(
            not o.redraw for o in scene.objects.values() if o.visible
        ), "redraw flags consumed by chunk update"


def test_input_impulses(engine):
    player = engine.scene.player
    v0 = player.vel
    engine.apply_input((0, 0, 1), (0, 0, 0), (0, 0), dt=1 / 24)
    assert player.vel != v0, "forward input should accelerate the player"
    r0 = player.rot
    engine.apply_input((0, 0, 0), (0, 10, 0), (0, 0), dt=1 / 24)
    assert player.rot != r0, "rotation input should rotate the player"


def test_static_mode_noise_is_frame_stable():
    """static=true replays the same per-pixel MT tape every frame (reference
    init.py:136-137): the raw render is identical across frames even though
    the RNG key advances."""
    import jax
    import jax.numpy as jnp

    from python_raytracer_tpu.models.default import build_default_scene, default_settings

    st = default_settings().replace(width=16, height=12, static=True, culling=False)
    scene = build_default_scene(st)
    eng = Engine(scene)
    assert eng._static_tape is not None
    f1, _ = eng._render(eng.compiled.arrays, jnp.asarray(eng.cam_pos, jnp.float32),
                        jnp.asarray(eng.cam_rot, jnp.float32), eng.lens,
                        jax.random.PRNGKey(1))
    f2, _ = eng._render(eng.compiled.arrays, jnp.asarray(eng.cam_pos, jnp.float32),
                        jnp.asarray(eng.cam_rot, jnp.float32), eng.lens,
                        jax.random.PRNGKey(999))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_ior_edit_recompiles_classes():
    """Editing a material's IOR across equality-class boundaries at runtime
    must re-bake the cell words (reference behavior: materials are shared by
    reference and edits apply immediately, README.md:77 + init.py:106) —
    the rendered frame must equal a fresh compile of the edited scene."""
    import jax.numpy as jnp

    from conftest import zero_roughness

    # static deterministic config: no gravity, no noise sources, so the two
    # engines below see identical scene state and RNG-independent frames
    st = default_settings().replace(width=32, height=24, samples=1, dof=0.0,
                                    lod_random=0.0, culling=False, gravity=0.0)
    scene = build_default_scene(st)
    zero_roughness(scene)
    engine = Engine(scene, dtype=jnp.float64, pipeline=False)
    engine.step(1 / 24)

    # edit glass-like materials: move every ior=0.25 material to 0.5 —
    # merges its equality class with the scatter materials' class
    edited = []
    for mat in engine.compiled.registry._materials:
        if mat is not None and float(mat.ior) == 0.25:
            mat.ior = 0.5
            edited.append(mat)
    assert edited, "expected an ior=0.25 material in the default scene"

    old_bits = np.asarray(engine.compiled.arrays.mat_bits).copy()
    engine.refresh_materials()
    assert not np.array_equal(np.asarray(engine.compiled.arrays.mat_bits),
                              old_bits), "mat_bits must change"
    img_edit = engine.step(1 / 24)

    # fresh compile of the already-edited scene must render identically
    engine2 = Engine(scene, dtype=jnp.float64, pipeline=False)
    engine2.step(1 / 24)
    img_fresh = engine2.step(1 / 24)
    np.testing.assert_array_equal(np.asarray(engine.last_frame),
                                  np.asarray(engine2.last_frame))
