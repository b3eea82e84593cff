"""Physics engine vs the reference (SURVEY.md §4 item 5).

The golden rollout (tests/golden/physics_rollout.npz) records 24 frames of
the reference's physics on the default scene — gravity, slab collision
blocking, friction/elasticity accumulation, velocity transfer, terminal/min
velocity handling (reference data.py:495-560). All default-scene materials
have solidity 1, so the rolls are deterministic and the trajectories must
match BIT-EXACTLY (friction/elasticity accumulate in the reference's exact
voxel order — physics/engine.py), which is what lets the motion+physics
multi-frame golden (tests/test_motion_frames.py) compare images exactly.
"""

import os

import numpy as np
import pytest

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.models.default import build_default_scene, default_settings
from python_raytracer_tpu.scene import Material, Object, Scene, Sprite

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "physics_rollout.npz")


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="physics golden not generated")
def test_default_scene_rollout_matches_reference():
    ref = np.load(GOLDEN)["rollout"]  # [T, n_obj, 2, 3]
    scene = build_default_scene(default_settings())
    order = list(scene.objects.keys())
    T = ref.shape[0]
    got = np.zeros_like(ref)
    for t in range(T):
        cam_pos = scene.player.cam_pos
        for oid in order:
            scene.objects[oid].update(cam_pos, 0.0)
        for i, oid in enumerate(order):
            got[t, i, 0] = scene.objects[oid].pos
            got[t, i, 1] = scene.objects[oid].vel
    np.testing.assert_array_equal(got, ref)


def test_velocity_transfer_between_objects():
    """A heavy fast object transfers velocity to a light one on contact
    (reference data.py:523-527)."""
    st = Settings(gravity=0.0, friction=1, friction_air=0, min_velocity=0,
                  max_velocity=10, dist_max=64, dist_move=64)
    scene = Scene(st)
    with scene:
        heavy = Material(albedo=(255, 0, 0), solidity=1, weight=10.0, friction=0, elasticity=0)
        light = Material(albedo=(0, 255, 0), solidity=1, weight=0.001, friction=0, elasticity=0)

        def cube(mat):
            s = Sprite(size=(2, 2, 2), frames=1)
            s.get_frame(0).set_voxels(
                {(x, y, z): mat for x in range(2) for y in range(2) for z in range(2)}, True
            )
            return s

        a = Object(pos=(0, 0, 0), physics=True)
        a.set_sprite(cube(heavy))
        b = Object(pos=(3, 0, 0), physics=True)
        b.set_sprite(cube(light))
        a.visible = b.visible = True
        a.vel = (2.0, 0.0, 0.0)

    from python_raytracer_tpu.physics.engine import update_physics

    update_physics(a, scene)
    assert b.vel[0] > 0, "velocity must transfer to the lighter object"
    assert a.vel[0] < 2.0, "source object loses the transferred velocity"


def test_solid_floor_blocks_and_min_velocity_zeroing():
    st = Settings(gravity=0.5, friction=1, friction_air=0.1, min_velocity=0.01,
                  max_velocity=10, dist_max=64, dist_move=64)
    scene = Scene(st)
    with scene:
        solid = Material(albedo=(200, 200, 200), solidity=1, weight=0.01, friction=0.5, elasticity=0)
        floor_spr = Sprite(size=(16, 2, 16), frames=1)
        floor_spr.get_frame(0).set_voxels(
            {(x, y, z): solid for x in range(16) for y in range(2) for z in range(16)}, True
        )
        floor = Object(pos=(0, -4, 0), physics=False)
        floor.set_sprite(floor_spr)
        box_spr = Sprite(size=(2, 2, 2), frames=1)
        box_spr.get_frame(0).set_voxels(
            {(x, y, z): solid for x in range(2) for y in range(2) for z in range(2)}, True
        )
        box = Object(pos=(0, 2, 0), physics=True)
        box.set_sprite(box_spr)
        floor.visible = box.visible = True

    for _ in range(40):
        box.update((0.0, 0.0, 0.0), 0.0)
    # The box must come to rest on the floor, not tunnel through it.
    assert box.pos[1] > floor.pos[1], (box.pos, box.vel)
    assert abs(box.vel[1]) < 0.2


def test_terminal_velocity_clamp():
    st = Settings(gravity=5.0, friction=1, friction_air=0, min_velocity=0,
                  max_velocity=2.0, dist_max=512, dist_move=512)
    scene = Scene(st)
    with scene:
        m = Material(albedo=(1, 1, 1), solidity=1, weight=1.0, friction=0, elasticity=0)
        s = Sprite(size=(2, 2, 2), frames=1)
        s.get_frame(0).set_voxels({(0, 0, 0): m}, True)
        o = Object(pos=(0, 100, 0), physics=True)
        o.set_sprite(s)
        o.visible = True
    from python_raytracer_tpu.physics.engine import update_physics

    for _ in range(10):
        update_physics(o, scene)
    assert abs(o.vel[1]) <= st.max_velocity + 1e-9
