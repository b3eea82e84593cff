"""Jitted batched physics (physics/jit_engine.py) vs the host oracle.

The host path (physics/engine.py) is bit-exact against the reference
(tests/test_physics.py golden rollout); the jitted step must reproduce the
host path's trajectories bit-for-bit on deterministic-solidity scenes
(every default-scene material has solidity 1 — rolls cannot change
outcomes), which transitively matches the reference golden."""

import os

import numpy as np
import pytest

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.models.default import build_default_scene, default_settings
from python_raytracer_tpu.scene import Material, Object, Scene, Sprite

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden",
                      "physics_rollout.npz")


def _tick_without_physics(scene, cam_pos):
    """Host-side per-frame bookkeeping (visibility/anim/weight) with the
    physics sub-step masked off — the jitted step replaces exactly that."""
    for o in list(scene.objects.values()):
        flag = o.physics
        o.physics = False
        try:
            o.update(cam_pos, 0.0)
        finally:
            o.physics = flag


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="physics golden not generated")
def test_jit_rollout_matches_host_and_golden():
    from python_raytracer_tpu.physics.jit_engine import step_scene

    ref = np.load(GOLDEN)["rollout"]  # [T, n_obj, 2, 3]
    st = default_settings()
    scene_h = build_default_scene(st)
    scene_j = build_default_scene(st)
    order_h = list(scene_h.objects.keys())
    order_j = list(scene_j.objects.keys())
    T = ref.shape[0]
    batch = fn = None
    got = np.zeros_like(ref)
    for t in range(T):
        cam_h = scene_h.player.cam_pos
        for oid in order_h:
            scene_h.objects[oid].update(cam_h, 0.0)
        cam_j = scene_j.player.cam_pos
        _tick_without_physics(scene_j, cam_j)
        batch, fn = step_scene(scene_j, batch, fn)
        for i, (oh, oj) in enumerate(zip(order_h, order_j)):
            h = scene_h.objects[oh]
            j = scene_j.objects[oj]
            np.testing.assert_array_equal(
                np.asarray(j.pos, np.float64), np.asarray(h.pos, np.float64),
                err_msg=f"pos diverged at frame {t} object {i}")
            np.testing.assert_array_equal(
                np.asarray(j.vel, np.float64), np.asarray(h.vel, np.float64),
                err_msg=f"vel diverged at frame {t} object {i}")
            got[t, i, 0] = j.pos
            got[t, i, 1] = j.vel
    np.testing.assert_array_equal(got, ref)


def test_jit_velocity_transfer_matches_host():
    from python_raytracer_tpu.physics.engine import update_physics
    from python_raytracer_tpu.physics.jit_engine import step_scene

    def build():
        st = Settings(gravity=0.0, friction=1, friction_air=0,
                      min_velocity=0, max_velocity=10, dist_max=64,
                      dist_move=64)
        scene = Scene(st)
        with scene:
            heavy = Material(albedo=(255, 0, 0), solidity=1, weight=10.0,
                             friction=0, elasticity=0)
            light = Material(albedo=(0, 255, 0), solidity=1, weight=0.001,
                             friction=0, elasticity=0)

            def cube(mat):
                s = Sprite(size=(2, 2, 2), frames=1)
                s.get_frame(0).set_voxels(
                    {(x, y, z): mat for x in range(2) for y in range(2)
                     for z in range(2)}, True)
                return s

            a = Object(pos=(0, 0, 0), physics=True)
            a.set_sprite(cube(heavy))
            b = Object(pos=(3, 0, 0), physics=True)
            b.set_sprite(cube(light))
            a.visible = b.visible = True
            a.vel = (2.0, 0.0, 0.0)
        return scene

    sh = build()
    ah, bh = list(sh.objects.values())
    update_physics(ah, sh)
    update_physics(bh, sh)

    sj = build()
    step_scene(sj)
    aj, bj = list(sj.objects.values())
    np.testing.assert_array_equal(np.asarray(aj.pos), np.asarray(ah.pos))
    np.testing.assert_array_equal(np.asarray(aj.vel), np.asarray(ah.vel))
    np.testing.assert_array_equal(np.asarray(bj.pos), np.asarray(bh.pos))
    np.testing.assert_array_equal(np.asarray(bj.vel), np.asarray(bh.vel))
    assert bj.vel[0] > 0 and aj.vel[0] < 2.0
