"""Multi-frame golden with MOTION: moving player + physics + culling.

The reference Window loop (init.py:455-471) driven end-to-end by
tools/reference_oracle.render_motion_frames: every frame renders, the
chunk_rate timer re-bakes chunks (with per-object rebuild for moved
objects and occlusion culling from ray feedback), every object runs
physics (gravity, collisions — the six cubes fall onto the castle, the
player falls and is pushed forward by a held input impulse). The Engine
must reproduce every frame bit-exactly in float64, plus the exact player
trajectory (physics is bit-exact vs the reference — tests/test_physics.py).

Golden: python3 tools/reference_oracle.py --out tests/golden/motion_frames.npz
            --motion-frames 24 --override dof=0 --override lod_random=0
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from python_raytracer_tpu.models.default import build_default_scene, default_settings
from python_raytracer_tpu.runtime.engine import Engine

from conftest import zero_roughness

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden",
                      "motion_frames.npz")


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden not generated")
@pytest.mark.parametrize("jit_physics", [False, True],
                         ids=["host-physics", "jit-physics"])
def test_motion_physics_culling_frames_exact(jit_physics):
    """jit_physics=True runs every mover's tick as one jitted dispatch
    (physics/jit_engine.py wired into the Engine, VERDICT r4 item 5) — the
    window golden must stay bit-exact either way."""
    g = np.load(GOLDEN)
    ref_frames = g["frames"]
    ref_updates = set(int(i) for i in g["updates"])
    n_frames = ref_frames.shape[0]
    dt = 1 / 24

    st = default_settings().replace(dof=0.0, lod_random=0.0)
    scene = build_default_scene(st)
    zero_roughness(scene)
    engine = Engine(scene, dtype=jnp.float64, pipeline=False,
                    jit_physics=jit_physics)

    updates = set()
    last_timer = engine.timer
    for fi in range(n_frames):
        engine.step(dt)
        if engine.timer < last_timer + dt - 1e-12:  # timer was consumed
            updates.add(fi)
        last_timer = engine.timer

        frame = np.asarray(engine.last_frame)
        diff = np.abs(frame - ref_frames[fi]).max(axis=-1)
        assert int((diff > 0).sum()) == 0, (
            f"frame {fi}: {(diff > 0).sum()} px differ (max {diff.max()}); "
            f"player at {scene.player.pos} vs ref {g['player_pos'][fi]}"
        )

        # trajectory exactness: physics + input impulse (applied below, as
        # the reference applies input after object updates, init.py:471)
        engine.apply_input((0, 0, 1), (0, 0, 0), (0, 0), dt)
        np.testing.assert_array_equal(np.array(scene.player.pos),
                                      g["player_pos"][fi], err_msg=f"frame {fi}")
        np.testing.assert_array_equal(np.array(scene.player.vel),
                                      g["player_vel"][fi], err_msg=f"frame {fi}")

    assert updates == ref_updates
