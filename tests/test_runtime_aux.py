"""Aux subsystems: checkpoint/resume round-trip, Goxel export round-trip,
metrics (SURVEY.md §5.1, §5.4)."""

import os

import numpy as np
import pytest

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.scene import Material, Scene, Sprite


def test_goxel_export_import_roundtrip(tmp_path):
    st = Settings()
    scene = Scene(st)
    with scene:
        m = Material(albedo=(18, 52, 86), solidity=1)  # 0x123456
        spr = Sprite(size=(6, 6, 6), frames=1)
        rng = np.random.default_rng(0)
        vox = {}
        for _ in range(30):
            p = (int(rng.integers(0, 6)), int(rng.integers(0, 6)), int(rng.integers(0, 6)))
            vox[p] = m
        spr.get_frame(0).set_voxels(vox, True)

    from python_raytracer_tpu.runtime.checkpoint import export_goxel

    path = str(tmp_path / "model.txt.gz")
    export_goxel(spr, path)

    spr2 = Sprite(size=(6, 6, 6), frames=1)
    m2 = Material(albedo=(18, 52, 86), solidity=1)
    spr2.load([path], {"123456": m2})
    got = set(spr2.get_frame(0).get_voxels().keys())
    want = set(vox.keys())
    assert got == want


def test_checkpoint_roundtrip(tmp_path):
    from python_raytracer_tpu.models.default import build_default_scene, default_settings
    from python_raytracer_tpu.runtime.checkpoint import restore_checkpoint, save_checkpoint
    from python_raytracer_tpu.runtime.engine import Engine

    st = default_settings().replace(width=16, height=12, dof=0.0)
    engine = Engine(build_default_scene(st))
    img_before = engine.step(1 / 24)
    engine.step(1 / 24)
    table_before = np.asarray(engine.compiled.arrays.material_table)
    player_pos = engine.scene.player.pos

    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, engine)

    # fresh engine from the same mod; state must restore
    engine2 = Engine(build_default_scene(st))
    engine2.scene.player.move((0, 50, 0))  # perturb
    restore_checkpoint(ckpt, engine2)
    np.testing.assert_array_equal(
        np.asarray(engine2.compiled.arrays.material_table), table_before
    )
    # restored buffers must be fresh copies, not aliases of engine 1's
    # (donation/aliasing sanitizer, utils/debug.py)
    from python_raytracer_tpu.utils.debug import check_no_aliasing

    check_no_aliasing(engine.compiled.arrays.material_table,
                      engine2.compiled.arrays.material_table)
    assert engine2.scene.player.pos == player_pos
    assert engine2.frame_index == engine.frame_index
    np.testing.assert_array_equal(np.asarray(engine2.canvas), np.asarray(engine.canvas))


def test_march_stats_and_metric_log(capsys):
    import jax.numpy as jnp

    from python_raytracer_tpu.ops.march import MarchResult
    from python_raytracer_tpu.utils.metrics import MarchStats, MetricLog, trace_scope

    res = MarchResult(
        color=jnp.zeros((10, 3)), energy=jnp.zeros(10), bounces=jnp.full(10, 2.0),
        step=jnp.full(10, 30.0), pos=jnp.zeros((10, 3)), vel=jnp.zeros((10, 3)),
        traversed=jnp.zeros(1, bool), hits=None,
    )
    stats = MarchStats.from_result(res, 0.001)
    assert stats.mrays_per_s == pytest.approx(0.01)
    assert stats.mean_steps == 30.0

    log = MetricLog()
    with trace_scope("test"):
        log.log("bench", mrays=stats.mrays_per_s)
    out = capsys.readouterr().out
    assert '"event": "bench"' in out


def test_training_interruption_resume_equivalence(tmp_path):
    """Failure recovery (SURVEY.md §5.3): a training run checkpointed at step
    k and resumed in a fresh process-state must produce the same table as an
    uninterrupted run — steps are re-runnable from checkpoints."""
    import jax
    import jax.numpy as jnp
    import optax

    from python_raytracer_tpu.config import Settings
    from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
    from python_raytracer_tpu.parallel.train import make_train_step
    from python_raytracer_tpu.scene import Material, Object, Scene, Sprite
    from python_raytracer_tpu.scene.compile import compile_scene

    st = Settings(width=8, height=8, dist_max=16, max_light=1, max_bounces=2,
                  exact=False)
    scene = Scene(st)
    with scene:
        m = Material(albedo=(200, 100, 50), roughness=0, absorption=1, ior=1,
                     energy=0, solidity=1)
        spr = Sprite(size=(8, 8, 8), frames=1)
        spr.get_frame(0).set_voxels(
            {(x, y, 0): m for x in range(8) for y in range(8)}, True)
        o = Object(pos=(0, 0, 8))
        o.set_sprite(spr)
    cs = compile_scene(scene, cam_pos=np.zeros(3))
    dirs, detail = pixel_grid(st, jnp.float32)
    rays = generate_rays(st, jnp.zeros(3, jnp.float32),
                         jnp.array([0, 0, 0, 1], jnp.float32), dirs, detail)
    target = jnp.full((rays.pos.shape[0], 3), 0.3, jnp.float32)
    opt = optax.adam(0.01)
    step = make_train_step(st, cs.spec, opt)
    key = jax.random.PRNGKey(0)

    # Uninterrupted: 6 steps
    arrays_a, opt_a = cs.arrays, opt.init(cs.arrays.material_table)
    for i in range(6):
        arrays_a, opt_a, _ = step(arrays_a, opt_a, rays, target, jax.random.fold_in(key, i))

    # Interrupted at 3: checkpoint table+opt state, restore, continue
    import orbax.checkpoint as ocp

    arrays_b, opt_b = cs.arrays, opt.init(cs.arrays.material_table)
    for i in range(3):
        arrays_b, opt_b, _ = step(arrays_b, opt_b, rays, target, jax.random.fold_in(key, i))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(str(tmp_path / "t"), {"table": arrays_b.material_table, "opt": opt_b},
               force=True)
    restored = ckptr.restore(str(tmp_path / "t"))
    import dataclasses as dc

    arrays_c = dc.replace(cs.arrays, material_table=jnp.asarray(restored["table"]))
    # Orbax returns plain containers; rebuild the optimizer state's pytree
    # structure from a template (standard optax restore pattern).
    treedef = jax.tree_util.tree_structure(opt.init(cs.arrays.material_table))
    opt_c = jax.tree_util.tree_unflatten(
        treedef,
        [jnp.asarray(x) for x in jax.tree_util.tree_leaves(restored["opt"])],
    )
    for i in range(3, 6):
        arrays_c, opt_c, _ = step(arrays_c, opt_c, rays, target, jax.random.fold_in(key, i))

    np.testing.assert_allclose(
        np.asarray(arrays_a.material_table), np.asarray(arrays_c.material_table),
        rtol=0, atol=0,
    )
