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
