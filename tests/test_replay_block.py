"""Fused Pallas replay backward (ops/replay_block.py) vs the XLA replay
(ops/diff.py _replay): forward equality and gradient equality on a real hit
tape from the default-scene march. Runs the kernel in interpret mode on the
CPU test backend; the same trace lowers to Mosaic on TPU (tools/tpu_checks.py
covers hardware equality)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from python_raytracer_tpu.models.default import (build_default_scene,
                                                 default_settings)
from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
from python_raytracer_tpu.ops.diff import _replay
from python_raytracer_tpu.ops.march import march
from python_raytracer_tpu.ops.replay_block import (make_replay_block,
                                                   replay_block_supported)
from python_raytracer_tpu.scene.compile import compile_scene


@pytest.fixture(scope="module")
def tape():
    """March a small default-scene batch recording the hit tape."""
    st = default_settings().replace(exact=False, static=False)
    scene = build_default_scene(st)
    cam_pos = np.array(scene.player.cam_pos, np.float32)
    cam_rot = np.array(scene.player.cam_rot, np.float32)
    cs = compile_scene(scene, cam_pos=cam_pos)
    n = 512
    dirs, detail = pixel_grid(st, jnp.float32)
    dirs, detail = dirs[:n], detail[:n]
    key = jax.random.PRNGKey(7)
    u_dof = jax.random.uniform(key, (n, 2), jnp.float32)
    rays = generate_rays(st, jnp.asarray(cam_pos), jnp.asarray(cam_rot),
                         dirs, detail, u_dof)
    rays = rays._replace(
        pos=rays.pos.astype(jnp.float32),
        vel=rays.vel.astype(jnp.float32), life=rays.life.astype(jnp.float32))
    res = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", record_hits=12,
                programs_used=cs.programs_used)
    assert int(jnp.max(res.hits.count)) > 0
    return st, cs, rays, res


def test_forward_matches_xla_replay(tape):
    st, cs, rays, res = tape
    table = cs.arrays.material_table.astype(jnp.float32)
    v0 = rays.vel
    c_ref, e_ref = _replay(table, st, res.hits, v0, "sky",
                           cs.programs_used, cs.arrays.program)
    assert replay_block_supported(cs.programs_used)
    replay = make_replay_block(st, "sky", tile=256, interpret=True)
    c_blk, e_blk = replay(table, res.hits, v0)
    np.testing.assert_allclose(np.asarray(c_blk), np.asarray(c_ref),
                               rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(np.asarray(e_blk), np.asarray(e_ref),
                               rtol=1e-6, atol=1e-6)


def test_forward_matches_march_colors(tape):
    """The fused replay must reproduce the march's own output colors from
    the tape (the bit-exactness property _replay has)."""
    st, cs, rays, res = tape
    table = cs.arrays.material_table.astype(jnp.float32)
    replay = make_replay_block(st, "sky", tile=256, interpret=True)
    c_blk, e_blk = replay(table, res.hits, rays.vel)
    np.testing.assert_allclose(np.asarray(c_blk), np.asarray(res.color),
                               rtol=1e-6, atol=1e-4)


def test_grad_matches_xla_replay(tape):
    st, cs, rays, res = tape
    table = cs.arrays.material_table.astype(jnp.float32)
    v0 = rays.vel
    replay = make_replay_block(st, "sky", tile=256, interpret=True)

    def loss_blk(t):
        color, _ = replay(t, res.hits, v0)
        return jnp.mean(color / 255.0)

    def loss_xla(t):
        color, _ = _replay(t, st, res.hits, v0, "sky",
                           cs.programs_used, cs.arrays.program)
        return jnp.mean(color / 255.0)

    l_b, g_b = jax.value_and_grad(loss_blk)(table)
    l_x, g_x = jax.value_and_grad(loss_xla)(table)
    np.testing.assert_allclose(float(l_b), float(l_x), rtol=1e-6)
    g_b, g_x = np.asarray(g_b), np.asarray(g_x)
    assert np.abs(g_x).max() > 0
    scale = np.abs(g_x).max()
    np.testing.assert_allclose(g_b, g_x, rtol=1e-4, atol=1e-6 * scale)
    # untouched (non-optical) params get exactly zero gradient on both paths
    assert (g_b[:, 7:] == 0).all()


def test_grad_under_jit_and_odd_n(tape):
    """Padding lanes (n not a multiple of the tile) must not contribute."""
    st, cs, rays, res = tape
    table = cs.arrays.material_table.astype(jnp.float32)
    n = 300  # not a multiple of 256
    import dataclasses as dc
    hits = res.hits._replace(
        vid=res.hits.vid[:n], u=res.hits.u[:n], flip=res.hits.flip[:n],
        count=res.hits.count[:n])
    v0 = rays.vel[:n]
    replay = make_replay_block(st, "sky", tile=256, interpret=True)

    def loss_blk(t):
        color, _ = replay(t, hits, v0)
        return jnp.mean(color / 255.0)

    def loss_xla(t):
        color, _ = _replay(t, st, hits, v0, "sky",
                           cs.programs_used, cs.arrays.program)
        return jnp.mean(color / 255.0)

    g_b = jax.jit(jax.grad(loss_blk))(table)
    g_x = jax.jit(jax.grad(loss_xla))(table)
    scale = float(jnp.abs(g_x).max())
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_x),
                               rtol=1e-4, atol=1e-6 * scale)
