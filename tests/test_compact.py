"""Compacted march == plain march, bit-exact (ops/compact.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from python_raytracer_tpu.models.default import build_default_scene, default_settings
from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
from python_raytracer_tpu.ops.compact import march_compacted
from python_raytracer_tpu.ops.march import march
from python_raytracer_tpu.scene.compile import compile_scene


def _setup(static=False, dof=0.5):
    st = default_settings().replace(width=16, height=16, dof=dof, static=static,
                                    exact=False)
    scene = build_default_scene(st)
    cam_pos = np.array(scene.player.cam_pos)
    cam_rot = np.array(scene.player.cam_rot)
    cs = compile_scene(scene, cam_pos=cam_pos)
    dirs, detail = pixel_grid(st, jnp.float32)
    key = jax.random.PRNGKey(3)
    u_dof = jax.random.uniform(key, (dirs.shape[0], 2), jnp.float32)
    rays = generate_rays(st, jnp.asarray(cam_pos, jnp.float32),
                         jnp.asarray(cam_rot, jnp.float32), dirs, detail, u_dof)
    return st, cs, rays, key


def test_compacted_equals_plain_key_mode():
    st, cs, rays, key = _setup()
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used,
                record_traversed=True)
    got = march_compacted(st, cs.spec, cs.arrays, rays, key=key,
                          background="sky", programs_used=cs.programs_used,
                          record_traversed=True,
                          segment_iters=8, min_width=16)
    np.testing.assert_array_equal(np.asarray(got.color), np.asarray(ref.color))
    np.testing.assert_array_equal(np.asarray(got.energy), np.asarray(ref.energy))
    np.testing.assert_array_equal(np.asarray(got.step), np.asarray(ref.step))
    np.testing.assert_array_equal(np.asarray(got.bounces), np.asarray(ref.bounces))
    np.testing.assert_array_equal(
        np.asarray(got.traversed), np.asarray(ref.traversed)
    )


def test_compacted_equals_plain_tape_mode():
    st, cs, rays, _ = _setup(static=True)
    n = rays.pos.shape[0]
    rng = np.random.default_rng(0)
    tape = jnp.asarray(rng.random((n, 32)), jnp.float32)
    ptr0 = jnp.full((n,), 3, jnp.int32)
    ref = march(st, cs.spec, cs.arrays, rays, tape=tape, tape_ptr=ptr0,
                background="sky", mode="while", programs_used=cs.programs_used)
    got = march_compacted(st, cs.spec, cs.arrays, rays, tape=tape, tape_ptr=ptr0,
                          background="sky", programs_used=cs.programs_used,
                          segment_iters=8, min_width=16)
    np.testing.assert_array_equal(np.asarray(got.color), np.asarray(ref.color))
    np.testing.assert_array_equal(np.asarray(got.step), np.asarray(ref.step))


def test_compacted_records_hits():
    st, cs, rays, key = _setup()
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=8)
    got = march_compacted(st, cs.spec, cs.arrays, rays, key=key,
                          background="sky", programs_used=cs.programs_used,
                          record_hits=8, segment_iters=8, min_width=16)
    np.testing.assert_array_equal(np.asarray(got.hits.count), np.asarray(ref.hits.count))
    np.testing.assert_array_equal(np.asarray(got.hits.vid), np.asarray(ref.hits.vid))
    np.testing.assert_array_equal(np.asarray(got.hits.u), np.asarray(ref.hits.u))


def test_render_frame_compacted_matches_render_frame():
    import jax

    from python_raytracer_tpu.ops.render import render_frame, render_frame_compacted

    st = default_settings().replace(width=16, height=12, exact=True)
    scene = build_default_scene(st)
    cam_pos = np.array(scene.player.cam_pos)
    cam_rot = np.array(scene.player.cam_rot)
    cs = compile_scene(scene, cam_pos=cam_pos)
    from python_raytracer_tpu.utils.tape import make_static_tape

    tape = make_static_tape(st)
    img_a, trav_a = render_frame(st, cs.spec, cs.arrays, cam_pos, cam_rot,
                                 tape=tape, record_traversed=True,
                                 programs_used=cs.programs_used)
    img_b, trav_b = render_frame_compacted(st, cs.spec, cs.arrays, cam_pos, cam_rot,
                                           tape=tape, record_traversed=True,
                                           programs_used=cs.programs_used,
                                           segment_iters=8, min_width=16)
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
    np.testing.assert_array_equal(np.asarray(trav_a), np.asarray(trav_b))


def test_unrolled_march_equals_plain():
    st, cs, rays, key = _setup()
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used)
    for u in (2, 4):
        got = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                    mode="while", programs_used=cs.programs_used, unroll=u)
        np.testing.assert_array_equal(np.asarray(got.color), np.asarray(ref.color))
        np.testing.assert_array_equal(np.asarray(got.step), np.asarray(ref.step))


def test_ladder_equals_plain_key_mode():
    from python_raytracer_tpu.ops.compact import march_ladder

    st, cs, rays, key = _setup()
    # Reference must also run under jit: XLA fusion (FMA contraction) makes
    # jitted float math differ from eager by ulps, which key-mode noise
    # amplifies through discrete branches. Jitted-vs-jitted is bit-exact.
    ref = jax.jit(lambda r: march(
        st, cs.spec, cs.arrays, r, key=key, background="sky",
        mode="while", programs_used=cs.programs_used,
        record_traversed=True, record_hits=8))(rays)
    # Deliberately under-provisioned schedule (width too small for the real
    # survivor count) so the full-width cleanup segment is exercised too.
    got = jax.jit(lambda r: march_ladder(
        st, cs.spec, cs.arrays, r, key=key, background="sky",
        programs_used=cs.programs_used, record_traversed=True, record_hits=8,
        schedule=((4, 1), (4, 2), (4, 8)), min_width=16))(rays)
    np.testing.assert_array_equal(np.asarray(got.color), np.asarray(ref.color))
    np.testing.assert_array_equal(np.asarray(got.energy), np.asarray(ref.energy))
    np.testing.assert_array_equal(np.asarray(got.step), np.asarray(ref.step))
    np.testing.assert_array_equal(np.asarray(got.bounces), np.asarray(ref.bounces))
    np.testing.assert_array_equal(np.asarray(got.traversed), np.asarray(ref.traversed))
    np.testing.assert_array_equal(np.asarray(got.hits.count), np.asarray(ref.hits.count))
    np.testing.assert_array_equal(np.asarray(got.hits.vid), np.asarray(ref.hits.vid))
    np.testing.assert_array_equal(np.asarray(got.hits.u), np.asarray(ref.hits.u))
    np.testing.assert_array_equal(np.asarray(got.hits.flip), np.asarray(ref.hits.flip))


def test_ladder_equals_plain_tape_mode():
    from python_raytracer_tpu.ops.compact import march_ladder

    st, cs, rays, _ = _setup(static=True)
    n = rays.pos.shape[0]
    rng = np.random.default_rng(0)
    tape = jnp.asarray(rng.random((n, 32)), jnp.float32)
    ptr0 = jnp.full((n,), 3, jnp.int32)
    ref = march(st, cs.spec, cs.arrays, rays, tape=tape, tape_ptr=ptr0,
                background="sky", mode="while", programs_used=cs.programs_used)
    got = march_ladder(st, cs.spec, cs.arrays, rays, tape=tape, tape_ptr=ptr0,
                       background="sky", programs_used=cs.programs_used,
                       schedule=((6, 1), (6, 4)), min_width=16)
    np.testing.assert_array_equal(np.asarray(got.color), np.asarray(ref.color))
    np.testing.assert_array_equal(np.asarray(got.step), np.asarray(ref.step))
