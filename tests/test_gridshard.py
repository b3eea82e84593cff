"""Grid tensor parallelism: sharded-slab march == replicated march
(SURVEY.md §2.2 TP row, §5.7 ring schedule)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from python_raytracer_tpu.models.default import build_default_scene, default_settings
from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
from python_raytracer_tpu.ops.march import march
from python_raytracer_tpu.parallel.gridshard import make_grid_sharded_renderer
from python_raytracer_tpu.parallel.mesh import make_mesh
from python_raytracer_tpu.scene.compile import compile_scene


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_grid_sharded_march_matches_replicated():
    st = default_settings().replace(width=16, height=16, dof=0.0, static=False,
                                    exact=False)
    scene = build_default_scene(st)
    cam_pos = np.array(scene.player.cam_pos)
    cam_rot = np.array(scene.player.cam_rot)
    cs = compile_scene(scene, cam_pos=cam_pos)

    dirs, detail = pixel_grid(st, jnp.float32)
    rays = generate_rays(st, jnp.asarray(cam_pos, jnp.float32),
                         jnp.asarray(cam_rot, jnp.float32), dirs, detail)
    key = jax.random.PRNGKey(11)

    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used)

    mesh = make_mesh(8, axes=("grid",))
    render, words_sharded = make_grid_sharded_renderer(
        st, cs.spec, cs.arrays, mesh, programs_used=cs.programs_used
    )
    out = render(words_sharded, rays, key)

    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(out.energy), np.asarray(ref.energy),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(out.step), np.asarray(ref.step))
    # per-device grid slab is 1/8 of the padded grid
    shard_shapes = {tuple(s.data.shape) for s in words_sharded.addressable_shards}
    assert all(shape[0] == 1 for shape in shard_shapes)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_grid_sharded_kernel_matches_replicated():
    """The ring march with use_kernel=True (Pallas slab/resume segments,
    interpret mode on CPU) must match the replicated XLA march: exact
    trajectories; colors allclose (jit fuses the interpret shading chain
    with FMA rounding — same comparison rule as tools/tpu_checks.py)."""
    from python_raytracer_tpu.ops import blockmarch as B

    st = default_settings().replace(width=16, height=16, dof=0.0,
                                    static=False, exact=False)
    scene = build_default_scene(st)
    cam_pos = np.array(scene.player.cam_pos)
    cam_rot = np.array(scene.player.cam_rot)
    cs = compile_scene(scene, cam_pos=cam_pos)

    dirs, detail = pixel_grid(st, jnp.float32)
    rays = generate_rays(st, jnp.asarray(cam_pos, jnp.float32),
                         jnp.asarray(cam_rot, jnp.float32), dirs, detail)
    key = jax.random.PRNGKey(11)

    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used)

    mesh = make_mesh(8, axes=("grid",))
    orig = B.march_blockwise

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    B.march_blockwise = interp
    try:
        render, words_sharded = make_grid_sharded_renderer(
            st, cs.spec, cs.arrays, mesh, programs_used=cs.programs_used,
            use_kernel=True, block_kw={"tile": 512, "inner_cap": 4,
                                       "ep_cap": 16})
        out = render(words_sharded, rays, key)
    finally:
        B.march_blockwise = orig

    np.testing.assert_array_equal(np.asarray(out.step), np.asarray(ref.step))
    np.testing.assert_array_equal(np.asarray(out.bounces),
                                  np.asarray(ref.bounces))
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.energy),
                               np.asarray(ref.energy), atol=1e-4)
