"""Custom material programs, custom backgrounds, object functions, animation
(reference mod ABI README.md:96-124; SURVEY.md §2.2 "EP" dispatch)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.ops import programs as P
from python_raytracer_tpu.ops.render import render_frame
from python_raytracer_tpu.scene import Material, Object, Scene, Sprite
from python_raytracer_tpu.scene.compile import compile_scene


def _flat_emissive(ray, mat, settings, draws):
    """Custom program: set color straight to albedo, add energy, stop rays
    fast (bounce = 1)."""
    ones = jnp.ones_like(ray.energy)
    return {"color": mat.albedo + 0 * ray.color, "energy": ray.energy + mat.energy}, ones


FLAT_PID = P.register_program("flat_emissive_test", _flat_emissive)


def _scene_with_programs():
    st = Settings(width=8, height=8, chunk_size=16, dist_max=24, max_light=10,
                  max_bounces=2, exact=False)
    scene = Scene(st)
    with scene:
        pbr = Material(albedo=(200, 40, 40), roughness=0, absorption=1, ior=0,
                       energy=0, solidity=1)
        flat = Material(albedo=(10, 250, 10), roughness=0, absorption=1, ior=0,
                        energy=1.0, solidity=1, function="flat_emissive_test")
        spr = Sprite(size=(8, 8, 8), frames=1)
        vox = {}
        for x in range(8):
            for y in range(8):
                vox[(x, y, 0)] = pbr if x < 4 else flat
        spr.get_frame(0).set_voxels(vox, True)
        obj = Object(pos=(0, 0, 8))
        obj.set_sprite(spr)
    return st, scene


def test_multi_program_dispatch():
    st, scene = _scene_with_programs()
    cs = compile_scene(scene, cam_pos=np.zeros(3))
    assert len(cs.programs_used) == 2 and FLAT_PID in cs.programs_used
    img, _ = render_frame(
        st, cs.spec, cs.arrays, np.zeros(3), np.array([0, 0, 0, 1.0]),
        background=None, programs_used=cs.programs_used, dtype=jnp.float64,
    )
    img = np.asarray(img).reshape(-1, 4)
    hits = img[img[:, :3].sum(-1) > 0]
    assert len(hits) > 8
    # flat-program pixels output the albedo verbatim (pure 250-green);
    # pbr pixels blend toward red-dominant albedo. Both must be present.
    flat_px = hits[hits[:, 1] == 250]
    pbr_px = hits[hits[:, 0] > hits[:, 1]]
    assert len(flat_px) > 0, hits[:5]
    assert len(pbr_px) > 0, hits[:5]
    assert (flat_px[:, 0] == 10).all() and (flat_px[:, 2] == 10).all()


def test_multi_program_grads_match_scan():
    st, scene = _scene_with_programs()
    cs = compile_scene(scene, cam_pos=np.zeros(3))
    from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
    from python_raytracer_tpu.ops.diff import make_diff_renderer
    from python_raytracer_tpu.ops.march import march

    dirs, detail = pixel_grid(st, jnp.float64)
    rays = generate_rays(st, jnp.zeros(3, jnp.float64),
                         jnp.array([0, 0, 0, 1.0], jnp.float64), dirs, detail)
    key = jax.random.PRNGKey(0)
    render = make_diff_renderer(st, cs.spec, background="sky",
                                programs_used=cs.programs_used)

    def loss_fast(t):
        color, _ = render(t, cs.arrays, rays, key)
        return jnp.mean(color)

    def loss_scan(t):
        arr = dataclasses.replace(cs.arrays, material_table=t)
        res = march(st, cs.spec, arr, rays, key=key, background="sky",
                    mode="scan", programs_used=cs.programs_used)
        return jnp.mean(res.color)

    table = cs.arrays.material_table.astype(jnp.float64)
    l1, g1 = jax.value_and_grad(loss_fast)(table)
    l2, g2 = jax.value_and_grad(loss_scan)(table)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-8, atol=1e-12)


def test_custom_background_callable():
    st, scene = _scene_with_programs()
    cs = compile_scene(scene, cam_pos=np.zeros(3))

    def solid_bg(color, energy, vel, bounces, settings):
        return jnp.full_like(color, 9.0), jnp.ones_like(energy)

    P.register_background("solid_test", solid_bg)
    img, _ = render_frame(
        st, cs.spec, cs.arrays, np.zeros(3), np.array([0, 0, 0, 1.0]),
        background="solid_test", programs_used=cs.programs_used, dtype=jnp.float64,
    )
    img = np.asarray(img)
    # miss pixels = pure background
    corners = img[0, 0, :3]
    assert (corners == 9.0).all() or (img[..., :3] == 9.0).any()


def test_object_custom_function_called():
    st = Settings(dist_max=64, dist_move=64)
    scene = Scene(st)
    calls = []
    with scene:
        m = Material(albedo=(1, 1, 1), solidity=1)
        s = Sprite(size=(2, 2, 2), frames=1)
        s.get_frame(0).set_voxels({(0, 0, 0): m}, True)
        o = Object(pos=(0, 0, 4), function=lambda obj: calls.append(obj.pos))
        o.set_sprite(s)
    o.update((0.0, 0.0, 0.0), 0.0)
    assert calls == [(0, 0, 4)]


def test_animation_triggers_redraw():
    st = Settings(dist_max=64, dist_move=64)
    scene = Scene(st)
    with scene:
        m1 = Material(albedo=(10, 0, 0), solidity=1)
        m2 = Material(albedo=(0, 10, 0), solidity=1)
        s = Sprite(size=(2, 2, 2), frames=2)
        s.get_frame(0).set_voxels({(0, 0, 0): m1}, True)
        s.get_frame(1).set_voxels({(0, 0, 0): m2}, True)
        o = Object(pos=(0, 0, 4))
        o.set_sprite(s)
        s.anim_set(0, 1, 0.1)
    o.update((0.0, 0.0, 0.0), 0.0)
    o.redraw = False
    w0 = o.weight
    o.update((0.0, 0.0, 0.0), 150.0)  # 150ms -> frame 1
    assert o.sprite.frame == 1
    assert o.redraw, "frame change must trigger redraw (data.py:580-582)"


def test_custom_ray_property_carried_and_differentiable():
    """Registered ray properties (the reference's mutable ray-store fields,
    README.md:96): carried across hits by the march, visible in the program
    on later hits, returned in MarchResult.aux, and differentiated by the
    hit-replay backward in lockstep with the scan autodiff."""
    import dataclasses as _dc

    from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
    from python_raytracer_tpu.ops.diff import make_diff_renderer
    from python_raytracer_tpu.ops.march import march

    def heat_program(ray, mat, settings, draws):
        heat = ray.aux["heat"] + mat.energy  # accumulates across this ray's hits
        color = ray.color * (1 - mat.absorption[:, None]) + (
            mat.albedo + heat[:, None]) * mat.absorption[:, None]
        return {"color": color, "heat": heat}, mat.absorption

    P.register_ray_property("heat", init=0.25)
    P.register_program("heat_test", heat_program)
    try:
        st = Settings(width=8, height=8, chunk_size=16, dist_max=24,
                      max_light=10, max_bounces=2, exact=False)
        scene = Scene(st)
        with scene:
            m = Material(albedo=(50, 60, 70), roughness=0, absorption=0.5,
                         ior=0, energy=0.5, solidity=1, function="heat_test")
            spr = Sprite(size=(8, 8, 8), frames=1)
            spr.get_frame(0).set_voxels(
                {(x, y, 0): m for x in range(8) for y in range(8)}, True)
            obj = Object(pos=(0, 0, 8))
            obj.set_sprite(spr)
        cs = compile_scene(scene, cam_pos=np.zeros(3))

        dirs, detail = pixel_grid(st, jnp.float64)
        rays = generate_rays(st, jnp.zeros(3, jnp.float64),
                             jnp.array([0, 0, 0, 1.0], jnp.float64), dirs, detail)
        key = jax.random.PRNGKey(0)
        res = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                    mode="while", programs_used=cs.programs_used)
        heat = np.asarray(res.aux["heat"])
        b = np.asarray(res.bounces)
        # heat = init + energy per hit; hits = bounces / absorption(0.5)
        np.testing.assert_allclose(heat, 0.25 + (b / 0.5) * 0.5, rtol=1e-9)
        assert (heat > 0.25).any(), "some rays must have hit"

        # gradients: hit-replay backward == scan autodiff through the custom
        # state chain (heat feeds color, color feeds the loss)
        render = make_diff_renderer(st, cs.spec, background="sky",
                                    programs_used=cs.programs_used)

        def loss_fast(t):
            color, _ = render(t, cs.arrays, rays, key)
            return jnp.mean(color)

        def loss_scan(t):
            arr = _dc.replace(cs.arrays, material_table=t)
            r = march(st, cs.spec, arr, rays, key=key, background="sky",
                      mode="scan", programs_used=cs.programs_used)
            return jnp.mean(r.color)

        table = cs.arrays.material_table.astype(jnp.float64)
        l1, g1 = jax.value_and_grad(loss_fast)(table)
        l2, g2 = jax.value_and_grad(loss_scan)(table)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-8, atol=1e-12)
        assert np.abs(np.asarray(g1)).sum() > 0
    finally:
        P.unregister_ray_property("heat")
