"""A small deterministic test scene + rays (shared by the multihost worker,
the fault-injection test, and ad-hoc tools). Mirrors tests/test_grad.py's
fixture, but importable outside pytest."""

import jax.numpy as jnp
import numpy as np

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
from python_raytracer_tpu.scene import Material, Object, Scene, Sprite
from python_raytracer_tpu.scene.compile import compile_scene


def build_tiny(width: int = 8, height: int = 8, dtype=jnp.float32):
    """Returns (settings, compiled_scene, rays, target)."""
    st = Settings(
        width=width, height=height, chunk_size=16, dist_max=24, max_light=1,
        max_bounces=2, falloff=0.25, lod_bounces=0.5, exact=False, samples=1,
    )
    scene = Scene(st)
    rng = np.random.default_rng(0)
    with scene:
        mats = [
            Material(albedo=(200, 50, 30), roughness=0, absorption=1, ior=1,
                     energy=0, solidity=1),
            Material(albedo=(20, 220, 90), roughness=0, absorption=0.5,
                     ior=0.25, energy=0.5, solidity=1),
        ]
        spr = Sprite(size=(8, 8, 8), frames=1)
        vox = {}
        for _ in range(120):
            p = tuple(int(v) for v in rng.integers(0, 8, 3))
            vox[p] = mats[int(rng.integers(0, 2))]
        spr.get_frame(0).set_voxels(vox, True)
        obj = Object(pos=(0, 0, 10))
        obj.set_sprite(spr)
    cs = compile_scene(scene, cam_pos=np.zeros(3))

    dirs, detail = pixel_grid(st, dtype)
    rays = generate_rays(
        st, jnp.zeros(3, dtype), jnp.array([0, 0, 0, 1.0], dtype),
        dirs, detail,
    )
    target = jnp.full((rays.pos.shape[0], 3), 0.5, dtype)
    return st, cs, rays, target
