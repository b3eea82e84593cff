"""Inverse rendering demo: recover material parameters from a target image.

The north-star capability (BASELINE.json): the renderer is differentiable
w.r.t. the material table, so scene appearance can be optimized by gradient
descent. This demo renders a target with the true materials, perturbs the
table, and recovers it by minimizing image MSE with the sharded train step
(rays data-parallel over every local device, table gradients psum'd).

  python3 tools/train_demo.py [--steps 200] [--save-dir DIR] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--height", type=int, default=48)
    ap.add_argument("--nan-checks", action="store_true",
                    help="jax_debug_nans: raise at the first NaN-producing "
                         "primitive (utils/debug.py)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.nan_checks:
        from python_raytracer_tpu.utils.debug import enable_nan_checks

        enable_nan_checks()
    import jax.numpy as jnp
    import optax

    from python_raytracer_tpu.models.default import build_default_scene, default_settings
    from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
    from python_raytracer_tpu.ops.diff import make_diff_renderer
    from python_raytracer_tpu.parallel.mesh import make_mesh
    from python_raytracer_tpu.parallel.train import make_train_step, project_material_table
    from python_raytracer_tpu.scene.compile import compile_scene
    from python_raytracer_tpu.scene.material import (
        PARAM_ABSORPTION, PARAM_ALBEDO_B, PARAM_ALBEDO_R, PARAM_ENERGY,
    )

    st = default_settings().replace(
        width=args.width, height=args.height, dof=0.0, lod_random=0.0,
        static=False, exact=False,
    )
    scene = build_default_scene(st)
    cam_pos = np.array(scene.player.cam_pos, np.float32)
    cam_rot = np.array(scene.player.cam_rot, np.float32)
    cs = compile_scene(scene, cam_pos=cam_pos)

    dirs, detail = pixel_grid(st, jnp.float32)
    rays = generate_rays(st, jnp.asarray(cam_pos), jnp.asarray(cam_rot), dirs, detail)
    key = jax.random.PRNGKey(0)

    renderer = make_diff_renderer(st, cs.spec, programs_used=cs.programs_used)
    true_table = cs.arrays.material_table
    target_color, _ = jax.jit(lambda t: renderer(t, cs.arrays, rays, key))(true_table)
    target = target_color / 255.0

    # Perturb the albedos (the parameters every visible surface constrains;
    # absorption/energy recovery is under-determined from a single view).
    rng = np.random.default_rng(0)
    pert = np.asarray(true_table).copy()
    k = pert.shape[0]
    pert[1:, PARAM_ALBEDO_R : PARAM_ALBEDO_B + 1] = rng.uniform(30, 220, (k - 1, 3))
    import dataclasses

    arrays = dataclasses.replace(cs.arrays, material_table=jnp.asarray(pert))

    mesh = make_mesh()
    opt = optax.adam(optax.cosine_decay_schedule(3.0, args.steps))  # 0..255 units
    mask = np.zeros_like(np.asarray(true_table))
    mask[:, PARAM_ALBEDO_R : PARAM_ALBEDO_B + 1] = 1.0  # optimize albedo only
    step = make_train_step(st, cs.spec, opt, mesh=mesh, programs_used=cs.programs_used,
                           project=project_material_table,
                           grad_mask=jnp.asarray(mask))
    opt_state = opt.init(arrays.material_table)

    def psnr(t):
        color, _ = renderer(t, cs.arrays, rays, key)
        mse = float(jnp.mean((color / 255.0 - target) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    print(json.dumps({"event": "start", "devices": len(jax.devices()),
                      "psnr_before": round(psnr(arrays.material_table), 2)}))
    t0 = time.time()
    for i in range(args.steps):
        arrays, opt_state, loss = step(arrays, opt_state, rays, target, key)
        if i % 25 == 0 or i == args.steps - 1:
            print(json.dumps({"event": "step", "i": i, "loss": round(float(loss), 8)}))
    dt = time.time() - t0
    final_psnr = psnr(arrays.material_table)
    err = np.abs(np.asarray(arrays.material_table) - np.asarray(true_table))
    print(json.dumps({
        "event": "done", "steps": args.steps, "sec": round(dt, 1),
        "psnr_after": round(final_psnr, 2),
        "albedo_mae": round(float(err[1:, :3].mean()), 2),
    }))

    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
        os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
        import pygame as pg

        def save(tbl, name):
            color, _ = renderer(jnp.asarray(tbl), cs.arrays, rays, key)
            img = np.asarray(color).reshape(st.height, st.width, 3)
            surf = pg.Surface((st.width, st.height))
            pg.surfarray.blit_array(surf, np.clip(img, 0, 255).astype(np.uint8).transpose(1, 0, 2))
            pg.image.save(pg.transform.scale(surf, (st.width * 8, st.height * 8)),
                          os.path.join(args.save_dir, name))

        save(true_table, "target.png")
        save(pert, "perturbed.png")
        save(arrays.material_table, "recovered.png")


if __name__ == "__main__":
    main()
