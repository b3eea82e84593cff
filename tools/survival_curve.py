"""Measure the ray survival curve S(t) = fraction alive after t march trips
on the default scene (the bench workload), to pick the static width schedule
for the on-device ladder march (ops/compact.py march_ladder).

Run: python3 tools/survival_curve.py [n_rays]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from python_raytracer_tpu.models.default import build_default_scene, default_settings
    from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
    from python_raytracer_tpu.ops.march import march, initial_state
    from python_raytracer_tpu.scene.compile import compile_scene

    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 49152
    st = default_settings().replace(exact=False, static=False)
    scene = build_default_scene(st)
    cam_pos = np.array(scene.player.cam_pos, np.float32)
    cam_rot = np.array(scene.player.cam_rot, np.float32)
    cs = compile_scene(scene, cam_pos=cam_pos)
    spec = cs.spec

    dirs, detail = pixel_grid(st, jnp.float32)
    reps = max(1, -(-n_rays // dirs.shape[0]))
    dirs = jnp.tile(dirs, (reps, 1))[:n_rays]
    detail = jnp.tile(detail, (reps,))[:n_rays]
    key = jax.random.PRNGKey(0)
    u_dof = jax.random.uniform(key, (n_rays, 2), jnp.float32)
    rays = generate_rays(st, jnp.asarray(cam_pos), jnp.asarray(cam_rot), dirs, detail, u_dof)

    state = initial_state(st, spec, rays)
    step1 = jax.jit(
        lambda s: march(st, spec, cs.arrays, rays, key=key, background=None,
                        mode="while", programs_used=cs.programs_used,
                        resume_state=s, num_iters=1, finalize=False)[1]
    )
    surv = []
    for it in range(st.march_steps):
        alive = int(np.asarray(state.alive).sum())
        surv.append(alive)
        if alive == 0:
            break
        state = step1(state)
    surv = np.array(surv, np.float64) / n_rays
    for t, s in enumerate(surv):
        print(f"t={t:3d} alive={s:7.4f}")
    # Suggested ladder: halve width once survival fits
    print("\nwidth-fit points (first t where S(t) <= 1/d):")
    for d in (2, 4, 8, 16, 32):
        idx = np.argmax(surv <= 1.0 / d) if (surv <= 1.0 / d).any() else -1
        print(f"  1/{d}: t={idx}")


if __name__ == "__main__":
    main()
