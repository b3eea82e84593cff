"""Multi-chip scaling-efficiency bench (BASELINE.md: >= 85% at N >= 2).

Measures WEAK scaling of the sharded fwd+bwd train step
(parallel/train.py): per-device ray batch fixed, mesh grown 1 -> N devices;
efficiency = t_1 / t_N (1.0 = perfect). This is the measurement machinery
for the BASELINE scaling row — single-chip today (the axon tunnel exposes
one chip), it produces the official number the moment a multi-chip slice
appears, with no new code.

On CPU it validates the mechanics on the 8-virtual-device mesh (numbers
are not hardware-meaningful; correctness of the sharded step itself is
covered by tests/test_grad.py sharded==unsharded and the driver's
dryrun_multichip).

Usage:
    python3 tools/scaling_bench.py            # default backend
    SCALE_RAYS_PER_DEV=65536 SCALE_ITERS=3 python3 tools/scaling_bench.py

Prints one JSON line: {"metric": "weak-scaling efficiency fwd+bwd", ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if os.environ.get("SCALE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax.numpy as jnp
    import optax

    from python_raytracer_tpu.models.default import (build_default_scene,
                                                     default_settings)
    from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
    from python_raytracer_tpu.ops.march import RayBatch
    from python_raytracer_tpu.parallel.mesh import make_mesh
    from python_raytracer_tpu.parallel.train import make_train_step
    from python_raytracer_tpu.scene.compile import compile_scene
    from python_raytracer_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    devs = jax.devices()
    n_dev = len(devs)
    per_dev = int(os.environ.get("SCALE_RAYS_PER_DEV", "65536"))
    iters = int(os.environ.get("SCALE_ITERS", "3"))

    st = default_settings().replace(exact=False, static=False)
    scene = build_default_scene(st)
    cam_pos = np.array(scene.player.cam_pos, np.float32)
    cam_rot = np.array(scene.player.cam_rot, np.float32)
    cs = compile_scene(scene, cam_pos=cam_pos)
    opt = optax.adam(1e-2)
    key = jax.random.PRNGKey(0)

    def build(n):
        rays_n = per_dev * n
        dirs, detail = pixel_grid(st, jnp.float32)
        reps = max(1, -(-rays_n // dirs.shape[0]))
        dirs_t = jnp.tile(dirs, (reps, 1))[:rays_n]
        detail_t = jnp.tile(detail, (reps,))[:rays_n]
        u_dof = jax.random.uniform(key, (rays_n, 2), jnp.float32)
        rays = generate_rays(st, jnp.asarray(cam_pos), jnp.asarray(cam_rot),
                             dirs_t, detail_t, u_dof)
        rays = RayBatch(*(x.astype(jnp.float32) for x in rays))
        mesh = make_mesh(n) if n > 1 else None
        step = make_train_step(st, cs.spec, opt, mesh=mesh, max_hits=12,
                               programs_used=cs.programs_used,
                               forward="while")
        target = jnp.zeros((rays_n, 3), jnp.float32)
        opt_state = opt.init(cs.arrays.material_table)
        return step, rays, target, opt_state

    def fence(x):
        leaf = jax.tree_util.tree_leaves(x)[-1]
        np.asarray(jnp.ravel(leaf)[:4])

    def measure(n):
        step, rays, target, opt_state = build(n)
        arrays = cs.arrays
        out = step(arrays, opt_state, rays, target, key)
        fence(out)
        t0 = time.time()
        for _ in range(iters):
            out = step(arrays, opt_state, rays, target, key)
        fence(out)
        return (time.time() - t0) / iters

    t1 = measure(1)
    if n_dev == 1:
        result = {
            "metric": "weak-scaling efficiency fwd+bwd (train step)",
            "value": None, "unit": "t1/tN",
            "detail": {
                "devices": 1, "rays_per_device": per_dev,
                "t1_sec": round(t1, 4),
                "note": "single chip visible - harness ready; efficiency "
                        "needs a multi-chip slice (BASELINE >= 0.85)",
                "device": str(devs[0]),
            },
        }
    else:
        tN = measure(n_dev)
        eff = t1 / tN
        result = {
            "metric": "weak-scaling efficiency fwd+bwd (train step)",
            "value": round(eff, 4), "unit": "t1/tN",
            "vs_baseline": round(eff / 0.85, 4),
            "detail": {"devices": n_dev, "rays_per_device": per_dev,
                       "t1_sec": round(t1, 4), "tN_sec": round(tN, 4),
                       "device": str(devs[0])},
        }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
