"""Sweep blockmarch kernel configs on TPU: where does the time go?

Times fwd-only variants (cleanup on/off, tile width, episode/inner caps,
hit recording) and counts stragglers (rays the kernel's static caps did not
finish — the cleanup march's workload). One line per config.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def fence(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])


def rtt_ms(reps=3):
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((2,), jnp.int32)
    np.asarray(f(x))
    ts = sorted((lambda t0: (np.asarray(f(x)), (time.time() - t0) * 1e3)[1])(time.time())
                for _ in range(reps))
    return ts[len(ts) // 2]


def main():
    from python_raytracer_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from python_raytracer_tpu.models.default import build_default_scene, default_settings
    from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
    from python_raytracer_tpu.ops.march import RayBatch
    from python_raytracer_tpu.ops.blockmarch import march_blockwise
    from python_raytracer_tpu.scene.compile import compile_scene

    n = int(os.environ.get("BM_RAYS", "393216"))
    iters = int(os.environ.get("BM_ITERS", "3"))
    st = default_settings().replace(exact=False, static=False)
    sc = build_default_scene(st)
    cam_pos = np.array(sc.player.cam_pos, np.float32)
    cam_rot = np.array(sc.player.cam_rot, np.float32)
    cs = compile_scene(sc, cam_pos=cam_pos)

    dirs, detail = pixel_grid(st, jnp.float32)
    reps = -(-n // dirs.shape[0])
    dirs = jnp.tile(dirs, (reps, 1))[:n]
    detail = jnp.tile(detail, (reps,))[:n]
    key = jax.random.PRNGKey(0)
    u_dof = jax.random.uniform(key, (n, 2), jnp.float32)
    rays = generate_rays(st, jnp.asarray(cam_pos), jnp.asarray(cam_rot),
                         dirs, detail, u_dof)
    rays = RayBatch(*(x.astype(jnp.float32) for x in rays))

    configs = eval(os.environ.get("SWEEP", """[
        dict(tile=1024, ep_cap=32, inner_cap=24, cleanup=True, record_hits=0),
        dict(tile=1024, ep_cap=32, inner_cap=24, cleanup=False, record_hits=0),
        dict(tile=1024, ep_cap=16, inner_cap=48, cleanup=False, record_hits=0),
        dict(tile=2048, ep_cap=32, inner_cap=24, cleanup=False, record_hits=0),
    ]"""))

    base = None
    for cfg in configs:
        def run(table, rays, cfg=cfg):
            import dataclasses
            arr = dataclasses.replace(cs.arrays, material_table=table)
            res, (trips, eps) = march_blockwise(
                st, cs.spec, arr, rays, key=key, background="sky",
                programs_used=cs.programs_used, return_trips=True, **cfg)
            return res.color, res.step, trips, eps

        f = jax.jit(run)
        t0 = time.time()
        out = f(cs.arrays.material_table, rays)
        fence(out)
        comp = time.time() - t0
        r = rtt_ms()
        t0 = time.time()
        for _ in range(iters):
            out = f(cs.arrays.material_table, rays)
        fence(out)
        dt = max(1e-9, (time.time() - t0) - r / 1e3) / iters
        color, step, trips, eps = (np.asarray(x) for x in out)
        if cfg.get("cleanup"):
            base = (color, step)
        stragglers = ""
        if base is not None and not cfg.get("cleanup"):
            bad = int((np.abs(color - base[0]).max(axis=-1) > 0).sum())
            stragglers = f" stragglers={bad}"
        print(f"{cfg}: {dt*1e3:.2f} ms ({n/dt/1e6:.2f} Mrays/s fwd, "
              f"compile {comp:.0f}s) trips={int(trips)} eps={int(eps)}"
              f"{stragglers}", flush=True)


if __name__ == "__main__":
    main()
