"""TPU bench: Pallas blockwise march vs the XLA ladder march.

Fenced timing per tools/tpu_timing.py rules (block_until_ready is a no-op
over axon; fence = tiny host readback; device executions stream-serialize).

Env: BM_RAYS (default 393216), BM_ITERS (default 3), BM_TILE (default 1024),
BM_HITS (default 0), BM_SKIP_XLA=1 to skip the ladder comparison,
BM_EP/BM_INNER caps.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:4])


def rtt_ms(reps=3):
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((2,), jnp.int32)
    np.asarray(f(x))
    ts = sorted((lambda t0: (np.asarray(f(x)), (time.time() - t0) * 1e3)[1])(time.time())
                for _ in range(reps))
    return ts[len(ts) // 2]


def time_iters(fn, args, iters):
    r = rtt_ms()
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return max(1e-9, (time.time() - t0) - r / 1e3) / iters, out


def main():
    from python_raytracer_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from python_raytracer_tpu.models.default import build_default_scene, default_settings
    from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
    from python_raytracer_tpu.ops.march import RayBatch
    from python_raytracer_tpu.ops.blockmarch import march_blockwise
    from python_raytracer_tpu.scene.compile import compile_scene

    n = int(os.environ.get("BM_RAYS", "393216"))
    iters = int(os.environ.get("BM_ITERS", "3"))
    tile = int(os.environ.get("BM_TILE", "1024"))
    hits = int(os.environ.get("BM_HITS", "0"))
    ep_cap = int(os.environ.get("BM_EP", "32"))
    inner_cap = int(os.environ.get("BM_INNER", "24"))
    cleanup = os.environ.get("BM_CLEANUP", "1") == "1"

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

    t0 = time.time()
    h = jnp.ones((1024, 1024))
    np.asarray(jax.jit(lambda a: a @ a)(h)[0, :2])
    t_h = time.time() - t0
    print(f"health: first matmul {t_h:.1f}s", flush=True)

    def run_block(table, rays):
        import dataclasses
        arr = dataclasses.replace(cs.arrays, material_table=table)
        res = march_blockwise(st, cs.spec, arr, rays, key=key,
                              background="sky", programs_used=cs.programs_used,
                              record_hits=hits, tile=tile, ep_cap=ep_cap,
                              inner_cap=inner_cap, cleanup=cleanup)
        return res.color, res.step, res.bounces

    fb = jax.jit(run_block)
    t0 = time.time()
    out_b = fb(cs.arrays.material_table, rays)
    fence(out_b)
    print(f"blockmarch compile+run: {time.time()-t0:.1f}s", flush=True)

    dt, out_b = time_iters(fb, (cs.arrays.material_table, rays), iters)
    print(f"blockmarch: {dt*1e3:.2f} ms/iter -> {n/dt/1e6:.2f} Mrays/s fwd "
          f"(tile={tile} hits={hits} cleanup={cleanup})", flush=True)

    if os.environ.get("BM_SKIP_XLA", "0") != "1":
        from python_raytracer_tpu.ops.compact import march_ladder

        def run_ladder(table, rays):
            import dataclasses
            arr = dataclasses.replace(cs.arrays, material_table=table)
            res = march_ladder(st, cs.spec, arr, rays, key=key,
                               background="sky",
                               programs_used=cs.programs_used)
            return res.color, res.step, res.bounces

        fl = jax.jit(run_ladder)
        t0 = time.time()
        out_l = fl(cs.arrays.material_table, rays)
        fence(out_l)
        print(f"ladder compile+run: {time.time()-t0:.1f}s", flush=True)
        dtl, out_l = time_iters(fl, (cs.arrays.material_table, rays), iters)
        print(f"ladder:     {dtl*1e3:.2f} ms/iter -> {n/dtl/1e6:.2f} Mrays/s fwd",
              flush=True)

        cb, sb, bb = (np.asarray(x) for x in out_b)
        cl, sl, bl = (np.asarray(x) for x in out_l)
        print("TPU block-vs-ladder: step equal", (sb == sl).mean().round(6),
              "bounces equal", (bb == bl).mean().round(6),
              "color maxdiff", np.abs(cb - cl).max(), flush=True)


if __name__ == "__main__":
    main()
