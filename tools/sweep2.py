"""Round-2 kernel tuning sweep: configs + ablations in one process.

Each entry is (name, BM_ABL string, march_blockwise kwargs). BM_ABL is read
at trace time (ops/blockmarch.py _make_kernel), so setting os.environ
between jit builds works in-process. Ablation timings are WRONG-result
runs — timing only.

Usage: SWEEP2='[...]' python3 tools/sweep2.py   (list of dicts; see DEFAULT)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

DEFAULT = [
    dict(name="base"),
    dict(name="bp", byte_planes=True),
    dict(name="abl-nocell", abl="nocell"),
    dict(name="abl-nocoarse", abl="nocoarse"),
]


def fence(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])


def rtt_ms(reps=3):
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((2,), jnp.int32)
    np.asarray(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(f(x))
        ts.append((time.time() - t0) * 1e3)
    ts.sort()
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

    configs = json.loads(os.environ["SWEEP2"]) if "SWEEP2" in os.environ else DEFAULT
    base_kw = dict(tile=2048, ep_cap=32, inner_cap=24, supersteps=1,
                   unroll=1, byte_planes=False, cleanup=True, record_hits=0)

    for cfg in configs:
        cfg = dict(cfg)
        name = cfg.pop("name")
        abl = cfg.pop("abl", "")
        kw = {**base_kw, **cfg}
        os.environ["BM_ABL"] = abl

        def run(table, rays, kw=kw):
            import dataclasses
            arr = dataclasses.replace(cs.arrays, material_table=table)
            res, (trips, eps) = march_blockwise(
                st, cs.spec, arr, rays, key=key, background="sky",
                programs_used=cs.programs_used, return_trips=True, **kw)
            return res.color, trips, eps

        f = jax.jit(run)
        t0 = time.time()
        out = f(cs.arrays.material_table, rays)
        fence(out)
        comp = time.time() - t0
        r = rtt_ms()
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            for _ in range(iters):
                out = f(cs.arrays.material_table, rays)
            fence(out)
            best = min(best, max(1e-9, (time.time() - t0) - r / 1e3) / iters)
        _, trips, eps = (np.asarray(x) for x in out)
        print(f"{name}: {best*1e3:.2f} ms ({n/best/1e6:.2f} Mrays/s fwd) "
              f"compile={comp:.0f}s trips={int(trips)} eps={int(eps)} kw={cfg} "
              f"abl={abl or '-'}", flush=True)
    os.environ.pop("BM_ABL", None)


if __name__ == "__main__":
    main()
