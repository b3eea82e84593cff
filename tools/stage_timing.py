"""Per-stage timing of the split bench programs from serialized executables.

Loads the committed .jax_exec artifacts (A = sort+kernel, B = cleanup march
+ background + loss, C = hit-replay grad — bench.py split3 layout) and times
each stage under its own fence, so the round-5 forward/backward work has a
measured baseline per stage instead of one fused number. No compiles: if the
fingerprint has no artifacts, exit with a message.

Usage: python3 tools/stage_timing.py  (env: BENCH_* knobs as bench.py)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import bench as B

    os.environ.setdefault("_BENCH_CHILD", "1")
    from python_raytracer_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    health = B._device_health_ms()
    print(json.dumps({"event": "health", "matmul10_ms": round(health, 1)}),
          flush=True)

    from python_raytracer_tpu.models.default import (build_default_scene,
                                                     default_settings)
    from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
    from python_raytracer_tpu.scene.compile import compile_scene

    n_rays = int(os.environ.get("BENCH_RAYS", "393216"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    st = default_settings().replace(exact=False, static=False)
    scene = build_default_scene(st)
    cam_pos = np.array(scene.player.cam_pos, np.float32)
    cam_rot = np.array(scene.player.cam_rot, np.float32)
    cs = compile_scene(scene, cam_pos=cam_pos)

    dirs, detail = pixel_grid(st, jnp.float32)
    reps = max(1, -(-n_rays // dirs.shape[0]))
    dirs = jnp.tile(dirs, (reps, 1))[:n_rays]
    detail = jnp.tile(detail, (reps,))[:n_rays]
    key = jax.random.PRNGKey(0)
    u_dof = jax.random.uniform(key, (n_rays, 2), jnp.float32)
    rays = generate_rays(st, jnp.asarray(cam_pos), jnp.asarray(cam_rot),
                         dirs, detail, u_dof)
    table = cs.arrays.material_table

    # fingerprint must match bench.py's (same knob dict construction)
    import dataclasses

    from python_raytracer_tpu.ops.blockmarch import march_blockwise
    from python_raytracer_tpu.ops.march import RayBatch, march

    block_kw = dict(
        tile=int(os.environ.get("BENCH_TILE", "2048")),
        supersteps=int(os.environ.get("BENCH_SUPERSTEPS", "1")),
        ep_cap=int(os.environ.get("BENCH_EP_CAP", "384")),
        inner_cap=int(os.environ.get("BENCH_INNER_CAP", "2")),
        unroll=int(os.environ.get("BENCH_BLOCK_UNROLL", "1")),
        byte_planes=os.environ.get("BENCH_BYTE_PLANES", "1") == "1",
        group_coarse=os.environ.get("BENCH_GROUP_COARSE", "0") == "1",
        pages=int(os.environ.get("BENCH_PAGES", "1")),
        resort_life=os.environ.get("BENCH_RESORT_LIFE", "0") == "1",
        resident=os.environ.get("BENCH_RESIDENT", "1") == "1",
        flat=os.environ.get("BENCH_FLAT", "1") == "1",
    )
    max_hits = int(os.environ.get("BENCH_MAX_HITS", "12"))

    def fwd_A(table, rays):
        arrays = dataclasses.replace(cs.arrays, material_table=table)
        _, state, _, vel0 = march_blockwise(
            st, cs.spec, arrays, rays, key=key, background="sky",
            programs_used=cs.programs_used, record_hits=max_hits,
            cleanup=False, finalize=False, unsorted=True,
            return_perm=True, **block_kw)
        return state, vel0

    import importlib
    srcs = [importlib.import_module(nm).__file__ for nm in (
        "python_raytracer_tpu.ops.diff",
        "python_raytracer_tpu.ops.march",
        "python_raytracer_tpu.ops.programs",
        "python_raytracer_tpu.ops.replay_block",
        "python_raytracer_tpu.utils.rng")]
    fast_bwd = os.environ.get("BENCH_FAST_BWD", "1") == "1"
    fp = B._program_fingerprint(
        fwd_A, (table, rays),
        {"rays": n_rays, "block_kw": block_kw, "max_hits": max_hits,
         "split3": True, "fast_bwd": fast_bwd},
        extra_src=srcs)
    paths = {nm: os.path.join(B._EXEC_DIR, f"{nm}-{fp}.pkl")
             for nm in ("A", "B", "bwd")}
    print(json.dumps({"event": "exec-fp", "fp": fp,
                      "have": {nm: os.path.exists(p)
                               for nm, p in paths.items()}}), flush=True)
    if not all(os.path.exists(p) for p in paths.values()):
        print(json.dumps({"event": "giveup",
                          "reason": "no serialized executables for this "
                                    "fingerprint; run bench.py warm first"}))
        return
    xA = B._exec_load(paths["A"])
    xB = B._exec_load(paths["B"])
    xb = B._exec_load(paths["bwd"])

    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[-1]
        np.asarray(leaf.ravel()[:4])

    # warm
    state, vel0 = xA(table, rays)
    loss, hits, aux = xB(table, state)
    g = xb(table, hits, vel0)
    fence(g)
    rtt = B._rtt_ms()

    def timeit(fn, *args):
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = fn(*args)
        fence(out)
        return max(1e-9, (time.time() - t0) - rtt / 1e3) / iters, out

    tA, (state, vel0) = timeit(xA, table, rays)
    tB, (loss, hits, aux) = timeit(xB, table, state)
    tC, g = timeit(xb, table, hits, vel0)

    def tot_time():
        t0 = time.time()
        for _ in range(iters):
            s_, v_ = xA(table, rays)
            l_, h_, a_ = xB(table, s_)
            g_ = xb(table, h_, v_)
        fence(g_)
        return max(1e-9, (time.time() - t0) - rtt / 1e3) / iters

    t_all = tot_time()
    out = {
        "event": "stage-timing", "rays": n_rays, "iters": iters,
        "rtt_ms": round(rtt, 1),
        "health_matmul10_ms": round(health, 1),
        "A_sort_kernel_ms": round(tA * 1e3, 2),
        "B_cleanup_loss_ms": round(tB * 1e3, 2),
        "C_replay_bwd_ms": round(tC * 1e3, 2),
        "total_ms": round(t_all * 1e3, 2),
        "mrays_fwd_bwd": round(n_rays / t_all / 1e6, 3),
        "steps_per_ray": round(float(aux[0]), 2),
        "bounces_per_ray": round(float(aux[1]), 3),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
