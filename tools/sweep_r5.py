"""Round-5 forward sweep: program-A (sort + Pallas kernel) wall time across
kernel knobs, against today's compile service.

The round-4 stage split (healthy tunnel, per-rep fenced): A = 105 ms,
B = 1 ms, C(fused bwd) = 3.3 ms — program A is 96% of fwd+bwd, and its
per-trip cost tripled compiler-side vs round 2 (ROADMAP forensics). This
sweep times ONLY program A variants (B and C are knob-independent), with a
warmup dispatch before each measurement (first-call overhead is ~0.3-1 s
even for warm programs).

Usage: SWEEP_R5='[{"unroll":2,"inner_cap":2}, ...]' python3 tools/sweep_r5.py
Defaults to the round-5 lever matrix. One JSON line per config.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from python_raytracer_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    os.environ.setdefault("_BENCH_CHILD", "1")
    import bench as B

    print(json.dumps({"event": "health",
                      "matmul10_ms": round(B._device_health_ms(), 1)}),
          flush=True)

    from python_raytracer_tpu.models.default import (build_default_scene,
                                                     default_settings)
    from python_raytracer_tpu.ops.blockmarch import march_blockwise
    from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
    from python_raytracer_tpu.scene.compile import compile_scene

    n_rays = int(os.environ.get("BENCH_RAYS", "393216"))
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
    max_hits = int(os.environ.get("BENCH_MAX_HITS", "12"))

    base = dict(tile=2048, supersteps=1, ep_cap=384, inner_cap=2, unroll=1,
                byte_planes=True, group_coarse=False, pages=1,
                resort_life=False, resident=True)
    default_sweep = [
        {},  # baseline (round-4 bench default)
        {"unroll": 2, "inner_cap": 2},
        {"unroll": 4, "inner_cap": 4},
        {"unroll": 8, "inner_cap": 8},
        {"unroll": 4, "inner_cap": 8},
        {"unroll": 2, "inner_cap": 4},
        {"supersteps": 2, "resort_life": True},
        {"unroll": 4, "inner_cap": 4, "supersteps": 2, "resort_life": True},
        {"tile": 1024, "unroll": 4, "inner_cap": 4},
        {"tile": 4096, "unroll": 4, "inner_cap": 4},
        {"group_coarse": True, "unroll": 4, "inner_cap": 4},
    ]
    sweep = json.loads(os.environ["SWEEP_R5"]) if "SWEEP_R5" in os.environ \
        else default_sweep

    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[-1]
        np.asarray(leaf.ravel()[:4])

    iters = int(os.environ.get("BENCH_ITERS", "5"))
    for delta in sweep:
        kw = {**base, **delta}
        if n_rays % kw["tile"]:
            print(json.dumps({"cfg": delta, "skip": "tile does not divide n"}),
                  flush=True)
            continue

        def fwd_A(table, rays, kw=kw):
            arrays = dataclasses.replace(cs.arrays, material_table=table)
            _, state, _, vel0 = march_blockwise(
                st, cs.spec, arrays, rays, key=key, background="sky",
                programs_used=cs.programs_used, record_hits=max_hits,
                cleanup=False, finalize=False, unsorted=True,
                return_perm=True, **kw)
            return state, vel0

        try:
            f = jax.jit(fwd_A)
            t0 = time.time()
            out = f(table, rays)
            fence(out)
            compile_s = time.time() - t0
            fence(f(table, rays))  # warmup (first-call overhead)
            rtt = B._rtt_ms()
            t0 = time.time()
            for _ in range(iters):
                out = f(table, rays)
            fence(out)
            dt = max(1e-9, (time.time() - t0) - rtt / 1e3) / iters
            # straggler count: lanes still alive after the kernel = B's
            # cleanup-march workload
            alive = int(np.asarray(jnp.sum(out[0].alive)))
            health = B._device_health_ms()
            print(json.dumps({
                "cfg": delta, "A_ms": round(dt * 1e3, 2),
                "compile_s": round(compile_s, 1), "alive_after": alive,
                "rtt_ms": round(rtt, 1),
                "health_ms": round(health, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"cfg": delta, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
