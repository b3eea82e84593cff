"""Beyond-VMEM scene bench (VERDICT r4 item 6): 4x-castle world through the
heat-ordered resident-pool kernel vs the XLA while-march, on TPU.

The paged (vote+DMA) kernel Mosaic-compiles in ~1000 s on the round-4/5
service — unusable. The resident kernel compiles in seconds but its VMEM
pool caps at ~350 byte-plane chunks. This tool proves the two-tier answer:
occupied chunks ranked by distance to the camera (``pool_center``), the
nearest ``resident_cap`` resident in VMEM, cold-chunk lanes frozen by the
unservable-page guard and finished by the XLA cleanup march. Reference
analogue: the unbounded chunk world, ``init.py:389-452``.

Scene: the default castle sprite placed 4x in a 2x2 grid (≈ 860k voxels,
~4x the stock occupied-chunk count), camera in the middle.

Usage: python3 tools/big_scene_bench.py        (env: BIG_RAYS, BIG_ITERS)
Prints JSON lines: scene stats, kernel compile time, fenced kernel and XLA
march times.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_big_scene(st):
    """Four castles in a 2x2 grid + the player camera (default-mod
    materials/sprites via the mod API so the content pipeline is real)."""
    from python_raytracer_tpu.models.default import build_default_scene
    from python_raytracer_tpu.scene import Object

    scene = build_default_scene(st)
    castle = None
    for obj in list(scene.scene_objects() if hasattr(scene, "scene_objects")
                    else scene.objects.values()):
        if obj.sprite is not None and max(obj.sprite.size) >= 128:
            castle = obj
            break
    assert castle is not None, "castle object not found"
    spr = castle.sprite
    base = np.asarray(castle.pos, float)
    with scene:
        for dx, dz in ((1, 0), (0, 1), (1, 1)):
            o = Object(pos=tuple(base + np.array([dx * 160.0, 0.0,
                                                  dz * 160.0])))
            o.set_sprite(spr)
    return scene


def main():
    from python_raytracer_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    os.environ.setdefault("_BENCH_CHILD", "1")
    import bench as B

    if os.environ.get("BIG_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    else:
        print(json.dumps({"event": "health",
                          "matmul10_ms": round(B._device_health_ms(), 1)}),
              flush=True)

    from python_raytracer_tpu.models.default import default_settings
    from python_raytracer_tpu.ops.blockmarch import march_blockwise
    from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
    from python_raytracer_tpu.ops.march import RayBatch, march
    from python_raytracer_tpu.scene.compile import compile_scene

    n_rays = int(os.environ.get("BIG_RAYS", "393216"))
    iters = int(os.environ.get("BIG_ITERS", "3"))
    st = default_settings().replace(exact=False, static=False)
    scene = build_big_scene(st)
    cam_pos = np.array(scene.player.cam_pos, np.float32)
    cam_rot = np.array(scene.player.cam_rot, np.float32)
    cs = compile_scene(scene, cam_pos=cam_pos)
    occ = int((np.asarray(jax.device_get(cs.arrays.chunk_res)) > 0).sum())
    per_chunk = 4 * 32 * 128 * 2
    cap = min(occ, (11 * 2 ** 20) // per_chunk)
    print(json.dumps({"event": "scene", "occupied_chunks": occ,
                      "resident_cap": cap,
                      "pool_mib": round(cap * per_chunk / 2 ** 20, 1),
                      "full_mib": round(occ * per_chunk / 2 ** 20, 1),
                      "grid": list(cs.spec.shape)}), flush=True)
    assert occ > cap, "scene must overflow the VMEM pool for this bench"

    dirs, detail = pixel_grid(st, jnp.float32)
    reps = max(1, -(-n_rays // dirs.shape[0]))
    dirs = jnp.tile(dirs, (reps, 1))[:n_rays]
    detail = jnp.tile(detail, (reps,))[:n_rays]
    key = jax.random.PRNGKey(0)
    u_dof = jax.random.uniform(key, (n_rays, 2), jnp.float32)
    rays = generate_rays(st, jnp.asarray(cam_pos), jnp.asarray(cam_rot),
                         dirs, detail, u_dof)
    rays = RayBatch(*(x.astype(jnp.float32) for x in rays))
    table = cs.arrays.material_table

    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[-1]
        np.asarray(leaf.ravel()[:4])

    import dataclasses

    def fwd_block(table, rays):
        arrays = dataclasses.replace(cs.arrays, material_table=table)
        res, (trips, eps) = march_blockwise(
            st, cs.spec, arrays, rays, key=key, background="sky",
            programs_used=cs.programs_used, resident=True,
            resident_cap=cap, pool_center=cam_pos, byte_planes=True,
            inner_cap=int(os.environ.get("BIG_INNER_CAP", "2")),
            ep_cap=int(os.environ.get("BIG_EP_CAP", "384")),
            interpret=os.environ.get("BIG_CPU") == "1",
            return_trips=True)
        return (jnp.mean(res.color / 255.0), jnp.mean(res.step),
                jnp.mean(res.bounces), trips)

    def fwd_while(table, rays):
        arrays = dataclasses.replace(cs.arrays, material_table=table)
        res = march(st, cs.spec, arrays, rays, key=key, background="sky",
                    mode="while", programs_used=cs.programs_used)
        return (jnp.mean(res.color / 255.0), jnp.mean(res.step),
                jnp.mean(res.bounces))

    results = {}
    for name, f in (("kernel_heat_pool", jax.jit(fwd_block)),
                    ("xla_while", jax.jit(fwd_while))):
        t0 = time.time()
        out = f(table, rays)
        fence(out)
        compile_s = time.time() - t0
        fence(f(table, rays))  # warmup (first-call overhead)
        rtt = B._rtt_ms() if os.environ.get("BIG_CPU") != "1" else 0.0
        t0 = time.time()
        for _ in range(iters):
            out = f(table, rays)
        fence(out)
        dt = max(1e-9, (time.time() - t0) - rtt / 1e3) / iters
        rec = {"event": name, "ms": round(dt * 1e3, 2),
               "mrays_s": round(n_rays / dt / 1e6, 3),
               "compile_s": round(compile_s, 1),
               "loss": round(float(out[0]), 6),
               "steps_per_ray": round(float(out[1]), 2),
               "bounces_per_ray": round(float(out[2]), 3)}
        if len(out) > 3:
            rec["kernel_trips"] = int(out[3])
        results[name] = rec
        print(json.dumps(rec), flush=True)
    if abs(results["kernel_heat_pool"]["loss"]
           - results["xla_while"]["loss"]) > 1e-6:
        print(json.dumps({"event": "MISMATCH"}), flush=True)


if __name__ == "__main__":
    main()
