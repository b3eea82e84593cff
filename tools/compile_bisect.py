"""Bisect the fused kernel program's compile-time blowup (VERDICT r3 #3).

The bench's fused jit(fwd) — initial co-sort + Pallas kernel + final
co-sort + XLA cleanup march + background — took ~8 min to XLA-compile in
round 2 and 33-50+ min in round 3. This tool compiles each piece as its own
program and times it, so the hog is identified instead of guessed, and so a
split-program bench path (one cheap program per piece, dispatched
back-to-back on-stream — the same trick bench.py already uses for fwd vs
bwd) can be justified with numbers.

Pieces (bench shapes: n=393216, tile=2048, H=12, ep32/inner24):
  sort_in   — the 9-operand initial coherence co-sort
  kernel    — ONE pallas_call invocation (the Mosaic kernel + XLA shell)
  kernel_rs — same, resident mode (VMEM pool, no DMA machinery)
  kernel_rs_bp — resident + byte_planes (bf16 pool)
  unsort    — the 36-operand final co-sort (suspected hog)
  cleanup   — the XLA while-march on resume state
  replay    — the hit-replay backward (grad program)
  FUSED     — optionally (env BISECT_FUSED=1) the whole fused fwd

Each compile is AOT (.lower().compile()) with the persistent cache
DISABLED for timed pieces (a hit would report seconds for a cached entry),
unless BISECT_CACHE=1. Results append to JSONL (arg 1, default
/tmp/compile_bisect.jsonl). Compiles serialize on the remote service — run
this alone, never while another compile is in flight.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    log_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/compile_bisect.jsonl"
    only = set((os.environ.get("BISECT_ONLY") or "").split(",")) - {""}

    import jax
    import jax.numpy as jnp

    if os.environ.get("BISECT_CACHE") == "1":
        from python_raytracer_tpu.utils.cache import enable_persistent_cache
        enable_persistent_cache()

    from python_raytracer_tpu.models.default import (build_default_scene,
                                                     default_settings)
    from python_raytracer_tpu.ops import blockmarch as B
    from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
    from python_raytracer_tpu.ops.march import RayBatch, march
    from python_raytracer_tpu.scene.compile import compile_scene

    st = default_settings().replace(exact=False, static=False)
    scene = build_default_scene(st)
    cam_pos = np.array(scene.player.cam_pos, np.float32)
    cs = compile_scene(scene, cam_pos=cam_pos)

    n = int(os.environ.get("BISECT_RAYS", "393216"))
    tile = int(os.environ.get("BISECT_TILE", "2048"))
    H = 12
    ep_cap, inner_cap = 32, 24
    dirs, detail = pixel_grid(st, jnp.float32)
    reps = max(1, -(-n // dirs.shape[0]))
    dirs = jnp.tile(dirs, (reps, 1))[:n]
    detail = jnp.tile(detail, (reps,))[:n]
    key = jax.random.PRNGKey(0)
    u_dof = jax.random.uniform(key, (n, 2), jnp.float32)
    rays = generate_rays(st, jnp.asarray(cam_pos),
                         jnp.asarray(np.array(scene.player.cam_rot,
                                              np.float32)),
                         dirs, detail, u_dof)

    def log(name, sec, extra=None):
        rec = {"piece": name, "compile_sec": round(sec, 1), "n": n,
               "tile": tile, **(extra or {})}
        print(json.dumps(rec), flush=True)
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def timed(name, fn, *args):
        if only and name not in only:
            return
        t0 = time.time()
        try:
            jax.jit(fn).lower(*args).compile()
            log(name, time.time() - t0)
        except Exception as e:
            log(name, time.time() - t0, {"error": repr(e)[:300]})

    npad = -(-max(n, tile) // tile) * tile
    CX, CY, CZ = cs.spec.chunk_shape
    czp = B._pad_to(CZ, 8)
    cxyp = B._pad_to(CX * CY, 8)

    # --- piece: initial coherence sort (9 operands, 1 key) ---
    def sort_in(pos, vel, life):
        sid = jnp.arange(npad, dtype=jnp.int32)
        skey = jnp.where(life > 0, sid % 1000, jnp.int32(2 ** 30))
        return jax.lax.sort([skey, sid, pos[:, 0], pos[:, 1], pos[:, 2],
                             vel[:, 0], vel[:, 1], vel[:, 2], life],
                            dimension=0, is_stable=True, num_keys=1)

    pos = jnp.zeros((npad, 3), jnp.float32)
    vel = jnp.zeros((npad, 3), jnp.float32)
    life = jnp.zeros((npad,), jnp.float32)
    timed("sort_in", sort_in, pos, vel, life)

    # --- piece: final unsort co-sort (1 + 16 + 3 + 16 operands, 1 key) ---
    def unsort(F2, Iflags, Iptr, Icnt, R2, sid_s):
        ops = [sid_s] + [F2[i] for i in range(B.F_ROWS)] + [
            Iflags, Iptr, Icnt] + [R2[i] for i in range(16)]
        return jax.lax.sort(ops, dimension=0, is_stable=False, num_keys=1)

    F2 = jnp.zeros((B.F_ROWS, npad), jnp.float32)
    I1 = jnp.zeros((npad,), jnp.int32)
    R2 = jnp.zeros((16, npad), jnp.int32)
    timed("unsort", unsort, F2, I1, I1, I1, R2, I1)

    # --- piece: ONE kernel invocation (paged, bench static params) ---
    def kernel_call(resident, byte_planes):
        blocks, coarse = B.pack_blocks(cs.spec, cs.arrays.cell_word,
                                       cs.arrays.chunk_res,
                                       byte_planes=byte_planes)
        if resident:
            occ = np.asarray(jax.device_get(cs.arrays.chunk_res)) > 0
            blocks = blocks[jnp.asarray(np.nonzero(occ)[0].astype(np.int32))]
        mat8 = B.pack_mat_rows(cs.arrays.material_table)
        kp = mat8.shape[1]
        import python_raytracer_tpu.utils.rng as R
        k1, k2 = R.key_data_pair(key)
        scal = jax.lax.bitcast_convert_type(
            jnp.stack([k1, k2]).astype(jnp.uint32), jnp.int32)
        kern = B._make_kernel(st, cs.spec, w=tile, record_hits=H,
                              ep_cap=ep_cap, inner_cap=inner_cap, czp=czp,
                              cxyp=cxyp, kp=kp, byte_planes=byte_planes,
                              resident=resident)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        hp = 16
        groups = tile // 256
        state_spec = lambda rows: pl.BlockSpec((rows, tile), lambda t, s: (0, t),
                                               memory_space=pltpu.VMEM)

        def run(F, I, Rrec):
            return pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(npad // tile,),
                    in_specs=[state_spec(B.F_ROWS), state_spec(B.I_ROWS),
                              state_spec(hp),
                              pl.BlockSpec(memory_space=(pltpu.VMEM if resident
                                                         else pl.ANY)),
                              pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=[state_spec(B.F_ROWS), state_spec(B.I_ROWS),
                               state_spec(hp),
                               pl.BlockSpec((1, czp, cxyp),
                                            lambda t, s: (t, 0, 0),
                                            memory_space=pltpu.VMEM)],
                    scratch_shapes=([
                        pltpu.VMEM(((4 if byte_planes else 2), tile),
                                   jnp.float32),
                    ] if resident else [
                        (pltpu.VMEM((groups, 4, 32, 128), jnp.bfloat16)
                         if byte_planes else
                         pltpu.VMEM((groups, 64, 128), jnp.float32)),
                        pltpu.SemaphoreType.DMA((groups,)),
                        pltpu.VMEM(((4 if byte_planes else 2), tile),
                                   jnp.float32),
                    ]),
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((B.F_ROWS, npad), jnp.float32),
                    jax.ShapeDtypeStruct((B.I_ROWS, npad), jnp.int32),
                    jax.ShapeDtypeStruct((hp, npad), jnp.int32),
                    jax.ShapeDtypeStruct((npad // tile, czp, cxyp), jnp.int32),
                ],
            )(scal, F, I, Rrec, blocks, coarse, mat8)

        return run

    F = jnp.zeros((B.F_ROWS, npad), jnp.float32)
    I = jnp.zeros((B.I_ROWS, npad), jnp.int32)
    Rr = jnp.zeros((16, npad), jnp.int32)
    timed("kernel", kernel_call(False, False), F, I, Rr)
    timed("kernel_rs", kernel_call(True, False), F, I, Rr)
    timed("kernel_rs_bp", kernel_call(True, True), F, I, Rr)

    # --- piece: XLA cleanup march (while-mode, resume path shape) ---
    def cleanup(table, rays):
        arrays = dataclasses.replace(cs.arrays, material_table=table)
        res = march(st, cs.spec, arrays, rays, key=key, background="sky",
                    mode="while", programs_used=cs.programs_used,
                    record_hits=H)
        return res.color

    timed("cleanup", cleanup, cs.arrays.material_table, rays)

    # --- piece: the hit-replay backward ---
    from python_raytracer_tpu.ops.diff import _replay
    from python_raytracer_tpu.ops.march import HitRecords

    def bwd_loss(table, hits, v0):
        color, _ = _replay(table, st, hits, v0, "sky", cs.programs_used,
                           cs.arrays.program)
        return jnp.mean(color / 255.0)

    hits = HitRecords(vid=jnp.zeros((n, H), jnp.int32),
                      u=jnp.zeros((n, H, 3), jnp.float32),
                      flip=jnp.zeros((n, H), jnp.int32),
                      count=jnp.zeros((n,), jnp.int32), cell=None)
    timed("replay", jax.grad(bwd_loss), cs.arrays.material_table, hits,
          rays.vel)

    # --- whole fused fwd for reference (SLOW — opt in) ---
    if os.environ.get("BISECT_FUSED") == "1":
        def fwd(table, rays):
            arrays = dataclasses.replace(cs.arrays, material_table=table)
            res = B.march_blockwise(st, cs.spec, arrays, rays, key=key,
                                    background="sky",
                                    programs_used=cs.programs_used,
                                    record_hits=H, tile=tile)
            return (jnp.mean(res.color / 255.0), res.hits,
                    (jnp.mean(res.step), jnp.mean(res.bounces)))

        timed("FUSED", fwd, cs.arrays.material_table, rays)


if __name__ == "__main__":
    main()
