"""Hardware equality checks for the Pallas kernels (run on the TPU chip).

Interpret-mode tests (tests/test_pallas_dt.py, tests/test_blockmarch.py)
prove the kernel MATH; this tool proves the Mosaic-compiled kernels agree
with the XLA implementations on the real chip. Exit code 0 = all equal.

Usage: python3 tools/tpu_checks.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from python_raytracer_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()
    failures = 0

    # --- distance transform: Pallas vs XLA on the default scene's grid ---
    from python_raytracer_tpu.models.default import build_default_scene, default_settings
    from python_raytracer_tpu.ops.pallas_dt import cheb_distance_pallas
    from python_raytracer_tpu.scene.compile import SKIP_CAP, _cheb_distance, compile_scene

    st = default_settings().replace(exact=False, static=False)
    sc = build_default_scene(st)
    cam = np.array(sc.player.cam_pos, np.float32)
    cs = compile_scene(sc, cam_pos=cam)
    occ = (cs.arrays.world_ids > 0)
    t0 = time.time()
    got = np.asarray(cheb_distance_pallas(occ, cap=SKIP_CAP, tile=16))
    ref = np.asarray(jax.jit(lambda o: _cheb_distance(o, SKIP_CAP))(occ))
    eq = (got == ref).all()
    print(f"pallas_dt vs XLA on {occ.shape}: equal={bool(eq)} "
          f"({time.time()-t0:.1f}s)", flush=True)
    failures += 0 if eq else 1

    # --- blockwise march vs XLA march (f32, key mode, with hit tape) ---
    from python_raytracer_tpu.ops.blockmarch import march_blockwise
    from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
    from python_raytracer_tpu.ops.march import RayBatch, march

    n = int(os.environ.get("CHECK_RAYS", "12288"))
    dirs, detail = pixel_grid(st, jnp.float32)
    reps = -(-n // dirs.shape[0])
    dirs = jnp.tile(dirs, (reps, 1))[:n]
    detail = jnp.tile(detail, (reps,))[:n]
    key = jax.random.PRNGKey(0)
    u_dof = jax.random.uniform(key, (n, 2), jnp.float32)
    rays = generate_rays(st, jnp.asarray(cam), jnp.asarray(
        np.array(sc.player.cam_rot, np.float32)), dirs, detail, u_dof)
    rays = RayBatch(*(x.astype(jnp.float32) for x in rays))

    t0 = time.time()
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=16)
    if os.environ.get("CHECK_PAGED", "0") != "1":
        # the paged (vote+DMA) kernel costs ~1000 s to compile on the
        # round-4 service; the resident kernel is the production path and
        # compiles in seconds. CHECK_PAGED=1 restores the full matrix.
        out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                              background="sky",
                              programs_used=cs.programs_used,
                              record_hits=16, resident=True, inner_cap=4,
                              ep_cap=192)
    else:
        out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                              background="sky",
                              programs_used=cs.programs_used,
                              record_hits=16)
    checks = {
        "step": (np.asarray(ref.step) == np.asarray(out.step)).mean(),
        "bounces": (np.asarray(ref.bounces) == np.asarray(out.bounces)).mean(),
        "vid": (np.asarray(ref.hits.vid) == np.asarray(out.hits.vid)).mean(),
        "count": (np.asarray(ref.hits.count) == np.asarray(out.hits.count)).mean(),
    }
    # color involves pow() — transcendental lowering may differ by ULPs
    # between Mosaic and XLA on hardware; trajectories must agree exactly.
    cdiff = np.abs(np.asarray(ref.color) - np.asarray(out.color)).max()
    print(f"blockmarch vs XLA march (n={n}): "
          + " ".join(f"{k}={v:.6f}" for k, v in checks.items())
          + f" color_maxdiff={cdiff:.3e} ({time.time()-t0:.1f}s)", flush=True)
    if not all(v == 1.0 for v in checks.values()) or cdiff > 0.05:
        failures += 1

    # --- resident VMEM-pool kernel (byte planes) vs XLA march ---
    t0 = time.time()
    outr = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                           background="sky", programs_used=cs.programs_used,
                           record_hits=16, resident=True, byte_planes=True,
                           inner_cap=4, ep_cap=192)
    checks_r = {
        "step": (np.asarray(ref.step) == np.asarray(outr.step)).mean(),
        "bounces": (np.asarray(ref.bounces)
                    == np.asarray(outr.bounces)).mean(),
        "vid": (np.asarray(ref.hits.vid) == np.asarray(outr.hits.vid)).mean(),
        "count": (np.asarray(ref.hits.count)
                  == np.asarray(outr.hits.count)).mean(),
    }
    cdiff_r = np.abs(np.asarray(ref.color) - np.asarray(outr.color)).max()
    print(f"resident blockmarch vs XLA march (n={n}): "
          + " ".join(f"{k}={v:.6f}" for k, v in checks_r.items())
          + f" color_maxdiff={cdiff_r:.3e} ({time.time()-t0:.1f}s)",
          flush=True)
    if not all(v == 1.0 for v in checks_r.values()) or cdiff_r > 0.05:
        failures += 1

    # --- flat (straight-line) resident kernel vs XLA march ---
    t0 = time.time()
    outf = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                           background="sky", programs_used=cs.programs_used,
                           record_hits=16, resident=True, byte_planes=True,
                           flat=True, inner_cap=2, ep_cap=384,
                           tile=min(4096, n))  # bench-default tile (round 5)
    checks_f = {
        "step": (np.asarray(ref.step) == np.asarray(outf.step)).mean(),
        "bounces": (np.asarray(ref.bounces)
                    == np.asarray(outf.bounces)).mean(),
        "vid": (np.asarray(ref.hits.vid) == np.asarray(outf.hits.vid)).mean(),
        "count": (np.asarray(ref.hits.count)
                  == np.asarray(outf.hits.count)).mean(),
    }
    cdiff_f = np.abs(np.asarray(ref.color) - np.asarray(outf.color)).max()
    print(f"flat resident blockmarch vs XLA march (n={n}): "
          + " ".join(f"{k}={v:.6f}" for k, v in checks_f.items())
          + f" color_maxdiff={cdiff_f:.3e} ({time.time()-t0:.1f}s)",
          flush=True)
    if not all(v == 1.0 for v in checks_f.values()) or cdiff_f > 0.05:
        failures += 1

    # --- fused Pallas replay (fwd + bwd kernels) vs the XLA scan replay ---
    from python_raytracer_tpu.ops.diff import _replay
    from python_raytracer_tpu.ops.replay_block import make_replay_block

    t0 = time.time()
    table = cs.arrays.material_table.astype(jnp.float32)
    v0 = rays.vel
    c_x, _ = _replay(table, st, ref.hits, v0, "sky", cs.programs_used,
                     cs.arrays.program)
    replay_f = make_replay_block(st, "sky", interpret=False)
    c_b, _ = replay_f(table, ref.hits, v0)
    fdiff = float(np.abs(np.asarray(c_b) - np.asarray(c_x)).max())

    def loss_x(t):
        c, _ = _replay(t, st, ref.hits, v0, "sky", cs.programs_used,
                       cs.arrays.program)
        return jnp.mean(c / 255.0)

    def loss_b(t):
        c, _ = replay_f(t, ref.hits, v0)
        return jnp.mean(c / 255.0)

    g_x = np.asarray(jax.jit(jax.grad(loss_x))(table))
    g_b = np.asarray(jax.jit(jax.grad(loss_b))(table))
    scale = max(1e-12, np.abs(g_x).max())
    gdiff = float(np.abs(g_b - g_x).max() / scale)
    print(f"fused replay vs XLA replay (n={n}): color_maxdiff={fdiff:.3e} "
          f"grad_reldiff={gdiff:.3e} ({time.time()-t0:.1f}s)", flush=True)
    if fdiff > 0.05 or gdiff > 1e-3 or not np.isfinite(g_b).all():
        failures += 1

    print("OK" if failures == 0 else f"FAILURES: {failures}", flush=True)
    # Stamp the result where bench.py's preamble reports it (VERDICT r3
    # item 7): every BENCH tail carries the latest hardware-equality state.
    import json
    stamp = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".tpu_checks.json")
    with open(stamp, "w") as f:
        json.dump({"ok": failures == 0, "ts": time.time(),
                   "failures": failures}, f)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
