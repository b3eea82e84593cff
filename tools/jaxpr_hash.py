"""Hash the traced jaxpr of the bench-default blockmarch program.

Trace-neutrality guard: kernel refactors must keep the DEFAULT-config trace
byte-identical, or every committed .jax_cache entry / .jax_exec artifact for
the bench program is silently invalidated (the driver's deadline-bound BENCH
run would fall back to a cold 50-min compile — the rounds-1..3 failure mode).

Usage:
    python3 tools/jaxpr_hash.py            # print hash of the default trace
    python3 tools/jaxpr_hash.py save       # write .jaxpr_hash.ref
    python3 tools/jaxpr_hash.py check      # compare vs .jaxpr_hash.ref
"""

import dataclasses
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

REF = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".jaxpr_hash.ref")


def bench_fwd_jaxpr(n=8192, **block_kw):
    from python_raytracer_tpu.models.default import (build_default_scene,
                                                     default_settings)
    from python_raytracer_tpu.ops.blockmarch import march_blockwise
    from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
    from python_raytracer_tpu.scene.compile import compile_scene

    st = default_settings().replace(exact=False, static=False)
    scene = build_default_scene(st)
    cam_pos = np.array(scene.player.cam_pos, np.float32)
    cs = compile_scene(scene, cam_pos=cam_pos)
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
    kw = dict(tile=2048, supersteps=1, ep_cap=32, inner_cap=24, unroll=1,
              byte_planes=False, group_coarse=False, pages=1,
              resort_life=False)
    kw.update(block_kw)

    def fwd(table, rays):
        arrays = dataclasses.replace(cs.arrays, material_table=table)
        res = march_blockwise(st, cs.spec, arrays, rays, key=key,
                              background="sky",
                              programs_used=cs.programs_used,
                              record_hits=12, **kw)
        return (jnp.mean(res.color / 255.0), res.hits,
                (jnp.mean(res.step), jnp.mean(res.bounces)))

    return str(jax.make_jaxpr(fwd)(cs.arrays.material_table, rays))


def main():
    txt = bench_fwd_jaxpr()
    h = hashlib.sha256(txt.encode()).hexdigest()[:24]
    mode = sys.argv[1] if len(sys.argv) > 1 else "print"
    if mode == "save":
        with open(REF, "w") as f:
            f.write(h + "\n")
        print("saved", h)
    elif mode == "check":
        want = open(REF).read().strip()
        print("have", h, "want", want)
        if h != want:
            print("TRACE CHANGED — bench cache/exec artifacts invalidated")
            sys.exit(1)
        print("trace unchanged")
    else:
        print(h)


if __name__ == "__main__":
    main()
