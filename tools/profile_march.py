"""In-process A/B profile of the march on the current device.

Measures, in ONE process (so axon-tunnel variance cancels):
  1. device health (matmul probe) before and after;
  2. while-march forward, iteration count, per-iteration ms;
  3. the same loop with shading stripped (gather + advance only);
  4. a pure gather loop (fetch word, add) at the same trip count;
  5. unroll 1/2/4 variants;
  6. scan-mode at fixed trip counts.

Usage: python3 tools/profile_march.py [n_rays]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t(fn, *a, iters=5):
    import jax
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from python_raytracer_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from python_raytracer_tpu.models.default import build_default_scene, default_settings
    from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
    from python_raytracer_tpu.ops.march import march, initial_state
    from python_raytracer_tpu.scene.compile import compile_scene
    import importlib
    MM = importlib.import_module("python_raytracer_tpu.ops.march")
    from python_raytracer_tpu.scene import compile as C

    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 393216

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
    rays = generate_rays(st, jnp.asarray(cam_pos), jnp.asarray(cam_rot), dirs, detail, u_dof)

    def health():
        x = jnp.ones((1024, 1024))
        f = jax.jit(lambda a: a @ a)
        f(x).block_until_ready()
        t0 = time.perf_counter()
        o = x
        for _ in range(10):
            o = f(o * 0.5)
        o.block_until_ready()
        return (time.perf_counter() - t0) * 1e3

    print(f"health before: {health():.1f} ms / 10 matmuls")

    # 1. full while-march forward; also trip count
    def fwd(unroll):
        f = jax.jit(lambda r: march(st, cs.spec, cs.arrays, r, key=key,
                                    background="sky", mode="while",
                                    programs_used=cs.programs_used,
                                    unroll=unroll).color)
        return t(f, rays)

    # trip count: run unjitted state walk? cheaper: use finalize=False and read it
    f_state = jax.jit(lambda r: march(st, cs.spec, cs.arrays, r, key=key,
                                      background="sky", mode="while",
                                      programs_used=cs.programs_used,
                                      finalize=False)[1].it)
    iters = int(f_state(rays))
    print(f"while-march trip count: {iters}")

    for u in (1, 2, 4):
        dt = fwd(u)
        print(f"fwd while unroll={u}: {dt*1e3:8.2f} ms  ({n_rays/dt/1e6:6.2f} Mrays/s)  ~{dt*1e3/iters:.3f} ms/iter")

    # 2. stripped loop: gather + advance only, same trip count
    spec = cs.spec
    words = cs.arrays.cell_word
    csz = float(st.chunk_size)

    def stripped(r):
        def body(s):
            pos, vel, step, alive, it = s
            fpos = jnp.floor(pos).astype(jnp.int32)
            word = MM._fetch_word(spec, words, fpos)
            skip_d = (word >> C.WORD_SKIP_SHIFT) & C.WORD_SKIP_MASK
            step_len = jnp.maximum(1, skip_d).astype(pos.dtype)
            pos = jnp.where(alive[:, None], pos + vel * step_len[:, None], pos)
            step = step + jnp.where(alive, step_len, 0.0)
            alive = alive & (step < 192.0)
            return pos, vel, step, alive, it + 1

        def cond(s):
            return (s[4] < iters)

        s0 = (r.pos, r.vel, jnp.zeros((n_rays,), jnp.float32),
              jnp.ones((n_rays,), bool), jnp.zeros((), jnp.int32))
        out = jax.lax.while_loop(cond, body, s0)
        return out[2]

    f2 = jax.jit(stripped)
    dt = t(f2, rays)
    print(f"gather+advance only ({iters} trips): {dt*1e3:8.2f} ms  ~{dt*1e3/iters:.3f} ms/iter")

    # 3. pure element-gather loop at same trip count (lower bound)
    def pure_gather(r):
        idx0 = (jnp.arange(n_rays) * 131071 % words.shape[0]).astype(jnp.int32)

        def body(s):
            acc, idx, it = s
            w = words[idx]
            acc = acc + w
            idx = (idx + w + 1) % words.shape[0]
            return acc, idx, it + 1

        out = jax.lax.while_loop(lambda s: s[2] < iters, body,
                                 (jnp.zeros((n_rays,), jnp.int32), idx0,
                                  jnp.zeros((), jnp.int32)))
        return out[0]

    f3 = jax.jit(pure_gather)
    dt = t(f3, rays)
    print(f"pure gather loop ({iters} trips): {dt*1e3:8.2f} ms  ~{dt*1e3/iters:.3f} ms/iter")

    # 4. no-gather control loop (VPU state updates only)
    def no_gather(r):
        def body(s):
            pos, vel, step, it = s
            step_len = jnp.maximum(1.0, jnp.min(jnp.abs(pos), axis=-1) * 0 + 1.0)
            pos = pos + vel * step_len[:, None]
            step = step + step_len
            return pos, vel, step, it + 1

        out = jax.lax.while_loop(lambda s: s[3] < iters, body,
                                 (r.pos, r.vel, jnp.zeros((n_rays,), jnp.float32),
                                  jnp.zeros((), jnp.int32)))
        return out[2]

    f4 = jax.jit(no_gather)
    dt = t(f4, rays)
    print(f"no-gather control loop ({iters} trips): {dt*1e3:8.2f} ms  ~{dt*1e3/iters:.3f} ms/iter")

    # 5. one-hot matmul alone at same trip count
    table = cs.arrays.material_table.astype(jnp.float32)
    K = table.shape[0]

    def onehot_loop(r):
        vid0 = (jnp.arange(n_rays) % K).astype(jnp.int32)

        def body(s):
            acc, vid, it = s
            onehot = (vid[:, None] == jnp.arange(K)[None, :]).astype(jnp.float32)
            rows = jnp.dot(onehot, table, preferred_element_type=jnp.float32)
            acc = acc + rows[:, 0]
            vid = (vid + 1) % K
            return acc, vid, it + 1

        out = jax.lax.while_loop(lambda s: s[2] < iters, body,
                                 (jnp.zeros((n_rays,), jnp.float32), vid0,
                                  jnp.zeros((), jnp.int32)))
        return out[0]

    f5 = jax.jit(onehot_loop)
    dt = t(f5, rays)
    print(f"one-hot matmul loop ({iters} trips): {dt*1e3:8.2f} ms  ~{dt*1e3/iters:.3f} ms/iter")

    print(f"health after: {health():.1f} ms / 10 matmuls")


if __name__ == "__main__":
    main()
