"""Workload analysis for the Pallas blockwise-march design (ROADMAP).

Replays the default-scene march on CPU, recording each ray's active-chunk
key per iteration, then reports the statistics that size the kernel:

  * iterations per ray / chunk switches per ray (= supersteps needed when
    every ray progresses every superstep);
  * per-superstep ray->chunk group sizes (padding waste at various tiles);
  * fraction of iterations spent in void (no chunk: closed-form skip, no
    table access needed);
  * distinct chunks alive per superstep (DMA traffic bound).

Run: python3 tools/analyze_coherence.py [n_rays]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from python_raytracer_tpu.models.default import build_default_scene, default_settings
    from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
    from python_raytracer_tpu.ops.march import march, initial_state
    from python_raytracer_tpu.scene.compile import compile_scene

    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 49152

    st = default_settings().replace(exact=False, static=False)
    scene = build_default_scene(st)
    cam_pos = np.array(scene.player.cam_pos, np.float32)
    cam_rot = np.array(scene.player.cam_rot, np.float32)
    cs = compile_scene(scene, cam_pos=cam_pos)
    spec = cs.spec

    dirs, detail = pixel_grid(st, jnp.float32)
    reps = max(1, -(-n_rays // dirs.shape[0]))
    dirs = jnp.tile(dirs, (reps, 1))[:n_rays]
    detail = jnp.tile(detail, (reps,))[:n_rays]
    key = jax.random.PRNGKey(0)
    u_dof = jax.random.uniform(key, (n_rays, 2), jnp.float32)
    rays = generate_rays(st, jnp.asarray(cam_pos), jnp.asarray(cam_rot), dirs, detail, u_dof)

    # step the march one iteration at a time, recording chunk keys
    state = initial_state(st, spec, rays)
    step1 = jax.jit(
        lambda s: march(st, spec, cs.arrays, rays, key=key, background=None,
                        mode="while", programs_used=cs.programs_used,
                        resume_state=s, num_iters=1, finalize=False)[1]
    )

    cs_f = float(st.chunk_size)
    org = np.array(spec.origin, np.float32)
    cshape = np.array(spec.chunk_shape, np.int32)

    keys_per_iter = []  # [T][N] int chunk key, -1 dead, -2 void
    alive_per_iter = []
    for it in range(st.march_steps):
        alive = np.asarray(state.alive)
        if not alive.any():
            break
        pos = np.asarray(state.pos)
        ci = np.floor((np.floor(pos / cs_f) * cs_f - org) / cs_f).astype(np.int64)
        in_grid = ((ci >= 0) & (ci < cshape)).all(-1)
        flat = (ci[:, 0] * cshape[1] + ci[:, 1]) * cshape[2] + ci[:, 2]
        # chunk occupancy: does the cell word at pos have res>0? use cres after
        # the step for "had chunk", but for grouping the key of where it IS:
        k = np.where(alive & in_grid, flat, -2)
        k = np.where(alive, k, -1)
        keys_per_iter.append(k)
        alive_per_iter.append(alive.copy())
        state = step1(state)

    T = len(keys_per_iter)
    K = np.stack(keys_per_iter)  # [T, N]
    A = np.stack(alive_per_iter)

    total_ray_iters = int(A.sum())
    print(f"rays={n_rays} iterations={T} ray-iterations={total_ray_iters} "
          f"(avg {total_ray_iters/n_rays:.1f} iters/ray)")

    # chunk switches per ray (counting only alive transitions)
    switches = np.zeros(n_rays, np.int64)
    last = np.full(n_rays, -3, np.int64)
    for t in range(T):
        m = A[t]
        ch = m & (K[t] != last)
        switches += ch
        last = np.where(m, K[t], last)
    print(f"chunk episodes/ray: mean {switches.mean():.2f}  p50 {np.percentile(switches,50):.0f}  "
          f"p90 {np.percentile(switches,90):.0f}  p99 {np.percentile(switches,99):.0f}  max {switches.max()}")

    # void fraction
    void_iters = int(((K == -2) & A).sum())
    print(f"void ray-iterations: {void_iters} ({100*void_iters/max(1,total_ray_iters):.1f}%)")

    # per-iteration grouping stats
    print("\nper-iteration occupancy (alive rays -> chunks):")
    print(" it  alive    void  chunks  p50grp  p90grp  pad256 pad512")
    for t in range(0, T, max(1, T // 16)):
        m = A[t]
        kk = K[t][m]
        void = int((kk == -2).sum())
        inch = kk[kk >= 0]
        if inch.size:
            uniq, cnt = np.unique(inch, return_counts=True)
            pad256 = int((np.ceil(cnt / 256) * 256).sum() + np.ceil(void/256)*256)
            pad512 = int((np.ceil(cnt / 512) * 512).sum() + np.ceil(void/512)*512)
            print(f"{t:3d} {int(m.sum()):6d} {void:7d} {uniq.size:7d} "
                  f"{int(np.percentile(cnt,50)):7d} {int(np.percentile(cnt,90)):7d} "
                  f"{pad256:7d} {pad512:6d}")
        else:
            print(f"{t:3d} {int(m.sum()):6d} {void:7d}       0")

    # superstep simulation: every ray marches through its current chunk to
    # exit within one superstep (what the kernel does); supersteps needed =
    # max chunk episodes; per-superstep work = padded group sizes at episode e
    E = int(switches.max())
    print(f"\nsuperstep model: {E} supersteps (max episodes)")
    # episode table: for each ray, the chunk key of episode e
    ep_keys = np.full((E, n_rays), -1, np.int64)
    eidx = np.zeros(n_rays, np.int64)
    last = np.full(n_rays, -3, np.int64)
    for t in range(T):
        m = A[t]
        ch = m & (K[t] != last)
        rs = np.where(ch)[0]
        ep_keys[np.minimum(eidx[rs], E - 1), rs] = K[t][rs]
        eidx += ch
        last = np.where(m, K[t], last)
    tot_pad256 = tot_pad512 = tot_pad1024 = 0
    for e in range(E):
        kk = ep_keys[e]
        inch = kk[kk >= 0]
        void = int((kk == -2).sum())
        if inch.size:
            _, cnt = np.unique(inch, return_counts=True)
            tot_pad256 += int((np.ceil(cnt/256)*256).sum()) + int(np.ceil(void/256)*256)
            tot_pad512 += int((np.ceil(cnt/512)*512).sum()) + int(np.ceil(void/512)*512)
            tot_pad1024 += int((np.ceil(cnt/1024)*1024).sum()) + int(np.ceil(void/1024)*1024)
    ideal = int((switches > 0).sum() * 1)  # one tile-visit per episode per ray
    print(f"padded tile-rays over all supersteps: tile256={tot_pad256} "
          f"tile512={tot_pad512} tile1024={tot_pad1024} (ray-episodes={int(switches.sum())})")
    print(f"padding overhead: x{tot_pad256/max(1,int(switches.sum())):.2f} (256) "
          f"x{tot_pad512/max(1,int(switches.sum())):.2f} (512) "
          f"x{tot_pad1024/max(1,int(switches.sum())):.2f} (1024)")


if __name__ == "__main__":
    main()
