"""Simulate the no-sort blockwise-march kernel schedule on the real trace.

Design being evaluated (ROADMAP "Pallas blockwise march", no-sort variant):
rays keep their pixel order permanently; each fixed tile of R rays, per
superstep, votes for the top-B chunk blocks among its active rays' current
chunks; rays whose chunk won get marched to their chunk exit inside the
kernel; the rest stall until a later superstep. No sorting, no permutation
of state or hit tape.

Reports supersteps needed, lane-step waste (masked lanes while the tile's
inner loop runs to the slowest winner), and stall behavior, from the same
iteration trace as analyze_coherence.py.

Run: python3 tools/simulate_blockmarch.py [n_rays]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_trace(n_rays):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from python_raytracer_tpu.models.default import build_default_scene, default_settings
    from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
    from python_raytracer_tpu.ops.march import march, initial_state
    from python_raytracer_tpu.scene.compile import compile_scene

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

    state = initial_state(st, spec, rays)
    step1 = jax.jit(
        lambda s: march(st, spec, cs.arrays, rays, key=key, background=None,
                        mode="while", programs_used=cs.programs_used,
                        resume_state=s, num_iters=1, finalize=False)[1]
    )
    cs_f = float(st.chunk_size)
    org = np.array(spec.origin, np.float32)
    cshape = np.array(spec.chunk_shape, np.int32)
    Ks, As = [], []
    for it in range(st.march_steps):
        alive = np.asarray(state.alive)
        if not alive.any():
            break
        pos = np.asarray(state.pos)
        ci = np.floor((np.floor(pos / cs_f) * cs_f - org) / cs_f).astype(np.int64)
        in_grid = ((ci >= 0) & (ci < cshape)).all(-1)
        flat = (ci[:, 0] * cshape[1] + ci[:, 1]) * cshape[2] + ci[:, 2]
        k = np.where(alive & in_grid, flat, -2)
        Ks.append(np.where(alive, k, -1))
        As.append(alive.copy())
        state = step1(state)
    return np.stack(Ks), np.stack(As)


def episodes(K, A):
    """Per ray: list of (chunk_key, inner_iterations)."""
    T, N = K.shape
    eps = [[] for _ in range(N)]
    for r in range(N):
        last = None
        for t in range(T):
            if not A[t, r]:
                break
            k = K[t, r]
            if last is not None and k == last:
                eps[r][-1][1] += 1
            else:
                eps[r].append([k, 1])
                last = k
    return eps


def simulate(eps, n_rays, tile, B, inner_cap, policy="mode"):
    n_tiles = -(-n_rays // tile)
    ptr = np.zeros(n_rays, np.int64)  # episode pointer
    nep = np.array([len(e) for e in eps])
    supersteps = 0
    lane_steps = 0  # tile inner iterations x tile width (the MXU cost driver)
    useful = sum(min(l, inner_cap) + (l - 1) // inner_cap * 0 for e in eps for _, l in e)
    ideal = sum(l for e in eps for _, l in e)
    active_tiles_total = 0
    stall_events = 0
    while True:
        act = ptr < nep
        if not act.any():
            break
        supersteps += 1
        for t in range(n_tiles):
            lo, hi = t * tile, min((t + 1) * tile, n_rays)
            rs = np.arange(lo, hi)[act[lo:hi]]
            if rs.size == 0:
                continue
            active_tiles_total += 1
            keys = np.array([eps[r][ptr[r]][0] for r in rs])
            lens = np.array([eps[r][ptr[r]][1] for r in rs])
            if policy == "mode":
                uniq, cnt = np.unique(keys, return_counts=True)
                top = uniq[np.argsort(-cnt)][:B]
            else:  # first-active: chunk of the lowest-index active ray(s)
                top = []
                for k in keys:
                    if k not in top:
                        top.append(k)
                        if len(top) >= B:
                            break
                top = np.array(top)
            win = np.isin(keys, top)
            stall_events += int((~win).sum())
            if not win.any():
                continue
            # winners march to chunk exit; inner loop runs to slowest winner
            # (capped; an episode longer than the cap continues next superstep)
            adv_lens = np.minimum(lens[win], inner_cap)
            inner = int(adv_lens.max())
            lane_steps += inner * tile
            for r, full, adv in zip(rs[win], lens[win], adv_lens):
                if full <= inner_cap:
                    ptr[r] += 1
                else:
                    eps[r][ptr[r]][1] = full - adv
    return supersteps, lane_steps, ideal, active_tiles_total, stall_events


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 49152
    K, A = build_trace(n_rays)
    print(f"trace: {K.shape[0]} iterations, {n_rays} rays")
    base = episodes(K, A)
    ideal = sum(l for e in base for _, l in e)
    print(f"ideal ray-steps: {ideal} ({ideal/n_rays:.1f}/ray)")
    import copy
    for policy in ("mode", "first"):
        for tile in (256,):
            for B in (1, 2):
                eps = copy.deepcopy(base)
                ss, lane, idl, tiles, stalls = simulate(eps, n_rays, tile, B,
                                                        inner_cap=32, policy=policy)
                print(f"policy={policy} tile={tile} B={B}: supersteps={ss} "
                      f"lane-steps={lane} (x{lane/idl:.2f} vs ideal) "
                      f"tile-episode-visits={tiles} stalls={stalls}")


if __name__ == "__main__":
    main()
