"""Run the five BASELINE.json evaluation configs end-to-end.

Each config exercises a capability pillar of the framework
(BASELINE.json "configs"); this script renders them all, reports metrics as
JSON lines and optionally writes PNGs. Used for acceptance runs on TPU and
(small) on CPU in CI.

  1. stock      — default scene, stock config, single frame
  2. multisample— samples=4 static-seed multisampling
  3. poststack  — full camera post stack over an animated camera path
  4. goxel_vol  — Goxel import with volumetric + translucent IOR materials
  5. flythrough — culling + physics displacement over a camera flythrough

Usage: python3 tools/eval_configs.py [--save-dir DIR] [--small]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _save(img, path):
    if path is None:
        return
    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    import pygame as pg

    surf = pg.Surface((img.shape[1], img.shape[0]))
    pg.surfarray.blit_array(surf, np.clip(img[..., :3], 0, 255).astype(np.uint8).transpose(1, 0, 2))
    pg.image.save(surf, path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--small", action="store_true", help="quarter resolution (CI)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "ignores JAX_PLATFORMS; --small implies --cpu)")
    ap.add_argument("--fps", type=int, default=0, metavar="N",
                    help="after the first (compile) frame, time N steady-"
                         "state frames per config and report fps / ms per "
                         "frame (the TPU Engine-path numbers, VERDICT r3 "
                         "item 5; reference target: 24 fps at 64x48, "
                         "mods/default/config.cfg:7)")
    args = ap.parse_args()
    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)

    import jax

    if args.cpu or args.small:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from python_raytracer_tpu.models.default import build_default_scene, default_settings
    from python_raytracer_tpu.ops.render import render_frame
    from python_raytracer_tpu.runtime.engine import Engine
    from python_raytracer_tpu.scene.compile import compile_scene

    def report(name, seconds, img, extra=None):
        rec = {
            "config": name,
            "sec": round(seconds, 3),
            "rgb_mean": round(float(img[..., :3].mean()), 2),
            "rgb_max": float(img[..., :3].max()),
        }
        rec.update(extra or {})
        print(json.dumps(rec))
        if args.save_dir:
            _save(np.asarray(img), os.path.join(args.save_dir, f"{name}.png"))

    base = default_settings()
    if args.small:
        base = base.replace(width=32, height=24)

    def steady_frame(name, fn, extra=None, extra_fn=None):
        """--fps: repeat a warmed single-frame render and report fps (the
        host readback in np.asarray is the fence — block_until_ready does
        not synchronize over the axon tunnel, ROADMAP measurement rules).
        ``extra_fn``: called after the run for late metrics (e.g. the
        Engine's per-phase wall-time breakdown, VERDICT r4 item 3)."""
        if not args.fps:
            return
        img = fn()  # warmup dispatch (first-call overhead, ROADMAP rules)
        np.asarray(img)
        t0 = time.time()
        for _ in range(args.fps):
            img = fn()
        np.asarray(img)
        dt = (time.time() - t0) / args.fps
        report(name + "_steady", dt, np.asarray(img),
               {**(extra or {}), **(extra_fn() if extra_fn else {}),
                "fps": round(1.0 / max(dt, 1e-9), 2),
                "ms_per_frame": round(dt * 1000, 2), "frames": args.fps})

    if not (args.cpu or args.small):
        # health stamp (ROADMAP measurement rules: the tunnel intermittently
        # degrades 100-1000x; numbers from a degraded window are garbage)
        x = jnp.ones((1024, 1024))
        fm = jax.jit(lambda a: a @ a)
        np.asarray(fm(x)[0, :4])
        t0 = time.time()
        o = x
        for _ in range(10):
            o = fm(o * 0.5)
        np.asarray(o[0, :4])
        print(json.dumps({"event": "health",
                          "matmul10_ms": round((time.time() - t0) * 1e3, 1)}))

    # 1. stock single frame.  render_frame is eager JAX — jit each config's
    # frame fn once (eager per-op dispatch costs per-op RPC latency over
    # the axon tunnel; measured seconds/frame for ~2 ms of compute).
    st = base
    scene = build_default_scene(st)
    cam_pos = np.array(scene.player.cam_pos)
    cam_rot = np.array(scene.player.cam_rot)
    cs = compile_scene(scene, cam_pos=cam_pos)
    f_stock = jax.jit(lambda arrays: render_frame(
        st, cs.spec, arrays, cam_pos, cam_rot,
        key=jax.random.PRNGKey(0), record_traversed=True))
    t0 = time.time()
    img, trav = f_stock(cs.arrays)
    img = np.asarray(img)
    report("stock", time.time() - t0, img,
           {"traversed_chunks": int(np.asarray(trav).sum())})
    steady_frame("stock", lambda: f_stock(cs.arrays)[0])

    # 2. samples=4 static multisampling (tape-replayed static noise)
    st4 = base.replace(samples=4)
    from python_raytracer_tpu.utils.tape import make_static_tape

    tape = make_static_tape(st4)
    scene4 = build_default_scene(st4)
    cs4 = compile_scene(scene4, cam_pos=cam_pos)
    f_ms = jax.jit(lambda arrays: render_frame(
        st4, cs4.spec, arrays, cam_pos, cam_rot, tape=tape))
    t0 = time.time()
    img4, _ = f_ms(cs4.arrays)
    report("multisample", time.time() - t0, np.asarray(img4), {"samples": 4})
    steady_frame("multisample", lambda: f_ms(cs4.arrays)[0], {"samples": 4})

    # 3. post stack over an animated camera path. On TPU the Engine returns
    # the pre-scale frame and the display edge scales on the host (the
    # reference's own pygame scale placement) — the 12.6 MB window-scaled
    # readback costs ~390 ms/frame over the axon tunnel.
    tpu = not (args.cpu or args.small)
    stp = base.replace(static=False)
    scene_p = build_default_scene(stp)
    eng = Engine(scene_p, host_scale=tpu)
    t0 = time.time()
    frames = 12 if not args.small else 6
    out = None
    for i in range(frames):
        eng.apply_input((0, 0, 0), (0, 8, 0), (0, 0), dt=1 / 24)  # pan
        out = eng.step(1 / 24)
    report("poststack", time.time() - t0, out,
           {"frames": frames, "iris": round(eng.iris, 4)})
    steady_frame("poststack", lambda: eng.step(1 / 24),
                 extra_fn=lambda: {"phase_ms": eng.last_phase_ms})

    # 4. Goxel import + volumetric/IOR materials (glass, scatter, mist cubes
    #    centered in view)
    from python_raytracer_tpu.scene import Scene, Object
    stg = base.replace(culling=False)
    scene_g = build_default_scene(stg)
    # aim the camera at the glass cube from nearby
    player = scene_g.player
    player.move((-4, 18, 2))
    player.rot = (0.0, 0.0, 0.0)
    player.set_camera_pos()
    cs_g = compile_scene(scene_g, cam_pos=np.array(player.cam_pos))
    gp = np.array(player.cam_pos)
    gr = np.array(player.cam_rot)
    f_gox = jax.jit(lambda arrays: render_frame(
        stg, cs_g.spec, arrays, gp, gr, key=jax.random.PRNGKey(2)))
    t0 = time.time()
    img_g, _ = f_gox(cs_g.arrays)
    report("goxel_vol", time.time() - t0, np.asarray(img_g))
    steady_frame("goxel_vol", lambda: f_gox(cs_g.arrays)[0])

    # 5. flythrough with culling + physics displacement
    stf = base.replace(static=False, culling=True)
    scene_f = build_default_scene(stf)
    # jitted batched physics tick (physics/jit_engine.py wired through the
    # Engine, VERDICT r4 item 5): one device dispatch for all movers
    engf = Engine(scene_f, jit_physics=True, host_scale=tpu)
    t0 = time.time()
    frames = 16 if not args.small else 8
    out = None
    for i in range(frames):
        engf.apply_input((0, 0, 1), (0, 4, 0), (0, 0), dt=1 / 24)
        out = engf.step(1 / 24)
    active = int((np.asarray(engf.compiled.arrays.chunk_res) > 0).sum())
    report("flythrough", time.time() - t0, out,
           {"frames": frames, "active_chunks": active,
            "player_pos": [round(c, 2) for c in engf.scene.player.pos]})

    def fly_step():
        engf.apply_input((0, 0, 1), (0, 4, 0), (0, 0), dt=1 / 24)
        return engf.step(1 / 24)

    steady_frame("flythrough", fly_step,
                 extra={"jit_physics": True},
                 extra_fn=lambda: {"phase_ms": engf.last_phase_ms})


if __name__ == "__main__":
    main()
