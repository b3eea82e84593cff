"""Headless driver for the reference engine — the golden-image oracle.

Drives the *actual reference code* at /root/reference (its Camera.trace march,
Frame voxel store, material shaders) without a window or process pool, so the
TPU renderer can be compared pixel-for-pixel against it. The reference has no
tests of its own (SURVEY.md §4), so this harness is the oracle for golden
tests: it replicates the orchestration that Window would do — chunk building
(init.py:389-452) and the per-pixel sample loop of Camera.tile
(init.py:126-147) — while calling into the reference's own modules for all
math and traversal.

Also records a Mersenne-Twister "RNG tape": the exact uniform draws each
(pixel, sample) ray consumed, in order, so the TPU marcher can replay them
bit-for-bit (SURVEY.md §7 "RNG-exact image matching", plan A).

Usage (writes a golden .npz):
    python3 tools/reference_oracle.py --out tests/golden/default_nonoise.npz \
        --override dof=0 --override lod_random=0 --zero-roughness
"""

from __future__ import annotations

import argparse
import math
import os
import random
import sys

import numpy as np

REF_PATH = os.environ.get("REFERENCE_PATH", "/root/reference")


class RecordingRandom:
    """random-module stand-in that records draws per seeded stream."""

    def __init__(self):
        self._rng = random.Random()
        self.recording = None  # list to append draws to, or None

    def seed(self, n=None):
        self._rng.seed(n)

    def random(self):
        v = self._rng.random()
        if self.recording is not None:
            self.recording.append(v)
        return v

    def getrandbits(self, k):
        return self._rng.getrandbits(k)


def load_reference(mod: str = "default", content_root: str = None):
    """Import the reference engine headlessly; returns (lib, data, Camera).

    ``content_root``: directory whose ``mods/<mod>/`` holds the scene to
    load (the reference resolves mod paths relative to the CWD,
    data.py:16-17); defaults to the reference's own tree."""
    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    root = content_root or REF_PATH
    os.chdir(root)
    if root not in sys.path:
        sys.path.insert(0, root)
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    sys.argv = ["init.py", mod]
    for name in list(sys.modules):
        if name in ("lib", "data") or name.startswith("mods"):
            sys.modules.pop(name, None)
    import lib  # noqa: E402
    import data  # noqa: E402

    # Execute init.py's source up to (but not including) the trailing
    # Window() instantiation, to obtain the Camera class without starting
    # the app (reference init.py:474).
    src = open(os.path.join(REF_PATH, "init.py")).read()
    cut = src.rfind("Window()")
    ns = {"__name__": "ref_init"}
    exec(compile(src[:cut], "ref_init.py", "exec"), ns)
    return lib, data, ns["Camera"]


def apply_overrides(data, overrides: dict):
    """Mutate data.settings post-import and refresh derived values
    (reference data.py:64-68)."""
    for k, v in overrides.items():
        setattr(data.settings, k, v)
    s = data.settings
    s.window = s.width, s.height
    s.window_scaled = s.window[0] * s.scale, s.window[1] * s.scale
    s.proportions = ((s.width + s.height) / 2) / max(s.width, s.height)
    s.chunk_time = s.chunk_rate / 1000
    s.chunk_radius = round(s.chunk_size / 2)


def build_camera(lib, data, Camera, packed: bool = False):
    """Build the camera chunk dict the way Window.chunk_update does with all
    chunks traversed (reference init.py:389-452). ``packed=False`` skips the
    reference's greedy box compression — a pure speed optimization with
    identical get_voxel results."""
    vec3 = lib.vec3
    s = data.settings
    cs = s.chunk_size
    cam = Camera()
    cam.pos = data.player.cam_pos
    cam.rot = data.player.cam_rot

    # Pass 1: per-object chunk voxel gathers (init.py:398-429).
    chunks_objects = {}
    for obj_id, obj in data.objects.items():
        dist = obj.pos.distance(cam.pos)
        obj.visible = bool(obj.sprite) and dist <= s.dist_max + obj.size.maxs()
        if not obj.visible:
            continue
        spr = obj.get_sprite()
        cmin = obj.mins.snapped(cs)
        cmax = obj.maxs.snapped(cs)
        for cx in range(cmin.x, cmax.x + 1, cs):
            for cy in range(cmin.y, cmax.y + 1, cs):
                for cz in range(cmin.z, cmax.z + 1, cs):
                    voxels = {}
                    pos_min = obj.mins.max(vec3(cx, cy, cz))
                    pos_max = obj.maxs.min(vec3(cx + cs, cy + cs, cz + cs))
                    for x in range(pos_min.x, pos_max.x):
                        for y in range(pos_min.y, pos_max.y):
                            for z in range(pos_min.z, pos_max.z):
                                mat = spr.get_voxel(None, vec3(x, y, z) - obj.mins, obj.rot)
                                if mat:
                                    voxels[(x, y, z)] = mat
                    if voxels:
                        chunks_objects.setdefault(obj_id, {})[(cx, cy, cz)] = voxels

    # Pass 2: merge per chunk + LOD ladder (init.py:434-446).
    chunk_keys = set()
    for per_obj in chunks_objects.values():
        chunk_keys.update(per_obj.keys())
    chunks = {}
    for post in chunk_keys:
        voxels = {}
        for per_obj in chunks_objects.values():
            if post in per_obj:
                voxels |= per_obj[post]
        ladder = []
        for lod in range(s.chunk_lod + 1):
            frame = data.Frame(packed=packed, resolution=lod + 1)
            frame.set_voxels(voxels, True)
            ladder.append(frame)
        chunks[post] = ladder

    # Pass 3: camera assignment by distance LOD, culling off (init.py:447-452).
    for post, ladder in chunks.items():
        pos = vec3(post[0], post[1], post[2]) + s.chunk_radius
        lod = min(math.trunc(pos.distance(cam.pos) / (s.dist_max / (1 + s.chunk_lod))), s.chunk_lod)
        cam.chunk_set(post, ladder[lod])
    return cam


def render(lib, data, cam, record_tape: bool = True, max_draws: int = 0):
    """Render a frame via Camera.trace, replicating the Camera.tile pixel /
    sample loop (init.py:126-147). Returns (image [H, W, 4] float64,
    tape [H*W, S, D] float64, diag dict)."""
    s = data.settings
    W, H, S = s.width, s.height, s.samples

    rec = RecordingRandom()
    lib.random = rec  # lib.rand() and the sample-loop draws go through this

    image = np.zeros((H, W, 4), dtype=np.float64)
    traversed_union = set()
    steps = np.zeros((H, W), dtype=np.float64)
    bounces = np.zeros((H, W), dtype=np.float64)
    draw_counts = np.zeros((H, W, S), dtype=np.int32)
    tapes = {}

    for x in range(W):
        for y in range(H):
            colors = []
            dir_x = -1 + (x / W) * 2
            dir_y = -1 + (y / H) * 2
            detail = 1 - abs(dir_x * dir_y) * s.lod_edge
            samples = max(1, round(s.samples * detail))
            for sample in range(samples):
                if s.static:
                    rec.seed((1 + x) * (1 + y) * (1 + sample))
                rec.recording = []
                ray_detail = detail / (1 + sample * s.lod_samples) * (1 - s.lod_random * rec.random())
                ray = cam.trace(dir_x, dir_y, ray_detail)
                alpha = round(min(1, ray.energy + s.shutter) * 255)
                colors.append(ray.color.array() + [alpha])
                draw_counts[y, x, sample] = len(rec.recording)
                if record_tape:
                    tapes[(y, x, sample)] = list(rec.recording)
                rec.recording = None
                for post in ray.traversed:
                    traversed_union.add(post)
                if sample == 0:
                    steps[y, x] = ray.step
                    bounces[y, x] = ray.bounces
            color = lib.average(colors)
            image[y, x] = [int(c) for c in color]

    tape = None
    if record_tape:
        d_max = max(max_draws, int(draw_counts.max()) + 3)
        tape = np.zeros((H * W, S, d_max), dtype=np.float64)
        for (y, x, sample), draws in tapes.items():
            # Extend each stream deterministically so the TPU replay can read
            # past the recorded draws without changing consumed values.
            rng = random.Random((1 + x) * (1 + y) * (1 + sample)) if s.static else None
            if rng is not None:
                full = [rng.random() for _ in range(d_max)]
                assert full[: len(draws)] == draws, "tape replay mismatch"
            else:
                full = draws + [0.5] * (d_max - len(draws))
            tape[y * W + x, sample] = full[:d_max]
    diag = {"steps": steps, "bounces": bounces, "draw_counts": draw_counts,
            "traversed_union": traversed_union}
    return image, tape, diag


def zero_roughness(data):
    """Zero all material roughness for a draw-free deterministic march."""
    seen = set()
    for obj in data.objects.values():
        if obj.sprite:
            for frame in obj.sprite.frames:
                for mat in list(frame.data3.values()) + list(frame.data6.values()):
                    if id(mat) not in seen:
                        seen.add(id(mat))
                        mat.roughness = 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--mod", default="default")
    ap.add_argument("--override", action="append", default=[],
                    help="settings override key=value (value eval'd)")
    ap.add_argument("--zero-roughness", action="store_true",
                    help="zero all material roughness for a draw-free march")
    ap.add_argument("--no-tape", action="store_true")
    ap.add_argument("--physics-rollout", type=int, metavar="TICKS", default=0,
                    help="record a TICKS-frame physics rollout instead of an "
                         "image golden (reference data.py:495-560)")
    ap.add_argument("--motion-frames", type=int, metavar="N", default=0,
                    help="record an N-frame Window-loop golden with a moving "
                         "player + physics + culling (init.py:455-471)")
    ap.add_argument("--dt", type=float, default=1 / 24)
    args = ap.parse_args()

    out_path = os.path.abspath(args.out)

    if args.physics_rollout:
        rollout = physics_rollout(args.physics_rollout)
        np.savez_compressed(out_path, rollout=rollout)
        print(f"wrote {out_path}: physics rollout {rollout.shape}")
        return

    overrides = {}
    for ov in args.override:
        k, v = ov.split("=", 1)
        overrides[k] = eval(v)  # noqa: S307 - trusted CLI input

    if args.motion_frames:
        frames, updates, traj = render_motion_frames(
            args.motion_frames, args.dt, overrides=overrides)
        np.savez_compressed(out_path, frames=frames,
                            updates=np.array(updates, np.int64), **traj)
        print(f"wrote {out_path}: {frames.shape[0]} motion frames, "
              f"updates at {updates}")
        return

    lib, data, Camera = load_reference(args.mod)
    apply_overrides(data, overrides)
    if args.zero_roughness:
        zero_roughness(data)

    cam = build_camera(lib, data, Camera)
    image, tape, diag = render(lib, data, cam, record_tape=not args.no_tape)

    payload = {
        "image": image,
        "steps": diag["steps"],
        "bounces": diag["bounces"],
        "draw_counts": diag["draw_counts"],
        "cam_pos": np.array(data.player.cam_pos.array(), dtype=np.float64),
        "cam_rot": np.array(
            [data.player.cam_rot.x, data.player.cam_rot.y, data.player.cam_rot.z, data.player.cam_rot.w],
            dtype=np.float64,
        ),
        "overrides": np.array(repr(overrides)),
        "zero_roughness": np.array(args.zero_roughness),
    }
    if tape is not None:
        payload["tape"] = tape
    np.savez_compressed(out_path, **payload)
    print(f"wrote {out_path}: image {image.shape}, "
          f"mean steps {diag['steps'].mean():.1f}, mean bounces {diag['bounces'].mean():.2f}"
          + (f", tape D={tape.shape[-1]}" if tape is not None else ""))




def physics_rollout(ticks: int = 24):
    """Drive the reference physics for N frames (reference init.py:469-470 ->
    data.py:564-587) and record object positions/velocities per tick.
    Deterministic on the default scene (all solidity == 1)."""
    lib, data, Camera = load_reference()
    order = list(data.objects.keys())
    frames = []
    for _ in range(ticks):
        cam_pos = data.player.cam_pos
        for oid in order:
            data.objects[oid].update(cam_pos)
        frames.append(
            [
                (data.objects[oid].pos.tuple(), data.objects[oid].vel.tuple())
                for oid in order
            ]
        )
    return np.array(frames, dtype=np.float64)  # [T, n_obj, 2, 3]


def render_window_frames(n_frames: int, dt: float, overrides=None):
    """Replicate the reference Window.update loop for a static scene:
    draw with the camera's current chunk set -> collect traversed feedback ->
    chunk_update on the chunk_rate timer with culling (reference
    init.py:455-471, 389-452). Gravity should be zeroed via overrides so the
    camera stays put (physics is validated separately).

    Returns (frames [n, H, W, 4], updates: list of frame indices where the
    chunk assignment was recalculated)."""
    lib, data, Camera = load_reference()
    apply_overrides(data, overrides or {})
    vec3 = lib.vec3
    s = data.settings
    cs = s.chunk_size

    cam = Camera()
    cam.pos = data.player.cam_pos
    cam.rot = data.player.cam_rot

    # Build the merged world chunk ladders once (static scene; objects get
    # their visibility flags the way Object.update would set them).
    chunks_objects = {}
    for obj_id, obj in data.objects.items():
        dist = obj.pos.distance(cam.pos)
        obj.visible = bool(obj.sprite) and dist <= s.dist_max + obj.size.maxs()
        if not obj.visible:
            continue
        spr = obj.get_sprite()
        cmin = obj.mins.snapped(cs)
        cmax = obj.maxs.snapped(cs)
        for cx in range(cmin.x, cmax.x + 1, cs):
            for cy in range(cmin.y, cmax.y + 1, cs):
                for cz in range(cmin.z, cmax.z + 1, cs):
                    voxels = {}
                    pos_min = obj.mins.max(vec3(cx, cy, cz))
                    pos_max = obj.maxs.min(vec3(cx + cs, cy + cs, cz + cs))
                    for x in range(pos_min.x, pos_max.x):
                        for y in range(pos_min.y, pos_max.y):
                            for z in range(pos_min.z, pos_max.z):
                                mat = spr.get_voxel(None, vec3(x, y, z) - obj.mins, obj.rot)
                                if mat:
                                    voxels[(x, y, z)] = mat
                    if voxels:
                        chunks_objects.setdefault(obj_id, {})[(cx, cy, cz)] = voxels
    chunk_keys = set()
    for per_obj in chunks_objects.values():
        chunk_keys.update(per_obj.keys())
    ladders = {}
    for post in chunk_keys:
        voxels = {}
        for per_obj in chunks_objects.values():
            if post in per_obj:
                voxels |= per_obj[post]
        ladder = []
        for lod in range(s.chunk_lod + 1):
            frame = data.Frame(packed=False, resolution=lod + 1)
            frame.set_voxels(voxels, True)
            ladder.append(frame)
        ladders[post] = ladder

    frames = []
    updates = []
    timer = 0.0
    traversed = []
    for fi in range(n_frames):
        image, _tape, diag = render(lib, data, cam, record_tape=False)
        frames.append(image)
        traversed = diag["traversed_union"]

        timer += dt
        if timer >= s.chunk_time:
            timer -= max(s.chunk_time, dt)
            updates.append(fi)
            for post, ladder in ladders.items():
                if (not s.culling) or (post in traversed):
                    pos = vec3(post[0], post[1], post[2]) + s.chunk_radius
                    lod = min(
                        math.trunc(pos.distance(cam.pos) / (s.dist_max / (1 + s.chunk_lod))),
                        s.chunk_lod,
                    )
                    cam.chunk_set(post, ladder[lod])
                else:
                    cam.chunk_set(post, None)
    return np.array(frames), updates


def render_motion_frames(n_frames: int, dt: float, overrides=None):
    """The FULL reference Window.update loop (init.py:455-471) with a moving
    player: forward input impulse every frame (init.py:367-369), physics on
    every object (init.py:469-470), and the real chunk_update — per-object
    chunk rebuild for redrawn/moved objects, merged world chunks, LOD select
    and occlusion culling from ray feedback (init.py:389-452).

    Always run noise-free (roughness zeroed; pass dof=0, lod_random=0 in
    overrides) so the images are deterministic without RNG tapes. Frame
    storage uses packed=False Frames — get_voxel semantics are identical to
    the reference's packed=True, only the internal storage differs.

    Returns (frames [n, H, W, 4], updates, traj dict with per-frame player
    pos/vel/rot and cam pos/rot)."""
    lib, data, Camera = load_reference()
    apply_overrides(data, overrides or {})
    zero_roughness(data)
    vec3 = lib.vec3
    s = data.settings
    cs = s.chunk_size

    cam = Camera()
    chunks = {}
    chunks_objects = {}
    timer = 0.0
    traversed = set()
    frames, updates = [], []
    traj = {k: [] for k in ("player_pos", "player_vel", "player_rot",
                            "cam_pos", "cam_rot")}

    for fi in range(n_frames):
        # -- focused-window branch (init.py:462-468) --
        cam.pos = data.player.cam_pos
        cam.rot = data.player.cam_rot
        image, _tape, diag = render(lib, data, cam, record_tape=False)
        frames.append(image)
        traversed = diag["traversed_union"]
        traj["cam_pos"].append(cam.pos.array())
        traj["cam_rot"].append([cam.rot.x, cam.rot.y, cam.rot.z, cam.rot.w])

        # -- chunk_update (faithful port of init.py:389-452) --
        timer += dt
        if timer >= s.chunk_time:
            timer -= max(s.chunk_time, dt)
            updates.append(fi)
            # pass 1: per-object chunk frames for redrawn objects
            for obj_id in lib.merge(data.objects.keys(), chunks_objects.keys()):
                if obj_id in chunks_objects and (
                        obj_id not in data.objects or data.objects[obj_id].redraw):
                    for post_chunk in chunks_objects[obj_id]:
                        chunks[post_chunk] = None
                    del chunks_objects[obj_id]
                if (obj_id in data.objects and data.objects[obj_id].redraw
                        and data.objects[obj_id].visible):
                    obj = data.objects[obj_id]
                    obj.redraw = False
                    spr = obj.get_sprite()
                    cmin = obj.mins.snapped(cs)
                    cmax = obj.maxs.snapped(cs)
                    for cx in range(cmin.x, cmax.x + 1, cs):
                        for cy in range(cmin.y, cmax.y + 1, cs):
                            for cz in range(cmin.z, cmax.z + 1, cs):
                                voxels = {}
                                pos_min = obj.mins.max(vec3(cx, cy, cz))
                                pos_max = obj.maxs.min(
                                    vec3(cx + cs, cy + cs, cz + cs))
                                post_chunk = cx, cy, cz
                                chunks[post_chunk] = None
                                for x in range(pos_min.x, pos_max.x):
                                    for y in range(pos_min.y, pos_max.y):
                                        for z in range(pos_min.z, pos_max.z):
                                            mat = spr.get_voxel(
                                                None, vec3(x, y, z) - obj.mins,
                                                obj.rot)
                                            if mat:
                                                voxels[(x, y, z)] = mat
                                if voxels:
                                    frame = data.Frame(packed=False, resolution=1)
                                    frame.set_voxels(voxels, True)
                                    chunks_objects.setdefault(obj_id, {})[
                                        post_chunk] = frame
            # pass 2 + 3: merged world chunks, LOD select + culling
            for post_chunk in list(chunks.keys()):
                if not chunks[post_chunk]:
                    voxels = {}
                    for per_obj in chunks_objects.values():
                        if post_chunk in per_obj:
                            voxels |= per_obj[post_chunk].get_voxels()
                    if voxels:
                        ladder = []
                        for lod in range(s.chunk_lod + 1):
                            frame = data.Frame(packed=False, resolution=lod + 1)
                            frame.set_voxels(voxels, True)
                            ladder.append(frame)
                        chunks[post_chunk] = ladder
                    else:
                        del chunks[post_chunk]
                if post_chunk in chunks and (
                        not s.culling or post_chunk in traversed):
                    pos = vec3(*post_chunk) + s.chunk_radius
                    lod = min(math.trunc(pos.distance(cam.pos)
                                         / (s.dist_max / (1 + s.chunk_lod))),
                              s.chunk_lod)
                    cam.chunk_set(post_chunk, chunks[post_chunk][lod])
                else:
                    cam.chunk_set(post_chunk, None)

        # -- object updates: visibility, anim, physics (init.py:469-470) --
        for obj in list(data.objects.values()):
            obj.update(cam.pos)

        # -- input: forward key held (init.py:353-369, input_vel.z = 1) --
        rot = (vec3(0, data.player.rot.y, 0).quaternion() if s.max_pitch
               else data.player.rot.quaternion())
        unit = s.speed_move * 1 * dt
        data.player.accelerate(rot.vec_forward() * max(-1, min(+1, 1)) * unit)

        traj["player_pos"].append(data.player.pos.array())
        traj["player_vel"].append(data.player.vel.array())
        traj["player_rot"].append(data.player.rot.array())

    traj = {k: np.array(v, dtype=np.float64) for k, v in traj.items()}
    return np.array(frames), updates, traj


if __name__ == "__main__":
    main()
