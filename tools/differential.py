"""Randomized differential testing: reference engine vs TPU renderer.

Generates random mods — materials across the full property space (IOR
classes, roughness, emission, volumetrics), random voxel content, objects at
random positions with random 90-degree rotations — renders each scene in
BOTH engines (the real reference at /root/reference, driven headlessly, and
this framework) and asserts pixel-exact agreement in float64 with RNG tape
replay. Catches interaction bugs the fixed default-scene goldens cannot
(rotated dense grids, negative-coordinate LOD alignment, chunk-boundary
neighbors, overlapping objects).

  python3 tools/differential.py --seeds 5 [--keep DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIG = """[WINDOW]
width = 16
height = 12
scale = 1
subsamples = 0
smooth = 0
fps = 0

[RENDER]
sync = false
culling = false
static = true
samples = {samples}
shutter = 0
spill = 0
iris = 0
iris_time = 0
bloom = 0
bloom_blur = 0
fov = 90
falloff = 0.25
chunk_rate = 0
chunk_size = 16
chunk_lod = {chunk_lod}
dof = 0.5
dist_min = 0
dist_max = {dist_max}
max_light = 2
max_bounces = 3
lod_bounces = 0.5
lod_samples = 0.5
lod_random = 0.25
lod_edge = 0.25
threads = 1

[PHYSICS]
gravity = 0
friction = 0
friction_air = 0
speed_jump = 1
speed_move = 1
speed_mouse = 1
min_velocity = 0
max_velocity = 0
max_pitch = 0
max_roll = 0
dist_move = 0
"""


def gen_mod(seed: int, mod_dir: str):
    """Write a random mod (config.cfg + init.py) into mod_dir."""
    rng = np.random.default_rng(seed)
    os.makedirs(mod_dir, exist_ok=True)
    chunk_lod = int(rng.integers(0, 3))
    dist_max = int(rng.choice([48, 96]))
    samples = int(rng.choice([1, 2]))
    with open(os.path.join(mod_dir, "config.cfg"), "w") as fh:
        fh.write(CONFIG.format(chunk_lod=chunk_lod, dist_max=dist_max, samples=samples))

    n_mats = int(rng.integers(2, 6))
    lines = ["from lib import *", "import data", ""]
    for i in range(n_mats):
        albedo = tuple(int(v) for v in rng.integers(0, 256, 3))
        # roughness 0 keeps the march draw-free only if 0; exercise both
        roughness = float(rng.choice([0, 0, 0.25, 0.5]))
        absorption = float(rng.choice([0.25, 0.5, 1.0, 1.5]))
        ior = float(rng.choice([0, 0.25, 0.5, 1.0]))
        energy = float(rng.choice([0, 0, 0.5, 2.0]))
        lines.append(
            f"m{i} = data.Material(function=material, albedo=rgb{albedo}, "
            f"roughness={roughness}, absorption={absorption}, ior={ior}, "
            f"energy={energy}, solidity=1, weight=0.001, friction=0.5, elasticity=0)"
        )
    n_objs = int(rng.integers(1, 4))
    for oi in range(n_objs):
        size = int(rng.choice([4, 6, 8]))
        # sprite lod > 0 stores frames at resolution lod+1 (reference
        # data.py:268): voxels at non-divisible positions are filtered and
        # stored cells expand to r-cubes — exercise both paths
        lod = int(rng.choice([0, 0, 0, 1]))
        lines.append(f"s{oi} = data.Sprite(size=vec3({size}, {size}, {size}), frames=1, lod={lod})")
        n_vox = int(rng.integers(6, size ** 3 // 2))
        for _ in range(n_vox):
            x, y, z = (int(v) for v in rng.integers(0, size, 3))
            mi = int(rng.integers(0, n_mats))
            lines.append(f"s{oi}.set_voxel(0, vec3({x}, {y}, {z}), m{mi}, True)")
        px, py, pz = (int(v) for v in rng.integers(-12, 13, 3))
        rx, ry, rz = (int(v) * 90 for v in rng.integers(0, 4, 3))
        lines.append(
            f"o{oi} = data.Object(pos=vec3({px}, {py}, {pz}), rot=vec3({rx}, {ry}, {rz}), "
            f"vel=vec3(0, 0, 0), physics=False)"
        )
        lines.append(f"o{oi}.set_sprite(s{oi})")
    # camera object just outside the content
    lines += [
        "cam_spr = data.Sprite(size=vec3(2, 2, 2), frames=1, lod=0)",
        "cam_obj = data.Object(pos=vec3(0, 0, -20), rot=vec3(0, 0, 0), vel=vec3(0, 0, 0), physics=False)",
        "cam_obj.set_sprite(cam_spr)",
        "cam_obj.set_camera(vec2(0.25, 1))",
        "data.player = cam_obj",
        "data.background = material_background",
    ]
    with open(os.path.join(mod_dir, "init.py"), "w") as fh:
        fh.write("\n".join(lines) + "\n")


def run_seed(seed: int, keep: str = None) -> dict:
    root = keep or tempfile.mkdtemp(prefix=f"diffmod{seed}_")
    mod_dir = os.path.join(root, "mods", f"rand{seed}")
    gen_mod(seed, mod_dir)

    # --- reference side (drives the real engine) ---
    from reference_oracle import build_camera, load_reference, render

    cwd = os.getcwd()
    lib, data, Camera = load_reference(f"rand{seed}", content_root=root)
    cam = build_camera(lib, data, Camera)
    ref_img, _tape, diag = render(lib, data, cam, record_tape=False)
    cam_pos = np.array(data.player.cam_pos.array(), np.float64)
    cam_rot = np.array([data.player.cam_rot.x, data.player.cam_rot.y,
                        data.player.cam_rot.z, data.player.cam_rot.w], np.float64)
    os.chdir(cwd)

    # --- TPU framework side ---
    import jax
    import jax.numpy as jnp

    from python_raytracer_tpu.modapi import load_mod
    from python_raytracer_tpu.ops.render import render_frame
    from python_raytracer_tpu.scene.compile import compile_scene
    from python_raytracer_tpu.utils.tape import make_static_tape

    scene = load_mod(f"rand{seed}", mods_root=os.path.join(root, "mods"))
    cs = compile_scene(scene, cam_pos=cam_pos)
    tape = make_static_tape(scene.settings)
    img, _ = render_frame(scene.settings, cs.spec, cs.arrays, cam_pos, cam_rot,
                          tape=tape, dtype=jnp.float64,
                          programs_used=cs.programs_used)
    img = np.asarray(img)
    diff = np.abs(img - ref_img).max(axis=-1)
    return {
        "seed": seed,
        "mismatched": int((diff > 0).sum()),
        "pixels": diff.size,
        "max_diff": float(diff.max()),
        "mean_steps": round(float(diag["steps"].mean()), 1),
        "dir": root,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--keep", default=None)
    args = ap.parse_args()
    sys.path.insert(0, os.path.join(REPO, "tools"))

    failures = 0
    for seed in range(args.start, args.start + args.seeds):
        r = run_seed(seed, args.keep)
        status = "OK " if r["mismatched"] == 0 else "FAIL"
        print(f"{status} seed={r['seed']} mismatched={r['mismatched']}/{r['pixels']} "
              f"max={r['max_diff']} steps={r['mean_steps']} {r['dir'] if status == 'FAIL' else ''}")
        failures += r["mismatched"] > 0
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
