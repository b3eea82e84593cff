"""Golden-image tests: the TPU renderer vs the reference engine's output.

The goldens are produced by tools/reference_oracle.py driving the actual
reference code at /root/reference (SURVEY.md §4 item 1). Two tiers:

* no-noise config (dof=0, lod_random=0, roughness zeroed): the march is
  fully deterministic — the image must match the reference bit-for-bit in
  float64.
* stock config: every RNG draw is replayed from the recorded
  Mersenne-Twister tape, so the stock image (DOF jitter, roughness
  scattering, per-sample detail randomization) must also match exactly.
"""

import jax.numpy as jnp
import numpy as np

from python_raytracer_tpu.models.default import build_default_scene, default_settings
from python_raytracer_tpu.ops.render import render_frame
from python_raytracer_tpu.scene.compile import compile_scene


def test_nonoise_exact(golden_nonoise, compiled_nonoise, default_scene_nonoise):
    g = golden_nonoise
    cs = compiled_nonoise
    st = default_scene_nonoise.settings
    img, _ = render_frame(
        st, cs.spec, cs.arrays, np.array(g["cam_pos"]), np.array(g["cam_rot"]),
        dtype=jnp.float64,
    )
    img = np.asarray(img)
    ref = g["image"]
    diff = np.abs(img - ref).max(axis=-1)
    mismatched = int((diff > 0).sum())
    assert mismatched == 0, (
        f"{mismatched}/{diff.size} pixels differ (max {diff.max()})"
    )


def test_stock_tape_exact(golden_stock):
    g = golden_stock
    st = default_settings()
    scene = build_default_scene(st)
    cam_pos = np.array(g["cam_pos"])
    cs = compile_scene(scene, cam_pos=cam_pos)
    tape = g["tape"]  # [H*W, S, D] float64
    img, _ = render_frame(
        st, cs.spec, cs.arrays, cam_pos, np.array(g["cam_rot"]),
        tape=tape, dtype=jnp.float64,
    )
    img = np.asarray(img)
    ref = g["image"]
    diff = np.abs(img - ref).max(axis=-1)
    mismatched = int((diff > 0).sum())
    assert mismatched == 0, (
        f"{mismatched}/{diff.size} pixels differ (max {diff.max()})"
    )


def test_march_stats_match_reference(golden_stock):
    """The BUILT marcher's own per-ray step/bounce counters must equal the
    reference's recorded profile ray-for-ray (not just the golden's own
    recording — this drives ops/march.py and checks its outputs)."""
    g = golden_stock
    st = default_settings()
    scene = build_default_scene(st)
    cam_pos = np.array(g["cam_pos"])
    cs = compile_scene(scene, cam_pos=cam_pos)
    from python_raytracer_tpu.ops.march import march
    from python_raytracer_tpu.ops.render import _prepare_frame_rays

    rays, march_kw, active, _ = _prepare_frame_rays(
        st, cam_pos, np.array(g["cam_rot"]), None, g["tape"], None,
        jnp.float64)
    res = march(st, cs.spec, cs.arrays, rays, programs_used=cs.programs_used,
                background="sky", mode="while", **march_kw)
    steps = np.asarray(res.step).reshape(-1)[np.asarray(active).reshape(-1)]
    bounces = np.asarray(res.bounces).reshape(-1)[np.asarray(active).reshape(-1)]
    np.testing.assert_array_equal(bounces, g["bounces"].reshape(-1))
    # Step distance is exact up to the final multi-cell skip's overshoot
    # (the built marcher jumps s lattice steps at once; the reference walks
    # them singly and stops the moment step >= life — ops/march.py step 5:
    # "only the unobservable final overshoot position may differ").
    overshoot = steps - g["steps"].reshape(-1)
    # (tiny negative = f64 accumulation-order noise between single steps
    # and batched skips summing the same distance)
    assert overshoot.min() >= -1e-9, "marcher took fewer steps than the reference"
    assert overshoot.max() <= 16, "overshoot beyond one chunk-size skip"
    # and the profile itself matches the survey's measurement (SURVEY.md §6)
    assert 20 < steps.mean() < 40
    assert 2.0 < bounces.mean() < 3.2


def test_multisample_tape_exact(golden_samples4):
    """BASELINE config 2: samples=4 static-seed multisampling. Exercises the
    per-pixel variable sample count (max(1, round(samples*detail)),
    init.py:134), per-sample detail decay and the sample average resolve."""
    g = golden_samples4
    st = default_settings().replace(samples=4)
    scene = build_default_scene(st)
    cam_pos = np.array(g["cam_pos"])
    cs = compile_scene(scene, cam_pos=cam_pos)
    img, _ = render_frame(
        st, cs.spec, cs.arrays, cam_pos, np.array(g["cam_rot"]),
        tape=g["tape"], dtype=jnp.float64,
    )
    img = np.asarray(img)
    diff = np.abs(img - g["image"]).max(axis=-1)
    mismatched = int((diff > 0).sum())
    assert mismatched == 0, f"{mismatched}/{diff.size} pixels differ (max {diff.max()})"
