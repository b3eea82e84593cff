"""Frame rendering: pixel/sample fan-out, march, sample resolve.

Replicates the reference's ``Camera.tile`` loop (reference ``init.py:126-150``)
for the whole frame at once:

* per-pixel sample count ``max(1, round(samples * detail))`` (init.py:134) —
  an irregular workload the reference handles with a Python loop and the TPU
  build handles with a static [n_pixels, max_samples] lattice + active masks,
* per-sample ray detail ``detail / (1 + sample * lod_samples) *
  (1 - lod_random * u)`` (init.py:139),
* motion-blur alpha ``round(min(1, energy + shutter) * 255)`` (init.py:141),
* per-pixel sample average (lib.py:419-428) with the set_at int truncation
  (init.py:146) in exact mode.

RNG modes mirror ops/march.py: ``key`` (device PRNG) or ``tape`` (host
Mersenne-Twister tape, [n_pixels, max_samples, n_draws], draw order
u_lod, u_dof_x, u_dof_y, then 3 per roughness-hit — see tools/tape.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
from python_raytracer_tpu.ops.march import MarchResult, RayBatch, march
from python_raytracer_tpu.scene.compile import GridSpec, SceneArrays


def render_rays(settings, spec, arrays, rays: RayBatch, **kw) -> MarchResult:
    """March a pre-built ray batch (bench / sharded entry point)."""
    return march(settings, spec, arrays, rays, **kw)


def _prepare_frame_rays(settings, cam_pos, cam_rot, lens, tape, key, dtype):
    """Shared raygen/sample fan-out for render_frame variants. Returns
    (rays, march kwargs, active mask, samples_px)."""
    w, h, s_max = settings.width, settings.height, settings.samples
    n_px = w * h
    dirs, detail = pixel_grid(settings, dtype)
    samples_px = jnp.maximum(1, jnp.round(settings.samples * detail)).astype(jnp.int32)
    sidx = jnp.arange(s_max, dtype=jnp.int32)
    active = sidx[None, :] < samples_px[:, None]

    use_tape = tape is not None
    if use_tape:
        tape = jnp.asarray(tape)
        u_lod = tape[:, :, 0].astype(dtype)
        if settings.dof:
            u_dof = tape[:, :, 1:3].astype(dtype)
            ptr0 = 3
        else:
            u_dof = None
            ptr0 = 1
        march_kw = dict(tape=tape.reshape(n_px * s_max, -1),
                        tape_ptr=jnp.full((n_px * s_max,), ptr0, jnp.int32),
                        key=None)
    else:
        k = key if key is not None else jax.random.PRNGKey(0)
        k_lod, k_dof, march_key = jax.random.split(k, 3)
        u_lod = jax.random.uniform(k_lod, (n_px, s_max), dtype=dtype)
        u_dof = jax.random.uniform(k_dof, (n_px, s_max, 2), dtype=dtype)
        march_kw = dict(tape=None, tape_ptr=None, key=march_key)

    ray_detail = (
        detail[:, None]
        / (1 + sidx[None, :].astype(dtype) * settings.lod_samples)
        * (1 - settings.lod_random * u_lod)
    )
    ray_detail = jnp.where(active, ray_detail, 0)
    dirs_full = jnp.broadcast_to(dirs[:, None, :], (n_px, s_max, 2)).reshape(-1, 2)
    u_dof_full = None if u_dof is None else jnp.broadcast_to(u_dof, (n_px, s_max, 2)).reshape(-1, 2)
    rays = generate_rays(settings, jnp.asarray(cam_pos, dtype), jnp.asarray(cam_rot, dtype),
                         dirs_full, ray_detail.reshape(-1), u_dof_full, lens)
    return rays, march_kw, active, samples_px


def _resolve_samples(settings, res, active, samples_px, dtype):
    """Sample average + motion-blur alpha (init.py:141, lib.py:419-428)."""
    n_px = settings.width * settings.height
    s_max = settings.samples
    if settings.exact:
        alpha = jnp.round(jnp.minimum(1.0, res.energy + settings.shutter) * 255)
    else:
        alpha = jnp.minimum(1.0, res.energy + settings.shutter) * 255
    rgba = jnp.concatenate([res.color, alpha[:, None]], axis=-1).reshape(n_px, s_max, 4)
    rgba = jnp.where(active[:, :, None], rgba, 0)
    avg = rgba.sum(axis=1) / samples_px[:, None].astype(dtype)
    if settings.exact:
        avg = jnp.trunc(avg)
    return avg.reshape(settings.height, settings.width, 4)


def render_frame_compacted(
    settings: Settings,
    spec: GridSpec,
    arrays: SceneArrays,
    cam_pos,
    cam_rot,
    lens: Optional[float] = None,
    *,
    tape: Optional[jnp.ndarray] = None,
    key: Optional[jnp.ndarray] = None,
    background: Optional[str] = "sky",
    record_traversed: bool = False,
    dtype=jnp.float32,
    programs_used=(0,),
    segment_iters: int = 16,
    min_width: int = 4096,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """render_frame through the ray-compacted march (ops/compact.py).

    Host-orchestrated (multiple jits) — bit-identical results to
    render_frame, lower wall time when ray lifetimes diverge."""
    from python_raytracer_tpu.ops.compact import march_compacted

    rays, march_kw, active, samples_px = _prepare_frame_rays(
        settings, cam_pos, cam_rot, lens, tape, key, dtype
    )
    res = march_compacted(
        settings, spec, arrays, rays,
        programs_used=programs_used, background=background,
        record_traversed=record_traversed,
        segment_iters=segment_iters, min_width=min_width, **march_kw,
    )
    image = _resolve_samples(settings, res, active, samples_px, dtype)
    return image, res.traversed.reshape(spec.chunk_shape)


def render_frame(
    settings: Settings,
    spec: GridSpec,
    arrays: SceneArrays,
    cam_pos,
    cam_rot,
    lens: Optional[float] = None,
    *,
    tape: Optional[jnp.ndarray] = None,
    key: Optional[jnp.ndarray] = None,
    background: Optional[str] = "sky",
    mode: str = "while",
    record_traversed: bool = False,
    dtype=jnp.float32,
    programs_used=(0,),
    with_stats: bool = False,
    block_kw: Optional[dict] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render one frame.

    Returns (image [H, W, 4] float RGBA in 0..255, traversed bool
    [CX, CY, CZ]). In exact mode the image holds the reference's integer
    values (as floats). ``with_stats`` appends (mean_steps, mean_bounces)
    device scalars — the reference's per-ray cost telemetry (init.py:55-57)
    aggregated on device for the Engine's metrics (utils/metrics.py).
    ``mode="block"`` marches through the Pallas kernel
    (ops/blockmarch.py; f32 key-RNG only) with ``block_kw`` tuning.
    """
    rays, march_kw, active, samples_px = _prepare_frame_rays(
        settings, cam_pos, cam_rot, lens, tape, key, dtype
    )
    if mode == "block":
        from python_raytracer_tpu.ops.blockmarch import (
            blockmarch_supported,
            march_blockwise,
        )

        if not blockmarch_supported(settings, spec, programs_used,
                                    march_kw.get("tape")):
            # graceful fallback: custom material programs and exotic configs
            # render through the XLA march (bit-identical semantics, slower)
            # instead of erroring out of the kernel
            mode = "while"
    if mode == "block":
        res = march_blockwise(
            settings, spec, arrays,
            RayBatch(*(x.astype(jnp.float32) for x in rays)),
            key=march_kw["key"], tape=march_kw.get("tape"),
            tape_ptr=march_kw.get("tape_ptr"), background=background,
            record_traversed=record_traversed, programs_used=programs_used,
            **(block_kw or {}),
        )
    else:
        res = march(
            settings, spec, arrays, rays,
            background=background, mode=mode,
            record_traversed=record_traversed, programs_used=programs_used,
            **march_kw,
        )
    image = _resolve_samples(settings, res, active, samples_px, dtype)
    out = (image, res.traversed.reshape(spec.chunk_shape))
    if with_stats:
        act = active.reshape(-1)
        n_act = jnp.maximum(1, jnp.sum(act))
        out = out + ((jnp.sum(jnp.where(act, res.step, 0)) / n_act,
                      jnp.sum(jnp.where(act, res.bounces, 0)) / n_act),)
    return out
