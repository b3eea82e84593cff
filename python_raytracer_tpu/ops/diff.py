"""Differentiable rendering via a custom VJP over the hit tape.

Reverse-mode through the full march is expensive: a fixed-length scan must
run ``dist_max`` iterations (192 on the stock config) even though the average
ray performs ~2.6 material interactions (reference profile, SURVEY.md §6),
and each replayed iteration re-gathers the voxel grid.

This module implements the recompute-based backward from SURVEY.md §7
(stage 5): the forward pass is the fast early-exit ``while`` march recording
a compact per-hit tape (material id, applied jitter uniforms, IOR flip mask —
ops/march.py HitRecords), and the backward pass differentiates a *replay* of
the shading chain only — max_hits (default 16) cheap steps with no grid
access. Gradients flow into the material table through exactly the arithmetic
the reference's shaders define (lib.py:448-476): absorption falloff, albedo/
emission blends, roughness-reparameterized velocity jitter, IOR velocity
flips, and the sky background; the discrete trajectory (which voxels were
hit, termination, flip selections) is frozen, matching the north star's
"grads w.r.t. material params on fixed trajectories" (BASELINE.json).

Rays whose hit count overflows max_hits fall back to truncated-replay
gradients (their primal output is still exact); with the stock bounce budget
(max_bounces=2, min absorption 0.25) overflow is impossible below 12 hits.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.ops import programs as P
from python_raytracer_tpu.ops.march import HitRecords, RayBatch, march
from python_raytracer_tpu.scene import material as M
from python_raytracer_tpu.scene.compile import GridSpec, SceneArrays
from python_raytracer_tpu.utils.mathutils import cheb_normalize


def _replay(table, settings: Settings, records: HitRecords, v0,
            background: Optional[str], programs_used=(0,), program_ids=None,
            voxel_albedo=None, unroll: int = 1):
    """Re-run the shading chain from the hit tape. Produces bit-identical
    color/energy to the forward march given the same records.
    ``voxel_albedo``: the per-cell albedo offset grid (requires
    ``records.cell``) — gradients route into it through the gather's
    scatter-add VJP (SURVEY.md §7 stage 5 optional extension).
    ``unroll``: scan unroll factor — unrolled steps keep the carry in
    registers instead of round-tripping HBM each hit (identical arithmetic,
    XLA fuses across steps; A/B on TPU before changing the default)."""
    n, h = records.vid.shape
    dtype = v0.dtype
    # Registered custom ray properties thread through the replay exactly as
    # through the forward march (ops/programs.py register_ray_property), so
    # gradients flow through custom-state chains too. An empty dict when none
    # are registered keeps the carry structure static.
    props = P.ray_properties()
    aux0 = {name: jnp.full((n,), init, dtype) for name, init in props}

    def hit_step(carry, rec):
        color, energy, vel, bounces, aux, idx = carry
        vid, u, flip, pid, cell = rec
        live = idx < records.count  # [N]
        onehot = (vid[:, None] == jnp.arange(table.shape[0])[None, :]).astype(dtype)
        rows = jnp.dot(onehot, table, preferred_element_type=dtype,
                       precision=jax.lax.Precision.HIGHEST)
        albedo = rows[:, M.PARAM_ALBEDO_R : M.PARAM_ALBEDO_B + 1]
        if voxel_albedo is not None:
            albedo = albedo + voxel_albedo.astype(dtype)[cell]
        mat = P.MatParams(
            albedo=albedo,
            roughness=rows[:, M.PARAM_ROUGHNESS],
            absorption=rows[:, M.PARAM_ABSORPTION],
            ior=rows[:, M.PARAM_IOR],
            energy=rows[:, M.PARAM_ENERGY],
        )
        zeros = jnp.zeros_like(energy)
        ray_view = P.HitRay(color=color, energy=energy, life=zeros, vel=vel,
                            bounces=bounces, step=zeros, aux=aux or None)
        upd, bounce = P.dispatch(programs_used, pid, ray_view, mat, settings, u)
        new_color = upd.get("color", color)
        new_energy = upd.get("energy", energy)
        new_vel = cheb_normalize(upd.get("vel", vel))
        # vectorized IOR flips: per-axis bit tests as one [N, 3] mask (the
        # .at[:, axis].set form produced scatter-shaped HLO with a slow VJP)
        flip_mask = ((flip[:, None] >> jnp.arange(3)[None, :]) & 1) > 0
        new_vel = jnp.where(flip_mask, new_vel - new_vel * mat.ior[:, None] * 2.0, new_vel)
        new_bounces = bounces + bounce
        color = jnp.where(live[:, None], new_color, color)
        energy = jnp.where(live, new_energy, energy)
        vel = jnp.where(live[:, None], new_vel, vel)
        bounces = jnp.where(live, new_bounces, bounces)
        aux = {k: jnp.where(live, upd.get(k, aux[k]), aux[k]) for k in aux}
        return (color, energy, vel, bounces, aux, idx + 1), None

    init = (
        jnp.zeros((n, 3), dtype),
        jnp.zeros((n,), dtype),
        v0,
        jnp.zeros((n,), dtype),
        aux0,
        jnp.zeros((), jnp.int32),
    )
    pid_per_hit = (
        program_ids[records.vid] if program_ids is not None and len(programs_used) > 1
        else jnp.zeros_like(records.vid)
    )
    cells = records.cell if records.cell is not None else jnp.zeros_like(records.vid)
    recs = (
        jnp.moveaxis(records.vid, 1, 0),
        jnp.moveaxis(records.u, 1, 0),
        jnp.moveaxis(records.flip, 1, 0),
        jnp.moveaxis(pid_per_hit, 1, 0),
        jnp.moveaxis(cells, 1, 0),
    )
    # Rematerialize each hit step in the backward: without this the scan
    # stores per-step one-hots/rows ([N, K] x H residuals, ~hundreds of MB)
    # and the VJP measured 2x slower than recompute (25.8 -> 12.2 ms at
    # N=393k, H=16 on TPU v5e).
    ck_step = jax.checkpoint(hit_step, prevent_cse=False)
    (color, energy, vel, bounces, _, _), _ = jax.lax.scan(
        ck_step, init, recs, unroll=unroll)

    bg = P.resolve_background(background)
    if bg is not None:
        color, energy = bg(color, energy, vel, bounces, settings)
        color = jnp.minimum(255.0, color * energy[:, None])
    return color, energy


def make_replay(settings: Settings, background: Optional[str] = "sky",
                programs_used=(0,), program_ids=None,
                fast: Optional[bool] = None, tile: int = 2048):
    """Build ``replay(table, hits, v0) -> (color, energy)`` — the shading
    chain the backward differentiates, selecting the fused Pallas replay
    (ops/replay_block.py: forward AND backward in lane-major kernels, no
    [N, H] HBM carry round-trips) when the configuration supports it.

    ``fast``: None = auto (fused on TPU for single-program-PBR f32 scenes —
    the production bench configuration), False = always the XLA ``_replay``
    scan, True = require the fused kernel (raises if unsupported)."""
    from python_raytracer_tpu.ops.replay_block import (make_replay_block,
                                                       replay_block_supported)

    supported = replay_block_supported(programs_used)
    if fast is True and not supported:
        raise ValueError("fused replay unsupported for this configuration "
                         "(needs single-program PBR, no ray properties)")
    use = fast if fast is not None else (
        supported and jax.default_backend() == "tpu")
    fused = make_replay_block(settings, background, tile=tile) if use else None

    def replay(table, hits: HitRecords, v0):
        if fused is not None and table.dtype == jnp.float32 \
                and v0.dtype == jnp.float32:
            return fused(table, hits, v0)
        return _replay(table, settings, hits, v0, background,
                       programs_used, program_ids)

    return replay


def make_diff_renderer(
    settings: Settings,
    spec: GridSpec,
    background: Optional[str] = "sky",
    max_hits: int = 16,
    programs_used=(0,),
    forward: str = "while",
    ladder_schedule=((20, 1), (5, 2), (11, 8)),
    with_stats: bool = False,
    voxel_grid: bool = False,
    block_kw: Optional[dict] = None,
    fast_replay: Optional[bool] = None,
):
    """Build ``render(table, arrays, rays, key) -> (color [N,3], energy [N])``
    differentiable w.r.t. ``table`` with the while-march forward + hit-replay
    backward. ``arrays.material_table`` is ignored in favor of ``table``.
    ``with_stats`` appends (mean_steps, mean_bounces) device scalars to the
    output (zero cotangent; observability only — utils/metrics.py).

    ``forward="ladder"`` uses the on-device width-ladder march
    (ops/compact.py march_ladder): bit-identical output, fewer full-width
    grid gathers (the march's measured bottleneck); ``ladder_schedule`` comes
    from the scene's survival curve (tools/survival_curve.py).

    ``voxel_grid=True`` changes the signature to ``render(table,
    voxel_albedo, arrays, rays, key)`` — a dense per-cell albedo-offset
    field [X*Y*Z, 3] differentiated alongside the table (SURVEY.md §7
    stage 5 optional extension). Served by the plain while forward or the
    Pallas kernel (``forward="block"``: the albedo grid rides the chunk
    pages and the hit cells land in the packed tape — ops/blockmarch.py);
    the replay backward scatter-adds into the grid either way.

    Diff-path ABI note: custom material programs are replayed with zeroed
    ``step``/``life`` ray fields (they are not outputs); programs whose
    color/energy/vel outputs depend on those fields get approximate
    gradients (the builtin PBR program does not)."""
    settings = settings.replace(exact=False)
    if voxel_grid and forward not in ("while", "block"):
        raise ValueError("voxel_grid needs the while or block forward")
    # fused Pallas replay for the non-voxel backward (ops/replay_block.py);
    # the voxel-grid path needs the scatter-add VJP into the albedo grid and
    # keeps the XLA replay
    from python_raytracer_tpu.ops.replay_block import (make_replay_block,
                                                       replay_block_supported)

    use_fast = fast_replay if fast_replay is not None else (
        replay_block_supported(programs_used)
        and jax.default_backend() == "tpu")
    _fused = (make_replay_block(settings, background)
              if use_fast and not voxel_grid else None)

    def _replay_any(t, hits, v0, pids):
        if _fused is not None and t.dtype == jnp.float32:
            return _fused(t, hits, v0)
        return _replay(t, settings, hits, v0, background, programs_used, pids)

    def _forward(table, voxg, arrays: SceneArrays, rays: RayBatch, key):
        arr = dataclasses.replace(arrays, material_table=table)
        vkw = dict(voxel_albedo=voxg, record_cells=True) if voxel_grid else {}
        if forward == "block":
            # Pallas blockwise kernel (ops/blockmarch.py): the production
            # TPU forward — bit-exact vs the while-march incl. the hit tape.
            from python_raytracer_tpu.ops.blockmarch import march_blockwise

            if voxel_grid:
                # Per-voxel albedo on ANY kernel flavor (byte planes /
                # resident included — VERDICT r4 item 7): albedo offsets
                # shift only the COLOR chain, never trajectories (life,
                # energy->termination, IOR flips and bounce weights are
                # albedo-free — ops/programs.py pbr), so the kernel marches
                # without the albedo blocks, records hit cells in the tape,
                # and the replay reconstructs the exact albedo-shifted
                # color/energy from the tape (the bit-identity _replay
                # guarantees). Rays overflowing max_hits get truncated
                # colors — same caveat as the replay backward.
                res = march_blockwise(
                    settings, spec, arr, rays, key=key, background=background,
                    record_hits=max_hits, programs_used=programs_used,
                    record_cells=True, **(block_kw or {}),
                )
                color, energy = _replay(
                    table, settings, res.hits, rays.vel, background,
                    programs_used, arrays.program, voxel_albedo=voxg)
                res = res._replace(color=color, energy=energy)
            else:
                res = march_blockwise(
                    settings, spec, arr, rays, key=key, background=background,
                    record_hits=max_hits, programs_used=programs_used,
                    **(block_kw or {}),
                )
        elif forward == "ladder":
            from python_raytracer_tpu.ops.compact import march_ladder

            res = march_ladder(
                settings, spec, arr, rays, key=key, background=background,
                record_hits=max_hits, programs_used=programs_used,
                schedule=ladder_schedule,
            )
        else:
            res = march(
                settings, spec, arr, rays, key=key, background=background,
                mode="while", record_hits=max_hits, programs_used=programs_used,
                **vkw,
            )
        out = (res.color, res.energy)
        if with_stats:
            out = out + (jnp.mean(res.step), jnp.mean(res.bounces))
        return out, (res.hits, rays.vel, arrays.program)

    def _bwd_core(table, voxg, hits, v0, program_ids, g):
        _, vjp = jax.vjp(
            lambda t, v: _replay(t, settings, hits, v0, background,
                                 programs_used, program_ids, voxel_albedo=v),
            table, voxg,
        )
        return vjp(g[:2] if with_stats else g)

    if voxel_grid:
        @jax.custom_vjp
        def render(table, voxg, arrays, rays, key):
            out, _ = _forward(table, voxg, arrays, rays, key)
            return out

        def render_fwd(table, voxg, arrays, rays, key):
            out, (hits, v0, pids) = _forward(table, voxg, arrays, rays, key)
            return out, (table, voxg, hits, v0, pids)

        def render_bwd(residuals, g):
            table, voxg, hits, v0, pids = residuals
            dtable, dvox = _bwd_core(table, voxg, hits, v0, pids, g)
            return dtable, dvox, None, None, None

        render.defvjp(render_fwd, render_bwd)
        return render

    @jax.custom_vjp
    def render(table, arrays, rays, key):
        out, _ = _forward(table, None, arrays, rays, key)
        return out

    def render_fwd(table, arrays, rays, key):
        out, (hits, v0, program_ids) = _forward(table, None, arrays, rays, key)
        return out, (table, hits, v0, program_ids)

    def render_bwd(residuals, g):
        table, hits, v0, program_ids = residuals
        _, vjp = jax.vjp(
            lambda t: _replay_any(t, hits, v0, program_ids),
            table,
        )
        (dtable,) = vjp(g[:2] if with_stats else g)
        return dtable, None, None, None

    render.defvjp(render_fwd, render_bwd)
    return render
