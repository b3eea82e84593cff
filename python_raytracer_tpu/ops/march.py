"""The voxel ray march: a batched, masked lax loop over all rays at once.

This re-designs the reference's per-pixel Python while loop
(``Camera.trace``, reference ``init.py:37-121``) as one SPMD program: every
ray is a lane of [N]-shaped state arrays, every semantic branch of the
reference becomes a mask, and the march runs either as a
``lax.while_loop`` (forward rendering, exits when all rays are done) or a
fixed-length ``lax.scan`` (differentiable path — reverse-mode AD needs a
static trip count; SURVEY.md §7 "reverse-mode through a while loop").

Reference semantics replicated per iteration (citations inline):

1. active-chunk hysteresis: the chunk is recomputed only when the position
   leaves the *closed* box [chunk_min, chunk_min + chunk_size]
   (init.py:67-73), and crossed chunk positions are recorded for the
   occlusion-culling feedback loop (init.py:72-73, 143).
2. voxel fetch at floor(pos) from the active chunk's LOD-decimated content
   (init.py:76-77; LOD semantics baked into ``baked_ids`` by
   scene/compile.py).
3. on hit: material program -> bounce; bounce accounting, life division,
   Chebyshev renormalize, termination on life/energy/bounce budget
   (init.py:81-86).
4. IOR face reflection from the three axis neighbors, neighbors fetched
   cross-chunk exactly like chunk_get (init.py:88-111).
5. advance by the chunk resolution, or by the void-skip distance toward the
   nearest possible chunk when outside all chunks (init.py:113-116).
6. after the loop: the background program (init.py:119-120).

RNG: two modes. ``key`` mode draws fresh uniforms per iteration from a JAX
PRNG (fast path; noise statistics match the reference, exact values do not).
``tape`` mode consumes a host-precomputed Mersenne-Twister tape in exactly
the reference's draw order (one lod_random draw + two DOF draws consumed by
raygen, then three draws per hit on materials with nonzero authored
roughness — rand() draws nothing when its amplitude is 0, lib.py:431-434),
enabling bit-exact golden tests against the reference (SURVEY.md §7 "RNG-
exact image matching", plan A).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.ops import programs as P
from python_raytracer_tpu.scene import material as M
from python_raytracer_tpu.scene import compile as C
from python_raytracer_tpu.scene.compile import GridSpec, SceneArrays
from python_raytracer_tpu.utils.mathutils import cheb_normalize, snapped


class RayBatch(NamedTuple):
    """Initial ray state ([N, 3] / [N])."""

    pos: jnp.ndarray
    vel: jnp.ndarray
    life: jnp.ndarray


class HitRecords(NamedTuple):
    """Compact per-hit tape recorded by the forward march (``record_hits``):
    everything the backward pass needs to replay the shading chain without
    touching the voxel grid (SURVEY.md §7 stage 5 "recompute-based backward
    from saved per-bounce hit records")."""

    vid: jnp.ndarray  # int32 [N, H] material id per hit
    u: jnp.ndarray  # [N, H, 3] roughness-jitter uniforms actually applied
    flip: jnp.ndarray  # int32 [N, H] IOR flip bitmask (bits 0..2 = x,y,z)
    count: jnp.ndarray  # int32 [N] total hits (may exceed H on overflow)
    cell: Optional[jnp.ndarray] = None  # int32 [N, H] flat grid cell per hit
    # (recorded only on the per-voxel differentiable path, SURVEY.md §7
    # stage 5 optional extension — see ops/diff.py voxel_albedo)


class MarchResult(NamedTuple):
    color: jnp.ndarray  # [N, 3] (post-background if enabled)
    energy: jnp.ndarray  # [N]
    bounces: jnp.ndarray  # [N]
    step: jnp.ndarray  # [N]
    pos: jnp.ndarray  # [N, 3]
    vel: jnp.ndarray  # [N, 3]
    traversed: jnp.ndarray  # bool [CX*CY*CZ] (all-False when not recorded)
    hits: Optional[HitRecords]  # populated when record_hits > 0
    aux: Optional[dict] = None  # final registered ray-property rows ([N])


class _State(NamedTuple):
    pos: jnp.ndarray
    vel: jnp.ndarray
    color: jnp.ndarray
    energy: jnp.ndarray
    step: jnp.ndarray
    life: jnp.ndarray
    bounces: jnp.ndarray
    alive: jnp.ndarray
    cmin: jnp.ndarray  # [N, 3] active chunk lower corner (world coords)
    cmax: jnp.ndarray  # [N, 3] active chunk upper corner; the closed box
    # [cmin, cmax] starts degenerate at (0,0,0) like the reference (init.py:46)
    cres: jnp.ndarray  # [N] active chunk resolution, 0 = no chunk
    ptr: jnp.ndarray  # [N] tape pointer (tape mode) or iteration scratch
    traversed: jnp.ndarray  # [CX*CY*CZ] bool
    it: jnp.ndarray  # [] iteration counter
    hits: Optional[HitRecords]  # hit tape buffers when record_hits > 0
    aux: Optional[dict] = None  # registered custom ray properties, [N] each
    # (ops/programs.py register_ray_property — the reference's mutable ray
    # "store" fields, README.md:96; None when no property is registered so
    # the default path's program is unchanged)


def _all3(x):
    return jnp.all(x, axis=-1)


def _fetch_word(spec: GridSpec, words, fpos_i, slab=None):
    """cell_word[fpos] as a single fast 1D gather; 0 outside the grid.

    The word packs material id (zeroed in absent/culled chunks), the chunk's
    LOD resolution and the Chebyshev empty-space distance — one gather per
    march step instead of separate id/res/table lookups (TPU element gathers
    are fast; row gathers are not — measured in bench notes).

    ``slab``: optional (x0_cells, width_cells) when ``words`` holds only the
    grid X-slab [x0, x0+width) — the grid-tensor-parallel path
    (parallel/gridshard.py); cells outside the slab read 0.
    """
    g = fpos_i - jnp.array(spec.origin, jnp.int32)
    in_grid = _all3((g >= 0) & (g < jnp.array(spec.shape, jnp.int32)))
    gsafe = jnp.clip(g, 0, jnp.array(spec.shape, jnp.int32) - 1)
    if slab is None:
        flat = (gsafe[..., 0] * spec.shape[1] + gsafe[..., 1]) * spec.shape[2] + gsafe[..., 2]
    else:
        x0, width = slab
        in_grid = in_grid & (gsafe[..., 0] >= x0) & (gsafe[..., 0] < x0 + width)
        lx = jnp.clip(gsafe[..., 0] - x0, 0, width - 1)
        flat = (lx * spec.shape[1] + gsafe[..., 1]) * spec.shape[2] + gsafe[..., 2]
    return jnp.where(in_grid, words[flat], 0)


def _neighbor_id_cls(spec, arrays, npos, cmin, cmax, cres):
    """Neighbor voxel id for the IOR reflection test (reference init.py:97-105).

    The cell word already carries 0 for cells in absent/culled chunks, so the
    reference's chunk_get path (init.py:28-33) collapses to a word fetch; the
    only extra rule is the active-chunk hysteresis: when npos lies in the
    active chunk's closed box, content beyond its cell range must read as
    empty (the boundary-miss quirk of Frame lookups through a stale chunk).
    """
    cs = spec.chunk_size
    nf = jnp.floor(npos).astype(jnp.int32)
    word = _fetch_word(spec, arrays.cell_word, nf)
    n_id = word & C.WORD_ID_MASK
    n_cls = (word >> C.WORD_IORCLS_SHIFT) & C.WORD_IORCLS_MASK
    in_active = _all3((npos >= cmin) & (npos <= cmax))
    beyond_active = in_active & (~_all3(nf <= cmin.astype(jnp.int32) + (cs - 1)) | (cres == 0))
    return jnp.where(beyond_active, 0, n_id), n_cls


def _initial_aux(n, dtype):
    """[N] rows for the registered custom ray properties (None when none —
    keeps the default path's traced program unchanged)."""
    props = P.ray_properties()
    if not props:
        return None
    return {name: jnp.full((n,), init, dtype) for name, init in props}


def initial_state(settings: Settings, spec: GridSpec, rays: RayBatch,
                  record_hits: int = 0, tape_ptr=None,
                  record_cells: bool = False) -> "_State":
    """Fresh march state for segmented execution (parallel/gridshard.py)."""
    n = rays.pos.shape[0]
    dtype = rays.pos.dtype
    zero = jnp.zeros((n,), dtype)
    return _State(
        pos=rays.pos, vel=rays.vel, color=jnp.zeros((n, 3), dtype), energy=zero,
        step=zero, life=rays.life, bounces=zero, alive=zero < rays.life,
        cmin=jnp.zeros((n, 3), dtype), cmax=jnp.zeros((n, 3), dtype),
        cres=jnp.zeros((n,), jnp.int32),
        ptr=(tape_ptr if tape_ptr is not None else jnp.zeros((n,), jnp.int32)),
        traversed=jnp.zeros((spec.num_chunks,), bool),
        it=jnp.zeros((), jnp.int32),
        aux=_initial_aux(n, dtype),
        hits=(
            HitRecords(
                vid=jnp.zeros((n, record_hits), jnp.int32),
                u=jnp.full((n, record_hits, 3), 0.5, dtype),
                flip=jnp.zeros((n, record_hits), jnp.int32),
                count=jnp.zeros((n,), jnp.int32),
                cell=(jnp.zeros((n, record_hits), jnp.int32)
                      if record_cells else None),
            )
            if record_hits
            else None
        ),
    )


def finalize_background(settings: Settings, state: "_State", background):
    """Apply the background program to a finished state (init.py:119-120)."""
    color, energy = state.color, state.energy
    bg = P.resolve_background(background)
    if bg is not None:
        color, energy = bg(color, energy, state.vel, state.bounces, settings)
        if settings.exact:
            color = jnp.round(color)
            color = jnp.minimum(255.0, jnp.round(color * energy[:, None]))
        else:
            color = jnp.minimum(255.0, color * energy[:, None])
    return MarchResult(
        color=color, energy=energy, bounces=state.bounces, step=state.step,
        pos=state.pos, vel=state.vel, traversed=state.traversed, hits=state.hits,
        aux=state.aux,
    )


def march(
    settings: Settings,
    spec: GridSpec,
    arrays: SceneArrays,
    rays: RayBatch,
    *,
    tape: Optional[jnp.ndarray] = None,
    tape_ptr: Optional[jnp.ndarray] = None,
    key: Optional[jnp.ndarray] = None,
    programs_used: Tuple[int, ...] = (M.PROGRAM_PBR,),
    background: Optional[str] = "sky",
    mode: str = "while",
    record_traversed: bool = False,
    record_hits: int = 0,
    resume_state: Optional["_State"] = None,
    num_iters: Optional[int] = None,
    finalize: bool = True,
    slab=None,
    unroll: int = 1,
    voxel_albedo: Optional[jnp.ndarray] = None,
    record_cells: bool = False,
) -> MarchResult:
    """March a batch of rays to completion. See module docstring.

    Segmented execution (parallel/gridshard.py, ops/compact.py):
    ``resume_state`` continues a previous partial march; ``num_iters`` caps
    this segment's iterations; with ``finalize=False`` the background is
    skipped and the call returns ``(MarchResult-of-raw-state, state)`` for
    resumption; ``slab=(x0_cells, width_cells)`` restricts progress to rays
    whose current cell lies in that grid X-slab (others stay frozen with
    exact state) with ``arrays.cell_word`` holding only the slab.

    Per-voxel differentiable parameters (SURVEY.md §7 stage 5 optional
    extension): ``voxel_albedo`` [X*Y*Z, 3] adds a per-cell albedo offset to
    the hit material's albedo (a dense differentiable field beyond the
    shared table); ``record_cells`` adds the flat hit cell to the hit tape
    so the replay backward (ops/diff.py) can route gradients into the grid.
    """
    n = rays.pos.shape[0]
    dtype = rays.pos.dtype
    cs = float(settings.chunk_size)
    table = arrays.material_table.astype(dtype)
    max_iters = num_iters if num_iters is not None else settings.march_steps

    use_tape = tape is not None
    if use_tape and tape_ptr is None:
        tape_ptr = jnp.zeros((n,), jnp.int32)
    if not use_tape and key is None:
        key = jax.random.PRNGKey(0)

    def rounding(x):
        return jnp.round(x) if settings.exact else x

    def draws_for_iteration(state):
        """[N, 3] uniforms for this iteration's potential hits.

        Key mode folds the key with each ray's own progress counter
        (state.ptr), not the global iteration index, so the stream a ray
        sees depends only on how far IT has marched — execution order
        (while vs scan, grid-TP freezing/rotation) never changes the noise.
        """
        if use_tape:
            idx = state.ptr[:, None] + jnp.arange(3)[None, :]
            idx = jnp.clip(idx, 0, tape.shape[1] - 1)
            return jnp.take_along_axis(tape, idx, axis=1).astype(dtype)
        keys = jax.vmap(lambda c: jax.random.fold_in(key, c))(state.ptr)
        return jax.vmap(lambda k: jax.random.uniform(k, (3,), dtype=dtype))(keys)

    def in_slab(pos):
        if slab is None:
            return None
        x0, width = slab
        gx = jnp.floor(pos[:, 0]).astype(jnp.int32) - spec.origin[0]
        gx = jnp.clip(gx, 0, spec.shape[0] - 1)
        return (gx >= x0) & (gx < x0 + width)

    def body(state: _State) -> _State:
        alive = state.alive
        if slab is not None:
            alive = alive & in_slab(state.pos)  # frozen rays make no progress
        pos, vel = state.pos, state.vel

        # -- 1. active-chunk hysteresis (init.py:67-73) --
        in_box = _all3(pos >= state.cmin) & _all3(pos <= state.cmax)
        switch = alive & ~in_box
        new_cmin = snapped(pos, cs)
        cmin = jnp.where(switch[:, None], new_cmin, state.cmin)
        cmax = jnp.where(switch[:, None], new_cmin + cs, state.cmax)

        # One cell-word fetch serves this entire iteration: the chunk's
        # resolution (floor(pos) always lies in the freshly-snapped chunk, so
        # its word carries the active chunk's res), the voxel id, and the
        # empty-space skip distance.
        fpos = jnp.floor(pos).astype(jnp.int32)
        word = _fetch_word(spec, arrays.cell_word, fpos, slab)
        res_new = (word >> C.WORD_RES_SHIFT) & C.WORD_RES_MASK
        cres = jnp.where(switch, res_new, state.cres)

        traversed = state.traversed
        if record_traversed:
            ci = ((cmin - jnp.array(spec.origin, dtype)) / cs).astype(jnp.int32)
            cshape = jnp.array(spec.chunk_shape, jnp.int32)
            mark = switch & _all3((ci >= 0) & (ci < cshape))
            flat = (
                jnp.clip(ci[:, 0], 0, spec.chunk_shape[0] - 1) * spec.chunk_shape[1]
                + jnp.clip(ci[:, 1], 0, spec.chunk_shape[1] - 1)
            ) * spec.chunk_shape[2] + jnp.clip(ci[:, 2], 0, spec.chunk_shape[2] - 1)
            traversed = traversed.at[flat].max(mark)

        # -- 2. voxel fetch (init.py:76-77) --
        has_chunk = cres > 0
        in_content = _all3(fpos <= cmin.astype(jnp.int32) + (settings.chunk_size - 1))
        vid = jnp.where(alive & has_chunk & in_content, word & C.WORD_ID_MASK, 0)
        hit = vid > 0

        # -- 3. material program (init.py:81-86, lib.py:448-460) --
        # Material row fetch as a one-hot matmul: [N, K] x [K, P] on the MXU.
        # Exact (single 1.0 per row selects the row bit-for-bit) and far
        # faster than TPU dynamic row gathers; also gives the backward pass a
        # clean transposed-matmul gradient into the table.
        onehot = (vid[:, None] == jnp.arange(table.shape[0])[None, :]).astype(dtype)
        rows = jnp.dot(onehot, table, preferred_element_type=dtype,
                       precision=jax.lax.Precision.HIGHEST)
        albedo = rows[:, M.PARAM_ALBEDO_R : M.PARAM_ALBEDO_B + 1]
        gsafe_flat = None
        if voxel_albedo is not None or record_cells:
            g = fpos - jnp.array(spec.origin, jnp.int32)
            gc = jnp.clip(g, 0, jnp.array(spec.shape, jnp.int32) - 1)
            gsafe_flat = spec.cell_flat(gc[:, 0], gc[:, 1], gc[:, 2])
        if voxel_albedo is not None:
            # dense per-cell albedo offset (hit cells are always in-grid,
            # and non-hit lanes' contributions are masked by the hit select
            # below, which also blocks their gradient)
            albedo = albedo + voxel_albedo.astype(dtype)[gsafe_flat]
        mat = P.MatParams(
            albedo=albedo,
            roughness=rows[:, M.PARAM_ROUGHNESS],
            absorption=rows[:, M.PARAM_ABSORPTION],
            ior=rows[:, M.PARAM_IOR],
            energy=rows[:, M.PARAM_ENERGY],
        )
        has_rough = ((word >> C.WORD_ROUGH_SHIFT) & 1) > 0
        u = draws_for_iteration(state)
        u = jnp.where((hit & has_rough)[:, None], u, 0.5)  # rand() center when no draw
        ray_view = P.HitRay(
            color=state.color,
            energy=state.energy,
            life=state.life,
            vel=vel,
            bounces=state.bounces,
            step=state.step,
            aux=state.aux,
        )
        pids = arrays.program[vid] if len(programs_used) > 1 else None
        upd, bounce = P.dispatch(programs_used, pids, ray_view, mat, settings, u)

        aux = state.aux
        if aux is not None:
            # custom ray properties update exactly like the builtin fields:
            # program output masked to actual hits (reference shaders mutate
            # the ray store only when called, i.e. on a hit — init.py:81)
            aux = {k: jnp.where(hit, upd.get(k, aux[k]), aux[k]) for k in aux}
        color = jnp.where(hit[:, None], rounding(upd.get("color", state.color)), state.color)
        energy = jnp.where(hit, upd.get("energy", state.energy), state.energy)
        life = jnp.where(hit, upd.get("life", state.life), state.life)
        vel = jnp.where(hit[:, None], upd.get("vel", vel), vel)
        bounces = jnp.where(hit, state.bounces + bounce, state.bounces)
        life = jnp.where(hit, life / (cres.astype(dtype) + bounce * settings.lod_bounces), life)
        vel = jnp.where(hit[:, None], cheb_normalize(vel), vel)
        if use_tape:
            ptr = state.ptr + jnp.where(hit & has_rough, 3, 0)
        else:
            ptr = state.ptr + alive.astype(jnp.int32)  # per-ray progress counter

        term = hit & (
            (state.step >= life)
            | (energy >= settings.max_light)
            | (bounces >= settings.max_bounces + 1)
        )

        # -- 4. IOR face reflection (init.py:88-111) --
        # "Same IOR" neighbor equality (init.py:106) compares via the discrete
        # IOR classes packed in the cell words — no extra table gathers.
        iorcls = (word >> C.WORD_IORCLS_SHIFT) & C.WORD_IORCLS_MASK
        do_ior = hit & ~term & (iorcls != 0)
        direction = (mat.ior - 0.5) * 2.0
        # Which neighbor is tested depends on the ray direction
        # (init.py:94-96): + neighbor when vel < (ior-0.5)*2, else -.
        # Vectorized over axes: the per-axis flips are independent (each
        # axis's delta reads only that axis), and the .at[:, axis].set form
        # lowered to scatter-shaped HLO with a slow transpose/VJP.
        bits = C.WORD_FACE_SHIFT + jnp.arange(3) * 2  # [3]
        toward = vel < direction[:, None]  # [N, 3]
        face_flip = jnp.where(
            toward, (word[:, None] >> bits[None, :]) & 1,
            (word[:, None] >> (bits[None, :] + 1)) & 1,
        )
        flips_mask = face_flip > 0  # [N, 3]
        flips = [flips_mask[:, 0], flips_mask[:, 1], flips_mask[:, 2]]
        vel = jnp.where(
            (do_ior[:, None] & flips_mask),
            vel - vel * mat.ior[:, None] * 2.0,
            vel,
        )

        hits_rec = state.hits
        if record_hits:
            # Record via one-hot selects over the (small) hit axis instead of
            # scatters — pure VPU elementwise work, no scatter HLO.
            cnt = hits_rec.count
            sel = (jnp.arange(record_hits)[None, :] == cnt[:, None]) & (hit & (cnt < record_hits))[:, None]
            flip_bits = jnp.where(do_ior, (
                flips[0].astype(jnp.int32)
                | (flips[1].astype(jnp.int32) << 1)
                | (flips[2].astype(jnp.int32) << 2)
            ), 0)
            hits_rec = HitRecords(
                vid=jnp.where(sel, vid[:, None], hits_rec.vid),
                u=jnp.where(sel[:, :, None], u[:, None, :], hits_rec.u),
                flip=jnp.where(sel, flip_bits[:, None], hits_rec.flip),
                count=cnt + hit.astype(jnp.int32),
                cell=(jnp.where(sel, gsafe_flat[:, None], hits_rec.cell)
                      if record_cells else hits_rec.cell),
            )

        # -- 5. advance (init.py:113-116) --
        # Inside a chunk the reference steps by the chunk resolution; we take
        # s lattice steps at once where s is bounded by (a) the cell's
        # Chebyshev distance to the nearest renderable voxel (no hit can occur
        # in between) and (b) the first lattice point outside the active
        # chunk's closed box (so the step lattice — and therefore every future
        # voxel hit — stays bit-identical to the reference's step-by-step
        # walk; only the unobservable final overshoot position may differ).
        # Outside chunks the reference's void-skip formula applies unchanged.
        adv = alive & ~term
        skip_d = (word >> C.WORD_SKIP_SHIFT) & C.WORD_SKIP_MASK
        cres_safe = jnp.maximum(cres, 1)
        s_free = jnp.maximum(1, (skip_d - 1) // cres_safe)
        # lattice steps until the first point outside the closed box
        denom = vel * cres_safe.astype(dtype)[:, None]
        bound = jnp.where(vel > 0, cmax, cmin)
        t_axis = jnp.where(
            jnp.abs(denom) > 1e-12, (bound - pos) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1), jnp.inf
        )
        k_exit = jnp.floor(jnp.min(t_axis, axis=-1)).astype(jnp.int32) + 1
        n_steps = jnp.clip(jnp.minimum(s_free, k_exit), 1, None)
        void_step = 1.0 + jnp.abs(
            settings.chunk_radius
            - jnp.mod(jnp.min(pos, axis=-1) + settings.chunk_radius, cs)
        )
        step_len = jnp.where(
            has_chunk,
            (n_steps * cres_safe).astype(dtype),
            void_step.astype(dtype),
        )
        pos = jnp.where(adv[:, None], pos + vel * step_len[:, None], pos)
        step = jnp.where(adv, state.step + step_len, state.step)

        alive = adv & (step < life)
        if slab is not None:
            # Frozen rays keep their previous liveness for later segments.
            alive = jnp.where(in_slab(state.pos), alive, state.alive)
        return _State(
            pos=pos, vel=vel, color=color, energy=energy, step=step, life=life,
            bounces=bounces, alive=alive, cmin=cmin, cmax=cmax, cres=cres, ptr=ptr,
            traversed=traversed, it=state.it + 1, hits=hits_rec, aux=aux,
        )

    zero = jnp.zeros((n,), dtype)
    if resume_state is not None:
        # The iteration counter is per-invocation (it caps this segment);
        # per-ray progress lives in ptr/step, which resume untouched.
        init = resume_state._replace(it=jnp.zeros((), jnp.int32))
    else:
        init = _State(
            pos=rays.pos,
            vel=rays.vel,
            color=jnp.zeros((n, 3), dtype),
            energy=zero,
            step=zero,
            life=rays.life,
            bounces=zero,
            alive=zero < rays.life,
            cmin=jnp.zeros((n, 3), dtype),
            cmax=jnp.zeros((n, 3), dtype),
            cres=jnp.zeros((n,), jnp.int32),
            ptr=(tape_ptr if use_tape else jnp.zeros((n,), jnp.int32)),
            traversed=jnp.zeros((spec.num_chunks,), bool),
            it=jnp.zeros((), jnp.int32),
            aux=_initial_aux(n, dtype),
            hits=(
                HitRecords(
                    vid=jnp.zeros((n, record_hits), jnp.int32),
                    u=jnp.full((n, record_hits, 3), 0.5, dtype),
                    flip=jnp.zeros((n, record_hits), jnp.int32),
                    count=jnp.zeros((n,), jnp.int32),
                    cell=(jnp.zeros((n, record_hits), jnp.int32)
                          if record_cells else None),
                )
                if record_hits
                else None
            ),
        )

    # Unrolled body: the per-ray masks make extra sub-steps no-ops for dead
    # rays, so grouping `unroll` steps per loop trip is semantics-exact (the
    # loop condition is just checked less often) and amortizes loop-control
    # and scheduling overhead.
    if unroll > 1:
        single_body = body

        def body(state):
            for _ in range(unroll):
                state = single_body(state)
            return state

    if mode == "while":
        if slab is None:
            cond = lambda s: jnp.any(s.alive) & (s.it < max_iters)
        else:
            # Segment ends when no ray can progress inside this slab.
            cond = lambda s: jnp.any(s.alive & in_slab(s.pos)) & (s.it < max_iters)
        final = jax.lax.while_loop(cond, body, init)
    elif mode == "scan":
        # Rematerialize each step in the backward pass: only the carried state
        # is saved per iteration, every gather/shade intermediate is recomputed
        # — the recompute-based backward of SURVEY.md §7 stage 5, trading
        # FLOPs for HBM exactly as jax.checkpoint is designed to.
        ck_body = jax.checkpoint(body, prevent_cse=False)

        def scan_body(s, _):
            return ck_body(s), None

        final, _ = jax.lax.scan(scan_body, init, None,
                                length=-(-max_iters // unroll))
    else:
        raise ValueError(f"mode must be 'while' or 'scan', got {mode!r}")

    if not finalize:
        res = MarchResult(
            color=final.color, energy=final.energy, bounces=final.bounces,
            step=final.step, pos=final.pos, vel=final.vel,
            traversed=final.traversed, hits=final.hits, aux=final.aux,
        )
        return res, final

    # -- 6. background program (init.py:119-120, lib.py:463-476) --
    color, energy = final.color, final.energy
    bg = P.resolve_background(background)
    if bg is not None:
        color, energy = bg(color, energy, final.vel, final.bounces, settings)
        color = jnp.round(color) if settings.exact else color
        # Energy -> color intensity, clamped (lib.py:474-476): round then min.
        if settings.exact:
            color = jnp.minimum(255.0, jnp.round(color * energy[:, None]))
        else:
            color = jnp.minimum(255.0, color * energy[:, None])

    return MarchResult(
        color=color,
        energy=energy,
        bounces=final.bounces,
        step=final.step,
        pos=final.pos,
        vel=final.vel,
        traversed=final.traversed,
        hits=final.hits,
        aux=final.aux,
    )
