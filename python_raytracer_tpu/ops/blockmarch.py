"""Pallas TPU blockwise march: the production kernel for the hot loop.

The XLA march (ops/march.py) is ~90% bound by its one cell-word gather per
ray-step (~15 ns/element on TPU regardless of context — measured, ROADMAP.md
perf facts). This kernel removes every HBM gather from the inner loop by
marching rays against chunk blocks staged in VMEM and turning all per-lane
lookups into one-hot matmuls on the MXU (exact: a single 1.0 per column
selects a value bit-for-bit, and the 16-bit halves survive the f32->bf16
3-pass decomposition because the one-hot's low part is exactly zero).

Design (tile-persistent, vote + DMA — the structure validated by
tools/skeleton_kernel.py, upgraded to full march semantics):

* rays live on the *lane* axis everywhere: per-ray state is [rows, N] with
  W-lane tiles per kernel instance, so every elementwise op fills whole
  8x128 VPU rows and no transposes/relayouts appear in the hot path. The
  one-hot lookups run "transposed": ``value_table[rows, K] @ onehot[K, W]``
  with the one-hot built by broadcasting the per-lane index across sublanes
  (free) and comparing against a sublane iota.
* the voxel grid is paged per chunk: ``blocks[C, 64, 128]`` f32 where
  ``blocks[c, lo, hi]`` / ``blocks[c, 32+lo, hi]`` hold the low/high 16-bit
  halves of the packed cell word (scene/compile.py layout) of local cell
  ``hi*32 + lo``. A chunk-level ``coarse`` table (res | chunk_id<<3) serves
  chunk switches and void detection.
* each W-lane tile is G = W/256 groups of 256 rays (rays are pre-sorted by
  starting chunk, and 256-ray groups measured 1.10x padding overhead —
  tools/analyze_coherence.py). Per episode every group *votes* for the
  chunk page its most-starved waiting lane needs, DMAs it HBM->VMEM, and an
  inner loop marches every lane whose chunk is loaded (or who is in void —
  void skips need no data). Lanes whose chunk is not resident freeze with
  exact state; per-ray-progress PRNG keys (ops/march.py draws_for_iteration)
  make any freeze/resume order bit-identical to the plain march.
* hit records are packed one int32 per hit (vid | flip<<12 | rough<<15 |
  ptr<<16); the jitter uniforms are *regenerated* outside the kernel from
  the recorded progress counter via utils/rng.py (bit-exact threefry
  replica), so the backward's HitRecords tape is byte-identical to the XLA
  march's and the hit-replay VJP (ops/diff.py) is reused unchanged.
* host side does few multi-operand co-sorts: one initial sort by
  (starting chunk, direction octant) for coherence, one final unsort by
  slot id, and optionally one compaction re-sort per extra superstep
  (dead lanes to the back, survivors grouped by needed page). Per-group
  gating skips block DMAs and cell-lookup matmuls for groups with no
  waiting/needing lane, and the whole shading chain is gated on any-hit.
  After the kernel an XLA cleanup march finishes any ray the static
  episode/iteration caps under-provisioned for, so the result is
  bit-exact vs ``march(mode="while")`` for EVERY input, not just typical
  ones (tests/test_blockmarch.py).

Replaces the reference's per-pixel Python march loop (reference
``init.py:66-116``); every semantic rule is inherited from ops/march.py
which cites the reference line-by-line.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.ops import programs as P
from python_raytracer_tpu.ops.march import (
    HitRecords,
    MarchResult,
    RayBatch,
    _State,
    finalize_background,
    march,
)
from python_raytracer_tpu.scene import compile as C
from python_raytracer_tpu.scene import material as M
from python_raytracer_tpu.scene.compile import GridSpec, SceneArrays
from python_raytracer_tpu.utils import rng as R

# f32 state rows
_F_POS = 0      # 0..2
_F_VEL = 3      # 3..5
_F_COLOR = 6    # 6..8
_F_ENERGY = 9
_F_STEP = 10
_F_LIFE = 11
_F_BOUNCES = 12
_F_CMIN = 13    # 13..15
F_ROWS = 16

# i32 state rows
_I_FLAGS = 0    # alive | has_box<<1 | cres<<2 | stall<<5 | page<<9
_I_PTR = 1
_I_COUNT = 2
_I_TRIPS = 3    # telemetry: inner-loop trips this tile paid (same all lanes)
_I_EPS = 4      # telemetry: episodes this tile paid (same all lanes)
I_ROWS = 8

_FLAG_ALIVE = 1
_FLAG_HASBOX = 2
_CRES_SHIFT = 2
_STALL_SHIFT = 5
_STALL_MAX = 15
_PAGE_SHIFT = 9

# packed hit record bits (see module docstring)
_REC_VID_MASK = (1 << C.WORD_ID_BITS) - 1
_REC_FLIP_SHIFT = 12
_REC_ROUGH_SHIFT = 15
_REC_PTR_SHIFT = 16


def _pad_to(x, mult):
    return -(-x // mult) * mult


def pack_blocks(spec: GridSpec, cell_word, chunk_res, byte_planes=False,
                voxel_albedo=None, page_map=None):
    """cell_word flat [X*Y*Z] -> (blocks, coarse f32).

    Default (f32 halves): blocks [C, 64, 128] f32 — blocks[c, lo, hi] = low
    16 bits of the word of local cell hi*32+lo; blocks[c, 32+lo, hi] = high
    15 bits (bit 31 unused by the layout).

    ``byte_planes``: blocks [C, 4, 32, 128] bf16 — plane b holds byte b of
    the word (0..255, exactly representable in bf16). Same lookup exactness
    as the f32 halves (a one-hot contraction sums exactly one exact product)
    but the MXU runs native single-pass bf16 instead of the 3-pass f32
    decomposition, and the HBM->VMEM block DMA halves to 16 KiB/chunk.

    ``voxel_albedo`` [X*Y*Z, 3] f32 (the per-voxel differentiable albedo
    grid, SURVEY.md §7 stage 5): appended as 3 more 32-row groups — blocks
    [C, 160, 128] — so the per-hit albedo offset rides the same DMA and the
    same one-hot lookup as the cell word (f32 halves mode only).

    coarse[cz, cx*CY+cy] = chunk_res | chunk_flat<<3 (exact in f32: <= 2^24).
    ``page_map`` [C] int32 replaces chunk_flat as the page field — resident
    mode remaps chunk ids to compacted VMEM-pool slots (march_blockwise).
    Jittable; rebuilt on bake updates (cheap reshapes, no gathers).
    """
    cs = spec.chunk_size
    if cs * cs * cs != 4096:
        raise ValueError("blockmarch requires chunk_size 16")
    CX, CY, CZ = spec.chunk_shape
    if page_map is None and CX * CY * CZ * 8 + 7 >= (1 << 16):
        # the coarse word (res | page<<3) is stored as TWO bf16 byte planes
        # (<= 255 each = 16 usable bits); without a page_map bounding the
        # page field, grids past 8191 chunks would silently corrupt lookups
        # (ADVICE r4). Resident mode compacts pages and stays in range.
        raise ValueError(
            f"chunk grid {CX}x{CY}x{CZ} overflows the 16-bit coarse word; "
            "use resident mode (page_map compaction) or the XLA march")

    def to_lohi(flat):
        v = flat.reshape(CX, cs, CY, cs, CZ, cs)
        v = v.transpose(0, 2, 4, 1, 3, 5).reshape(CX * CY * CZ, 128, 32)
        return v.transpose(0, 2, 1)  # [C, lo, hi]

    w = to_lohi(cell_word)
    if byte_planes:
        if voxel_albedo is not None:
            raise ValueError("voxel_albedo needs f32-halves blocks")
        blocks = jnp.stack(
            [((w >> (8 * b)) & 0xFF).astype(jnp.bfloat16) for b in range(4)],
            axis=1)  # [C, 4, lo, hi]
    else:
        lo16 = (w & 0xFFFF).astype(jnp.float32)
        hi16 = ((w >> 16) & 0x7FFF).astype(jnp.float32)
        parts = [lo16, hi16]
        if voxel_albedo is not None:
            va = voxel_albedo.astype(jnp.float32)
            parts += [to_lohi(va[:, ch]) for ch in range(3)]
        blocks = jnp.concatenate(parts, axis=1)  # [C, 64 or 160, 128]

    if page_map is None:
        flat = jnp.arange(CX * CY * CZ, dtype=jnp.int32)
    else:
        flat = jnp.asarray(page_map, jnp.int32)
    cword = chunk_res.astype(jnp.int32) | (flat << 3)
    cword = cword.reshape(CX, CY, CZ).transpose(2, 0, 1).reshape(CZ, CX * CY)
    # TWO bf16 byte planes (lo = word & 0xFF, hi = word >> 8): each value
    # <= 255 is bf16-exact and a one-hot contraction sums exactly one
    # product, so the chunk-table lookup runs as two single-pass bf16
    # matmuls. (An f32 plane needs multi-pass HIGHEST dots: the round-4
    # compile service lowers default-precision f32 dots as single-pass
    # bf16, which silently truncates packed integers — ROADMAP forensics.)
    coarse = jnp.zeros((2, _pad_to(CZ, 8), _pad_to(CX * CY, 8)),
                       jnp.bfloat16)
    coarse = coarse.at[0, :CZ, : CX * CY].set(
        (cword & 0xFF).astype(jnp.bfloat16))
    coarse = coarse.at[1, :CZ, : CX * CY].set(
        (cword >> 8).astype(jnp.bfloat16))
    return blocks, coarse


def pack_mat_rows(table, program=None):
    """Material table [K, NUM_PARAMS] -> [8, Kpad] param-major f32 plane for
    the transposed one-hot fetch (rows: albedo r/g/b, roughness, absorption,
    ior, energy, pad). ``program`` [K] int32 fills row 7 with per-material
    program ids (exact in f32) for the kernel's multi-program dispatch."""
    perm = [M.PARAM_ALBEDO_R, M.PARAM_ALBEDO_G, M.PARAM_ALBEDO_B,
            M.PARAM_ROUGHNESS, M.PARAM_ABSORPTION, M.PARAM_IOR,
            M.PARAM_ENERGY]
    k = table.shape[0]
    out = jnp.zeros((8, _pad_to(k, 8)), jnp.float32)
    out = out.at[:7, :k].set(table.astype(jnp.float32).T[jnp.array(perm)])
    if program is not None:
        out = out.at[7, :k].set(jnp.asarray(program, jnp.int32)
                                .astype(jnp.float32))
    return out


def _onehot_T(idx, k, w, dtype=jnp.float32):
    """[k, w] one-hot of per-lane indices ``idx`` [w] (no match -> zero
    column). Broadcast across sublanes is free; compare against sublane iota."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, w), 0)
    return (rows == idx[None, :]).astype(dtype)


def _sublane_pick(rows_T, idx, k, w):
    """rows_T [k, w] -> [w]: value at sublane idx[lane] per lane."""
    sel = jax.lax.broadcasted_iota(jnp.int32, (k, w), 0) == idx[None, :]
    return jnp.sum(jnp.where(sel, rows_T, 0.0), axis=0)


def _make_kernel(settings: Settings, spec: GridSpec, *, w: int,
                 record_hits: int, ep_cap: int, inner_cap: int,
                 czp: int, cxyp: int, kp: int, unroll: int = 1,
                 record_traversed: bool = False, byte_planes: bool = False,
                 group_coarse: bool = False, tape_rows: int = 0,
                 tape_len: int = 0, voxel_mode: bool = False,
                 record_cells: bool = False, pages: int = 1,
                 resident: bool = False,
                 programs_used: Tuple[int, ...] = (M.PROGRAM_PBR,),
                 slab_width: int = 0,
                 prop_names: Tuple[str, ...] = (),
                 flat: bool = False, flat_coarse: Optional[bool] = None):
    """Build the kernel body (all settings/geometry static).

    ``flat``: straight-line trip bodies — the coarse lookup, cell fetch,
    shade chain and hit-record write run UNCONDITIONALLY every trip instead
    of behind ``lax.cond``/``pl.when`` gates. Rationale (round-5 measured):
    on the current compile service a trip costs ~3.5 us nearly independent
    of lane width (256-lane group trips cost as much as 2048-lane tile
    trips), i.e. per-trip cost is dominated by scalar-sync overhead (the
    ``jnp.any`` reductions + branches), not vector work — the gates cost
    more than the MXU work they save. Identical results: every gated body
    is already mask-correct when no lane needs it (zeros/no-op writes).
    The per-hit RNG draw stays gated (threefry is real vector work).
    ``flat_coarse`` (default = ``flat``): whether the COARSE lookup also
    runs unconditionally — it is the one genuinely expensive gated body
    (the [cxyp, w] one-hot build is ~O(chunk-columns) row ops; round-5
    ablation: removing it saves ~1.8 us/trip), so keeping its gate while
    flattening everything else can win when switches are rare per trip.

    ``pages`` > 1: each group holds P resident chunk blocks instead of one
    (bufs [groups, P, rows, 128]); the per-episode vote loads into slot
    ``ep % P`` and lanes whose chunk is resident in ANY slot stay active,
    so diverged groups freeze fewer lanes per episode. The cell fetch runs
    one gated matmul per resident slot with the one-hot masked to that
    slot's lanes (each lane matches at most one slot, so the accumulated
    picks are exact). pages=1 traces the exact original program.

    ``voxel_mode``: blocks carry 3 extra 32-row albedo groups
    (pack_blocks(voxel_albedo=...)) applied as per-hit albedo offsets;
    ``record_cells``: the hit tape gains a second row block holding the flat
    grid cell of each hit (per-voxel gradient routing, ops/diff.py).

    ``tape_rows``/``tape_len``: static-noise tape mode (reference
    init.py:136-137 per-pixel reseeding; utils/tape.py layout). The per-ray
    tape segments are staged per tile as a [tape_rows, w] VMEM block exactly
    like the state rows; on a roughness hit the three uniforms are per-lane
    sublane picks at ptr..ptr+2 (clipped to tape_len-1, matching
    ops/march.py draws_for_iteration), and ptr advances by 3 per rough hit
    instead of the key-mode progress counter.

    ``resident``: the whole (occupied-chunk) block pool lives in VMEM as a
    kernel input — the scene fits (~225 chunks x 16-32 KiB, vs ~16 MB VMEM)
    — so the vote+DMA episode machinery disappears: a single trip loop
    votes a served page per group per trip and the cell fetch reads
    ``pool[served]`` directly. A lane whose chunk is not the served page
    freezes for ONE trip instead of one episode (the measured 8.5x trip
    imbalance of the episode design). Freeze/resume order never changes
    results: PRNG draws are keyed by per-ray progress counters.

    BM_ABL env flags (perf ablations — WRONG results, timing only):
    nodma (skip block DMAs), nocell (skip the cell-word lookup matmuls),
    nomat (skip the material fetch), norng (skip threefry draws),
    nocoarse (skip the chunk-table lookup at chunk switches).
    """
    import os as _os
    _abl = set((_os.environ.get("BM_ABL") or "").split(","))
    if flat_coarse is None:
        flat_coarse = flat
    cs = float(settings.chunk_size)
    csi = settings.chunk_size
    CX, CY, CZ = spec.chunk_shape
    ox, oy, oz = (float(v) for v in spec.origin)
    groups = w // 256
    falloff_e = 1.0 + float(settings.falloff)
    max_light = float(settings.max_light)
    max_b = float(settings.max_bounces) + 1.0
    lod_bounces = float(settings.lod_bounces)
    chunk_radius = float(settings.chunk_radius)
    H = record_hits
    hp = _pad_to(H, 8) if H else 8
    SX, SY, SZ = spec.shape
    brows = 160 if voxel_mode else 64  # f32-halves block rows
    nprops = len(prop_names)  # registered ray-property rows ride the state
    # block after the builtin F rows (reference mutable ray store,
    # README.md:96; ops/programs.py register_ray_property)

    def kernel(scal_ref, *args):
        i = 0
        F_in, I_in, R_in = args[0:3]
        i = 3
        tape_ref = None
        if tape_rows:
            tape_ref = args[i]
            i += 1
        blocks_hbm, coarse_ref, mat_ref = args[i:i + 3]
        F_out, I_out, R_out, T_out = args[i + 3:i + 7]
        if resident:
            # the pool arrives in ANY (HBM) exactly like the paged blocks
            # (whole-VMEM inputs of pool size miscompiled on hardware:
            # coarse/mat8 read zeros — ROADMAP round-4 forensics) and is
            # DMA'd ONCE into a persistent VMEM scratch below; no per-
            # episode vote DMAs.
            pool_scr, pool_sem, picked = args[i + 7:i + 10]
            bufs = sems = None
        else:
            bufs, sems, picked = args[i + 7:i + 10]
        F_out[:] = F_in[:]
        I_out[:] = I_in[:]
        if H:
            R_out[:] = R_in[:]
        T_out[0] = jnp.zeros((czp, cxyp), jnp.int32)
        k1 = scal_ref[0]
        k2 = scal_ref[1]

        group_of = jax.lax.broadcasted_iota(jnp.int32, (w,), 0) // 256

        def in_slab_of(px):
            """Grid-TP slab gate (ops/march.py in_slab, SURVEY §5.7 ring):
            lanes whose current cell-x lies outside [x0, x0+width) freeze
            with exact state; x0 rides the prefetch scalars (it rotates
            per ring segment)."""
            gx = jnp.clip(jnp.floor(px).astype(jnp.int32) - int(ox),
                          0, SX - 1)
            x0 = scal_ref[2]
            return (gx >= x0) & (gx < x0 + slab_width)

        def read_state():
            px, py, pz = F_out[_F_POS], F_out[_F_POS + 1], F_out[_F_POS + 2]
            vx, vy, vz = F_out[_F_VEL], F_out[_F_VEL + 1], F_out[_F_VEL + 2]
            flags = I_out[_I_FLAGS]
            return px, py, pz, vx, vy, vz, flags

        def episode_cond(carry):
            ep, go, loaded = carry
            return jnp.logical_and(ep < ep_cap, go)

        def episode_body(carry):
            ep, _, loaded = carry
            flags = I_out[_I_FLAGS]
            alive = (flags & _FLAG_ALIVE) > 0
            cres = (flags >> _CRES_SHIFT) & 7
            stall = (flags >> _STALL_SHIFT) & _STALL_MAX
            page = flags >> _PAGE_SHIFT

            def resident_of(pg):
                # closure over the CURRENT `loaded` binding (pre-vote in the
                # needing test, post-vote inside the inner loop)
                r = pg == loaded[0]
                for l in loaded[1:]:
                    r = r | (pg == l)
                return r

            # --- vote + DMA: each group fetches the page its most-starved
            # waiting lane needs (max over stall<<12|page guarantees every
            # waiting lane is eventually served) ---
            if pages == 1:
                needing = alive & (cres > 0) & (page != loaded[0])
            else:
                needing = alive & (cres > 0) & ~resident_of(page)
            if resident:
                # pages past the pool capacity are unservable (traced-grid
                # overflow): they must never win a vote — their lanes stay
                # frozen and the XLA cleanup finishes them
                needing = needing & (page < blocks_hbm.shape[0])
            if slab_width:
                # grid-TP: lanes outside this device's slab are frozen and
                # must not steer the vote
                needing = needing & in_slab_of(F_out[_F_POS])
            votekey = jnp.where(needing, (stall << 20) | page, -1)
            if pages == 1:
                new_loaded = loaded[0]
                fetches = []
                for g in range(groups):
                    vk = jnp.max(votekey[g * 256:(g + 1) * 256])
                    vote = jnp.where(vk >= 0, vk & 0xFFFFF,
                                     loaded[0][g * 256])
                    safe = jnp.clip(vote, 0, blocks_hbm.shape[0] - 1)
                    pred = vk >= 0  # groups w/o waiting lanes skip the fetch
                    if resident:
                        # no DMA: the pool is VMEM-resident; the cell fetch
                        # reads blocks_hbm[loaded-page] directly in-region
                        pass
                    elif "nodma" not in _abl:
                        fetches.append((g, pred, safe))

                        @pl.when(pred)
                        def _(g=g, safe=safe):
                            pltpu.make_async_copy(blocks_hbm.at[safe],
                                                  bufs.at[g],
                                                  sems.at[g]).start()
                    new_loaded = jnp.where(group_of == g, vote, new_loaded)
                for g, pred, safe in fetches:
                    @pl.when(pred)
                    def _(g=g, safe=safe):
                        pltpu.make_async_copy(blocks_hbm.at[safe], bufs.at[g],
                                              sems.at[g]).wait()
                loaded = (new_loaded,)
            else:
                # multi-page residency: the vote replaces slot ep % P, so a
                # diverged group accumulates up to P live chunk blocks and
                # freezes fewer lanes per episode. One DMA per group per
                # episode (sems[g] is single-slot), same as pages=1.
                slotp = [jax.lax.rem(ep, jnp.int32(pages)) == p
                         for p in range(pages)]
                new_loaded = list(loaded)
                fetches = []
                for g in range(groups):
                    vk = jnp.max(votekey[g * 256:(g + 1) * 256])
                    vote = vk & 0xFFFFF
                    safe = jnp.clip(vote, 0, blocks_hbm.shape[0] - 1)
                    pred = vk >= 0
                    if "nodma" not in _abl:
                        fetches.append((g, pred, safe))
                        for p in range(pages):
                            @pl.when(pred & slotp[p])
                            def _(g=g, p=p, safe=safe):
                                pltpu.make_async_copy(blocks_hbm.at[safe],
                                                      bufs.at[g, p],
                                                      sems.at[g]).start()
                    for p in range(pages):
                        sel = (group_of == g) & pred & slotp[p]
                        new_loaded[p] = jnp.where(sel, vote, new_loaded[p])
                for g, pred, safe in fetches:
                    for p in range(pages):
                        @pl.when(pred & slotp[p])
                        def _(g=g, p=p, safe=safe):
                            pltpu.make_async_copy(blocks_hbm.at[safe],
                                                  bufs.at[g, p],
                                                  sems.at[g]).wait()
                loaded = tuple(new_loaded)

            # --- inner march loop: lanes in a loaded chunk or in void ---
            def inner_cond(c):
                it, go = c
                return jnp.logical_and(it < inner_cap, go)

            def one_iteration():
                px, py, pz, vx, vy, vz, flags = read_state()
                alive = (flags & _FLAG_ALIVE) > 0
                has_box = (flags & _FLAG_HASBOX) > 0
                cres = (flags >> _CRES_SHIFT) & 7
                page = flags >> _PAGE_SHIFT
                cmx = F_out[_F_CMIN]
                cmy = F_out[_F_CMIN + 1]
                cmz = F_out[_F_CMIN + 2]

                active = alive & ((cres == 0) | resident_of(page))
                if slab_width:
                    # grid-TP segment: out-of-slab lanes freeze exactly
                    # (reference of record: ops/march.py body() slab gate)
                    active = active & in_slab_of(px)

                # 1. active-chunk hysteresis (ops/march.py step 1,
                #    reference init.py:67-73)
                in_box = has_box & (
                    (px >= cmx) & (px <= cmx + cs)
                    & (py >= cmy) & (py <= cmy + cs)
                    & (pz >= cmz) & (pz <= cmz + cs))
                switch = active & ~in_box

                def do_coarse(_):
                    sx = jnp.floor(px / cs) * cs
                    sy = jnp.floor(py / cs) * cs
                    sz = jnp.floor(pz / cs) * cs
                    ccx = ((sx - ox) / cs).astype(jnp.int32)
                    ccy = ((sy - oy) / cs).astype(jnp.int32)
                    ccz = ((sz - oz) / cs).astype(jnp.int32)
                    in_grid = ((ccx >= 0) & (ccx < CX) & (ccy >= 0)
                               & (ccy < CY) & (ccz >= 0) & (ccz < CZ))
                    cxy = jnp.where(in_grid, ccx * CY + ccy, -1)
                    czi_ = jnp.where(in_grid, ccz, -1)
                    oh = _onehot_T(cxy, cxyp, w, jnp.bfloat16)
                    lo_T = jnp.dot(coarse_ref[0], oh,
                                   preferred_element_type=jnp.float32)
                    hi_T = jnp.dot(coarse_ref[1], oh,
                                   preferred_element_type=jnp.float32)
                    cw = (_sublane_pick(lo_T, czi_, czp, w).astype(jnp.int32)
                          | (_sublane_pick(hi_T, czi_, czp, w)
                             .astype(jnp.int32) << 8))
                    return cw & 7, cw >> 3, sx, sy, sz

                any_switch = jnp.any(switch)
                if "nocoarse" in _abl:
                    res_c = jnp.zeros((w,), jnp.int32)
                    page_c = jnp.zeros((w,), jnp.int32)
                    sx = jnp.floor(px / cs) * cs
                    sy = jnp.floor(py / cs) * cs
                    sz = jnp.floor(pz / cs) * cs
                elif group_coarse:
                    # per-group gated chunk-table lookup (same trick as the
                    # cell fetch below): groups where no lane switches skip
                    # their [czp,cxyp]x[cxyp,256] matmul entirely. Stale
                    # scratch lanes are safe — res_c/page_c are only consumed
                    # under jnp.where(switch, ...).
                    sx = jnp.floor(px / cs) * cs
                    sy = jnp.floor(py / cs) * cs
                    sz = jnp.floor(pz / cs) * cs
                    ccx = ((sx - ox) / cs).astype(jnp.int32)
                    ccy = ((sy - oy) / cs).astype(jnp.int32)
                    ccz = ((sz - oz) / cs).astype(jnp.int32)
                    in_grid = ((ccx >= 0) & (ccx < CX) & (ccy >= 0)
                               & (ccy < CY) & (ccz >= 0) & (ccz < CZ))
                    cxy = jnp.where(in_grid, ccx * CY + ccy, -1)
                    czi_ = jnp.where(in_grid, ccz, -1)
                    crow = 4 if byte_planes else (5 if voxel_mode else 2)
                    for g in range(groups):
                        sl = slice(g * 256, (g + 1) * 256)

                        @pl.when(jnp.any(switch[sl]))
                        def _(g=g, sl=sl):
                            oh = _onehot_T(cxy[sl], cxyp, 256, jnp.bfloat16)
                            lo_T = jnp.dot(
                                coarse_ref[0], oh,
                                preferred_element_type=jnp.float32)
                            hi_T = jnp.dot(
                                coarse_ref[1], oh,
                                preferred_element_type=jnp.float32)
                            picked[crow, sl] = _sublane_pick(
                                lo_T, czi_[sl], czp, 256)
                            picked[crow + 1, sl] = _sublane_pick(
                                hi_T, czi_[sl], czp, 256)
                    cw = (picked[crow, :].astype(jnp.int32)
                          | (picked[crow + 1, :].astype(jnp.int32) << 8))
                    res_c, page_c = cw & 7, cw >> 3
                elif flat_coarse:
                    # unconditional: switch-masked consumers make stale
                    # lanes harmless; dropping the any()+branch saves the
                    # scalar sync that dominates per-trip cost (see ``flat``)
                    res_c, page_c, sx, sy, sz = do_coarse(0)
                else:
                    res_c, page_c, sx, sy, sz = jax.lax.cond(
                        any_switch, do_coarse,
                        lambda _: (jnp.zeros((w,), jnp.int32),
                                   jnp.zeros((w,), jnp.int32),
                                   px, py, pz), 0)

                if record_traversed:
                    # traversed-chunk feedback (reference init.py:72-73):
                    # OR of switched lanes' (cz, cxy) via one gated MXU
                    # outer product accumulated into the tile's bitmask
                    @pl.when(any_switch)
                    def _():
                        ccx = (jnp.floor(px / cs) - ox / cs).astype(jnp.int32)
                        ccy = (jnp.floor(py / cs) - oy / cs).astype(jnp.int32)
                        ccz = (jnp.floor(pz / cs) - oz / cs).astype(jnp.int32)
                        in_g = ((ccx >= 0) & (ccx < CX) & (ccy >= 0)
                                & (ccy < CY) & (ccz >= 0) & (ccz < CZ))
                        m = switch & in_g
                        cxy_t = jnp.where(m, ccx * CY + ccy, -1)
                        cz_t = jnp.where(m, ccz, -1)
                        oh_cz = _onehot_T(cz_t, czp, w)
                        oh_cxy = _onehot_T(cxy_t, cxyp, w)
                        acc = jax.lax.dot_general(
                            oh_cz, oh_cxy, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                        T_out[0] = T_out[0] | (acc > 0).astype(jnp.int32)
                if "dumpcw" in _abl:
                    # debug: expose the raw coarse word per lane via the
                    # ptr row (state.ptr after unsorted return)
                    I_out[_I_PTR] = (res_c << 3) | 0
                    I_out[_I_PTR] = I_out[_I_PTR] | (page_c << 8)
                cmx = jnp.where(switch, sx, cmx)
                cmy = jnp.where(switch, sy, cmy)
                cmz = jnp.where(switch, sz, cmz)
                has_box = has_box | switch
                cres = jnp.where(switch, res_c, cres)
                page = jnp.where(switch, page_c, page)

                # lanes that switched into an unloaded chunk freeze NOW
                # (resumed bit-exactly on a later episode / cleanup)
                active = active & ((cres == 0) | resident_of(page))

                # 2. cell-word fetch from the group's VMEM block
                #    (ops/march.py step 2, reference init.py:76-77)
                fx = jnp.floor(px)
                fy = jnp.floor(py)
                fz = jnp.floor(pz)
                lx = (fx - cmx).astype(jnp.int32)
                ly = (fy - cmy).astype(jnp.int32)
                lz = (fz - cmz).astype(jnp.int32)
                in_content = ((lx <= csi - 1) & (ly <= csi - 1)
                              & (lz <= csi - 1))
                cell = jnp.clip((lx * csi + ly) * csi + lz, 0, 4095)
                lo = cell & 31
                hi = cell >> 5
                # per-group block lookup; results land in a scratch row
                # (Mosaic has no 1-D vector concatenate). Groups with no
                # lane needing a word skip their matmul entirely — stale
                # scratch values are safe because inactive lanes' words are
                # masked to 0 below. This is the dominant per-trip cost, and
                # in diverged tiles most group-trips are inactive.
                need_word = active & (cres > 0) & in_content
                if "nocell" not in _abl and pages == 1:
                    for g in range(groups):
                        sl = slice(g * 256, (g + 1) * 256)

                        def _cell_fetch(g=g, sl=sl):
                            # resident: read the served page straight out of
                            # the VMEM pool. The page index is extracted
                            # HERE, inside this region, from the loaded
                            # vector (static-index lane extract — the
                            # proven pattern): a Python-carried scalar from
                            # the episode body miscompiled on hardware
                            # (garbage pages; interpret mode was exact).
                            if resident:
                                sg = jnp.clip(loaded[0][g * 256], 0,
                                              blocks_hbm.shape[0] - 1)
                            if byte_planes:
                                # 4 single-pass bf16 byte-plane matmuls
                                # (exact: bytes <= 255, one-hot contraction)
                                oh = _onehot_T(hi[sl], 128, 256, jnp.bfloat16)
                                for b in range(4):
                                    rows_T = jnp.dot(
                                        pool_scr[sg, b] if resident
                                        else bufs[g, b], oh,
                                        preferred_element_type=jnp.float32)
                                    picked[b, sl] = _sublane_pick(
                                        rows_T, lo[sl], 32, 256)
                            else:
                                oh = _onehot_T(hi[sl], 128, 256)
                                rows_T = jnp.dot(
                                    pool_scr[sg] if resident
                                    else bufs[g],
                                    oh,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
                                picked[0, sl] = _sublane_pick(rows_T, lo[sl],
                                                              brows, 256)
                                picked[1, sl] = _sublane_pick(
                                    rows_T, lo[sl] + 32, brows, 256)
                                if voxel_mode:
                                    # per-voxel albedo offsets ride the same
                                    # lookup (rows 64+32*ch of the block)
                                    for ch in range(3):
                                        picked[2 + ch, sl] = _sublane_pick(
                                            rows_T, lo[sl] + 64 + 32 * ch,
                                            brows, 256)

                        if flat:
                            # unconditional fetch (see ``flat``): masked
                            # consumers make garbage picks harmless and the
                            # per-group any()+region gate costs more than
                            # the matmuls it skips on this compile service
                            _cell_fetch()
                        else:
                            pl.when(jnp.any(need_word[sl]))(_cell_fetch)
                elif "nocell" not in _abl:
                    # multi-page: one gated matmul per (group, resident
                    # slot), one-hot masked to the lanes whose chunk lives
                    # in that slot; a lane matches at most one slot so the
                    # accumulated picks are exact. Rows are zeroed first —
                    # skipped slots must not leave stale contributions.
                    nrows = 4 if byte_planes else (5 if voxel_mode else 2)
                    for g in range(groups):
                        sl = slice(g * 256, (g + 1) * 256)
                        for r_ in range(nrows):
                            picked[r_, sl] = jnp.zeros((256,), jnp.float32)
                        for p in range(pages):
                            match = need_word[sl] & (page[sl]
                                                     == loaded[p][sl])

                            @pl.when(jnp.any(match))
                            def _(g=g, p=p, match=match, sl=sl):
                                mhi = jnp.where(match, hi[sl], -1)
                                if byte_planes:
                                    oh = _onehot_T(mhi, 128, 256,
                                                   jnp.bfloat16)
                                    for b in range(4):
                                        rows_T = jnp.dot(
                                            bufs[g, p, b], oh,
                                            preferred_element_type=jnp.float32)
                                        picked[b, sl] = picked[b, sl] + \
                                            _sublane_pick(rows_T, lo[sl],
                                                          32, 256)
                                else:
                                    oh = _onehot_T(mhi, 128, 256)
                                    rows_T = jnp.dot(
                                        bufs[g, p], oh,
                                        preferred_element_type=jnp.float32,
                                        precision=jax.lax.Precision.HIGHEST)
                                    picked[0, sl] = picked[0, sl] + \
                                        _sublane_pick(rows_T, lo[sl],
                                                      brows, 256)
                                    picked[1, sl] = picked[1, sl] + \
                                        _sublane_pick(rows_T, lo[sl] + 32,
                                                      brows, 256)
                                    if voxel_mode:
                                        for ch in range(3):
                                            picked[2 + ch, sl] = \
                                                picked[2 + ch, sl] + \
                                                _sublane_pick(
                                                    rows_T,
                                                    lo[sl] + 64 + 32 * ch,
                                                    brows, 256)
                if byte_planes:
                    word = (picked[0, :].astype(jnp.int32)
                            | (picked[1, :].astype(jnp.int32) << 8)
                            | (picked[2, :].astype(jnp.int32) << 16)
                            | (picked[3, :].astype(jnp.int32) << 24))
                else:
                    word = (picked[0, :].astype(jnp.int32)
                            | (picked[1, :].astype(jnp.int32) << 16))
                has_chunk = cres > 0
                word = jnp.where(active & has_chunk & in_content, word, 0)
                vid = word & C.WORD_ID_MASK
                hit = vid > 0

                # 3+4. material program + IOR reflection (ops/march.py steps
                # 3-4, reference init.py:81-111), the whole shading chain
                # gated on any lane hitting this trip — most trips have none
                color_r = F_out[_F_COLOR]
                color_g = F_out[_F_COLOR + 1]
                color_b = F_out[_F_COLOR + 2]
                energy = F_out[_F_ENERGY]
                step = F_out[_F_STEP]
                life = F_out[_F_LIFE]
                bounces = F_out[_F_BOUNCES]
                prop_rows = tuple(F_out[F_ROWS + i] for i in range(nprops))
                ptr = I_out[_I_PTR]
                zero_i = jnp.zeros((w,), jnp.int32)

                def shade(_):
                    if "nomat" in _abl:
                        mrows = jnp.zeros((8, w), jnp.float32)
                    else:
                        mrows = jnp.dot(mat_ref[:], _onehot_T(vid, kp, w),
                                        preferred_element_type=jnp.float32,
                                        precision=jax.lax.Precision.HIGHEST)
                    alb_r, alb_g, alb_b = mrows[0], mrows[1], mrows[2]
                    if voxel_mode:
                        # dense per-cell albedo offset (ops/march.py
                        # voxel_albedo; non-hit lanes masked by `hit` below)
                        alb_r = alb_r + picked[2, :]
                        alb_g = alb_g + picked[3, :]
                        alb_b = alb_b + picked[4, :]
                    rough, absorb, ior, menergy = (mrows[3], mrows[4],
                                                   mrows[5], mrows[6])
                    has_rough = ((word >> C.WORD_ROUGH_SHIFT) & 1) > 0
                    need_draw = hit & has_rough

                    if tape_rows:
                        def draws(_):
                            # per-lane tape reads at ptr..ptr+2 (clipped like
                            # ops/march.py draws_for_iteration)
                            return tuple(
                                _sublane_pick(
                                    tape_ref[:],
                                    jnp.minimum(ptr + j, tape_len - 1),
                                    tape_rows, w)
                                for j in range(3))
                    else:
                        def draws(_):
                            n1, n2 = R.fold_in_pair(k1, k2, ptr)
                            return R.uniform3_parts(n1, n2)

                    half = jnp.full((w,), 0.5, jnp.float32)
                    if "norng" in _abl:
                        u0, u1, u2 = half, half, half
                    else:
                        u0, u1, u2 = jax.lax.cond(
                            jnp.any(need_draw), draws,
                            lambda _: (half, half, half), 0)
                    u0 = jnp.where(need_draw, u0, 0.5)
                    u1 = jnp.where(need_draw, u1, 0.5)
                    u2 = jnp.where(need_draw, u2, 0.5)

                    aux = ({nm: prop_rows[i]
                            for i, nm in enumerate(prop_names)} or None)
                    if tuple(programs_used) == (M.PROGRAM_PBR,):
                        # inline builtin PBR (reference lib.py:448-460) — the
                        # single-program fast path, trace-identical to the
                        # original kernel
                        absb = jnp.minimum(
                            1.0, absorb / (1.0 + bounces) ** falloff_e)
                        cr = jnp.where(hit,
                                       color_r * (1 - absb) + alb_r * absb,
                                       color_r)
                        cg = jnp.where(hit,
                                       color_g * (1 - absb) + alb_g * absb,
                                       color_g)
                        cb = jnp.where(hit,
                                       color_b * (1 - absb) + alb_b * absb,
                                       color_b)
                        en = jnp.where(hit,
                                       energy * (1 - absb) + menergy * absb,
                                       energy)
                        bounce = absorb
                        lf = jnp.where(hit, life * (1.0 - rough * absb), life)
                        nvx = jnp.where(hit, vx + (-1.0 + u0 * 2.0) * rough,
                                        vx)
                        nvy = jnp.where(hit, vy + (-1.0 + u1 * 2.0) * rough,
                                        vy)
                        nvz = jnp.where(hit, vz + (-1.0 + u2 * 2.0) * rough,
                                        vz)
                        nprop = prop_rows  # builtin PBR touches no props
                    else:
                        # masked multi-program dispatch (the ABI's expert
                        # select, ops/programs.py dispatch_rows; per-material
                        # program ids ride row 7 of the material plane)
                        pid_row = mrows[7].astype(jnp.int32)
                        rayv = P.HitRayRows(
                            color=(color_r, color_g, color_b), energy=energy,
                            life=life, vel=(vx, vy, vz), bounces=bounces,
                            step=step, aux=aux)
                        matv = P.MatRows(
                            albedo=(alb_r, alb_g, alb_b), roughness=rough,
                            absorption=absorb, ior=ior, energy=menergy)
                        upd, bounce = P.dispatch_rows(
                            tuple(programs_used), pid_row, rayv, matv,
                            settings, (u0, u1, u2))
                        ucr, ucg, ucb = upd.get("color", rayv.color)
                        cr = jnp.where(hit, ucr, color_r)
                        cg = jnp.where(hit, ucg, color_g)
                        cb = jnp.where(hit, ucb, color_b)
                        en = jnp.where(hit, upd.get("energy", energy), energy)
                        lf = jnp.where(hit, upd.get("life", life), life)
                        uvx, uvy, uvz = upd.get("vel", rayv.vel)
                        nvx = jnp.where(hit, uvx, vx)
                        nvy = jnp.where(hit, uvy, vy)
                        nvz = jnp.where(hit, uvz, vz)
                        # registered ray properties update like the builtin
                        # fields: program output masked to actual hits
                        # (ops/march.py aux rule)
                        nprop = tuple(
                            jnp.where(hit, upd.get(nm, prop_rows[i]),
                                      prop_rows[i])
                            for i, nm in enumerate(prop_names))
                    bo = jnp.where(hit, bounces + bounce, bounces)
                    cresf = cres.astype(jnp.float32)
                    lf = jnp.where(hit, lf / (cresf + bounce * lod_bounces),
                                   lf)
                    # Chebyshev renormalize (utils/mathutils.py)
                    ref = jnp.maximum(jnp.maximum(jnp.abs(nvx), jnp.abs(nvy)),
                                      jnp.abs(nvz))
                    refs = jnp.where(ref != 0, ref, 1.0)
                    nvx = jnp.where(hit & (ref != 0), nvx / refs, nvx)
                    nvy = jnp.where(hit & (ref != 0), nvy / refs, nvy)
                    nvz = jnp.where(hit & (ref != 0), nvz / refs, nvz)

                    term = hit & ((step >= lf) | (en >= max_light)
                                  | (bo >= max_b))
                    iorcls = (word >> C.WORD_IORCLS_SHIFT) & C.WORD_IORCLS_MASK
                    do_ior = hit & ~term & (iorcls != 0)
                    direction = (ior - 0.5) * 2.0
                    flips = []
                    for ax, v_ax in enumerate((nvx, nvy, nvz)):
                        bit = C.WORD_FACE_SHIFT + ax * 2
                        toward = v_ax < direction
                        f = jnp.where(toward, (word >> bit) & 1,
                                      (word >> (bit + 1)) & 1)
                        flips.append(f > 0)
                    nvx = jnp.where(do_ior & flips[0], nvx - nvx * ior * 2.0,
                                    nvx)
                    nvy = jnp.where(do_ior & flips[1], nvy - nvy * ior * 2.0,
                                    nvy)
                    nvz = jnp.where(do_ior & flips[2], nvz - nvz * ior * 2.0,
                                    nvz)
                    fb = jnp.where(do_ior, (
                        flips[0].astype(jnp.int32)
                        | (flips[1].astype(jnp.int32) << 1)
                        | (flips[2].astype(jnp.int32) << 2)), 0)
                    return (cr, cg, cb, en, lf, nvx, nvy, nvz, bo,
                            term.astype(jnp.int32), fb,
                            need_draw.astype(jnp.int32)) + nprop

                if flat:
                    # unconditional shading: every expression is hit-masked
                    # already, and the any()+branch costs more than the
                    # shade chain it skips (see ``flat``)
                    any_hit = jnp.array(True)
                    outs = shade(0)
                else:
                    any_hit = jnp.any(hit)
                    outs = jax.lax.cond(
                        any_hit, shade,
                        lambda _: (color_r, color_g, color_b, energy, life,
                                   vx, vy, vz, bounces, zero_i, zero_i,
                                   zero_i)
                        + prop_rows,
                        0)
                (color_r, color_g, color_b, energy, life, vx, vy, vz,
                 bounces, term_i, fb, need_draw_i) = outs[:12]
                prop_rows = outs[12:]
                term = term_i > 0
                ptr_pre = ptr
                if tape_rows:
                    # tape mode: the pointer is the tape position — 3 draws
                    # consumed per roughness hit (ops/march.py tape ptr rule)
                    ptr = ptr + 3 * need_draw_i
                else:
                    ptr = ptr + active.astype(jnp.int32)

                # hit record (packed; u regenerated outside the kernel)
                count = I_out[_I_COUNT]
                if H:
                    def _record():
                        rec = (vid | (fb << _REC_FLIP_SHIFT)
                               | (need_draw_i << _REC_ROUGH_SHIFT)
                               | (ptr_pre << _REC_PTR_SHIFT))
                        rows = jax.lax.broadcasted_iota(
                            jnp.int32, (H, w), 0)
                        sel = (rows == count[None, :]) & (
                            hit & (count < H))[None, :]
                        R_out[:H] = jnp.where(sel, rec[None, :], R_out[:H])
                        if record_cells:
                            # flat grid cell of this hit (clipped exactly
                            # like ops/march.py gsafe_flat)
                            gx = jnp.clip((fx - ox).astype(jnp.int32),
                                          0, SX - 1)
                            gy = jnp.clip((fy - oy).astype(jnp.int32),
                                          0, SY - 1)
                            gz = jnp.clip((fz - oz).astype(jnp.int32),
                                          0, SZ - 1)
                            cellf = (gx * SY + gy) * SZ + gz
                            R_out[hp:hp + H] = jnp.where(
                                sel, cellf[None, :], R_out[hp:hp + H])

                    if flat:
                        _record()  # sel is all-False with no hit: no-op RMW
                    else:
                        pl.when(any_hit)(_record)
                count = count + hit.astype(jnp.int32)

                # 5. advance (ops/march.py step 5, reference init.py:113-116)
                adv = active & ~term
                skip_d = (word >> C.WORD_SKIP_SHIFT) & C.WORD_SKIP_MASK
                cres_safe = jnp.maximum(cres, 1)
                s_free = jnp.maximum(1, (skip_d - 1) // cres_safe)
                csf = cres_safe.astype(jnp.float32)
                ks = []
                for v_ax, p_ax, cm_ax in ((vx, px, cmx), (vy, py, cmy),
                                          (vz, pz, cmz)):
                    denom = v_ax * csf
                    bound = jnp.where(v_ax > 0, cm_ax + cs, cm_ax)
                    ok = jnp.abs(denom) > 1e-12
                    ks.append(jnp.where(
                        ok, (bound - p_ax) / jnp.where(ok, denom, 1.0),
                        jnp.inf))
                t_min = jnp.minimum(jnp.minimum(ks[0], ks[1]), ks[2])
                k_exit = jnp.floor(t_min).astype(jnp.int32) + 1
                n_steps = jnp.maximum(jnp.minimum(s_free, k_exit), 1)
                pmin = jnp.minimum(jnp.minimum(px, py), pz)
                void_step = 1.0 + jnp.abs(
                    chunk_radius - jnp.mod(pmin + chunk_radius, cs))
                step_len = jnp.where(has_chunk,
                                     (n_steps * cres_safe).astype(jnp.float32),
                                     void_step)
                px = jnp.where(adv, px + vx * step_len, px)
                py = jnp.where(adv, py + vy * step_len, py)
                pz = jnp.where(adv, pz + vz * step_len, pz)
                step = jnp.where(adv, step + step_len, step)
                # frozen lanes (chunk not resident this episode) keep their
                # liveness — they resume bit-exactly later. Pure logical ops:
                # Mosaic cannot lower a select on bool vectors (i8->i1 trunci).
                alive = (active & adv & (step < life)) | (~active & alive)

                # write back
                F_out[_F_POS] = px
                F_out[_F_POS + 1] = py
                F_out[_F_POS + 2] = pz
                F_out[_F_VEL] = vx
                F_out[_F_VEL + 1] = vy
                F_out[_F_VEL + 2] = vz
                F_out[_F_COLOR] = color_r
                F_out[_F_COLOR + 1] = color_g
                F_out[_F_COLOR + 2] = color_b
                F_out[_F_ENERGY] = energy
                F_out[_F_STEP] = step
                F_out[_F_LIFE] = life
                F_out[_F_BOUNCES] = bounces
                F_out[_F_CMIN] = cmx
                F_out[_F_CMIN + 1] = cmy
                F_out[_F_CMIN + 2] = cmz
                for pi in range(nprops):
                    F_out[F_ROWS + pi] = prop_rows[pi]
                stall = (I_out[_I_FLAGS] >> _STALL_SHIFT) & _STALL_MAX
                nflags = (alive.astype(jnp.int32)
                          | (has_box.astype(jnp.int32) << 1)
                          | (cres << _CRES_SHIFT)
                          | (stall << _STALL_SHIFT)
                          | (page << _PAGE_SHIFT))
                I_out[_I_FLAGS] = nflags
                I_out[_I_PTR] = ptr
                I_out[_I_COUNT] = count
                # telemetry: every lane carries its tile's paid-trip count, so
                # sum(row)/w over all lanes = total trips across tiles (exact
                # across superstep re-sorts because the sum is permutation-
                # invariant and increments are uniform per tile)
                I_out[_I_TRIPS] = I_out[_I_TRIPS] + 1

                go = alive & ((cres == 0) | resident_of(page))
                if slab_width:
                    # lanes that just advanced out of the slab stop driving
                    # the inner loop (they are frozen from the next trip on)
                    go = go & in_slab_of(px)
                return jnp.any(go)

            def inner_body(c):
                it, _ = c
                # unrolled sub-iterations amortize loop-control overhead;
                # masked lanes no-op, so semantics are unchanged (the cond
                # is just checked less often — same trick as ops/march.py)
                for _ in range(unroll):
                    go = one_iteration()
                return it + unroll, go

            jax.lax.while_loop(inner_cond, inner_body,
                               (jnp.zeros((), jnp.int32), jnp.array(True)))

            # age lanes still waiting so the vote eventually serves them
            flags = I_out[_I_FLAGS]
            alive = (flags & _FLAG_ALIVE) > 0
            cres = (flags >> _CRES_SHIFT) & 7
            page = flags >> _PAGE_SHIFT
            stall = (flags >> _STALL_SHIFT) & _STALL_MAX
            if pages == 1:
                waiting = alive & (cres > 0) & (page != loaded[0])
            else:
                waiting = alive & (cres > 0) & ~resident_of(page)
            stall = jnp.minimum(stall + waiting.astype(jnp.int32), _STALL_MAX)
            I_out[_I_FLAGS] = ((flags & ~(_STALL_MAX << _STALL_SHIFT))
                               | (stall << _STALL_SHIFT))
            I_out[_I_EPS] = I_out[_I_EPS] + 1
            ep1 = ep + 1  # traced before the liveness test: op order is part
            # of the jaxpr and the committed cache keys must not churn
            if resident or slab_width:
                # unservable lanes (pool overflow / outside this device's
                # slab) can make no progress here — don't let them keep the
                # episode loop spinning
                live = alive
                if resident:
                    live = live & ((cres == 0)
                                   | (page < blocks_hbm.shape[0]))
                if slab_width:
                    live = live & in_slab_of(F_out[_F_POS])
                live = jnp.any(live)
            else:
                live = jnp.any(alive)
            return ep1, live, loaded

        if resident:
            # stage the whole occupied-chunk pool in VMEM before marching
            # (one bulk DMA per tile; the scene fits — pack_blocks budget
            # check). Every later fetch reads pool_scr[page] directly.
            pltpu.make_async_copy(blocks_hbm, pool_scr, pool_sem).start()
            pltpu.make_async_copy(blocks_hbm, pool_scr, pool_sem).wait()

        loaded0 = tuple(jnp.full((w,), -1, jnp.int32) for _ in range(pages))
        jax.lax.while_loop(episode_cond, episode_body,
                           (jnp.zeros((), jnp.int32), jnp.array(True),
                            loaded0))

    return kernel


def _make_group_kernel(settings: Settings, spec: GridSpec, *, w: int,
                       record_hits: int, ep_cap: int, inner_cap: int,
                       czp: int, cxyp: int, kp: int, unroll: int = 1,
                       record_traversed: bool = False,
                       byte_planes: bool = False,
                       record_cells: bool = False,
                       programs_used: Tuple[int, ...] = (M.PROGRAM_PBR,),
                       prop_names: Tuple[str, ...] = ()):
    """Per-group independent march (``group_loops=True``): each 256-lane
    group runs its OWN episode+inner while loops over the resident VMEM
    pool, so a tile stops paying trips for a group the moment that group's
    lanes die — the in-kernel answer to the measured 8.5x trip imbalance
    (ROADMAP roofline lever 4; a tile-wide trip costs ~8x a group trip and
    the tail of long rays lives in few groups after the coherence sort).
    Semantics are identical to ``_make_kernel(resident=True)``: same vote /
    serve-window rotation per group, same freeze rule (PRNG draws are keyed
    by per-ray progress, so group-local execution order cannot change
    results), same cleanup contract for unservable pages. Resident pool
    only, pages=1, key-RNG (no tape), no slab; callers fall back to the
    episode kernel otherwise. Marches the reference hot loop
    ``init.py:66-116`` exactly like the episode kernel — bit-compared in
    tests/test_blockmarch.py."""
    cs = float(settings.chunk_size)
    csi = settings.chunk_size
    CX, CY, CZ = spec.chunk_shape
    ox, oy, oz = (float(v) for v in spec.origin)
    groups = w // 256
    falloff_e = 1.0 + float(settings.falloff)
    max_light = float(settings.max_light)
    max_b = float(settings.max_bounces) + 1.0
    lod_bounces = float(settings.lod_bounces)
    chunk_radius = float(settings.chunk_radius)
    H = record_hits
    hp = _pad_to(H, 8) if H else 8
    SX, SY, SZ = spec.shape
    nprops = len(prop_names)
    G = 256

    def kernel(scal_ref, *args):
        F_in, I_in, R_in, blocks_hbm, coarse_ref, mat_ref = args[0:6]
        F_out, I_out, R_out, T_out = args[6:10]
        pool_scr, pool_sem, picked = args[10:13]
        F_out[:] = F_in[:]
        I_out[:] = I_in[:]
        if H:
            R_out[:] = R_in[:]
        T_out[0] = jnp.zeros((czp, cxyp), jnp.int32)
        k1 = scal_ref[0]
        k2 = scal_ref[1]
        npages = blocks_hbm.shape[0]
        # stage the whole occupied-chunk pool once (resident contract)
        pltpu.make_async_copy(blocks_hbm, pool_scr, pool_sem).start()
        pltpu.make_async_copy(blocks_hbm, pool_scr, pool_sem).wait()

        def one_iteration(sl, loaded):
            px = F_out[_F_POS, sl]
            py = F_out[_F_POS + 1, sl]
            pz = F_out[_F_POS + 2, sl]
            vx = F_out[_F_VEL, sl]
            vy = F_out[_F_VEL + 1, sl]
            vz = F_out[_F_VEL + 2, sl]
            flags = I_out[_I_FLAGS, sl]
            alive = (flags & _FLAG_ALIVE) > 0
            has_box = (flags & _FLAG_HASBOX) > 0
            cres = (flags >> _CRES_SHIFT) & 7
            page = flags >> _PAGE_SHIFT
            cmx = F_out[_F_CMIN, sl]
            cmy = F_out[_F_CMIN + 1, sl]
            cmz = F_out[_F_CMIN + 2, sl]
            active = alive & ((cres == 0) | (page == loaded[0]))

            # 1. active-chunk hysteresis (reference init.py:67-73)
            in_box = has_box & (
                (px >= cmx) & (px <= cmx + cs)
                & (py >= cmy) & (py <= cmy + cs)
                & (pz >= cmz) & (pz <= cmz + cs))
            switch = active & ~in_box
            any_switch = jnp.any(switch)

            def do_coarse(_):
                sx = jnp.floor(px / cs) * cs
                sy = jnp.floor(py / cs) * cs
                sz = jnp.floor(pz / cs) * cs
                ccx = ((sx - ox) / cs).astype(jnp.int32)
                ccy = ((sy - oy) / cs).astype(jnp.int32)
                ccz = ((sz - oz) / cs).astype(jnp.int32)
                in_grid = ((ccx >= 0) & (ccx < CX) & (ccy >= 0)
                           & (ccy < CY) & (ccz >= 0) & (ccz < CZ))
                cxy = jnp.where(in_grid, ccx * CY + ccy, -1)
                czi_ = jnp.where(in_grid, ccz, -1)
                oh = _onehot_T(cxy, cxyp, G, jnp.bfloat16)
                lo_T = jnp.dot(coarse_ref[0], oh,
                               preferred_element_type=jnp.float32)
                hi_T = jnp.dot(coarse_ref[1], oh,
                               preferred_element_type=jnp.float32)
                cw = (_sublane_pick(lo_T, czi_, czp, G).astype(jnp.int32)
                      | (_sublane_pick(hi_T, czi_, czp, G)
                         .astype(jnp.int32) << 8))
                return cw & 7, cw >> 3, sx, sy, sz

            res_c, page_c, sx, sy, sz = jax.lax.cond(
                any_switch, do_coarse,
                lambda _: (jnp.zeros((G,), jnp.int32),
                           jnp.zeros((G,), jnp.int32),
                           px, py, pz), 0)

            if record_traversed:
                # traversed-chunk feedback (reference init.py:72-73)
                @pl.when(any_switch)
                def _():
                    ccx = (jnp.floor(px / cs) - ox / cs).astype(jnp.int32)
                    ccy = (jnp.floor(py / cs) - oy / cs).astype(jnp.int32)
                    ccz = (jnp.floor(pz / cs) - oz / cs).astype(jnp.int32)
                    in_g = ((ccx >= 0) & (ccx < CX) & (ccy >= 0)
                            & (ccy < CY) & (ccz >= 0) & (ccz < CZ))
                    m = switch & in_g
                    cxy_t = jnp.where(m, ccx * CY + ccy, -1)
                    cz_t = jnp.where(m, ccz, -1)
                    oh_cz = _onehot_T(cz_t, czp, G)
                    oh_cxy = _onehot_T(cxy_t, cxyp, G)
                    acc = jax.lax.dot_general(
                        oh_cz, oh_cxy, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    T_out[0] = T_out[0] | (acc > 0).astype(jnp.int32)

            cmx = jnp.where(switch, sx, cmx)
            cmy = jnp.where(switch, sy, cmy)
            cmz = jnp.where(switch, sz, cmz)
            has_box = has_box | switch
            cres = jnp.where(switch, res_c, cres)
            page = jnp.where(switch, page_c, page)
            # lanes that switched into an unserved chunk freeze NOW
            active = active & ((cres == 0) | (page == loaded[0]))

            # 2. cell-word fetch from the resident VMEM pool
            fx = jnp.floor(px)
            fy = jnp.floor(py)
            fz = jnp.floor(pz)
            lx = (fx - cmx).astype(jnp.int32)
            ly = (fy - cmy).astype(jnp.int32)
            lz = (fz - cmz).astype(jnp.int32)
            in_content = ((lx <= csi - 1) & (ly <= csi - 1)
                          & (lz <= csi - 1))
            cell = jnp.clip((lx * csi + ly) * csi + lz, 0, 4095)
            lo = cell & 31
            hi = cell >> 5
            need_word = active & (cres > 0) & in_content

            def fetch(_):
                # page extracted INSIDE this region from the carried vector
                # via a static-index lane extract (the round-4 proven
                # pattern: a Python-carried scalar from the episode body
                # miscompiled on hardware)
                sg = jnp.clip(loaded[0][0], 0, npages - 1)
                if byte_planes:
                    oh = _onehot_T(hi, 128, G, jnp.bfloat16)
                    bs = []
                    for b in range(4):
                        rows_T = jnp.dot(pool_scr[sg, b], oh,
                                         preferred_element_type=jnp.float32)
                        bs.append(_sublane_pick(rows_T, lo, 32, G)
                                  .astype(jnp.int32))
                    return bs[0] | (bs[1] << 8) | (bs[2] << 16) | (bs[3] << 24)
                oh = _onehot_T(hi, 128, G)
                rows_T = jnp.dot(pool_scr[sg], oh,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
                lo16 = _sublane_pick(rows_T, lo, 64, G).astype(jnp.int32)
                hi16 = _sublane_pick(rows_T, lo + 32, 64, G).astype(jnp.int32)
                return lo16 | (hi16 << 16)

            word = jax.lax.cond(jnp.any(need_word), fetch,
                                lambda _: jnp.zeros((G,), jnp.int32), 0)
            has_chunk = cres > 0
            word = jnp.where(active & has_chunk & in_content, word, 0)
            vid = word & C.WORD_ID_MASK
            hit = vid > 0

            # 3+4. material program + IOR reflection (reference
            # init.py:81-111), gated on any lane hitting this trip
            color_r = F_out[_F_COLOR, sl]
            color_g = F_out[_F_COLOR + 1, sl]
            color_b = F_out[_F_COLOR + 2, sl]
            energy = F_out[_F_ENERGY, sl]
            step = F_out[_F_STEP, sl]
            life = F_out[_F_LIFE, sl]
            bounces = F_out[_F_BOUNCES, sl]
            prop_rows = tuple(F_out[F_ROWS + i, sl] for i in range(nprops))
            ptr = I_out[_I_PTR, sl]
            zero_i = jnp.zeros((G,), jnp.int32)

            def shade(_):
                mrows = jnp.dot(mat_ref[:], _onehot_T(vid, kp, G),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
                alb_r, alb_g, alb_b = mrows[0], mrows[1], mrows[2]
                rough, absorb, ior, menergy = (mrows[3], mrows[4],
                                               mrows[5], mrows[6])
                has_rough = ((word >> C.WORD_ROUGH_SHIFT) & 1) > 0
                need_draw = hit & has_rough

                def draws(_):
                    n1, n2 = R.fold_in_pair(k1, k2, ptr)
                    return R.uniform3_parts(n1, n2)

                half = jnp.full((G,), 0.5, jnp.float32)
                u0, u1, u2 = jax.lax.cond(
                    jnp.any(need_draw), draws,
                    lambda _: (half, half, half), 0)
                u0 = jnp.where(need_draw, u0, 0.5)
                u1 = jnp.where(need_draw, u1, 0.5)
                u2 = jnp.where(need_draw, u2, 0.5)

                aux = ({nm: prop_rows[i]
                        for i, nm in enumerate(prop_names)} or None)
                if tuple(programs_used) == (M.PROGRAM_PBR,):
                    # inline builtin PBR (reference lib.py:448-460)
                    absb = jnp.minimum(
                        1.0, absorb / (1.0 + bounces) ** falloff_e)
                    cr = jnp.where(hit,
                                   color_r * (1 - absb) + alb_r * absb,
                                   color_r)
                    cg = jnp.where(hit,
                                   color_g * (1 - absb) + alb_g * absb,
                                   color_g)
                    cb = jnp.where(hit,
                                   color_b * (1 - absb) + alb_b * absb,
                                   color_b)
                    en = jnp.where(hit,
                                   energy * (1 - absb) + menergy * absb,
                                   energy)
                    bounce = absorb
                    lf = jnp.where(hit, life * (1.0 - rough * absb), life)
                    nvx = jnp.where(hit, vx + (-1.0 + u0 * 2.0) * rough, vx)
                    nvy = jnp.where(hit, vy + (-1.0 + u1 * 2.0) * rough, vy)
                    nvz = jnp.where(hit, vz + (-1.0 + u2 * 2.0) * rough, vz)
                    nprop = prop_rows  # builtin PBR touches no props
                else:
                    pid_row = mrows[7].astype(jnp.int32)
                    rayv = P.HitRayRows(
                        color=(color_r, color_g, color_b), energy=energy,
                        life=life, vel=(vx, vy, vz), bounces=bounces,
                        step=step, aux=aux)
                    matv = P.MatRows(
                        albedo=(alb_r, alb_g, alb_b), roughness=rough,
                        absorption=absorb, ior=ior, energy=menergy)
                    upd, bounce = P.dispatch_rows(
                        tuple(programs_used), pid_row, rayv, matv,
                        settings, (u0, u1, u2))
                    ucr, ucg, ucb = upd.get("color", rayv.color)
                    cr = jnp.where(hit, ucr, color_r)
                    cg = jnp.where(hit, ucg, color_g)
                    cb = jnp.where(hit, ucb, color_b)
                    en = jnp.where(hit, upd.get("energy", energy), energy)
                    lf = jnp.where(hit, upd.get("life", life), life)
                    uvx, uvy, uvz = upd.get("vel", rayv.vel)
                    nvx = jnp.where(hit, uvx, vx)
                    nvy = jnp.where(hit, uvy, vy)
                    nvz = jnp.where(hit, uvz, vz)
                    nprop = tuple(
                        jnp.where(hit, upd.get(nm, prop_rows[i]),
                                  prop_rows[i])
                        for i, nm in enumerate(prop_names))
                bo = jnp.where(hit, bounces + bounce, bounces)
                cresf = cres.astype(jnp.float32)
                lf = jnp.where(hit, lf / (cresf + bounce * lod_bounces), lf)
                ref = jnp.maximum(jnp.maximum(jnp.abs(nvx), jnp.abs(nvy)),
                                  jnp.abs(nvz))
                refs = jnp.where(ref != 0, ref, 1.0)
                nvx = jnp.where(hit & (ref != 0), nvx / refs, nvx)
                nvy = jnp.where(hit & (ref != 0), nvy / refs, nvy)
                nvz = jnp.where(hit & (ref != 0), nvz / refs, nvz)

                term = hit & ((step >= lf) | (en >= max_light)
                              | (bo >= max_b))
                iorcls = (word >> C.WORD_IORCLS_SHIFT) & C.WORD_IORCLS_MASK
                do_ior = hit & ~term & (iorcls != 0)
                direction = (ior - 0.5) * 2.0
                flips = []
                for ax, v_ax in enumerate((nvx, nvy, nvz)):
                    bit = C.WORD_FACE_SHIFT + ax * 2
                    toward = v_ax < direction
                    f = jnp.where(toward, (word >> bit) & 1,
                                  (word >> (bit + 1)) & 1)
                    flips.append(f > 0)
                nvx = jnp.where(do_ior & flips[0], nvx - nvx * ior * 2.0,
                                nvx)
                nvy = jnp.where(do_ior & flips[1], nvy - nvy * ior * 2.0,
                                nvy)
                nvz = jnp.where(do_ior & flips[2], nvz - nvz * ior * 2.0,
                                nvz)
                fb = jnp.where(do_ior, (
                    flips[0].astype(jnp.int32)
                    | (flips[1].astype(jnp.int32) << 1)
                    | (flips[2].astype(jnp.int32) << 2)), 0)
                return (cr, cg, cb, en, lf, nvx, nvy, nvz, bo,
                        term.astype(jnp.int32), fb,
                        need_draw.astype(jnp.int32)) + nprop

            any_hit = jnp.any(hit)
            outs = jax.lax.cond(
                any_hit, shade,
                lambda _: (color_r, color_g, color_b, energy, life,
                           vx, vy, vz, bounces, zero_i, zero_i, zero_i)
                + prop_rows,
                0)
            (color_r, color_g, color_b, energy, life, vx, vy, vz,
             bounces, term_i, fb, need_draw_i) = outs[:12]
            prop_rows = outs[12:]
            term = term_i > 0
            ptr_pre = ptr
            ptr = ptr + active.astype(jnp.int32)

            # hit record (packed; u regenerated outside the kernel)
            count = I_out[_I_COUNT, sl]
            if H:
                @pl.when(any_hit)
                def _():
                    rec = (vid | (fb << _REC_FLIP_SHIFT)
                           | (need_draw_i << _REC_ROUGH_SHIFT)
                           | (ptr_pre << _REC_PTR_SHIFT))
                    rows = jax.lax.broadcasted_iota(jnp.int32, (H, G), 0)
                    sel = (rows == count[None, :]) & (
                        hit & (count < H))[None, :]
                    R_out[:H, sl] = jnp.where(sel, rec[None, :],
                                              R_out[:H, sl])
                    if record_cells:
                        gx = jnp.clip((fx - ox).astype(jnp.int32),
                                      0, SX - 1)
                        gy = jnp.clip((fy - oy).astype(jnp.int32),
                                      0, SY - 1)
                        gz = jnp.clip((fz - oz).astype(jnp.int32),
                                      0, SZ - 1)
                        cellf = (gx * SY + gy) * SZ + gz
                        R_out[hp:hp + H, sl] = jnp.where(
                            sel, cellf[None, :], R_out[hp:hp + H, sl])
            count = count + hit.astype(jnp.int32)

            # 5. advance (reference init.py:113-116)
            adv = active & ~term
            skip_d = (word >> C.WORD_SKIP_SHIFT) & C.WORD_SKIP_MASK
            cres_safe = jnp.maximum(cres, 1)
            s_free = jnp.maximum(1, (skip_d - 1) // cres_safe)
            csf = cres_safe.astype(jnp.float32)
            ks = []
            for v_ax, p_ax, cm_ax in ((vx, px, cmx), (vy, py, cmy),
                                      (vz, pz, cmz)):
                denom = v_ax * csf
                bound = jnp.where(v_ax > 0, cm_ax + cs, cm_ax)
                ok = jnp.abs(denom) > 1e-12
                ks.append(jnp.where(
                    ok, (bound - p_ax) / jnp.where(ok, denom, 1.0),
                    jnp.inf))
            t_min = jnp.minimum(jnp.minimum(ks[0], ks[1]), ks[2])
            k_exit = jnp.floor(t_min).astype(jnp.int32) + 1
            n_steps = jnp.maximum(jnp.minimum(s_free, k_exit), 1)
            pmin = jnp.minimum(jnp.minimum(px, py), pz)
            void_step = 1.0 + jnp.abs(
                chunk_radius - jnp.mod(pmin + chunk_radius, cs))
            step_len = jnp.where(has_chunk,
                                 (n_steps * cres_safe).astype(jnp.float32),
                                 void_step)
            px = jnp.where(adv, px + vx * step_len, px)
            py = jnp.where(adv, py + vy * step_len, py)
            pz = jnp.where(adv, pz + vz * step_len, pz)
            step = jnp.where(adv, step + step_len, step)
            alive = (active & adv & (step < life)) | (~active & alive)

            # write back (group slice)
            F_out[_F_POS, sl] = px
            F_out[_F_POS + 1, sl] = py
            F_out[_F_POS + 2, sl] = pz
            F_out[_F_VEL, sl] = vx
            F_out[_F_VEL + 1, sl] = vy
            F_out[_F_VEL + 2, sl] = vz
            F_out[_F_COLOR, sl] = color_r
            F_out[_F_COLOR + 1, sl] = color_g
            F_out[_F_COLOR + 2, sl] = color_b
            F_out[_F_ENERGY, sl] = energy
            F_out[_F_STEP, sl] = step
            F_out[_F_LIFE, sl] = life
            F_out[_F_BOUNCES, sl] = bounces
            F_out[_F_CMIN, sl] = cmx
            F_out[_F_CMIN + 1, sl] = cmy
            F_out[_F_CMIN + 2, sl] = cmz
            for pi in range(nprops):
                F_out[F_ROWS + pi, sl] = prop_rows[pi]
            stall = (I_out[_I_FLAGS, sl] >> _STALL_SHIFT) & _STALL_MAX
            nflags = (alive.astype(jnp.int32)
                      | (has_box.astype(jnp.int32) << 1)
                      | (cres << _CRES_SHIFT)
                      | (stall << _STALL_SHIFT)
                      | (page << _PAGE_SHIFT))
            I_out[_I_FLAGS, sl] = nflags
            I_out[_I_PTR, sl] = ptr
            I_out[_I_COUNT, sl] = count
            # telemetry: per-GROUP trips (sum(row)/256 = total group-trips)
            I_out[_I_TRIPS, sl] = I_out[_I_TRIPS, sl] + 1

            go = alive & ((cres == 0) | (page == loaded[0]))
            return jnp.any(go)

        for g in range(groups):
            sl = slice(g * 256, (g + 1) * 256)

            def ep_cond(c):
                ep, go, loaded = c
                return jnp.logical_and(ep < ep_cap, go)

            def ep_body(c, sl=sl):
                ep, _, loaded = c
                flags = I_out[_I_FLAGS, sl]
                alive = (flags & _FLAG_ALIVE) > 0
                cres = (flags >> _CRES_SHIFT) & 7
                stall = (flags >> _STALL_SHIFT) & _STALL_MAX
                page = flags >> _PAGE_SHIFT
                # vote: the most-starved waiting lane's page is served next
                # (unservable pages — pool overflow — never win)
                needing = (alive & (cres > 0) & (page != loaded[0])
                           & (page < npages))
                votekey = jnp.where(needing, (stall << 20) | page, -1)
                vk = jnp.max(votekey)
                vote = jnp.where(vk >= 0, vk & 0xFFFFF, loaded[0])
                loaded = (jnp.full((256,), 0, jnp.int32) + vote,)

                def inner_cond(c2):
                    it, go2 = c2
                    return jnp.logical_and(it < inner_cap, go2)

                def inner_body(c2, sl=sl, loaded=loaded):
                    it, _ = c2
                    for _u in range(unroll):
                        go2 = one_iteration(sl, loaded)
                    return it + unroll, go2

                jax.lax.while_loop(inner_cond, inner_body,
                                   (jnp.zeros((), jnp.int32),
                                    jnp.array(True)))

                # age lanes still waiting so the vote eventually serves them
                flags2 = I_out[_I_FLAGS, sl]
                alive2 = (flags2 & _FLAG_ALIVE) > 0
                cres2 = (flags2 >> _CRES_SHIFT) & 7
                page2 = flags2 >> _PAGE_SHIFT
                stall2 = (flags2 >> _STALL_SHIFT) & _STALL_MAX
                waiting = alive2 & (cres2 > 0) & (page2 != loaded[0])
                stall2 = jnp.minimum(stall2 + waiting.astype(jnp.int32),
                                     _STALL_MAX)
                I_out[_I_FLAGS, sl] = (
                    (flags2 & ~(_STALL_MAX << _STALL_SHIFT))
                    | (stall2 << _STALL_SHIFT))
                I_out[_I_EPS, sl] = I_out[_I_EPS, sl] + 1
                ep1 = ep + 1
                live = jnp.any(alive2 & ((cres2 == 0) | (page2 < npages)))
                return ep1, live, loaded

            alive0 = jnp.any((I_out[_I_FLAGS, sl] & _FLAG_ALIVE) > 0)
            jax.lax.while_loop(
                ep_cond, ep_body,
                (jnp.zeros((), jnp.int32), alive0,
                 (jnp.full((256,), -1, jnp.int32),)))

    return kernel


def blockmarch_supported(settings: Settings, spec: GridSpec,
                         programs_used=(M.PROGRAM_PBR,), tape=None) -> bool:
    """True when ``march_blockwise`` can serve this configuration (see its
    docstring for the constraint list). Callers use this to fall back to the
    XLA march for custom material programs / exotic configs. Tape (static)
    mode is served in-kernel as long as the per-ray tape fits a VMEM-staged
    row block (the stock tape is 75 draws — utils/tape.py)."""
    return (not settings.exact
            and (tape is None or int(tape.shape[-1]) <= 256)
            and all(P.has_rows_program(p) for p in programs_used)
            and settings.march_steps >= settings.dist_max
            and settings.chunk_size ** 3 == 4096
            # conservative 16-bit coarse-word guard (ADVICE r4): grids past
            # 8191 chunks overflow the two bf16 byte planes in paged mode;
            # resident mode's page_map compaction can still serve them via
            # march_blockwise(resident=True) directly when occupancy fits
            and spec.num_chunks * 8 + 7 < (1 << 16))


def march_blockwise(
    settings: Settings,
    spec: GridSpec,
    arrays: SceneArrays,
    rays: RayBatch,
    *,
    key=None,
    tape=None,
    tape_ptr=None,
    programs_used: Tuple[int, ...] = (M.PROGRAM_PBR,),
    background: Optional[str] = "sky",
    record_hits: int = 0,
    record_traversed: bool = False,
    tile: int = 1024,
    ep_cap: int = 32,
    inner_cap: int = 24,
    supersteps: int = 1,
    unroll: int = 1,
    cleanup: bool = True,
    cleanup_width: int = 0,
    interpret: bool = False,
    return_trips: bool = False,
    byte_planes: bool = False,
    group_coarse: bool = False,
    voxel_albedo=None,
    record_cells: bool = False,
    pages: int = 1,
    resort_life: bool = False,
    resident: bool = False,
    resident_cap: int = 0,
    pool_center=None,
    group_loops: bool = False,
    flat: bool = False,
    flat_coarse: Optional[bool] = None,
    slab=None,
    resume_state=None,
    finalize: bool = True,
    unsorted: bool = False,
    return_perm: bool = False,
) -> MarchResult:
    """Bit-exact drop-in for ``march(mode="while")`` in key-RNG mode.

    ``supersteps`` > 1 re-invokes the kernel with a compaction co-sort in
    between (dead lanes to the back — all-dead tiles exit at episode 0 —
    and survivors regrouped by (stall desc, needed page)): the mid-march
    load-balancing the single-invocation kernel cannot do across tiles.
    ``ep_cap`` applies per invocation. ``unroll`` repeats the inner march
    body per loop trip (identical semantics, fewer cond evaluations).

    ``tape``/``tape_ptr``: static-noise mode — per-ray Mersenne-Twister
    tapes [N, D] consumed in the reference's exact draw order
    (utils/tape.py; bit-exact vs ``march(tape=...)``); the stock reference
    config (static=true) renders through the kernel this way.

    ``resident``: stage the OCCUPIED chunks' blocks in VMEM as a pool and
    serve any page per group per vote without DMA (see _make_kernel). The
    BASELINE-scale scene (~225 occupied chunks) fits with room to spare;
    scenes whose pool exceeds the VMEM budget must use the paged mode.
    Requires a concrete (non-traced) chunk grid — true for the compiled
    scenes the renderer closes over. ``inner_cap`` becomes the serve
    duration: trips between vote rotations (small values cut the measured
    freeze imbalance; ``ep_cap`` bounds total votes).

    Constraints (callers fall back to the XLA march otherwise): f32 rays,
    every scene program registered with a lane-major ``rows_fn`` (builtin
    PBR included; ops/programs.py dispatch_rows runs the masked
    multi-program select in-kernel; registered custom ray properties ride
    the kernel state as extra lane-major rows and reach programs as
    ``HitRayRows.aux``), chunk_size 16, exact=False, tape D <= 256,
    march_steps >= dist_max (the global iteration cap must never truncate
    a ray mid-flight — true for every reference config since each
    iteration advances step by >= 1 and life <= dist_max).
    """
    if settings.exact:
        raise ValueError("blockmarch is the f32 fast path (exact=False only)")
    programs_used = tuple(programs_used)
    if not all(P.has_rows_program(p) for p in programs_used):
        raise ValueError(
            "blockmarch dispatches lane-major program variants in-kernel; "
            "register_program(..., rows_fn=...) every program in the scene "
            "or fall back to the XLA march (blockmarch_supported)")
    # registered custom ray properties ride the kernel state as extra
    # lane-major f32 rows after the builtin F rows (VERDICT r4 item 4);
    # programs read them via HitRayRows.aux inside dispatch_rows
    props = P.ray_properties()
    nprops = len(props)
    frows = F_ROWS + nprops
    if settings.march_steps < settings.dist_max:
        raise ValueError("blockmarch requires march_steps >= dist_max")
    if key is None:
        key = jax.random.PRNGKey(0)
    use_tape = tape is not None
    if use_tape:
        tape = jnp.asarray(tape, jnp.float32)
        if tape.shape[-1] > 256:
            raise ValueError("blockmarch tape mode needs <= 256 draws/ray")
    if voxel_albedo is not None and byte_planes:
        raise ValueError("voxel_albedo needs f32-halves blocks")
    if pages not in (1, 2, 3, 4):
        raise ValueError("pages (resident chunk blocks per group) must be "
                         "1..4 — VMEM budget")
    if resident and pages != 1:
        raise ValueError("resident mode already serves every page from the "
                         "VMEM pool; pages must be 1")
    if resident and voxel_albedo is not None:
        raise ValueError("resident mode: the 160-row voxel-albedo pool "
                         "exceeds the VMEM budget; use the paged mode")
    if group_loops:
        # per-group independent march (_make_group_kernel): resident pool,
        # key RNG, no slab — the production fast path
        if not resident or pages != 1:
            raise ValueError("group_loops runs on the resident pool "
                             "(resident=True, pages=1)")
        if use_tape or slab is not None:
            raise ValueError("group_loops is key-RNG only and has no slab "
                             "segments; use the episode kernel")
    if slab is not None or resume_state is not None:
        # grid-TP segmented execution (parallel/gridshard.py ring): the
        # kernel marches only the rays whose cell lies in this device's
        # X-slab; everyone else freezes with exact state. Kept to the TP
        # render path's needs: key RNG, no hit tape, paged blocks.
        if use_tape:
            raise ValueError("slab/resume kernel segments run key-RNG only")
        if resume_state is not None and record_hits:
            raise ValueError("hit-tape resume is not supported in the "
                             "kernel path; record hits on the final "
                             "(unsegmented) march instead")
        if slab is not None and (resident or voxel_albedo is not None):
            raise ValueError("slab segments use the paged block path")
    if unsorted or return_perm:
        # split-program mode (see bench.py): the 36-operand final co-sort
        # is a compile-service hog AND unnecessary for permutation-invariant
        # consumers (mean losses, table gradients). Results come back in
        # kernel (coherence-sorted) order with the slot permutation and the
        # sorted initial velocities for hit-replay alignment.
        if not (unsorted and return_perm and not finalize):
            raise ValueError("unsorted/return_perm come as a pair with "
                             "finalize=False (split-program mode)")
        if supersteps != 1:
            raise ValueError("unsorted mode is single-superstep (the "
                             "returned initial-velocity rows align with "
                             "the one coherence sort)")

    n = rays.pos.shape[0]
    dtype = jnp.float32
    w = tile
    npad = _pad_to(max(n, w), w)
    if unsorted and npad != n:
        raise ValueError(
            f"unsorted mode needs n divisible by tile (n={n}, tile={w}): "
            "padding lanes would interleave with live rays")
    CX, CY, CZ = spec.chunk_shape
    czp = _pad_to(CZ, 8)
    cxyp = _pad_to(CX * CY, 8)

    page_map = occ_idx = None
    slab_w_cells = 0
    x0_cells = x0_chunks = scx = None
    if slab is not None:
        x0_cells, slab_w_cells = slab
        cs_i = settings.chunk_size
        if slab_w_cells % cs_i:
            raise ValueError("slab width must be chunk-aligned")
        scx = slab_w_cells // cs_i
        x0_chunks = jnp.asarray(x0_cells, jnp.int32) // cs_i
    res_traced = resident and isinstance(arrays.chunk_res, jax.core.Tracer)
    if resident:
        per_chunk = (4 * 32 * 128 * 2) if byte_planes else (64 * 128 * 4)
        if res_traced:
            # traced chunk grid (Engine rebakes churn occupancy under one
            # compiled program): fixed-capacity pool, data-dependent page
            # map. Chunks past the cap drop out of the pool; lanes needing
            # them stay frozen and the XLA cleanup finishes them — exactness
            # never depends on the cap, only throughput does.
            if resident_cap <= 0:
                raise ValueError(
                    "a traced chunk grid needs an explicit resident_cap "
                    "(static pool capacity; overflow goes to cleanup)")
            nocc = resident_cap
            occ = arrays.chunk_res > 0
            rank = jnp.cumsum(occ.astype(jnp.int32)) - 1
            page_map = jnp.where(occ, rank, 0)
        else:
            occ = np.asarray(jax.device_get(arrays.chunk_res)) > 0
            nocc = max(1, int(occ.sum()))
            if resident_cap > 0:
                nocc = min(nocc, resident_cap)
            occ_flat = np.nonzero(occ)[0].astype(np.int32)
            if pool_center is not None and len(occ_flat) > nocc:
                # Beyond-VMEM scene (VERDICT r4 item 6): the pool holds the
                # HOT chunks — occupied chunks ranked by distance to
                # ``pool_center`` (host value: the camera / ray origin).
                # Cold chunks rank past the capacity, their lanes freeze
                # (unservable-page guard) and the XLA cleanup march
                # finishes them — exactness never depends on the cap, and
                # the fast-compiling resident kernel (~3 s vs ~1000 s for
                # the paged vote+DMA mode on the round-4 service) serves
                # scenes of any size. Reference analogue: the unbounded
                # chunk world, init.py:389-452.
                cs_i = settings.chunk_size
                ci = np.stack(np.unravel_index(
                    occ_flat, (CX, CY, CZ)), axis=-1).astype(np.float64)
                centers = (ci * cs_i + np.asarray(spec.origin)[None, :]
                           + cs_i / 2.0)
                d = np.linalg.norm(
                    centers - np.asarray(pool_center, np.float64)[None, :],
                    axis=-1)
                occ_flat = occ_flat[np.argsort(d, kind="stable")]
            occ_idx = np.zeros((nocc,), np.int32)
            take = min(nocc, len(occ_flat))
            occ_idx[:take] = occ_flat[:take]
            page_map = np.zeros((occ.shape[0],), np.int32)
            # cold ranks clamp at 8191: any value >= nocc means unservable
            # (lane freezes -> cleanup), and the clamp keeps every stored
            # page inside the 16-bit coarse word even for huge scenes
            page_map[occ_flat] = np.minimum(
                np.arange(len(occ_flat), dtype=np.int32), 8191)
        if nocc * per_chunk > 11 * 2 ** 20:
            raise ValueError(
                f"resident pool ({nocc} chunks x {per_chunk} B) exceeds "
                "the VMEM budget; use the paged (vote+DMA) mode")
        if nocc * 8 + 7 >= (1 << 16):
            # page ids ride the two bf16 coarse byte planes (ADVICE r4)
            raise ValueError(f"resident pool ({nocc} pages) overflows the "
                             "16-bit coarse word; cap below 8192 pages")
    if slab is not None:
        # grid-TP segment: arrays.cell_word holds only this device's X-slab
        # (parallel/gridshard.py). Blocks come from the slab's own cells
        # (pages are slab-local); per-chunk res derives from the words'
        # res bits; the coarse table is GLOBAL-shaped with the slab's span
        # placed at its rotating chunk offset (out-of-slab chunks read 0 =
        # void, never consumed — those lanes are frozen by the slab gate).
        slab_spec = GridSpec(
            origin=spec.origin,
            shape=(slab_w_cells, spec.shape[1], spec.shape[2]),
            chunk_size=cs_i, num_lods=spec.num_lods)
        wordsv = jnp.asarray(arrays.cell_word, jnp.int32).reshape(
            scx, cs_i, CY, cs_i, CZ, cs_i)
        res_slab = jnp.max(
            (wordsv >> C.WORD_RES_SHIFT) & C.WORD_RES_MASK,
            axis=(1, 3, 5)).reshape(-1)
        blocks, coarse_local = pack_blocks(slab_spec, arrays.cell_word,
                                           res_slab,
                                           byte_planes=byte_planes)
        coarse = jax.lax.dynamic_update_slice(
            jnp.zeros((2, czp, cxyp), jnp.bfloat16),
            coarse_local[:, :CZ, : scx * CY],
            (jnp.int32(0), jnp.int32(0), x0_chunks * jnp.int32(CY)))
    else:
        blocks, coarse = pack_blocks(spec, arrays.cell_word,
                                     arrays.chunk_res,
                                     byte_planes=byte_planes,
                                     voxel_albedo=voxel_albedo,
                                     page_map=page_map)
    if resident:
        if res_traced:
            # scatter occupied blocks into the capacity-bounded pool;
            # overflow ranks land out of range and drop (mode="drop")
            idx = jnp.where(occ, page_map, nocc)
            pool = jnp.zeros((nocc,) + blocks.shape[1:], blocks.dtype)
            blocks = pool.at[idx].set(blocks, mode="drop")
        else:
            # compact to the occupied-chunk pool (static gather — occ_idx
            # is a host constant, so XLA folds it into the scene constants)
            blocks = blocks[jnp.asarray(occ_idx)]
    mat8 = pack_mat_rows(arrays.material_table,
                         program=(arrays.program
                                  if len(programs_used) > 1 else None))
    kp = mat8.shape[1]
    k1, k2 = R.key_data_pair(key)
    # int32 transport (bit-preserving) — scalar prefetch wants int32
    scal = jax.lax.bitcast_convert_type(
        jnp.stack([k1, k2]).astype(jnp.uint32), jnp.int32)
    if slab is not None:
        # the rotating slab origin rides the prefetch scalars (cells)
        scal = jnp.concatenate(
            [scal, jnp.asarray(x0_cells, jnp.int32).reshape(1)])

    pos = jnp.zeros((npad, 3), dtype).at[:n].set(rays.pos.astype(dtype))
    vel = jnp.zeros((npad, 3), dtype).at[:n].set(rays.vel.astype(dtype))
    life = jnp.zeros((npad,), dtype).at[:n].set(rays.life.astype(dtype))
    alive0 = life > 0
    sid = jnp.arange(npad, dtype=jnp.int32)

    D = Dpad = 0
    ptr0 = tapeT0 = None
    if use_tape:
        D = int(tape.shape[-1])
        Dpad = _pad_to(D, 8)
        ptr0 = jnp.zeros((npad,), jnp.int32)
        if tape_ptr is not None:
            ptr0 = ptr0.at[:n].set(jnp.asarray(tape_ptr, jnp.int32))
        # tape transposed to rows x lanes so each tile stages its lanes'
        # segments as one [Dpad, w] VMEM block (same layout as the state)
        tapeT0 = jnp.zeros((Dpad, npad), jnp.float32).at[:D, :n].set(tape.T)

    # --- initial coherence sort: starting chunk, then direction octant ---
    cc = jnp.floor_divide(pos, float(settings.chunk_size)).astype(jnp.int32)
    cc = cc - jnp.array([o // settings.chunk_size for o in spec.origin],
                        jnp.int32)
    ccs = jnp.clip(cc, 0, jnp.array([CX - 1, CY - 1, CZ - 1], jnp.int32))
    ckey = (ccs[:, 0] * CY + ccs[:, 1]) * CZ + ccs[:, 2]
    octant = ((vel[:, 0] > 0).astype(jnp.int32)
              | ((vel[:, 1] > 0).astype(jnp.int32) << 1)
              | ((vel[:, 2] > 0).astype(jnp.int32) << 2))
    tape_s = None
    if resume_state is None:
        skey = jnp.where(alive0, ckey * 8 + octant, jnp.int32(2 ** 30))
        srt = jax.lax.sort(
            [skey, sid, pos[:, 0], pos[:, 1], pos[:, 2],
             vel[:, 0], vel[:, 1], vel[:, 2], life]
            + ([ptr0] if use_tape else []),
            dimension=0, is_stable=True, num_keys=1)
        sid_s = srt[1]
        pos_s = jnp.stack(srt[2:5], axis=0)
        vel_s = jnp.stack(srt[5:8], axis=0)
        life_s = srt[8]

        F = jnp.zeros((frows, npad), dtype)
        F = F.at[_F_POS:_F_POS + 3].set(pos_s)
        F = F.at[_F_VEL:_F_VEL + 3].set(vel_s)
        F = F.at[_F_LIFE].set(life_s)
        for pi, (_, init) in enumerate(props):
            F = F.at[F_ROWS + pi].set(jnp.full((npad,), init, dtype))
        I = jnp.zeros((I_ROWS, npad), jnp.int32)
        I = I.at[_I_FLAGS].set((life_s > 0).astype(jnp.int32))
        vel0_sT = vel_s  # sorted initial velocities (return_perm)
        if use_tape:
            I = I.at[_I_PTR].set(srt[9])
            tape_s = tapeT0[:, sid_s]
    else:
        # --- resume a partial march (grid-TP segments, gridshard ring) ---
        st_ = resume_state
        alive0 = jnp.zeros((npad,), bool).at[:n].set(st_.alive)
        F0 = jnp.zeros((frows, npad), dtype)
        for pi, (nm, init) in enumerate(props):
            F0 = F0.at[F_ROWS + pi].set(jnp.full((npad,), init, dtype))
            if st_.aux is not None and nm in st_.aux:
                F0 = F0.at[F_ROWS + pi, :n].set(st_.aux[nm].astype(dtype))
        F0 = F0.at[_F_POS:_F_POS + 3].set(
            jnp.zeros((3, npad), dtype).at[:, :n].set(st_.pos.T.astype(dtype)))
        F0 = F0.at[_F_VEL:_F_VEL + 3].set(
            jnp.zeros((3, npad), dtype).at[:, :n].set(st_.vel.T.astype(dtype)))
        F0 = F0.at[_F_COLOR:_F_COLOR + 3].set(
            jnp.zeros((3, npad), dtype).at[:, :n].set(st_.color.T.astype(dtype)))
        F0 = F0.at[_F_ENERGY, :n].set(st_.energy.astype(dtype))
        F0 = F0.at[_F_STEP, :n].set(st_.step.astype(dtype))
        F0 = F0.at[_F_LIFE, :n].set(st_.life.astype(dtype))
        F0 = F0.at[_F_BOUNCES, :n].set(st_.bounces.astype(dtype))
        F0 = F0.at[_F_CMIN:_F_CMIN + 3].set(
            jnp.zeros((3, npad), dtype).at[:, :n].set(st_.cmin.T.astype(dtype)))
        has_box0 = jnp.zeros((npad,), bool).at[:n].set(
            (st_.cmax[:, 0] - st_.cmin[:, 0]) > 0)
        cres0 = jnp.zeros((npad,), jnp.int32).at[:n].set(st_.cres)
        ptrr = jnp.zeros((npad,), jnp.int32).at[:n].set(st_.ptr)
        # active-chunk page under the CURRENT block layout (slab-local when
        # slab mode rotates the span; pool rank when resident) — garbage for
        # out-of-slab frozen lanes is harmless: they never vote or fetch
        ci = ((F0[_F_CMIN:_F_CMIN + 3].T
               - jnp.array(spec.origin, dtype)[None, :])
              / float(settings.chunk_size)).astype(jnp.int32)
        ciy = jnp.clip(ci[:, 1], 0, CY - 1)
        ciz = jnp.clip(ci[:, 2], 0, CZ - 1)
        if slab is not None:
            lcx = jnp.clip(ci[:, 0] - x0_chunks, 0, scx - 1)
            page0 = (lcx * CY + ciy) * CZ + ciz
        else:
            flatc = (jnp.clip(ci[:, 0], 0, CX - 1) * CY + ciy) * CZ + ciz
            page0 = (jnp.asarray(page_map, jnp.int32)[flatc]
                     if resident else flatc)
        flags0 = (alive0.astype(jnp.int32)
                  | (has_box0.astype(jnp.int32) << 1)
                  | (cres0 << _CRES_SHIFT)
                  | (page0 << _PAGE_SHIFT))
        eligible = alive0
        if slab is not None:
            gx0 = jnp.clip(jnp.floor(pos[:, 0]).astype(jnp.int32)
                           - spec.origin[0], 0, spec.shape[0] - 1)
            x0i = jnp.asarray(x0_cells, jnp.int32)
            eligible = eligible & (gx0 >= x0i) & (gx0 < x0i + slab_w_cells)
        skey = jnp.where(eligible, ckey * 8 + octant, jnp.int32(2 ** 30))
        ops = ([skey, sid] + [F0[i] for i in range(frows)]
               + [flags0, ptrr])
        out0 = jax.lax.sort(ops, dimension=0, is_stable=True, num_keys=1)
        sid_s = out0[1]
        F = jnp.stack(out0[2:2 + frows])
        I = jnp.zeros((I_ROWS, npad), jnp.int32)
        I = I.at[_I_FLAGS].set(out0[2 + frows])
        I = I.at[_I_PTR].set(out0[3 + frows])
        vel0_sT = F[_F_VEL:_F_VEL + 3]  # segment-start velocities
    H = record_hits
    hp = _pad_to(H, 8) if H else 8
    rrows = hp * 2 if (record_cells and H) else hp  # + flat-cell row block
    Rrec = jnp.zeros((rrows, npad), jnp.int32)
    voxel_mode = voxel_albedo is not None

    if group_loops:
        kernel = _make_group_kernel(
            settings, spec, w=w, record_hits=H, ep_cap=ep_cap,
            inner_cap=inner_cap, czp=czp, cxyp=cxyp, kp=kp, unroll=unroll,
            record_traversed=record_traversed, byte_planes=byte_planes,
            record_cells=record_cells and H > 0,
            programs_used=programs_used,
            prop_names=tuple(nm for nm, _ in props))
    else:
        kernel = _make_kernel(
            settings, spec, w=w, record_hits=H, ep_cap=ep_cap,
            inner_cap=inner_cap, czp=czp, cxyp=cxyp, kp=kp,
            unroll=unroll, record_traversed=record_traversed,
            byte_planes=byte_planes, group_coarse=group_coarse,
            tape_rows=Dpad if use_tape else 0, tape_len=D,
            voxel_mode=voxel_mode,
            record_cells=record_cells and H > 0, pages=pages,
            resident=resident, programs_used=programs_used,
            slab_width=slab_w_cells,
            prop_names=tuple(nm for nm, _ in props), flat=flat,
            flat_coarse=flat_coarse)
    grid = (npad // w,)
    state_spec = lambda rows: pl.BlockSpec((rows, w), lambda t, s: (0, t),
                                           memory_space=pltpu.VMEM)
    groups = w // 256

    def run_kernel(F, I, Rrec, tape_s=None):
        extra = (tape_s,) if use_tape else ()
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    state_spec(frows),
                    state_spec(I_ROWS),
                    state_spec(rrows),
                ] + ([state_spec(Dpad)] if use_tape else []) + [
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=[state_spec(frows), state_spec(I_ROWS),
                           state_spec(rrows),
                           pl.BlockSpec((1, czp, cxyp), lambda t, s: (t, 0, 0),
                                        memory_space=pltpu.VMEM)],
                scratch_shapes=([
                    (pltpu.VMEM((blocks.shape[0], 4, 32, 128), jnp.bfloat16)
                     if byte_planes else
                     pltpu.VMEM((blocks.shape[0], 64, 128), jnp.float32)),
                    pltpu.SemaphoreType.DMA,
                    pltpu.VMEM(((4 if byte_planes else
                                 (5 if voxel_mode else 2))
                                + (2 if group_coarse else 0), w), jnp.float32),
                ] if resident else [
                    ((pltpu.VMEM((groups, 4, 32, 128), jnp.bfloat16)
                      if byte_planes else
                      pltpu.VMEM((groups, 160 if voxel_mode else 64, 128),
                                 jnp.float32))
                     if pages == 1 else
                     (pltpu.VMEM((groups, pages, 4, 32, 128), jnp.bfloat16)
                      if byte_planes else
                      pltpu.VMEM((groups, pages,
                                  160 if voxel_mode else 64, 128),
                                 jnp.float32))),
                    pltpu.SemaphoreType.DMA((groups,)),
                    pltpu.VMEM(((4 if byte_planes else
                                 (5 if voxel_mode else 2))
                                + (2 if group_coarse else 0), w), jnp.float32),
                ]),
            ),
            out_shape=[
                jax.ShapeDtypeStruct((frows, npad), dtype),
                jax.ShapeDtypeStruct((I_ROWS, npad), jnp.int32),
                jax.ShapeDtypeStruct((rrows, npad), jnp.int32),
                jax.ShapeDtypeStruct((npad // w, czp, cxyp), jnp.int32),
            ],
            interpret=interpret,
        )(scal, F, I, Rrec, *extra, blocks, coarse, mat8)

    F2, I2, R2, T2 = run_kernel(F, I, Rrec, tape_s)
    trav_acc = T2.any(axis=0) if record_traversed else None
    for _ in range(1, supersteps):
        # compaction co-sort: dead lanes last (all-dead tiles exit at
        # episode 0), survivors grouped by (stall desc, needed page)
        flags = I2[_I_FLAGS]
        alive_f = flags & 1
        stall_f = (flags >> _STALL_SHIFT) & _STALL_MAX
        page_f = flags >> _PAGE_SHIFT
        pb = max(1, int(blocks.shape[0] - 1).bit_length())
        if resort_life and pb <= 21:
            # secondary remaining-life bucket: rays with similar work left
            # share tiles, so tiles drain together instead of each paying
            # for its single longest lane (the measured 8.5x trip waste)
            rem = jnp.maximum(F2[_F_LIFE] - F2[_F_STEP], 0.0)
            bucket = jnp.minimum(
                (rem * (15.0 / float(settings.dist_max))).astype(jnp.int32),
                15)
            key_f = jnp.where(
                alive_f > 0,
                ((_STALL_MAX - stall_f) << (pb + 4)) | (page_f << 4) | bucket,
                jnp.int32(2 ** 30))
        else:
            key_f = jnp.where(alive_f > 0,
                              ((_STALL_MAX - stall_f) << 24) | page_f,
                              jnp.int32(2 ** 30))
        ops = ([key_f, sid_s] + [F2[i] for i in range(frows)]
               + [I2[i] for i in range(5)] + [R2[i] for i in range(rrows)])
        out = jax.lax.sort(ops, dimension=0, is_stable=False, num_keys=1)
        sid_s = out[1]
        F2 = jnp.stack(out[2:2 + frows])
        I2 = jnp.zeros((I_ROWS, npad), jnp.int32).at[:5].set(
            jnp.stack(out[2 + frows:7 + frows]))
        R2 = jnp.stack(out[7 + frows:7 + frows + rrows])
        if use_tape:
            tape_s = tapeT0[:, sid_s]
        F2, I2, R2, T2 = run_kernel(F2, I2, R2, tape_s)
        if record_traversed:
            trav_acc = trav_acc | T2.any(axis=0)

    # kernel-cost telemetry (see _I_TRIPS comment in the kernel): total
    # inner trips / episodes paid across all tiles and supersteps. In
    # group_loops mode each 256-lane group counts its OWN trips, so the
    # divisor is the group width (total group-trips, the cost unit).
    tdiv = 256 if group_loops else w
    trips_total = jnp.sum(I2[_I_TRIPS]) // tdiv
    eps_total = jnp.sum(I2[_I_EPS]) // tdiv

    if unsorted:
        # split-program mode: stay in kernel order (the co-sort below is a
        # compile-service hog and mean losses / table grads don't need it)
        Fo = [F2[i] for i in range(frows)]
        flags, ptr, count = I2[_I_FLAGS], I2[_I_PTR], I2[_I_COUNT]
        recs = [R2[i] for i in range(rrows)]
    else:
        # --- final unsort (one multi-operand co-sort keyed by slot id) ---
        ops = [sid_s] + [F2[i] for i in range(frows)] + [
            I2[_I_FLAGS], I2[_I_PTR], I2[_I_COUNT]] + [R2[i]
                                                       for i in range(rrows)]
        out = jax.lax.sort(ops, dimension=0, is_stable=False, num_keys=1)
        Fo = out[1:1 + frows]
        flags, ptr, count = out[1 + frows:4 + frows]
        recs = out[4 + frows:]

    pos = jnp.stack(Fo[_F_POS:_F_POS + 3], axis=-1)[:n]
    vel = jnp.stack(Fo[_F_VEL:_F_VEL + 3], axis=-1)[:n]
    color = jnp.stack(Fo[_F_COLOR:_F_COLOR + 3], axis=-1)[:n]
    energy = Fo[_F_ENERGY][:n]
    step = Fo[_F_STEP][:n]
    life = Fo[_F_LIFE][:n]
    bounces = Fo[_F_BOUNCES][:n]
    cmin = jnp.stack(Fo[_F_CMIN:_F_CMIN + 3], axis=-1)[:n]
    flags = flags[:n]
    has_box = (flags & _FLAG_HASBOX) > 0
    alive = (flags & _FLAG_ALIVE) > 0
    cres = (flags >> _CRES_SHIFT) & 7
    cmin = jnp.where(has_box[:, None], cmin, 0.0)
    cmax = jnp.where(has_box[:, None], cmin + float(settings.chunk_size), 0.0)

    hits = None
    if H:
        rec = jnp.stack([r[:n] for r in recs[:H]], axis=1)  # [n, H]
        hvid = rec & _REC_VID_MASK
        hflip = (rec >> _REC_FLIP_SHIFT) & 7
        hrough = (rec >> _REC_ROUGH_SHIFT) & 1
        hptr = rec >> _REC_PTR_SHIFT
        if use_tape:
            # regenerate the applied uniforms from the recorded tape position
            idx = jnp.clip(hptr[..., None] + jnp.arange(3)[None, None, :],
                           0, D - 1).reshape(n, H * 3)
            hu_all = jnp.take_along_axis(tape, idx, axis=1).reshape(n, H, 3)
        else:
            hu_all = R.hit_draws(key, hptr).astype(dtype)
        hu = jnp.where((hrough > 0)[..., None], hu_all, dtype(0.5))
        hcell = None
        if record_cells:
            hcell = jnp.stack([recs[hp + i][:n] for i in range(H)], axis=1)
        hits = HitRecords(vid=hvid, u=hu, flip=hflip, count=count[:n],
                          cell=hcell)

    if record_traversed:
        # [czp, cxyp] bitmask -> flat chunk order (cx*CY + cy major, cz minor)
        trav = trav_acc[:CZ, :CX * CY].T.reshape(-1)
    else:
        trav = jnp.zeros((spec.num_chunks,), bool)

    aux = ({nm: Fo[F_ROWS + pi][:n] for pi, (nm, _) in enumerate(props)}
           if props else None)
    state = _State(
        pos=pos, vel=vel, color=color, energy=energy, step=step, life=life,
        bounces=bounces, alive=alive, cmin=cmin, cmax=cmax, cres=cres,
        ptr=ptr[:n], traversed=trav,
        it=(resume_state.it if resume_state is not None
            else jnp.zeros((), jnp.int32)), hits=hits, aux=aux)

    if cleanup:
        if cleanup_width and tape is None and slab is None:
            # cap-and-cleanup (round 5): with a low ep_cap the kernel stops
            # paying the 7.8x trip-imbalance tail; the survivors march to
            # completion in a compacted static-width batch instead of a
            # full-width masked resume (ops/compact.py resume_compact).
            # The backstop below still runs (near-zero-trip when the width
            # covered everyone) — exactness depends on neither cap.
            from python_raytracer_tpu.ops.compact import resume_compact
            state = resume_compact(
                settings, spec, arrays, state, key=key,
                programs_used=programs_used, background=background,
                record_hits=H, width=cleanup_width,
                record_traversed=record_traversed,
                voxel_albedo=voxel_albedo,
                record_cells=record_cells and H > 0)
        # finish any ray the static caps under-provisioned for (usually a
        # zero-trip while_loop) — exactness never depends on the caps
        _, state = march(
            settings, spec, arrays, RayBatch(state.pos, state.vel, state.life),
            key=key, tape=tape, programs_used=programs_used,
            background=background,
            mode="while", record_hits=H, record_traversed=record_traversed,
            voxel_albedo=voxel_albedo, record_cells=record_cells and H > 0,
            resume_state=state, finalize=False, slab=slab)
    if not finalize:
        # segmented-execution contract (mirrors ops/march.py): raw state
        # back to the caller for the next ring segment
        res = MarchResult(
            color=state.color, energy=state.energy, bounces=state.bounces,
            step=state.step, pos=state.pos, vel=state.vel,
            traversed=state.traversed, hits=state.hits, aux=state.aux)
        if return_perm:
            # split-program extras: slot permutation (row i holds original
            # ray sid_s[i]) + that order's initial velocities ([n, 3]) for
            # the hit-replay backward
            return res, state, sid_s[:n], vel0_sT.T[:n]
        return res, state
    res = finalize_background(settings, state, background)
    if return_trips:
        return res, (trips_total, eps_total)
    return res
