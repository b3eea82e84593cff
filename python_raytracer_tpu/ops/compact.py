"""Ray-compacted marching: shrink the batch as rays terminate.

Rays finish at wildly different step counts (the stock scene: mean ~29,
max ~61 — SURVEY.md §6, "divergence" hard part §7), but an SPMD march pays
for the *longest* ray at the *full* batch width every iteration. This driver
runs the march in fixed-iteration segments and, between segments, packs the
surviving rays to the front and continues at a smaller static width (a
handful of power-of-two widths keep jit cache hits). Dead rays' final states
are scattered back to their original slots.

Bit-exactness: the march state is self-contained per ray and the PRNG is
keyed by per-ray progress counters (ops/march.py draws_for_iteration), so
permuting/compacting rays changes nothing about any ray's trajectory — the
output equals the plain march exactly (tests/test_compact.py).

Host-orchestrated (one jit per segment width); use inside other jits is not
supported — the Engine and bench forward paths use it, the fully-jitted
train step keeps the plain while-march.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.ops.march import (
    MarchResult,
    RayBatch,
    _State,
    finalize_background,
    initial_state,
    march,
)
from python_raytracer_tpu.scene.compile import GridSpec, SceneArrays

# _State fields that are per-ray (leading dim N); the rest are global.
_GLOBAL_FIELDS = ("traversed", "it")


def _per_ray_map(state: _State, fn) -> _State:
    return state._replace(
        **{
            f: jax.tree_util.tree_map(fn, getattr(state, f))
            for f in state._fields
            if f not in _GLOBAL_FIELDS and getattr(state, f) is not None
        }
    )


def _next_width(n_alive: int, min_width: int) -> int:
    w = max(min_width, 1 << int(np.ceil(np.log2(max(1, n_alive)))))
    return w


def march_compacted(
    settings: Settings,
    spec: GridSpec,
    arrays: SceneArrays,
    rays: RayBatch,
    *,
    key=None,
    tape=None,
    tape_ptr=None,
    programs_used: Tuple[int, ...] = (0,),
    background: Optional[str] = "sky",
    record_traversed: bool = False,
    record_hits: int = 0,
    segment_iters: int = 16,
    min_width: int = 4096,
) -> MarchResult:
    """Drop-in replacement for ``march(mode="while")`` with compaction."""
    n = rays.pos.shape[0]
    dtype = rays.pos.dtype
    if key is None and tape is None:
        key = jax.random.PRNGKey(0)

    @functools.lru_cache(maxsize=None)
    def segment_fn(width: int, tape_cols: int):
        def run(state, seg_tape):
            _, out = march(
                settings, spec, arrays,
                RayBatch(state.pos, state.vel, state.life),
                key=key, tape=seg_tape, programs_used=programs_used,
                background=background, mode="while",
                record_traversed=record_traversed, record_hits=record_hits,
                resume_state=state, num_iters=segment_iters, finalize=False,
            )
            return out, jnp.sum(out.alive.astype(jnp.int32))
        return jax.jit(run)

    state = initial_state(settings, spec, rays, record_hits=record_hits,
                          tape_ptr=tape_ptr)
    # Final per-ray state accumulator at original indices.
    out_state = state
    order = jnp.arange(n)
    cur_tape = tape
    traversed = state.traversed
    max_segments = -(-settings.march_steps // segment_iters) + 1

    for _ in range(max_segments):
        tape_cols = 0 if cur_tape is None else cur_tape.shape[1]
        state, n_alive_dev = segment_fn(state.pos.shape[0], tape_cols)(state, cur_tape)
        traversed = traversed | state.traversed if record_traversed else traversed
        # Write everything back to the original slots (dead rays are final;
        # survivors will be overwritten by later segments).
        out_state = _per_ray_map_scatter(out_state, state, order)
        n_alive = int(n_alive_dev)
        if n_alive == 0:
            break
        width = state.pos.shape[0]
        new_w = _next_width(n_alive, min_width)
        if new_w < width:
            perm = jnp.argsort(~state.alive, stable=True)[:new_w]
            state = _per_ray_map(state, lambda x: x[perm])
            order = order[perm]
            if cur_tape is not None:
                cur_tape = cur_tape[perm]

    out_state = out_state._replace(traversed=traversed)
    return finalize_background(settings, out_state, background)


def _per_ray_map_scatter(dst: _State, src: _State, order) -> _State:
    upd = {}
    for f in dst._fields:
        if f in _GLOBAL_FIELDS:
            continue
        d, s = getattr(dst, f), getattr(src, f)
        if d is None:
            continue
        upd[f] = jax.tree_util.tree_map(lambda a, b: a.at[order].set(b), d, s)
    return dst._replace(**upd)


# ---------------------------------------------------------------------------
# On-device ladder march: compaction without host round trips.
#
# ``march_compacted`` above shrinks the batch with data-dependent widths,
# which forces a device->host readback (``int(n_alive)``) per segment — over
# the axon tunnel that RPC latency made it ~60x slower end to end than the
# single-dispatch while-march despite doing less device work (bench notes).
#
# ``march_ladder`` keeps the whole ladder inside ONE jit: a *static* width
# schedule (chosen from the scene's measured survival curve,
# tools/survival_curve.py), with an alive-first stable co-sort of all per-ray
# state between segments so each narrower segment is a static prefix slice.
# TPU sorts are nearly free relative to the march's grid gathers
# (lax.sort_key_val of 393k keys: 0.035 ms — ROADMAP perf facts), and the
# sort applies ONE permutation to every payload column, so no row gathers
# (measured slow) appear anywhere.
#
# Correctness: per-ray state is self-contained and PRNG draws are keyed by
# per-ray progress counters (ops/march.py draws_for_iteration), so permuting
# rays never changes any ray's trajectory. A final full-width segment
# finishes any ray the static schedule under-provisioned for (e.g. more than
# width survivors), so the result is bit-exact vs the plain march for EVERY
# input, not just typical ones (tests/test_compact.py::test_ladder_*).
# ---------------------------------------------------------------------------


def _per_ray_leaves(state: _State, tape):
    """Flatten all per-ray arrays to a list of [n] columns + rebuild recipe."""
    leaves = []
    recipe = []  # (field_path, shape, dtype, n_cols)
    items = [(f, getattr(state, f)) for f in state._fields if f not in _GLOBAL_FIELDS]
    flat = []
    for f, v in items:
        if v is None:
            continue
        sub_leaves, treedef = jax.tree_util.tree_flatten(v)
        flat.append((f, treedef, sub_leaves))
    if tape is not None:
        flat.append(("__tape__", None, [tape]))
    for f, treedef, sub_leaves in flat:
        for arr in sub_leaves:
            n = arr.shape[0]
            a2 = arr.reshape(n, -1)
            k = a2.shape[1]
            recipe.append((f, arr.shape, arr.dtype, k))
            for j in range(k):
                col = a2[:, j]
                if col.dtype == jnp.bool_:
                    col = col.astype(jnp.int32)
                leaves.append(col)
    return leaves, recipe, [(f, treedef) for f, treedef, _ in flat]


def _rebuild(state: _State, cols, recipe, treedefs):
    out_tape = None
    per_field = {}
    i = 0
    for f, shape, dtype, k in recipe:
        n = cols[0].shape[0]
        stacked = jnp.stack(cols[i : i + k], axis=1).reshape((n,) + shape[1:])
        i += k
        if dtype == jnp.bool_:
            stacked = stacked.astype(jnp.bool_)
        else:
            stacked = stacked.astype(dtype)
        per_field.setdefault(f, []).append(stacked)
    upd = {}
    for f, treedef in treedefs:
        leaves = per_field[f]
        if f == "__tape__":
            out_tape = leaves[0]
        else:
            upd[f] = jax.tree_util.tree_unflatten(treedef, leaves)
    return state._replace(**upd), out_tape


def _co_sort(key_col, state: _State, tape, sid):
    """Stable-sort every per-ray column (plus sid and optional tape rows) by
    ``key_col`` ascending, with one multi-operand lax.sort (one permutation,
    no gathers)."""
    cols, recipe, treedefs = _per_ray_leaves(state, tape)
    out = jax.lax.sort([key_col, sid] + cols, dimension=0, is_stable=True, num_keys=1)
    sid = out[1]
    state, tape = _rebuild(state, list(out[2:]), recipe, treedefs)
    return state, tape, sid


def march_ladder(
    settings: Settings,
    spec: GridSpec,
    arrays: SceneArrays,
    rays: RayBatch,
    *,
    key=None,
    tape=None,
    tape_ptr=None,
    programs_used: Tuple[int, ...] = (0,),
    background: Optional[str] = "sky",
    record_traversed: bool = False,
    record_hits: int = 0,
    schedule: Tuple[Tuple[int, int], ...] = ((20, 1), (5, 2), (11, 8)),
    min_width: int = 256,
    unroll: int = 1,
    finalize: bool = True,
):
    """Bit-exact drop-in for ``march(mode="while")``, single dispatch.

    ``schedule``: static ((iters, width_divisor), ...) — segment s marches the
    first n/width_divisor rays (after an alive-first co-sort) for at most
    ``iters`` trips. After the schedule a full-width segment runs to
    ``settings.march_steps`` so stragglers (rays the static widths didn't
    cover) always finish — exactness never depends on the schedule fitting.
    """
    n = rays.pos.shape[0]
    if key is None and tape is None:
        key = jax.random.PRNGKey(0)

    def seg(state, seg_tape, iters, width):
        sub = _slice_state(state, width)
        sub_rays = RayBatch(sub.pos, sub.vel, sub.life)
        _, out = march(
            settings, spec, arrays, sub_rays,
            key=key, tape=None if seg_tape is None else seg_tape[:width],
            programs_used=programs_used, background=background, mode="while",
            record_traversed=record_traversed, record_hits=record_hits,
            resume_state=sub, num_iters=iters, finalize=False, unroll=unroll,
        )
        return _paste_state(state, out, width)

    state = initial_state(settings, spec, rays, record_hits=record_hits,
                          tape_ptr=tape_ptr)
    sid = jnp.arange(n, dtype=jnp.int32)
    spent = 0
    for iters, div in schedule:
        width = max(min_width, n // div)
        if width >= n:
            width = n
        else:
            state, tape, sid = _co_sort(
                (~state.alive).astype(jnp.int32), state, tape, sid
            )
        state = seg(state, tape, iters, width)
        spent += iters
    if spent < settings.march_steps:
        state = seg(state, tape, settings.march_steps - spent, n)
    # Restore the original ray order (one more co-sort, keyed by slot id).
    state, tape, sid = _co_sort(sid, state, tape, sid)
    if not finalize:
        return state
    return finalize_background(settings, state, background)


def resume_compact(
    settings: Settings,
    spec: GridSpec,
    arrays: SceneArrays,
    state: _State,
    *,
    key=None,
    programs_used: Tuple[int, ...] = (0,),
    background: Optional[str] = "sky",
    record_hits: int = 0,
    width: int = 32768,
    unroll: int = 1,
    record_traversed: bool = False,
    voxel_albedo=None,
    record_cells: bool = False,
) -> _State:
    """Compacted straggler cleanup for a partial march state (the trip-capped
    Pallas kernel's output, ``march_blockwise(..., cleanup=False)``).

    A full-batch masked resume pays every remaining iteration over ALL N
    lanes (~1.5 ns/lane-iter adds up to tens of ms when the capped kernel
    leaves a deep tail), but the survivors are few: gather them to a static
    ``width`` prefix, while-march just that batch to completion, and scatter
    the results back. The permutation is applied with a single-key argsort +
    per-row index gathers — multi-operand co-sorts (the ladder's ``_co_sort``
    with a hit tape attached is 36 operands) do not compile on the round-4/5
    compile service (ROADMAP forensics).

    Exactness never depends on ``width``: rays beyond it (more survivors
    than the static width) come back still alive, and the caller's full-batch
    resume backstop finishes them — it exits in one trip when this pass
    covered everyone. Per-ray state is self-contained and PRNG draws are
    keyed by per-ray progress counters (ops/march.py draws_for_iteration),
    so the gather/scatter permutation changes no ray's trajectory.
    """
    n = state.pos.shape[0]
    if width >= n:
        return state
    dead = jnp.where(state.alive, jnp.int32(0), jnp.int32(1))
    order = jnp.argsort(dead, stable=True)  # survivors first, order kept
    idx = order[:width]
    sub = _per_ray_map(state, lambda x: x[idx])
    sub_rays = RayBatch(sub.pos, sub.vel, sub.life)
    _, out = march(
        settings, spec, arrays, sub_rays,
        key=key, programs_used=programs_used, background=background,
        mode="while", record_hits=record_hits, resume_state=sub,
        record_traversed=record_traversed, voxel_albedo=voxel_albedo,
        record_cells=record_cells, finalize=False, unroll=unroll,
    )
    return _per_ray_map_scatter(state, out, idx)._replace(
        traversed=out.traversed)


def _slice_state(state: _State, width: int) -> _State:
    return _per_ray_map(state, lambda x: x[:width])


def _paste_state(full: _State, sub: _State, width: int) -> _State:
    upd = {}
    for f in full._fields:
        d = getattr(full, f)
        s = getattr(sub, f)
        if d is None:
            continue
        if f in _GLOBAL_FIELDS:
            # Global fields advanced during the segment (traversed OR-mask).
            upd[f] = s
            continue
        upd[f] = jax.tree_util.tree_map(
            lambda a, b: jax.lax.dynamic_update_slice_in_dim(a, b, 0, axis=0), d, s
        )
    return full._replace(**upd)
