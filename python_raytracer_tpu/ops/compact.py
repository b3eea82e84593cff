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
