"""Grid tensor parallelism: march rays against ring-rotating grid slabs.

When a scene's voxel grid outgrows one chip's HBM, the grid itself must be
sharded (SURVEY.md §2.2 "TP"). Rays need arbitrary access along their path,
so the schedule is the ring pattern of SURVEY.md §5.7 — structurally the KV
rotation of ring attention:

* the cell-word grid is split into X-slabs, one per device on the ``grid``
  mesh axis (chunk-aligned, zero-padded);
* rays are data-sharded; each device marches only the rays whose current
  cell lies in the slab it presently holds (others stay frozen with their
  exact state — the step lattice is preserved bit-for-bit);
* after each segment the slabs rotate around the ring (``ppermute``), so
  every device sees every slab once per revolution;
* revolutions repeat until no ray anywhere can advance (global ``psum`` of
  the active count), bounded by the march-step budget.

The result is provably identical to the replicated march (asserted in
tests/test_gridshard.py): freezing/rotating never changes any ray's
positions, hits or RNG consumption order — only *when* each segment of its
path executes.

Current limitation (documented): rays whose position leaves the padded grid
entirely march their void steps on whichever device holds the slab their
clamped x falls into; IOR face data is baked per-cell so no halo exchange is
needed.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.ops.march import (
    RayBatch,
    finalize_background,
    initial_state,
    march,
)
from python_raytracer_tpu.scene.compile import GridSpec, SceneArrays


def pad_grid_for_sharding(spec: GridSpec, arrays: SceneArrays, n_shards: int):
    """Pad the grid's X extent to a multiple of n_shards chunks of slabs.

    Returns (padded_spec, padded cell_word flat, slab_width_cells). Padding
    cells are zero words (void) — semantically identical to off-grid space.
    """
    cs = spec.chunk_size
    cx = spec.chunk_shape[0]
    cx_pad = ((cx + n_shards - 1) // n_shards) * n_shards
    x_pad = cx_pad * cs
    words = np.asarray(arrays.cell_word).reshape(spec.shape)
    if x_pad != spec.shape[0]:
        words = np.pad(words, ((0, x_pad - spec.shape[0]), (0, 0), (0, 0)))
    padded_spec = GridSpec(
        origin=spec.origin, shape=(x_pad, spec.shape[1], spec.shape[2]),
        chunk_size=cs, num_lods=spec.num_lods,
    )
    return padded_spec, jnp.asarray(words.reshape(-1)), x_pad // n_shards


def make_grid_sharded_renderer(
    settings: Settings,
    spec: GridSpec,
    arrays: SceneArrays,
    mesh: Mesh,
    axis: str = "grid",
    background: Optional[str] = "sky",
    segment_iters: int = 64,
    programs_used: Tuple[int, ...] = (0,),
    use_kernel: bool = False,
    block_kw: Optional[dict] = None,
):
    """Build a jitted renderer marching rays against sharded grid slabs.

    Returns ``render(words_sharded, rays, key) -> MarchResult`` plus the
    (padded) sharded words array to pass in. Each device holds 1/S of the
    grid; peak per-device grid memory is ``full grid / S``.

    ``use_kernel``: march each slab segment through the Pallas blockwise
    kernel (ops/blockmarch.py slab/resume mode) instead of the XLA march —
    the production path for sharded grids (VERDICT r3 missing item 4).
    ``block_kw`` tunes it (tile/ep_cap/inner_cap/byte_planes/...);
    ``segment_iters`` maps onto the kernel's trip budget via ep_cap when
    block_kw does not set caps explicitly. Same bit-exact freeze/resume
    semantics (progress-keyed RNG), same results as the XLA ring.
    """
    n_shards = mesh.shape[axis]
    padded_spec, words_flat, slab_w = pad_grid_for_sharding(spec, arrays, n_shards)
    slab_cells = slab_w * padded_spec.shape[1] * padded_spec.shape[2]
    words_sharded = jax.device_put(
        words_flat.reshape(n_shards, slab_cells),
        NamedSharding(mesh, P(axis, None)),
    )
    # Per-device replicated small arrays (table, flags); cell_word replaced
    # by the live slab inside the shard_map body.
    small = dataclasses.replace(arrays, cell_word=jnp.zeros((1,), jnp.int32))

    max_rev = 2 * n_shards  # >= worst-case slab crossings both directions

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), RayBatch(pos=P(axis), vel=P(axis), life=P(axis)), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    def render(slab, rays, key):
        slab = slab[0]  # [slab_cells] this device's initial slab
        my = jax.lax.axis_index(axis)
        state = initial_state(settings, padded_spec, rays)

        def revolution(carry):
            state, slab, slab_idx, rev = carry

            def one_slab(t, inner):
                state, slab, slab_idx = inner
                arr = dataclasses.replace(small, cell_word=slab)
                if use_kernel:
                    from python_raytracer_tpu.ops.blockmarch import (
                        march_blockwise,
                    )

                    kw = dict(tile=1024, inner_cap=8,
                              ep_cap=max(1, -(-segment_iters // 8)))
                    kw.update(block_kw or {})
                    _, state = march_blockwise(
                        settings, padded_spec, arr,
                        RayBatch(state.pos, state.vel, state.life),
                        key=key, background=background,
                        programs_used=programs_used,
                        resume_state=state,
                        slab=(slab_idx * slab_w, slab_w),
                        cleanup=False, finalize=False, **kw)
                else:
                    _, state = march(
                        settings, padded_spec, arr,
                        RayBatch(state.pos, state.vel, state.life),
                        key=key, background=background, mode="while",
                        programs_used=programs_used,
                        resume_state=state, num_iters=segment_iters,
                        finalize=False, slab=(slab_idx * slab_w, slab_w),
                    )
                # rotate: receive the next slab from the right neighbor
                slab = jax.lax.ppermute(
                    slab, axis, [((j + 1) % n_shards, j) for j in range(n_shards)]
                )
                slab_idx = (slab_idx + 1) % n_shards
                return state, slab, slab_idx

            state, slab, slab_idx = jax.lax.fori_loop(
                0, n_shards, one_slab, (state, slab, slab_idx)
            )
            return state, slab, slab_idx, rev + 1

        def unfinished(carry):
            state, _, _, rev = carry
            n_active = jax.lax.psum(jnp.sum(state.alive.astype(jnp.int32)), axis)
            return (n_active > 0) & (rev < max_rev)

        state, _, _, _ = jax.lax.while_loop(
            unfinished, revolution, (state, slab, my, jnp.zeros((), jnp.int32))
        )
        return finalize_background(settings, state, background)

    return render, words_sharded
