"""Pallas TPU kernel: Chebyshev distance transform for the chunk bake.

The bake computes, per grid cell, the Chebyshev distance to the nearest
renderable voxel (capped) — the empty-space skip field consumed by the
marcher (scene/compile.py cell words). The XLA fallback is CAP iterations of
three separable 1D min reduce_windows (45 passes over the full grid per
bake). This kernel computes the whole transform in ONE pass over HBM:

* the occupancy grid stays in HBM; each program DMAs its X-tile plus a
  CAP-cell halo into VMEM scratch (the transform's dependency radius is
  exactly CAP — halo windows overlap, so the copy is explicit rather than a
  BlockSpec),
* all CAP relaxation rounds run on the VMEM-resident tile — three shifted-min
  sweeps per round, pure VPU work, no refetches,
* the de-haloed result tile is written through a VMEM output block.

HBM traffic drops from ~2 * 45 grid passes to ~1 read + 1 write. Used by
bake_chunks on TPU; interpret mode keeps CPU tests exact
(tests/test_pallas_dt.py asserts equality with the XLA implementation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 2**20  # plain int: jnp scalars would be captured consts in the kernel


def _shift_min(d, axis: int):
    """min(d, d shifted +1, d shifted -1) along axis, edges padded BIG."""
    n = d.shape[axis]
    lo = jax.lax.slice_in_dim(d, 0, n - 1, axis=axis)
    hi = jax.lax.slice_in_dim(d, 1, n, axis=axis)
    pad_shape = list(d.shape)
    pad_shape[axis] = 1
    big = jnp.full(pad_shape, BIG, d.dtype)
    down = jnp.concatenate([big, lo], axis=axis)  # d[i-1]
    up = jnp.concatenate([hi, big], axis=axis)  # d[i+1]
    return jnp.minimum(d, jnp.minimum(down, up))


def _dt_kernel(occ_hbm, out_ref, scratch, sem, *, cap: int, tile: int):
    i = pl.program_id(0)
    win = tile + 2 * cap
    copy = pltpu.make_async_copy(
        occ_hbm.at[pl.ds(i * tile, win)], scratch, sem
    )
    copy.start()
    copy.wait()

    d = jnp.where(scratch[...] > 0, jnp.int32(0), BIG)

    def round_(_, d):
        m = _shift_min(_shift_min(_shift_min(d, 0), 1), 2)
        return jnp.minimum(d, m + 1)

    d = jax.lax.fori_loop(0, cap, round_, d)
    out_ref[...] = jnp.minimum(d[cap : cap + tile], jnp.int32(cap))


@functools.partial(jax.jit, static_argnames=("cap", "tile", "interpret"))
def cheb_distance_pallas(occupied, cap: int = 15, tile: int = 16, interpret: bool = False):
    """Chebyshev DT of a bool/int [X, Y, Z] occupancy grid, clamped to cap.

    X must be a multiple of ``tile``. Matches scene.compile._cheb_distance.
    """
    X, Y, Z = occupied.shape
    assert X % tile == 0, (X, tile)
    occ = occupied.astype(jnp.int32)
    # Empty halo on both X edges so every tile sees a full window; Y/Z
    # padded to the (8, 128) memref tiling Mosaic requires for HBM DMA
    # slices (empty padding cannot change interior Chebyshev distances —
    # it contains no occupied cells).
    Yp = -(-Y // 8) * 8
    Zp = -(-Z // 128) * 128
    occ = jnp.pad(occ, ((cap, cap), (0, Yp - Y), (0, Zp - Z)))

    win = tile + 2 * cap
    out = pl.pallas_call(
        functools.partial(_dt_kernel, cap=cap, tile=tile),
        out_shape=jax.ShapeDtypeStruct((X, Yp, Zp), jnp.int32),
        grid=(X // tile,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tile, Yp, Zp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((win, Yp, Zp), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        # the relaxation rounds keep 2-3 window-sized temporaries live;
        # the default 16M scoped-vmem limit is too small for real grids
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024),
        interpret=interpret,
    )(occ)
    return out[:, :Y, :Z]
