"""Mosaic feasibility skeleton for the tile-persistent blockwise march.

Exercises, with nonsense math but the real structure:
  * grid (T,) with BlockSpec state in/out [16, 256] slices of [16, N];
  * blocks input left in HBM (pl.ANY), manual async DMA indexed by a
    scalar computed in-kernel (the vote);
  * outer episode fori + inner while_loop whose cond is a cross-lane any();
  * one-hot [256, 128] @ [128, 128] bf16 -> f32 matmul gather;
  * uint32 threefry ops + bitcast inside the kernel.

Run on TPU: python3 tools/skeleton_kernel.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from python_raytracer_tpu.utils.rng import threefry2x32

R = 256          # rays per tile
NC = 64          # number of blocks
EPISODES = 3
INNER_CAP = 8


def kernel(state_ref, blocks_hbm, out_ref, block_vmem, sem):
    x = state_ref[0, :]          # [256] f32 "position"
    acc = state_ref[1, :]        # accumulator
    seed = state_ref[2, :]

    def episode(e, carry):
        x, acc = carry
        # vote: max lane value -> block index (scalar)
        vote = (jnp.max(x).astype(jnp.int32)) & (NC - 1)
        if int(os.environ.get("SKEL_DMA", "1")):
            dma = pltpu.make_async_copy(blocks_hbm.at[vote], block_vmem, sem)
            dma.start()
            dma.wait()

        def cond(c):
            x, acc, it = c
            return jnp.logical_and(jnp.any(x < 40.0), it < INNER_CAP)

        def body(c):
            x, acc, it = c
            hi = (x.astype(jnp.int32) & 127)
            onehot = (hi[:, None] == jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
                      ).astype(jnp.bfloat16)
            if int(os.environ.get("SKEL_MM", "1")):
                rows = jnp.dot(onehot, block_vmem[:, :],
                               preferred_element_type=jnp.float32)  # [256, 128]
            else:
                rows = onehot.astype(jnp.float32) * 2.0
            lo = (x.astype(jnp.int32) & 31)
            lsel = (lo[:, None] == jax.lax.broadcasted_iota(jnp.int32, (R, 32), 1)
                    ).astype(jnp.float32)
            # plane-major lanes: lane = plane*32 + lo -> static per-plane slices
            picked = jnp.zeros((R,), jnp.float32)
            for p in range(4):
                picked = picked + jnp.sum(rows[:, p * 32:(p + 1) * 32] * lsel, axis=1)
            if int(os.environ.get("SKEL_RNG", "1")):
                u0 = jax.lax.bitcast_convert_type(x.astype(jnp.int32), jnp.uint32)
                y0, y1 = threefry2x32(u0, u0 ^ np.uint32(0x9E3779B9),
                                      jnp.zeros_like(u0), u0)
                fb = ((y0 ^ y1) >> np.uint32(9)) | np.uint32(0x3F800000)
                noise = jax.lax.bitcast_convert_type(fb, jnp.float32) - 1.0
            else:
                noise = jnp.zeros_like(x)
            active = x < 40.0
            x = jnp.where(active, x + 1.0 + noise * 0.01, x)
            acc = jnp.where(active, acc + picked, acc)
            return x, acc, it + 1

        variant = int(os.environ.get("SKEL_VARIANT", "0"))
        if variant == 0:      # while + all features
            x, acc, _ = jax.lax.while_loop(cond, body, (x, acc, jnp.zeros((), jnp.int32)))
        elif variant == 1:    # fori, no early exit
            x, acc, _ = jax.lax.fori_loop(0, INNER_CAP, lambda i, c: body(c), (x, acc, jnp.zeros((), jnp.int32)))
        return x, acc

    x, acc = jax.lax.fori_loop(0, EPISODES, episode, (x, acc))
    out_ref[0, :] = x
    out_ref[1, :] = acc
    out_ref[2, :] = seed


def main():
    from python_raytracer_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    n = int(os.environ.get("SKEL_N", str(256 * 1536)))
    T = n // R
    rng = np.random.default_rng(0)
    state = jnp.asarray(rng.random((16, n)) * 30, jnp.float32)
    blocks = jnp.asarray(rng.random((NC, 128, 128)), jnp.bfloat16)

    f = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((16, R), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((16, R), lambda t: (0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((128, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    fj = jax.jit(f)
    t0 = time.time()
    out = fj(state, blocks)
    np.asarray(out[0, :4])
    print(f"compiled+ran in {time.time()-t0:.1f}s; out sample {np.asarray(out[1, :4])}")

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from tpu_timing import time_fn_ms
    states = [jnp.asarray(rng.random((16, n)) * 30, jnp.float32) for _ in range(4)]
    ms = time_fn_ms(fj, [(s, blocks) for s in states], slice_out=lambda o: o[0, :4])
    steps = T * EPISODES * INNER_CAP * R
    print(f"kernel: {ms:.3f} ms for <= {steps} lane-steps "
          f"({steps/ms/1e3:.0f} M lane-steps/s)")


if __name__ == "__main__":
    main()
