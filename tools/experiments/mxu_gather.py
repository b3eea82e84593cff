"""Experiment: MXU one-hot gather vs XLA dynamic gather (Pallas).

The blockwise-march design (ROADMAP.md round-2 plan) hinges on one question:
inside a Pallas kernel, can a tile of rays fetch cells from a VMEM-resident
chunk block faster than XLA's dynamic gather does from HBM? TPU has no
arbitrary per-lane vector gather, but a [T, B] one-hot matmul against a
[B, C] block IS a gather executed on the MXU.

This prototype measures exactly that shape: T=128-ray tiles gathering from a
B=4096-cell block (one 16^3 chunk), values as 2 f32 columns (an int32 word
split into two 16-bit halves, exactly representable in f32).

Run on TPU:  python3 tools/experiments/mxu_gather.py
(CPU falls back to interpret mode: correctness only.)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 4096  # cells per block (16^3 chunk)
T = 128   # rays per tile


def _kernel(block_ref, idx_ref, out_ref, *, steps: int):
    """Each program: one tile of T rays does `steps` dependent gathers from
    the block via one-hot MXU matmuls (index chaining emulates the march's
    sequential dependence)."""
    block = block_ref[...]  # [B, 2] f32 (word halves)
    idx = idx_ref[0, :]     # [T] int32

    def body(_, carry):
        idx, acc = carry
        onehot = (idx[:, None] == jax.lax.broadcasted_iota(jnp.int32, (T, B), 1)
                  ).astype(jnp.float32)
        vals = jnp.dot(onehot, block, preferred_element_type=jnp.float32)  # [T, 2]
        word = vals[:, 0].astype(jnp.int32) + (vals[:, 1].astype(jnp.int32) << 16)
        idx = (word + acc.astype(jnp.int32)) % B
        return idx, acc + vals[:, 0]

    idx, acc = jax.lax.fori_loop(0, steps, body, (idx, jnp.zeros((T,), jnp.float32)))
    out_ref[0, :] = acc


@functools.partial(jax.jit, static_argnames=("steps", "interpret"))
def mxu_gather_chain(block2, idx, steps: int, interpret: bool = False):
    """block2 [B, 2] f32; idx [n_tiles, T] int32 -> [n_tiles, T] f32."""
    n_tiles = idx.shape[0]
    return pl.pallas_call(
        functools.partial(_kernel, steps=steps),
        out_shape=jax.ShapeDtypeStruct((n_tiles, T), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((B, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(block2, idx)


def reference_chain(block2, idx, steps):
    """Same computation via plain XLA gathers."""
    def body(_, carry):
        idx, acc = carry
        vals = block2[idx]  # [n, T, 2]
        word = vals[..., 0].astype(jnp.int32) + (vals[..., 1].astype(jnp.int32) << 16)
        idx = (word + acc.astype(jnp.int32)) % B
        return idx, acc + vals[..., 0]

    idx, acc = jax.lax.fori_loop(0, steps, body, (idx, jnp.zeros(idx.shape, jnp.float32)))
    return acc


def main():
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    words = rng.integers(0, 2**30, B).astype(np.int64)
    block2 = jnp.asarray(
        np.stack([words & 0xFFFF, words >> 16], axis=1), jnp.float32
    )
    steps = 32
    for n_tiles in ([8, 256] if not interpret else [8]):
        idx = jnp.asarray(rng.integers(0, B, (n_tiles, T)), jnp.int32)
        out = mxu_gather_chain(block2, idx, steps, interpret)
        ref = jax.jit(reference_chain, static_argnums=2)(block2, idx, steps)
        ok = np.allclose(np.asarray(out), np.asarray(ref))
        n_gathers = n_tiles * T * steps
        t0 = time.time()
        for _ in range(10):
            out = mxu_gather_chain(block2, idx, steps, interpret)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 10
        t0 = time.time()
        rfn = jax.jit(reference_chain, static_argnums=2)
        for _ in range(10):
            ref = rfn(block2, idx, steps)
        jax.block_until_ready(ref)
        dt_ref = (time.time() - t0) / 10
        print(f"MXU-GATHER tiles={n_tiles} correct={ok} "
              f"pallas {dt*1e3:.2f} ms ({n_gathers/dt/1e6:.0f} M/s) vs "
              f"xla {dt_ref*1e3:.2f} ms ({n_gathers/dt_ref/1e6:.0f} M/s)")


if __name__ == "__main__":
    main()
