"""Explicit Threefry-2x32 — bit-exact replica of jax.random's stream.

The march draws per-hit roughness jitter as
``jax.random.uniform(jax.random.fold_in(key, ptr), (3,))`` (ops/march.py
``draws_for_iteration``). The Pallas blockwise kernel (ops/blockmarch.py)
cannot call jax.random — it draws in-kernel via these primitives — and its
hit tape stores the per-ray progress counter instead of the uniforms, which
``hit_draws`` regenerates bit-exactly for the hit-replay backward. This
module reimplements exactly the pieces used, as plain uint32 jnp ops that
trace both in XLA and inside Pallas kernels:

  * ``threefry2x32(k1, k2, x0, x1)`` — the 20-round hash
    (jax._src.prng._threefry2x32_lowering, unrolled form);
  * ``fold_in_pair(k1, k2, data)`` — jax.random.fold_in on a raw key pair:
    threefry on the count pair (0, data) (threefry_seed of a nonneg int32);
  * ``uniform3(k1, k2)`` — jax.random.uniform(key, (3,)) in [0,1) under the
    default ``threefry_partitionable`` mode: bits_i = y0 ^ y1 of
    threefry(key, (0, i)) for i = 0..2 (prng._threefry_random_bits_
    partitionable with iota_2x32_shape); floats via the mantissa trick
    bits>>9 | 0x3F800000, bitcast, minus 1.

``test_rng_exact.py`` asserts bit-equality against jax.random on arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _rot(x, r):
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)


def threefry2x32(k1, k2, x0, x1):
    """The Threefry-2x32 hash of count pair (x0, x1) under key (k1, k2).

    All args uint32 arrays (broadcastable); returns (y0, y1).
    Mirrors jax._src.prng._threefry2x32_lowering with unrolled rounds.
    """
    k1 = jnp.asarray(k1, jnp.uint32)
    k2 = jnp.asarray(k2, jnp.uint32)
    x0 = jnp.asarray(x0, jnp.uint32)
    x1 = jnp.asarray(x1, jnp.uint32)
    ks0, ks1 = k1, k2
    ks2 = k1 ^ k2 ^ np.uint32(0x1BD11BDA)

    x0 = x0 + ks0
    x1 = x1 + ks1

    def four_rounds(x0, x1, rots):
        for r in rots:
            x0 = x0 + x1
            x1 = _rot(x1, r) ^ x0
        return x0, x1

    x0, x1 = four_rounds(x0, x1, _ROT_A)
    x0, x1 = x0 + ks1, x1 + ks2 + np.uint32(1)
    x0, x1 = four_rounds(x0, x1, _ROT_B)
    x0, x1 = x0 + ks2, x1 + ks0 + np.uint32(2)
    x0, x1 = four_rounds(x0, x1, _ROT_A)
    x0, x1 = x0 + ks0, x1 + ks1 + np.uint32(3)
    x0, x1 = four_rounds(x0, x1, _ROT_B)
    x0, x1 = x0 + ks1, x1 + ks2 + np.uint32(4)
    x0, x1 = four_rounds(x0, x1, _ROT_A)
    x0, x1 = x0 + ks2, x1 + ks0 + np.uint32(5)
    return x0, x1


def key_data_pair(key):
    """Raw (k1, k2) uint32 scalars of a jax.random key (typed or legacy)."""
    raw = jax.random.key_data(key) if jnp.issubdtype(key.dtype, jax.dtypes.prng_key) else key
    return jnp.asarray(raw[0], jnp.uint32), jnp.asarray(raw[1], jnp.uint32)


def fold_in_pair(k1, k2, data):
    """jax.random.fold_in on a raw key pair; ``data`` nonnegative int32/uint32
    arrays (vectorized). Returns the new raw pair."""
    d = jnp.asarray(data).astype(jnp.uint32)
    return threefry2x32(k1, k2, jnp.zeros_like(d), d)


def uniform3_parts(k1, k2):
    """The three uniforms of ``uniform3`` as separate arrays (the layout the
    Pallas kernel wants: per-lane vectors, no trailing axis)."""
    zero = jnp.zeros_like(k1)
    outs = []
    for i in range(3):
        y0, y1 = threefry2x32(k1, k2, zero, jnp.full_like(k1, i))
        fb = ((y0 ^ y1) >> np.uint32(9)) | np.uint32(0x3F800000)
        outs.append(jax.lax.bitcast_convert_type(fb, jnp.float32)
                    - jnp.float32(1.0))
    return tuple(outs)


def uniform3(k1, k2):
    """jax.random.uniform(key, (3,), float32) for raw pair arrays.

    k1/k2 shaped [...]; returns u [..., 3] in [0, 1), bit-exact vs
    jax.random.uniform(fold-derived key, (3,)).
    """
    return jnp.stack(uniform3_parts(k1, k2), axis=-1)


def hit_draws(key, ptr):
    """The march's per-hit draw: uniform3(fold_in(key, ptr)).

    ``key``: jax.random key; ``ptr``: int32 [...] progress counters.
    Returns [..., 3] float32 — bit-exact equal to the march's
    ``draws_for_iteration`` key mode (ops/march.py).
    """
    k1, k2 = key_data_pair(key)
    n1, n2 = fold_in_pair(k1, k2, ptr)
    return uniform3(n1, n2)
