"""utils/rng.py: bit-equality against jax.random's threefry stream.

The explicit threefry replica is what lets the Pallas kernel
(ops/blockmarch.py) draw the same uniforms as the XLA march's
``jax.random.uniform(jax.random.fold_in(key, ptr), (3,))`` and what lets the
hit tape store a progress counter instead of 48 float columns (the uniforms
are regenerated bit-exactly from it).
"""

import jax
import jax.numpy as jnp
import numpy as np

from python_raytracer_tpu.utils import rng as R


def test_fold_in_uniform3_matches_jax_random():
    key = jax.random.PRNGKey(1234)
    for ptr in (0, 1, 7, 191, 2**20):
        expect = jax.random.uniform(jax.random.fold_in(key, ptr), (3,),
                                    jnp.float32)
        k1, k2 = R.key_data_pair(key)
        n1, n2 = R.fold_in_pair(k1, k2, jnp.uint32(ptr))
        got = R.uniform3(n1, n2)
        assert got.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(expect), np.asarray(got))


def test_hit_draws_vectorized_matches_march_draws():
    """hit_draws == the march's draws_for_iteration key mode, elementwise."""
    key = jax.random.PRNGKey(42)
    ptr = jnp.array([0, 1, 2, 3, 50, 191], jnp.int32)
    expect = jax.vmap(
        lambda c: jax.random.uniform(jax.random.fold_in(key, c), (3,),
                                     jnp.float32))(ptr)
    got = R.hit_draws(key, ptr)
    np.testing.assert_array_equal(np.asarray(expect), np.asarray(got))


def test_uniform3_parts_equals_uniform3():
    k1 = jnp.arange(8, dtype=jnp.uint32) * 77 + 3
    k2 = jnp.arange(8, dtype=jnp.uint32) * 131 + 9
    parts = R.uniform3_parts(k1, k2)
    stacked = R.uniform3(k1, k2)
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(stacked[..., i]),
                                      np.asarray(parts[i]))


def test_threefry_matches_jax_prng_bits():
    """Raw threefry2x32 vs jax.random.bits on the same key/counters."""
    key = jax.random.PRNGKey(7)
    n = 8
    # partitionable threefry: bits(key, (n,)) hashes counters (0, i)
    expect = jax.random.bits(key, (n,), jnp.uint32)
    k1, k2 = R.key_data_pair(key)
    i = jnp.arange(n, dtype=jnp.uint32)
    y0, y1 = R.threefry2x32(k1, k2, jnp.zeros_like(i), i)
    np.testing.assert_array_equal(np.asarray(expect), np.asarray(y0 ^ y1))
