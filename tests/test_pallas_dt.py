"""Pallas Chebyshev distance-transform kernel == XLA implementation
(ops/pallas_dt.py; interpret mode on CPU, compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from python_raytracer_tpu.ops.pallas_dt import cheb_distance_pallas
from python_raytracer_tpu.scene.compile import _cheb_distance

INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("density", [0.0, 0.002, 0.05, 1.0])
def test_matches_xla_dt(density):
    rng = np.random.default_rng(42)
    occ = jnp.asarray(rng.random((64, 24, 40)) < density)
    ref = np.asarray(jax.jit(lambda o: _cheb_distance(o, 15))(occ))
    got = np.asarray(cheb_distance_pallas(occ, cap=15, tile=16, interpret=INTERPRET))
    np.testing.assert_array_equal(got, ref)


def test_small_cap_and_tile():
    rng = np.random.default_rng(1)
    occ = jnp.asarray(rng.random((32, 16, 24)) < 0.01)
    ref = np.asarray(jax.jit(lambda o: _cheb_distance(o, 7))(occ))
    got = np.asarray(cheb_distance_pallas(occ, cap=7, tile=8, interpret=INTERPRET))
    np.testing.assert_array_equal(got, ref)
