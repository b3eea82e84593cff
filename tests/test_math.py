"""L0 math semantics: Chebyshev normalize, euler->quat, quaternion basis
(SURVEY.md §4 item 2; reference lib.py:310-376)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from python_raytracer_tpu.utils import hostmath as hm
from python_raytracer_tpu.utils import mathutils as mu


def test_cheb_normalize_unit_axis():
    v = jnp.array([[0.3, -0.8, 0.5], [0.0, 0.0, 0.0], [2.0, 1.0, -4.0]])
    out = np.asarray(mu.cheb_normalize(v))
    # max |component| becomes exactly 1 (reference lib.py:310-314)
    assert np.abs(out[0]).max() == 1.0
    assert np.all(out[1] == 0)  # zero vector unchanged
    np.testing.assert_allclose(out[2], [0.5, 0.25, -1.0])


def test_cheb_normalize_matches_host():
    rng = np.random.default_rng(0)
    for _ in range(50):
        v = rng.uniform(-3, 3, 3)
        got = np.asarray(mu.cheb_normalize(jnp.asarray(v)))
        want = hm.cheb_normalize_h(v)
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_euler_quat_roundtrip_identity():
    q = np.asarray(mu.euler_to_quat(jnp.array([0.0, 0.0, 0.0])))
    np.testing.assert_allclose(q, [0, 0, 0, 1])


def test_euler_quat_matches_host():
    rng = np.random.default_rng(1)
    for _ in range(50):
        e = rng.uniform(0, 360, 3)
        got = np.asarray(mu.euler_to_quat(jnp.asarray(e)))
        want = hm.euler_to_quat_h(e)
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_quat_multiply_and_basis_match_host():
    rng = np.random.default_rng(2)
    for _ in range(20):
        a = hm.euler_to_quat_h(rng.uniform(0, 360, 3))
        b = hm.euler_to_quat_h(rng.uniform(0, 360, 3))
        got = np.asarray(mu.quat_multiply(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, hm.quat_multiply_h(a, b), atol=1e-12)
        for jf, hf in [
            (mu.quat_vec_forward, hm.quat_vec_forward_h),
            (mu.quat_vec_right, hm.quat_vec_right_h),
            (mu.quat_vec_up, hm.quat_vec_up_h),
        ]:
            np.testing.assert_allclose(np.asarray(jf(jnp.asarray(a))), hf(a), atol=1e-12)


def test_forward_vector_of_yaw():
    # yaw 0 -> +Z forward; yaw 90 -> ±X (reference convention via lib.py:372-376)
    f0 = np.asarray(mu.quat_vec_forward(mu.euler_to_quat(jnp.array([0.0, 0.0, 0.0]))))
    np.testing.assert_allclose(f0, [0, 0, 1], atol=1e-12)
    f90 = np.asarray(mu.quat_vec_forward(mu.euler_to_quat(jnp.array([0.0, 90.0, 0.0]))))
    assert abs(abs(f90[0]) - 1) < 1e-12 and abs(f90[1]) < 1e-12 and abs(f90[2]) < 1e-12


def test_snapped_floor_semantics():
    out = np.asarray(mu.snapped(jnp.array([-0.5, 17.0, -16.0]), 16.0))
    np.testing.assert_allclose(out, [-16.0, 16.0, -16.0])


@pytest.mark.skipif(
    not __import__("os").path.exists("/root/reference/lib.py"),
    reason="reference not mounted",
)
def test_against_reference_lib():
    import sys

    sys.path.insert(0, "/root/reference")
    sys.modules.pop("lib", None)
    import lib as ref_lib

    rng = np.random.default_rng(3)
    for _ in range(20):
        e = rng.uniform(0, 360, 3)
        rq = ref_lib.vec3(*e).quaternion()
        got = np.asarray(mu.euler_to_quat(jnp.asarray(e)))
        np.testing.assert_allclose(got, [rq.x, rq.y, rq.z, rq.w], atol=1e-12)
        fwd = rq.vec_forward()
        gotf = np.asarray(mu.quat_vec_forward(jnp.asarray(got)))
        np.testing.assert_allclose(gotf, [fwd.x, fwd.y, fwd.z], atol=1e-12)
        v = rng.uniform(-2, 2, 3)
        rn = ref_lib.vec3(*v).normalize()
        gotn = np.asarray(mu.cheb_normalize(jnp.asarray(v)))
        np.testing.assert_allclose(gotn, [rn.x, rn.y, rn.z], atol=0)
    sys.path.remove("/root/reference")
    sys.modules.pop("lib", None)
