"""Test harness config: CPU backend, 8 virtual devices, float64.

Tests run on an 8-device virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) so multi-chip sharding code is
exercised without TPU hardware (SURVEY.md §4 item 4), and in x64 mode so the
semantic oracle matches the reference's Python float64 math bit-for-bit.

Note: the environment's axon sitecustomize overrides JAX_PLATFORMS at
interpreter start, so the CPU platform must be forced via jax.config after
import — env vars alone are not honored.
"""

import os

import numpy as np
import pytest

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture(scope="session")
def golden_nonoise():
    path = os.path.join(GOLDEN_DIR, "default_nonoise.npz")
    if not os.path.exists(path):
        pytest.skip("golden default_nonoise.npz not generated")
    return np.load(path)


@pytest.fixture(scope="session")
def golden_stock():
    path = os.path.join(GOLDEN_DIR, "default_stock.npz")
    if not os.path.exists(path):
        pytest.skip("golden default_stock.npz not generated")
    return np.load(path)


def zero_roughness(scene):
    """Zero all material roughness (mirrors the oracle's --zero-roughness)."""
    seen = set()
    for obj in scene.objects.values():
        if obj.sprite:
            for frame in obj.sprite.frames:
                for mat in list(frame.data3.values()) + list(frame.data6.values()):
                    if id(mat) not in seen:
                        seen.add(id(mat))
                        mat.roughness = 0


@pytest.fixture(scope="session")
def default_scene_nonoise():
    from python_raytracer_tpu.models.default import build_default_scene, default_settings

    st = default_settings().replace(dof=0.0, lod_random=0.0)
    scene = build_default_scene(st)
    zero_roughness(scene)
    return scene


@pytest.fixture(scope="session")
def compiled_nonoise(default_scene_nonoise, golden_nonoise):
    from python_raytracer_tpu.scene.compile import compile_scene

    cam_pos = np.array(golden_nonoise["cam_pos"])
    return compile_scene(default_scene_nonoise, cam_pos=cam_pos)


@pytest.fixture(scope="session")
def golden_samples4():
    path = os.path.join(GOLDEN_DIR, "default_samples4.npz")
    if not os.path.exists(path):
        pytest.skip("golden default_samples4.npz not generated")
    return np.load(path)
