"""Gradient tests: reverse-mode through the march vs finite differences, and
sharded-vs-unsharded gradient equivalence (SURVEY.md §4 items 3-4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
from python_raytracer_tpu.parallel.mesh import make_mesh
from python_raytracer_tpu.parallel.train import image_loss, make_train_step
from python_raytracer_tpu.scene import Material, Object, Scene, Sprite
from python_raytracer_tpu.scene.compile import compile_scene
from python_raytracer_tpu.scene.material import (
    PARAM_ABSORPTION,
    PARAM_ALBEDO_G,
    PARAM_ENERGY,
)


@pytest.fixture(scope="module")
def tiny():
    st = Settings(
        width=8, height=8, chunk_size=16, dist_max=24, max_light=1,
        max_bounces=2, falloff=0.25, lod_bounces=0.5, exact=False, samples=1,
    )
    scene = Scene(st)
    rng = np.random.default_rng(0)
    with scene:
        mats = [
            Material(albedo=(200, 50, 30), roughness=0, absorption=1, ior=1,
                     energy=0, solidity=1),
            Material(albedo=(20, 220, 90), roughness=0, absorption=0.5, ior=0.25,
                     energy=0.5, solidity=1),
        ]
        spr = Sprite(size=(8, 8, 8), frames=1)
        vox = {}
        for _ in range(120):
            p = tuple(int(v) for v in rng.integers(0, 8, 3))
            vox[p] = mats[int(rng.integers(0, 2))]
        spr.get_frame(0).set_voxels(vox, True)
        obj = Object(pos=(0, 0, 10))
        obj.set_sprite(spr)
    cs = compile_scene(scene, cam_pos=np.zeros(3))

    dirs, detail = pixel_grid(st, jnp.float64)
    rays = generate_rays(
        st, jnp.zeros(3, jnp.float64), jnp.array([0, 0, 0, 1.0], jnp.float64),
        dirs, detail,
    )
    target = jnp.full((rays.pos.shape[0], 3), 0.5, jnp.float64)
    return st, cs, rays, target


def test_grad_matches_finite_difference(tiny):
    st, cs, rays, target = tiny
    table = cs.arrays.material_table.astype(jnp.float64)

    loss_fn = jax.jit(
        lambda t: image_loss(t, st, cs.spec, cs.arrays, rays, target)
    )
    grad = jax.jit(jax.grad(
        lambda t: image_loss(t, st, cs.spec, cs.arrays, rays, target)
    ))(table)
    grad = np.asarray(grad)
    assert np.isfinite(grad).all()
    assert np.abs(grad).max() > 0, "gradient must be nonzero"

    eps = 1e-5
    for row, col in [(1, PARAM_ALBEDO_G), (1, PARAM_ABSORPTION), (2, PARAM_ENERGY),
                     (2, PARAM_ABSORPTION)]:
        tp = table.at[row, col].add(eps)
        tm = table.at[row, col].add(-eps)
        fd = (float(loss_fn(tp)) - float(loss_fn(tm))) / (2 * eps)
        got = grad[row, col]
        assert got == pytest.approx(fd, rel=2e-4, abs=1e-9), (row, col)


def test_sharded_grad_matches_unsharded(tiny):
    st, cs, rays, target = tiny
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    st = st.replace(exact=False)
    opt = optax.sgd(1e-3)
    step_1 = make_train_step(st, cs.spec, opt, mesh=None)
    mesh = make_mesh(8)
    step_n = make_train_step(st, cs.spec, opt, mesh=mesh)

    opt_state = opt.init(cs.arrays.material_table)
    key = jax.random.PRNGKey(0)
    a1, _, l1 = step_1(cs.arrays, opt_state, rays, target, key)
    an, _, ln = step_n(cs.arrays, opt_state, rays, target, key)
    np.testing.assert_allclose(float(l1), float(ln), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(a1.material_table), np.asarray(an.material_table), rtol=1e-10
    )


def test_training_reduces_loss(tiny):
    """A few SGD steps should reduce the loss — the end-to-end 'inverse
    rendering' capability the north star asks for."""
    st, cs, rays, target = tiny
    opt = optax.adam(0.05)
    step = make_train_step(st, cs.spec, opt, mesh=None)
    arrays = cs.arrays
    opt_state = opt.init(arrays.material_table)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(8):
        arrays, opt_state, loss = step(arrays, opt_state, rays, target, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_custom_vjp_matches_scan_autodiff(tiny):
    """The hit-replay backward (ops/diff.py) must reproduce both the primal
    colors and the gradients of plain reverse-mode through the scan march."""
    st, cs, rays, target = tiny
    from python_raytracer_tpu.ops.diff import make_diff_renderer
    from python_raytracer_tpu.parallel.train import render_colors

    key = jax.random.PRNGKey(3)
    render = make_diff_renderer(st, cs.spec, max_hits=16)

    def loss_fast(t):
        color, energy = render(t, cs.arrays, rays, key)
        return jnp.mean((color / 255.0 - target) ** 2)

    def loss_scan(t):
        arr = dataclasses.replace(cs.arrays, material_table=t)
        color = render_colors(st.replace(exact=False), cs.spec, arr, rays, key=key)
        return jnp.mean((color / 255.0 - target) ** 2)

    table = cs.arrays.material_table.astype(jnp.float64)
    l_fast, g_fast = jax.value_and_grad(loss_fast)(table)
    l_scan, g_scan = jax.value_and_grad(loss_scan)(table)
    np.testing.assert_allclose(float(l_fast), float(l_scan), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_scan), rtol=1e-8, atol=1e-12)


def test_voxel_grid_gradients(tiny):
    """Per-voxel differentiable albedo grid (SURVEY §7 stage 5 optional):
    forward responds to per-cell offsets, gradients match finite
    differences, and grads land ONLY on cells that were actually hit."""
    st, cs, rays, target = tiny
    from python_raytracer_tpu.ops.diff import make_diff_renderer

    renderer = make_diff_renderer(st, cs.spec, max_hits=16,
                                  programs_used=cs.programs_used,
                                  voxel_grid=True)
    table = cs.arrays.material_table.astype(jnp.float64)
    nv = int(np.prod(cs.spec.shape))
    vox0 = jnp.zeros((nv, 3), jnp.float64)

    def loss(t, v):
        color, _ = renderer(t, v, cs.arrays, rays, jax.random.PRNGKey(0))
        return jnp.mean((color / 255.0 - target) ** 2)

    l0 = float(loss(table, vox0))
    dvox = jax.grad(loss, argnums=1)(table, vox0)
    dvox = np.asarray(dvox)
    assert np.isfinite(dvox).all()
    nz = np.nonzero(np.abs(dvox).sum(axis=1))[0]
    assert len(nz) > 0, "some hit cells must receive gradient"
    # only renderable cells may receive gradient
    baked = np.asarray(cs.arrays.cell_word) & 0xFFF
    assert (baked[nz] > 0).all(), "gradient on an empty cell"

    # finite differences on the strongest cells
    eps = 1e-4
    flat_idx = nz[np.argsort(-np.abs(dvox[nz]).sum(axis=1))[:3]]
    for ci in flat_idx:
        ch = int(np.argmax(np.abs(dvox[ci])))
        vp = vox0.at[ci, ch].add(eps)
        vm = vox0.at[ci, ch].add(-eps)
        fd = (float(loss(table, vp)) - float(loss(table, vm))) / (2 * eps)
        import pytest as _pytest
        assert dvox[ci, ch] == _pytest.approx(fd, rel=2e-4, abs=1e-10), ci

    # forward effect: a big offset on a hit cell changes the image
    vbig = vox0.at[int(flat_idx[0])].set(jnp.array([50.0, 50.0, 50.0]))
    l1 = float(loss(table, vbig))
    assert l1 != l0
