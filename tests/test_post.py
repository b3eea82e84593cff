"""Post-effects stack vs real Pygame semantics (reference init.py:208-253).

The JAX post ops are float-domain re-designs of pygame's integer surface
blends; these tests drive actual pygame surfaces through the same operations
the reference performs and require close agreement (small integer-rounding
tolerance)."""

import os

import numpy as np
import pytest

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
import pygame as pg  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from python_raytracer_tpu.ops import post  # noqa: E402


def _surf_from(arr):
    s = pg.Surface((arr.shape[1], arr.shape[0]), pg.SRCALPHA)
    rgb = arr[..., :3].astype(np.uint8).transpose(1, 0, 2)
    pg.surfarray.blit_array(s, rgb)
    alpha = pg.surfarray.pixels_alpha(s)
    alpha[:] = arr[..., 3].astype(np.uint8).T
    del alpha
    return s


def _to_arr(surf):
    rgb = pg.surfarray.array3d(surf).transpose(1, 0, 2).astype(np.float64)
    a = pg.surfarray.array_alpha(surf).T.astype(np.float64)
    return np.concatenate([rgb, a[..., None]], axis=-1)


@pytest.fixture
def canvas():
    rng = np.random.default_rng(0)
    return rng.uniform(0, 255, (24, 32, 4)).astype(np.float64)


def test_alpha_over_matches_pygame(canvas):
    rng = np.random.default_rng(1)
    src = rng.uniform(0, 255, canvas.shape).astype(np.float64)
    dst_s = _surf_from(canvas)
    src_s = _surf_from(src)
    dst_s.blit(src_s, (0, 0))
    want = _to_arr(dst_s)
    # pygame stores integers; our input already rounds through uint8 above
    got = np.asarray(post.alpha_over(jnp.asarray(np.floor(canvas)), jnp.asarray(np.floor(src))))
    err = np.abs(got - want)
    assert err[..., :3].max() <= 2.0, err[..., :3].max()
    assert err[..., 3].max() <= 2.0


def test_spill_matches_pygame(canvas):
    amount = 0.1
    s = _surf_from(canvas)
    color = pg.transform.average_color(s, consider_alpha=True)
    fac = 255 - round(amount * 255)
    tint = tuple(min(255, c + fac) for c in color)
    s.fill(tint, special_flags=pg.BLEND_RGBA_MULT)
    want = _to_arr(s)
    got = np.asarray(post.spill(jnp.asarray(np.floor(canvas)), amount))
    # pygame mult blend is (a*b)>>8-style; allow small scale tolerance
    assert np.abs(got - want).mean() < 2.5, np.abs(got - want).mean()


@pytest.mark.parametrize("iris", [0.4, -0.4])
def test_iris_matches_pygame(canvas, iris):
    s = _surf_from(canvas)
    col = 0 if iris > 0 else 255
    mod = pg.BLEND_RGBA_ADD if iris > 0 else pg.BLEND_RGBA_SUB
    fac = round(abs(iris * 255))
    gray = pg.transform.grayscale(s)
    mask = pg.Surface(s.get_size(), pg.SRCALPHA)
    mask.fill((col, col, col, col), special_flags=0)
    mask.blit(gray, (0, 0), special_flags=mod)
    mask.fill((fac, fac, fac, fac), special_flags=pg.BLEND_RGBA_MULT)
    s.blit(mask, (0, 0), special_flags=mod)
    want = _to_arr(s)

    got, _tgt = post.iris_adapt(jnp.asarray(np.floor(canvas)), jnp.asarray(iris))
    got = np.asarray(got)
    # rgb channels only: pygame's mask alpha path makes the blit alpha-weighted;
    # the visible-channel agreement is what matters
    assert np.abs(got[..., :3] - want[..., :3]).mean() < 6.0


def test_bloom_shapes_and_monotonicity(canvas):
    out = np.asarray(post.bloom(jnp.asarray(canvas), 0.5, 4))
    assert out.shape == canvas.shape
    assert (out + 1e-6 >= canvas).all()  # additive effect only brightens
    assert out.max() <= 255.0


def test_subsample_and_window_scale(canvas):
    from python_raytracer_tpu.config import Settings

    out = np.asarray(post.subsample(jnp.asarray(canvas), 0.5))
    assert out.shape == (36, 48, 4)
    st = Settings(width=32, height=24, scale=4, smooth=0.25)
    scaled = np.asarray(post.window_scale(jnp.asarray(canvas), st.window_scaled, st.smooth))
    assert scaled.shape == (96, 128, 4)


def test_post_stack_runs_stock_settings():
    from python_raytracer_tpu.models.default import default_settings

    st = default_settings()
    canvas = jnp.asarray(np.random.default_rng(2).uniform(0, 255, (st.height, st.width, 4)))
    img, iris_target = post.post_stack(canvas, st, iris=0.2)
    assert img.shape == (st.window_scaled[1], st.window_scaled[0], 4)
    assert np.isfinite(np.asarray(img)).all()
    assert np.isfinite(float(iris_target))
