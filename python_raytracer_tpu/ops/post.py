"""Camera post-effects stack as differentiable JAX image ops.

Re-designs the reference's Pygame surface pipeline (reference
``init.py:208-253``) as float-domain array transforms over RGBA images in
[0, 255]. Each op documents the pygame semantics it replaces; integer
saturating blends become float clamps (validated against real pygame output
in tests/test_post.py), which also makes the whole stack differentiable —
gradients can flow from a post-processed frame back into material parameters.

Stack order per frame (reference init.py:208-253):
  shutter motion-blur accumulate -> spill -> iris -> bloom -> subsample ->
  window scale (sharp / smooth / hybrid).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from python_raytracer_tpu.config import Settings


def alpha_over(dst: jnp.ndarray, src: jnp.ndarray) -> jnp.ndarray:
    """SRCALPHA blit of src over dst (reference init.py:188 draw_tile).

    The alpha channel carries the motion-blur weight: ray energy + shutter
    maps to opacity, so bright pixels overwrite faster and dim pixels leave
    trails (reference init.py:125, 141).
    """
    a = src[..., 3:4] / 255.0
    rgb = src[..., :3] * a + dst[..., :3] * (1 - a)
    # pygame's alpha blitter copies src verbatim onto fully-transparent
    # destination pixels (anti-halo special case; matters for the first
    # frame on the cleared canvas) — verified against pygame in tests.
    rgb = jnp.where(dst[..., 3:4] == 0, src[..., :3], rgb)
    alpha = src[..., 3:4] + dst[..., 3:4] * (1 - a)
    return jnp.concatenate([rgb, jnp.minimum(255.0, alpha)], axis=-1)


def average_color(img: jnp.ndarray) -> jnp.ndarray:
    """Mean RGBA (pygame.transform.average_color with consider_alpha,
    reference init.py:211)."""
    return img.reshape(-1, img.shape[-1]).mean(axis=0)


def spill(img: jnp.ndarray, amount: float) -> jnp.ndarray:
    """Color spill: multiply the canvas with its average color, lifted by
    1 - amount (reference init.py:209-215, BLEND_RGBA_MULT fill)."""
    color = average_color(img)
    fac = 255.0 - jnp.round(amount * 255.0)
    tint = jnp.minimum(255.0, color + fac)
    return img * tint / 255.0


def grayscale(rgb: jnp.ndarray) -> jnp.ndarray:
    """Luma grayscale (pygame.transform.grayscale weights)."""
    w = jnp.array([0.299, 0.587, 0.114], rgb.dtype)
    return jnp.tensordot(rgb[..., :3], w, axes=1)


def iris_adapt(img: jnp.ndarray, iris: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Iris adaptation: brighten or darken in contrast to luminosity
    (reference init.py:217-228).

    iris > 0 adds a scaled grayscale copy; iris < 0 subtracts a scaled
    inverted grayscale copy. Returns (image, iris_target) where the target
    feeds the exponential iris state in the runtime
    (``1 - 2 * max(avg rgb) / 255``, init.py:228).
    """
    fac = jnp.abs(iris)
    gray = grayscale(img)[..., None]
    brighten = jnp.minimum(255.0, img + gray * fac)
    darken = jnp.maximum(0.0, img - (255.0 - gray) * fac)
    out = jnp.where(iris > 0, brighten, jnp.where(iris < 0, darken, img))
    avg = average_color(img)
    iris_target = 1.0 - (jnp.max(avg[:3]) / 255.0) * 2.0
    return out, iris_target


def _resize(img: jnp.ndarray, shape: Tuple[int, int], smooth: bool) -> jnp.ndarray:
    """(H, W) resize of an (H, W, C) image; smooth = bilinear+antialias
    (pygame smoothscale), else nearest (pygame scale)."""
    out_shape = (shape[0], shape[1], img.shape[-1])
    if smooth:
        return jax.image.resize(img, out_shape, method="linear", antialias=True)
    return jax.image.resize(img, out_shape, method="nearest")


def bloom(img: jnp.ndarray, amount: float, blur: float) -> jnp.ndarray:
    """Bloom: darken a copy by 1 - amount, box-blur it by downscale+upscale,
    add it back (reference init.py:230-238)."""
    h, w = img.shape[0], img.shape[1]
    box = (max(1, round(h / max(1.0, blur))), max(1, round(w / max(1.0, blur))))
    fac = jnp.round((1.0 - amount) * 255.0)
    # BLEND_RGBA_SUB with an RGB color: darken RGB, leave alpha (init.py:235)
    dark = jnp.concatenate(
        [jnp.maximum(0.0, img[..., :3] - fac), img[..., 3:]], axis=-1
    )
    blurred = _resize(_resize(dark, box, True), (h, w), True)
    return jnp.minimum(255.0, img + blurred)


def subsample(img: jnp.ndarray, amount: float) -> jnp.ndarray:
    """Subsampling: smooth-upscale by 1 + amount to create extra pixels
    (reference init.py:240-243)."""
    h, w = img.shape[0], img.shape[1]
    fac = 1.0 + amount
    return _resize(img, (round(h * fac), round(w * fac)), True)


def window_scale(img: jnp.ndarray, window_scaled: Tuple[int, int], smooth: float) -> jnp.ndarray:
    """Final scale to the window: smooth==0 sharp, ==1 smooth, else sharp
    by trunc(1/smooth) then smooth (reference init.py:245-253)."""
    wsw, wsh = window_scaled  # reference window tuples are (w, h)
    target = (wsh, wsw)
    if smooth == 0:
        return _resize(img, target, False)
    if smooth == 1:
        return _resize(img, target, True)
    fac = int(1.0 / smooth)
    h, w = img.shape[0], img.shape[1]
    sharp = _resize(img, (h * fac, w * fac), False)
    return _resize(sharp, target, True)


def post_stack(
    canvas: jnp.ndarray,
    settings: Settings,
    iris: jnp.ndarray | float = 0.0,
    scale_to_window: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full per-frame post pipeline (reference init.py:208-253).

    Args:
      canvas: [H, W, 4] accumulated frame (after alpha_over of the new
        render when shutter motion blur is on).
      iris: current iris state (runtime-integrated, init.py:463).

    Returns (final image, iris_target).
    """
    img = canvas
    iris_arr = jnp.asarray(iris, img.dtype)
    if settings.spill:
        img = spill(img, settings.spill)
    iris_target = jnp.asarray(0.0, img.dtype)
    if settings.iris and settings.iris_time:
        img, iris_target = iris_adapt(img, iris_arr)
    if settings.bloom and settings.bloom_blur:
        img = bloom(img, settings.bloom, settings.bloom_blur)
    if settings.subsamples:
        img = subsample(img, settings.subsamples)
    if scale_to_window:
        img = window_scale(img, settings.window_scaled, settings.smooth)
    return img, iris_target
