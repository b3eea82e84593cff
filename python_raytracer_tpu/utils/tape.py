"""Static-noise RNG tapes: reproduce the reference's per-pixel seeding.

With ``static = true`` the reference reseeds the Mersenne Twister per
(pixel, sample) — ``random.seed((1+x)*(1+y)*(1+sample))`` (reference
``init.py:136-137``) — so noise (DOF jitter, roughness scatter, LOD
randomization) is a fixed screen-space pattern instead of flickering per
frame. The TPU marcher consumes uniforms from a tape in the reference's
exact draw order (ops/march.py), so static mode = generate this tape once
per (resolution, samples) and replay it every frame.

Tape layout [H*W, samples, D] float64 (pixel index p = y*W + x):
  slot 0        — lod_random draw (always consumed, init.py:139)
  slots 1..2    — DOF jitter x/y (consumed only when dof != 0, lib.py:431)
  slots 3+      — 3 per hit on materials with authored roughness != 0

The same generator backs the bit-exact golden tests (tools/reference_oracle
records the identical streams from the live reference engine).
"""

from __future__ import annotations

import random

import numpy as np

from python_raytracer_tpu.config import Settings

# 3 raygen draws + 3 per hit; 24 recorded hits covers every terminating
# bounce budget the stock configs can produce (bounces cap at
# max_bounces + 1 with min nonzero absorption 0.25 -> <= 12 hits).
DEFAULT_MAX_DRAWS = 3 + 3 * 24


def make_static_tape(settings: Settings, max_draws: int = DEFAULT_MAX_DRAWS) -> np.ndarray:
    """Generate the static-mode tape for a full frame."""
    w, h, s_max = settings.width, settings.height, settings.samples
    tape = np.empty((h * w, s_max, max_draws), dtype=np.float64)
    for y in range(h):
        for x in range(w):
            for s in range(s_max):
                rng = random.Random((1 + x) * (1 + y) * (1 + s))
                tape[y * w + x, s] = [rng.random() for _ in range(max_draws)]
    return tape
