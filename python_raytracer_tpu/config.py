"""Frozen, hashable engine configuration.

Reads the same ``mods/<mod>/config.cfg`` INI schema as the reference engine
(schema and defaults: reference ``data.py:14-68``, documented in
``README.md:25-73``) so existing scenes/configs are drop-in compatible, plus
TPU-specific fields the reference has no equivalent for (mesh axes, precision,
march step bounds).

Being a frozen dataclass the config is hashable, so it can be passed as a
static argument to ``jax.jit`` — all of its values are compile-time constants
inside kernels, exactly like the reference's module-global ``data.settings``
store was a de-facto constant per run.
"""

from __future__ import annotations

import configparser
import dataclasses
import math
import os
from typing import Tuple


def _or(value, default):
    """Reference fallback semantics: ``cfg.get(...) or default``.

    The reference applies ``or`` to every parsed setting (data.py:19-62), so an
    explicit 0 / false in the file falls back to the default. Replicated
    exactly for config-file compatibility.
    """
    return value or default


@dataclasses.dataclass(frozen=True)
class Settings:
    """All engine settings. Field names and defaults mirror reference data.py:19-62."""

    # --- WINDOW (reference data.py:19-24) ---
    width: int = 64
    height: int = 64
    scale: int = 1
    subsamples: float = 0.0
    smooth: float = 0.0
    fps: int = 0

    # --- RENDER (reference data.py:26-50) ---
    sync: bool = False
    culling: bool = False
    static: bool = False
    samples: int = 1
    shutter: float = 0.0
    spill: float = 0.0
    iris: float = 0.0
    iris_time: float = 0.0
    bloom: float = 0.0
    bloom_blur: float = 0.0
    fov: float = 90.0
    falloff: float = 0.0
    chunk_rate: int = 0
    chunk_size: int = 16
    chunk_lod: int = 0
    dof: float = 0.0
    dist_min: int = 0
    dist_max: int = 32
    max_light: float = 0.0
    max_bounces: float = 0.0
    lod_bounces: float = 0.0
    lod_samples: float = 0.0
    lod_random: float = 0.0
    lod_edge: float = 0.0
    threads: int = 1  # kept for config compat; TPU build shards rays instead

    # --- PHYSICS (reference data.py:52-62) ---
    gravity: float = 0.0
    friction: float = 0.0
    friction_air: float = 0.0
    speed_jump: float = 1.0
    speed_move: float = 1.0
    speed_mouse: float = 1.0
    min_velocity: float = 0.0
    max_velocity: float = 0.0
    max_pitch: int = 0
    max_roll: int = 0
    dist_move: int = 0

    # --- TPU build additions (no reference equivalent) ---
    # Upper bound on march loop iterations; the reference's while loop
    # (init.py:66) is bounded by life <= dist_max since every step advances
    # step by at least 1, so dist_max is a safe default.
    max_steps: int = 0
    # Enable reference-exact integer color rounding in the forward pass
    # (rgb.mix rounds at every blend, reference lib.py:393-395). Disable for
    # the smooth differentiable path.
    exact: bool = True

    # --- derived (reference data.py:64-68) ---
    @property
    def window(self) -> Tuple[int, int]:
        return (self.width, self.height)

    @property
    def window_scaled(self) -> Tuple[int, int]:
        return (self.width * self.scale, self.height * self.scale)

    @property
    def proportions(self) -> float:
        return ((self.width + self.height) / 2) / max(self.width, self.height)

    @property
    def chunk_time(self) -> float:
        return self.chunk_rate / 1000

    @property
    def chunk_radius(self) -> int:
        # round() = banker's rounding, same as the reference's round() call
        return round(self.chunk_size / 2)

    @property
    def lens(self) -> float:
        """Camera lens factor (reference init.py:17)."""
        return self.fov * math.pi / 8

    @property
    def march_steps(self) -> int:
        """Static bound for the march loop."""
        return self.max_steps if self.max_steps > 0 else self.dist_max

    def replace(self, **kw) -> "Settings":
        return dataclasses.replace(self, **kw)

    # --- loading ---
    @classmethod
    def from_cfg(cls, path: str) -> "Settings":
        """Load from a reference-format config.cfg (reference data.py:16-62)."""
        cfg = configparser.RawConfigParser()
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        cfg.read(path)

        def gi(sec, key, default):
            try:
                return _or(cfg.getint(sec, key), default)
            except (configparser.Error, ValueError):
                return default

        def gf(sec, key, default):
            try:
                return _or(cfg.getfloat(sec, key), default)
            except (configparser.Error, ValueError):
                return default

        def gb(sec, key, default):
            try:
                return _or(cfg.getboolean(sec, key), default)
            except (configparser.Error, ValueError):
                return default

        return cls(
            width=gi("WINDOW", "width", 64),
            height=gi("WINDOW", "height", 64),
            scale=gi("WINDOW", "scale", 1),
            subsamples=gf("WINDOW", "subsamples", 0),
            smooth=gf("WINDOW", "smooth", 0),
            fps=gi("WINDOW", "fps", 0),
            sync=gb("RENDER", "sync", False),
            culling=gb("RENDER", "culling", False),
            static=gb("RENDER", "static", False),
            samples=gi("RENDER", "samples", 1),
            shutter=gf("RENDER", "shutter", 0),
            spill=gf("RENDER", "spill", 0),
            iris=gf("RENDER", "iris", 0),
            iris_time=gf("RENDER", "iris_time", 0),
            bloom=gf("RENDER", "bloom", 0),
            bloom_blur=gf("RENDER", "bloom_blur", 0),
            fov=gf("RENDER", "fov", 90),
            falloff=gf("RENDER", "falloff", 0),
            chunk_rate=gi("RENDER", "chunk_rate", 0),
            chunk_size=gi("RENDER", "chunk_size", 16),
            chunk_lod=gi("RENDER", "chunk_lod", 0),
            dof=gf("RENDER", "dof", 0),
            dist_min=gi("RENDER", "dist_min", 0),
            dist_max=gi("RENDER", "dist_max", 32),
            max_light=gf("RENDER", "max_light", 0),
            max_bounces=gf("RENDER", "max_bounces", 0),
            lod_bounces=gf("RENDER", "lod_bounces", 0),
            lod_samples=gf("RENDER", "lod_samples", 0),
            lod_random=gf("RENDER", "lod_random", 0),
            lod_edge=gf("RENDER", "lod_edge", 0),
            threads=gi("RENDER", "threads", 1),
            gravity=gf("PHYSICS", "gravity", 0),
            friction=gf("PHYSICS", "friction", 0),
            friction_air=gf("PHYSICS", "friction_air", 0),
            speed_jump=gf("PHYSICS", "speed_jump", 1),
            speed_move=gf("PHYSICS", "speed_move", 1),
            speed_mouse=gf("PHYSICS", "speed_mouse", 1),
            min_velocity=gf("PHYSICS", "min_velocity", 0),
            max_velocity=gf("PHYSICS", "max_velocity", 0),
            max_pitch=gi("PHYSICS", "max_pitch", 0),
            max_roll=gi("PHYSICS", "max_roll", 0),
            dist_move=gi("PHYSICS", "dist_move", 0),
        )
