"""The default test scene (reference ``mods/default``).

Content lives in mod format at ``mods/default/init.py`` (13 materials
covering the full property space, the 128x64x128 castle, six physics-enabled
material cubes, the player camera object — matching the reference scene
values exactly for golden comparisons); this module is the programmatic
entry used by tests, bench and the driver, loading it through the mod API
so the reference-compatible content pipeline is exercised end-to-end.
"""

from __future__ import annotations

import os
from typing import Optional

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.modapi import default_mods_root, load_mod
from python_raytracer_tpu.scene import Scene

DEFAULT_VOXELS = os.path.join(default_mods_root(), "default", "voxels")
DEFAULT_CONFIG = os.path.join(default_mods_root(), "default", "config.cfg")


def default_settings() -> Settings:
    return Settings.from_cfg(DEFAULT_CONFIG)


def build_default_scene(settings: Optional[Settings] = None) -> Scene:
    """Build the default scene (optionally with overridden settings)."""
    return load_mod("default", settings=settings)
