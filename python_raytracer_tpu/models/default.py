"""Programmatic builder for the default test scene.

Reconstructs the reference's default mod scene (reference
``mods/default/init.py:6-217``): 13 materials exercising the full property
space (marble/rough stones, near-mirror metal, emissive light, subsurface
scatter, glass, shiny, volumetric mist), the 128x64x128 castle, six 12^3
physics-enabled material cubes, and the player object with camera offset
(12, 4). Material parameter values and object placements match the reference
scene so golden-image comparisons are apples-to-apples.
"""

from __future__ import annotations

import os
from typing import Optional

from python_raytracer_tpu.config import Settings
from python_raytracer_tpu.scene import Material, Object, Scene, Sprite, rgb

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_VOXELS = os.path.join(_HERE, "mods", "default", "voxels")
DEFAULT_CONFIG = os.path.join(_HERE, "mods", "default", "config.cfg")


def default_settings() -> Settings:
    return Settings.from_cfg(DEFAULT_CONFIG)


def build_default_scene(settings: Optional[Settings] = None, voxel_dir: Optional[str] = None) -> Scene:
    """Build the default scene into a fresh Scene and return it."""
    voxel_dir = voxel_dir or DEFAULT_VOXELS
    scene = Scene(settings or default_settings())
    with scene:
        mat_stone_marble = Material(
            function="pbr", albedo=rgb(255, 255, 255), roughness=0, absorption=1, ior=1,
            energy=0, solidity=1, weight=0.0025, friction=0.125, elasticity=0,
        )
        mat_stone_light = Material(
            function="pbr", albedo=rgb(191, 191, 191), roughness=0.5, absorption=1, ior=1,
            energy=0, solidity=1, weight=0.0025, friction=0.25, elasticity=0,
        )
        mat_stone_gray = Material(
            function="pbr", albedo=rgb(127, 127, 127), roughness=0.5, absorption=1.5, ior=1,
            energy=0, solidity=1, weight=0.0025, friction=0.375, elasticity=0,
        )
        mat_stone_dark = Material(
            function="pbr", albedo=rgb(63, 63, 63), roughness=0.5, absorption=2, ior=1,
            energy=0, solidity=1, weight=0.0025, friction=0.5, elasticity=0,
        )
        mat_metal = Material(
            function="pbr", albedo=rgb(0, 0, 0), roughness=0.1, absorption=0.5, ior=1,
            energy=0, solidity=1, weight=0.0025, friction=0.125, elasticity=0,
        )
        mat_material = Material(
            function="pbr", albedo=rgb(127, 127, 127), roughness=0.25, absorption=1, ior=1,
            energy=0, solidity=1, weight=0.0005, friction=0.5, elasticity=0,
        )
        mat_material_rough = Material(
            function="pbr", albedo=rgb(255, 0, 0), roughness=0.5, absorption=1, ior=1,
            energy=0, solidity=1, weight=0.0005, friction=1, elasticity=0.25,
        )
        mat_material_light = Material(
            function="pbr", albedo=rgb(255, 255, 0), roughness=0.5, absorption=1, ior=1,
            energy=2, solidity=1, weight=0.00025, friction=0.5, elasticity=0.25,
        )
        mat_material_scatter = Material(
            function="pbr", albedo=rgb(0, 255, 0), roughness=0.25, absorption=0.5, ior=0.5,
            energy=0, solidity=1, weight=0.0005, friction=1, elasticity=0.5,
        )
        mat_material_glass = Material(
            function="pbr", albedo=rgb(0, 255, 255), roughness=0, absorption=0.25, ior=0.25,
            energy=0, solidity=1, weight=0.00125, friction=0, elasticity=0,
        )
        mat_material_shiny = Material(
            function="pbr", albedo=rgb(0, 0, 255), roughness=0, absorption=1, ior=1,
            energy=0, solidity=1, weight=0.00125, friction=0.25, elasticity=0,
        )
        mat_material_mist = Material(
            function="pbr", albedo=rgb(255, 0, 255), roughness=0, absorption=0.25, ior=0,
            energy=0, solidity=1, weight=0.00025, friction=0, elasticity=1,
        )
        mat_player = Material(
            function="pbr", albedo=rgb(127, 127, 127), roughness=0.5, absorption=1, ior=1,
            energy=0, solidity=1, weight=0.0005, friction=0.1, elasticity=0.5,
        )

        def vox(name):
            return os.path.join(voxel_dir, name)

        castle_spr = Sprite(size=(128, 64, 128), frames=1, lod=0)
        castle_spr.load(
            [vox("castle.txt.gz")],
            {
                "000000": mat_metal,
                "3f3f3f": mat_stone_dark,
                "7f7f7f": mat_stone_gray,
                "bfbfbf": mat_stone_light,
                "ffffff": mat_stone_marble,
            },
        )
        castle_obj = Object(pos=(0, 0, 0), rot=(0, 0, 0), vel=(0, 0, 0), physics=False)
        castle_obj.set_sprite(castle_spr)

        cubes = [
            (mat_material_rough, (-56, -16, 56)),
            (mat_material_light, (12, -24, 24)),
            (mat_material_scatter, (48, -24, -48)),
            (mat_material_glass, (-4, 18, 16)),
            (mat_material_shiny, (-56, 18, 16)),
            (mat_material_mist, (-36, 18, -36)),
        ]
        for accent, pos in cubes:
            spr = Sprite(size=(12, 12, 12), frames=1, lod=0)
            spr.load([vox("material.txt.gz")], {"7f7f7f": mat_material, "ffffff": accent})
            obj = Object(pos=pos, rot=(0, 0, 0), vel=(0, 0, 0), physics=True)
            obj.set_sprite(spr)

        player_spr = Sprite(size=(12, 16, 12), frames=1, lod=0)
        player_spr.load([vox("player.txt.gz")], {"7f7f7f": mat_player})
        player_obj = Object(pos=(-12, 0, -8), rot=(0, 0, 0), vel=(0, 0, 0), physics=True)
        player_obj.set_sprite(player_spr)
        player_obj.set_camera((12, 4))

        scene.player = player_obj
        scene.background = "sky"
    return scene
