"""Checkpoint / resume of the differentiable and dynamic engine state.

The reference has no save/load at all — config is read-only at boot and the
closest thing to persistence is the gzip Goxel import (SURVEY.md §5.4). The
TPU build checkpoints everything needed to resume a training run or a live
session:

* the differentiable state: material parameter table (+ optimizer state when
  given),
* the dynamic scene state: full-res world id grid, per-object pose/velocity,
* camera pose, iris state, RNG key, frame index.

Uses Orbax (sharding-aware, async-capable) for the array pytree and JSON for
the object/host state. Goxel text export is also provided so edited voxel
content round-trips with the reference's import format (reference
data.py:271-289; coordinates are un-mirrored back to Goxel's Z-up space).
"""

from __future__ import annotations

import gzip
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from python_raytracer_tpu.scene.sprite import Sprite


def save_checkpoint(path: str, engine, opt_state=None, extra: Optional[Dict[str, Any]] = None):
    """Write a checkpoint directory for an Engine (runtime/engine.py)."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    arrays = engine.compiled.arrays
    tree = {
        "material_table": arrays.material_table,
        "world_ids": engine._world_dev,
        "traversed": engine._traversed,
        "canvas": engine.canvas,
        "rng_key": engine._key,
    }
    if opt_state is not None:
        tree["opt_state"] = opt_state
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, "arrays"), tree, force=True)

    objects = {}
    for oid, obj in engine.scene.objects.items():
        objects[str(oid)] = {
            "pos": list(obj.pos),
            "rot": list(obj.rot),
            "vel": list(obj.vel),
            "visible": obj.visible,
            "redraw": obj.redraw,
            "frame": obj.sprite.frame if obj.sprite else 0,
        }
    host = {
        "objects": objects,
        "iris": engine.iris,
        "iris_target": engine.iris_target,
        "timer": engine.timer,
        "ticks_ms": engine.ticks_ms,
        "lens": engine.lens,
        "frame_index": engine.frame_index,
        "extra": extra or {},
    }
    with open(os.path.join(path, "host.json"), "w") as fh:
        json.dump(host, fh)


def restore_checkpoint(path: str, engine, opt_state=None):
    """Restore a checkpoint into an Engine built from the same scene/mod.

    Returns the restored opt_state (or None). Object identity is matched by
    registry order — the scene must be rebuilt from the same mod first.
    """
    import dataclasses

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(os.path.join(path, "arrays"))
    with open(os.path.join(path, "host.json")) as fh:
        host = json.load(fh)

    engine.compiled.arrays = dataclasses.replace(
        engine.compiled.arrays, material_table=jax.numpy.asarray(tree["material_table"])
    )
    engine._world_dev = jax.numpy.asarray(tree["world_ids"])
    engine._traversed = jax.numpy.asarray(tree["traversed"])
    engine.canvas = jax.numpy.asarray(tree["canvas"])
    engine._key = jax.numpy.asarray(tree["rng_key"])
    engine.iris = host["iris"]
    engine.iris_target = host["iris_target"]
    engine.timer = host["timer"]
    engine.ticks_ms = host["ticks_ms"]
    engine.lens = host["lens"]
    engine.frame_index = host["frame_index"]

    saved_objects = list(host["objects"].values())
    for obj, saved in zip(engine.scene.objects.values(), saved_objects):
        obj.pos = tuple(saved["pos"])
        obj.rot = tuple(saved["rot"])
        obj.vel = tuple(saved["vel"])
        obj.visible = saved["visible"]
        obj.redraw = saved["redraw"]
        if obj.sprite:
            obj.sprite.frame = saved["frame"]
        obj._update_bounds()
        obj.set_camera_pos()
    engine._rebake()
    return tree.get("opt_state", opt_state)


def export_goxel(sprite: Sprite, path: str, id_to_hex: Optional[Dict[int, str]] = None,
                 frame: Optional[int] = None):
    """Export a sprite frame to Goxel text ("X Y Z RRGGBB"), inverting the
    engine's import transform (reference data.py:287: import does
    ``post = size.x - x, z, y``; export emits ``size.x - x, z, y`` again —
    the transform is an involution on (x, z<->y))."""
    lines = ["# Goxel export (python_raytracer_tpu)", "# One line per voxel", "# X Y Z RRGGBB"]
    mat_hex: Dict[int, str] = {}
    for (x, y, z), mat in sprite.get_frame(frame).get_voxels().items():
        key = id(mat)
        if key not in mat_hex:
            r, g, b = (int(c) for c in mat.albedo)
            mat_hex[key] = f"{r:02x}{g:02x}{b:02x}"
        gx = sprite.size[0] - x
        lines.append(f"{gx} {z} {y} {mat_hex[key]}")
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wt") as fh:
        fh.write("\n".join(lines) + "\n")
