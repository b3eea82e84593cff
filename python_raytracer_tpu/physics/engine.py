"""Voxel physics: axis-ordered impulse resolution with slab collision tests.

Re-design of the reference physics engine (reference ``data.py:495-560``):
per velocity step, take the dominant unit direction of the remaining
velocity, build the 1-voxel-thick boundary slab in that direction, test every
other visible object whose AABB intersects it (velocity transfer on physical
objects by weight difference, stochastic per-voxel solidity rolls, pairwise
friction/elasticity accumulation), then either move one unit or dump that
axis's velocity; finally gravity, elasticity reflection, friction damping,
terminal-velocity clamp and minimum-velocity zeroing.

TPU-first difference: the reference tests the slab with a triple Python loop
calling ``Sprite.get_voxel`` per world cell per object pair
(data.py:532-542); here each object's active (frame, rotation) is cached as a
dense NumPy id grid once and slab tests are vectorized array ops. Solidity
rolls are drawn from an injectable RNG (``scene.physics_rng``; the reference
uses the global ``random`` module) so physics tests are deterministic
(SURVEY.md §4 item 5).
"""

from __future__ import annotations

import math
import random
from typing import Tuple

import numpy as np

from python_raytracer_tpu.scene.material import (
    NUM_PARAMS,
    PARAM_ELASTICITY,
    PARAM_FRICTION,
    PARAM_SOLIDITY,
)


def _dense_props(obj):
    """Cached ((X, Y, Z, 3) grid, local-coord offset) of (solidity, friction,
    elasticity) for the object's active frame at its 90-degree rotation step.

    Unlike the render grid, physics must cover content *outside* the sprite
    size: the Goxel import mirrors X as ``size.x - x`` (reference
    data.py:287), leaving a voxel plane at local x == size.x that the
    renderer's [mins, maxs) clip never reads but the reference's inclusive
    collision slabs and back-queries do (data.py:532-538). The grid therefore
    spans the frame's true content bounds; ``offset`` maps local coordinates
    to indices. Rotated reads go through pos_rotated, which only addresses
    in-size positions — matching the reference's remap."""
    spr = obj.get_sprite()
    rot_step = tuple(round(a / 90) % 4 for a in obj.rot)
    frame = spr.get_frame(None)
    key = (id(frame), rot_step, getattr(frame, "_version", 0))
    cache = getattr(spr, "_phys_cache", None)
    if cache is not None and cache[0] == key:
        return cache[1]

    voxels = frame.get_voxels()
    lo = [0, 0, 0]
    hi = [spr.size[0], spr.size[1], spr.size[2]]
    if not any(rot_step):
        for (x, y, z) in voxels:
            lo = [min(lo[0], x), min(lo[1], y), min(lo[2], z)]
            hi = [max(hi[0], x + 1), max(hi[1], y + 1), max(hi[2], z + 1)]
    shape = (hi[0] - lo[0], hi[1] - lo[1], hi[2] - lo[2])
    grid = np.zeros(shape + (3,), dtype=np.float64)
    if any(rot_step):
        rot_deg = tuple(a * 90 for a in rot_step)
        lookup = dict(voxels)
        for x in range(spr.size[0]):
            for y in range(spr.size[1]):
                for z in range(spr.size[2]):
                    mat = lookup.get(spr.pos_rotated((x, y, z), rot_deg))
                    if mat is not None:
                        grid[x, y, z] = (mat.solidity, mat.friction, mat.elasticity)
    else:
        for (x, y, z), mat in voxels.items():
            grid[x - lo[0], y - lo[1], z - lo[2]] = (mat.solidity, mat.friction, mat.elasticity)
    result = (grid, tuple(lo))
    spr._phys_cache = (key, result)
    return result


def _slab_props(obj, post6) -> np.ndarray:
    """(solidity, friction, elasticity) for each world cell of the inclusive
    slab box, zeros outside the object's content."""
    x0, y0, z0, x1, y1, z1 = post6
    shape = (x1 - x0 + 1, y1 - y0 + 1, z1 - z0 + 1)
    out = np.zeros(shape + (3,), dtype=np.float64)
    dense, off = _dense_props(obj)
    # World cell w maps to local cell w - obj.mins (reference data.py:536),
    # shifted by the dense grid's content offset.
    lo = [
        x0 - obj.mins[0] - off[0],
        y0 - obj.mins[1] - off[1],
        z0 - obj.mins[2] - off[2],
    ]
    src_lo = [max(0, l) for l in lo]
    src_hi = [min(dense.shape[i], lo[i] + shape[i]) for i in range(3)]
    if any(src_hi[i] <= src_lo[i] for i in range(3)):
        return out
    dst_lo = [src_lo[i] - lo[i] for i in range(3)]
    dst_hi = [dst_lo[i] + (src_hi[i] - src_lo[i]) for i in range(3)]
    out[dst_lo[0] : dst_hi[0], dst_lo[1] : dst_hi[1], dst_lo[2] : dst_hi[2]] = dense[
        src_lo[0] : src_hi[0], src_lo[1] : src_hi[1], src_lo[2] : src_hi[2]
    ]
    return out


def _cheb_dir(v) -> Tuple[int, int, int]:
    """trunc(chebyshev-normalize(v)): +-1 on dominant axes, 0 elsewhere
    (reference data.py:501 via lib.py:310-314)."""
    ref = max(abs(v[0]), abs(v[1]), abs(v[2]))
    if ref == 0:
        return (0, 0, 0)
    return (math.trunc(v[0] / ref), math.trunc(v[1] / ref), math.trunc(v[2] / ref))


def update_physics(obj, scene):
    """One physics tick for ``obj`` (reference data.py:495-560)."""
    settings = scene.settings
    rng = getattr(scene, "physics_rng", None) or random
    friction = 0.0
    elasticity = 0.0
    vel_apply = list(obj.vel)

    while vel_apply[0] or vel_apply[1] or vel_apply[2]:
        vel_dir = _cheb_dir(vel_apply)
        blocked = False

        # Boundary slab in the move direction, order -X,+X,-Y,+Y,-Z,+Z
        # (reference data.py:506-517).
        mins, maxs = obj.mins, obj.maxs
        if vel_dir[0] < 0:
            post6 = (mins[0] - 1, mins[1], mins[2], mins[0], maxs[1], maxs[2])
        elif vel_dir[0] > 0:
            post6 = (maxs[0], mins[1], mins[2], maxs[0] + 1, maxs[1], maxs[2])
        elif vel_dir[1] < 0:
            post6 = (mins[0], mins[1] - 1, mins[2], maxs[0], mins[1], maxs[2])
        elif vel_dir[1] > 0:
            post6 = (mins[0], maxs[1], mins[2], maxs[0], maxs[1] + 1, maxs[2])
        elif vel_dir[2] < 0:
            post6 = (mins[0], mins[1], mins[2] - 1, maxs[0], maxs[1], mins[2])
        else:
            post6 = (mins[0], mins[1], maxs[2], maxs[0], maxs[1], maxs[2] + 1)

        for other in list(scene.objects.values()):
            if other is obj or not other.visible:
                continue
            if not other.intersects(post6[:3], post6[3:]):
                continue

            # Velocity transfer between physical objects by weight difference
            # and projectile speed (reference data.py:523-527).
            if other.physics:
                amax = max(abs(v) for v in vel_apply)
                fac = max(0.0, min(1.0, amax * obj.weight - other.weight))
                transfer = tuple(v * fac for v in vel_apply)
                other.vel = tuple(a + b for a, b in zip(other.vel, transfer))
                obj.vel = tuple(a - b for a, b in zip(obj.vel, transfer))
                vel_apply = [a - b for a, b in zip(vel_apply, transfer)]

            # Vectorized slab solidity test (reference data.py:531-542): both
            # the other object's voxel and our voxel one step behind must pass
            # a stochastic solidity roll; passing pairs accumulate friction
            # and elasticity and block the move.
            other_props = _slab_props(other, post6)
            self_post6 = (
                post6[0] - vel_dir[0], post6[1] - vel_dir[1], post6[2] - vel_dir[2],
                post6[3] - vel_dir[0], post6[4] - vel_dir[1], post6[5] - vel_dir[2],
            )
            self_props = _slab_props(obj, self_post6)
            o_sol = other_props[..., 0]
            s_sol = self_props[..., 0]
            cand = o_sol > 0
            if not cand.any():
                continue
            rolls_o = np.array([rng.random() for _ in range(int(cand.sum()))])
            pass_o = np.zeros_like(cand)
            pass_o[cand] = o_sol[cand] > rolls_o
            cand2 = pass_o & (s_sol >= 0)  # self voxel may be empty (solidity 0 fails roll)
            rolls_s = np.array([rng.random() for _ in range(int(pass_o.sum()))])
            pass_s = np.zeros_like(cand)
            pass_s[pass_o] = s_sol[pass_o] > rolls_s
            contact = pass_o & pass_s
            if contact.any():
                # Sequential accumulation in the reference's x,y,z voxel
                # order with each term scaled before adding
                # (data.py:540-541) — a vectorized .sum() uses pairwise
                # summation whose rounding diverges from the reference by
                # ULPs, which breaks bit-exact physics trajectories.
                m = contact.ravel()
                ff = (other_props[..., 1] * self_props[..., 1]).ravel()[m]
                ee = (other_props[..., 2] * self_props[..., 2]).ravel()[m]
                for a, b in zip(ff, ee):
                    friction += float(a) * settings.friction
                    elasticity += float(b) * settings.friction
                blocked = True

        # Move at most one unit, or dump this direction's velocity when
        # blocked (reference data.py:545-548).
        if blocked:
            vel_step = tuple(d * abs(v) for d, v in zip(vel_dir, vel_apply))
        else:
            vel_step = tuple(d * min(abs(v), 1.0) for d, v in zip(vel_dir, vel_apply))
        vel_apply = [a - b for a, b in zip(vel_apply, vel_step)]
        if not blocked:
            obj.move(tuple(p + s for p, s in zip(obj.pos, vel_step)))

    # Global velocity effects (reference data.py:551-560).
    vx, vy, vz = obj.vel
    vy -= obj.weight * settings.gravity
    vx -= vx * elasticity
    vy -= vy * elasticity
    vz -= vz * elasticity
    damp = 1 + max(0.0, friction + settings.friction_air)
    vx, vy, vz = vx / damp, vy / damp, vz / damp
    mv = settings.max_velocity
    vx = max(-mv, min(mv, vx))
    vy = max(-mv, min(mv, vy))
    vz = max(-mv, min(mv, vz))
    if abs(vx) < settings.min_velocity:
        vx = 0.0
    if abs(vy) < settings.min_velocity:
        vy = 0.0
    if abs(vz) < settings.min_velocity:
        vz = 0.0
    obj.vel = (vx, vy, vz)
