"""Sprite semantics: Goxel import transform, 90-degree rotations, dense
compilation (SURVEY.md §4 item 2; reference data.py:253-427)."""

import gzip
import os

import numpy as np
import pytest

from python_raytracer_tpu.scene.frame import Frame
from python_raytracer_tpu.scene.material import Material, MaterialRegistry
from python_raytracer_tpu.scene.sprite import Sprite


def _mat():
    return Material(albedo=(1, 2, 3), solidity=1)


def test_even_size_forcing(capsys):
    spr = Sprite(size=(5, 4, 7), frames=1)
    assert spr.size == (6, 4, 8)
    assert "Warning" in capsys.readouterr().out


def test_goxel_import_transform(tmp_path):
    """post = (size.x - x, z, y): X mirrored, Y/Z swapped (reference
    data.py:287)."""
    m = _mat()
    path = tmp_path / "model.txt"
    path.write_text("# Goxel test\n1 2 3 ff0000\n0 0 0 ff0000\n9 9 9 00ff00\n")
    spr = Sprite(size=(4, 4, 4), frames=1)
    spr.load([str(path)], {"ff0000": m})
    f = spr.get_frame(0)
    assert f.get_voxel((4 - 1, 3, 2)) is m
    assert f.get_voxel((4, 0, 0)) is m  # (0,0,0) -> (size.x - 0, 0, 0)
    # 00ff00 not in materials dict -> skipped
    assert len(f.get_voxels()) == 2


def test_goxel_import_gz(tmp_path):
    m = _mat()
    path = tmp_path / "model.txt.gz"
    with gzip.open(path, "wt") as fh:
        fh.write("2 1 0 aabbcc\n")
    spr = Sprite(size=(6, 6, 6), frames=1)
    spr.load([str(path)], {"aabbcc": m})
    assert spr.get_frame(0).get_voxel((4, 0, 1)) is m


@pytest.mark.parametrize("axis", [0, 1, 2])
@pytest.mark.parametrize("steps", [1, 2, 3])
def test_pos_rotated_is_permutation(axis, steps):
    """Each 90-degree rotation is a bijection on the cube (reference
    data.py:338-371)."""
    spr = Sprite(size=(4, 4, 4), frames=1)
    rot = [0, 0, 0]
    rot[axis] = steps * 90
    seen = set()
    for x in range(4):
        for y in range(4):
            for z in range(4):
                p = spr.pos_rotated((x, y, z), tuple(rot))
                assert all(0 <= c < 4 for c in p)
                seen.add(p)
    assert len(seen) == 64


def test_to_dense_matches_pos_rotated():
    """Dense rotated grids must agree with per-voxel rotated reads for every
    90-degree rotation combination (the renderer's contract,
    reference init.py:421)."""
    rng = np.random.default_rng(0)
    reg = MaterialRegistry()
    mats = [_mat() for _ in range(4)]
    spr = Sprite(size=(4, 4, 4), frames=1)
    vox = {}
    for _ in range(40):
        p = tuple(int(v) for v in rng.integers(0, 4, 3))
        vox[p] = mats[int(rng.integers(0, 4))]
    spr.get_frame(0).set_voxels(vox, True)
    for ax in range(4):
        for ay in range(4):
            for az in range(4):
                rot = (ax * 90, ay * 90, az * 90)
                dense = spr.to_dense(reg, 0, rot)
                for x in range(4):
                    for y in range(4):
                        for z in range(4):
                            m = spr.get_voxel(0, (x, y, z), rot)
                            want = 0 if m is None else reg.register(m)
                            assert dense[x, y, z] == want, (rot, (x, y, z))


def test_rotation_disabled_for_unequal_axes():
    spr = Sprite(size=(4, 6, 8), frames=1)
    # no pair of perpendicular axes equal -> all rotations are identity
    assert spr.pos_rotated((1, 2, 3), (90, 90, 90)) == (1, 2, 3)


def test_anim_state_machine():
    spr = Sprite(size=(2, 2, 2), frames=4)
    spr.anim_set(1, 3, 0.1)  # 100ms per frame
    spr.anim_update(0)
    assert spr.frame == 1
    spr.anim_update(150)
    assert spr.frame == 2
    spr.anim_update(350)
    assert spr.frame == 1 + (3 % 3)  # wraps over range length 3


def test_mix_overlay():
    """Sprite.mix overlays same-size sprites; None never erases; only the
    overlapping frame range is mixed (reference data.py:311-321)."""
    a_mat, b_mat = _mat(), Material(albedo=(9, 9, 9), solidity=1)
    a = Sprite(size=(4, 4, 4), frames=2)
    b = Sprite(size=(4, 4, 4), frames=3)
    a.set_voxel(0, (1, 1, 1), a_mat, True)
    a.set_voxel(1, (2, 2, 2), a_mat, True)
    b.set_voxel(0, (1, 1, 1), b_mat, True)   # overlaps a's voxel
    b.set_voxel(0, (3, 3, 3), b_mat, True)   # empty in a
    b.set_voxel(2, (0, 0, 0), b_mat, True)   # frame beyond a's range

    a.mix(b, force=True)
    assert a.get_voxel(0, (1, 1, 1), (0, 0, 0)) is b_mat   # force overwrites
    assert a.get_voxel(0, (3, 3, 3), (0, 0, 0)) is b_mat   # fills empties
    assert a.get_voxel(1, (2, 2, 2), (0, 0, 0)) is a_mat   # b frame 1 empty: kept
    assert len(a.frames) == 2                              # no frame added

    # force=False keeps existing voxels
    c = Sprite(size=(4, 4, 4), frames=1)
    c.set_voxel(0, (1, 1, 1), a_mat, True)
    c.mix(b, force=False)
    assert c.get_voxel(0, (1, 1, 1), (0, 0, 0)) is a_mat
    assert c.get_voxel(0, (3, 3, 3), (0, 0, 0)) is b_mat


def test_mix_size_mismatch_warns(capsys):
    a = Sprite(size=(4, 4, 4), frames=1)
    b = Sprite(size=(4, 4, 6), frames=1)
    b.set_voxel(0, (1, 1, 1), _mat(), True)
    a.mix(b, force=True)
    assert "Can't mix sprites of uneven size" in capsys.readouterr().out
    assert a.get_voxel(0, (1, 1, 1), (0, 0, 0)) is None
