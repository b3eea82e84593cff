"""Frame voxel container semantics (SURVEY.md §4 item 2; reference
data.py:96-250): pack/unpack round-trip, resolution filtering, box scans."""

import numpy as np

from python_raytracer_tpu.scene.frame import Frame
from python_raytracer_tpu.scene.material import Material, MaterialRegistry


def _mat(**kw):
    return Material(albedo=(255, 0, 0), solidity=1, **kw)


def test_point_set_get():
    f = Frame()
    m = _mat()
    f.set_voxel((1, 2, 3), m, True)
    assert f.get_voxel((1, 2, 3)) is m
    assert f.get_voxel((1, 2, 4)) is None
    f.set_voxel((1, 2, 3), None, True)
    assert f.get_voxel((1, 2, 3)) is None


def test_pack_round_trip():
    """Greedy box compression must not change get_voxels (reference
    data.py:192-250 contract)."""
    rng = np.random.default_rng(0)
    m1, m2 = _mat(), _mat()
    f_packed = Frame(packed=True)
    f_plain = Frame(packed=False)
    voxels = {}
    # a solid slab plus random scatter of two materials
    for x in range(4):
        for y in range(3):
            for z in range(5):
                voxels[(x, y, z)] = m1
    for _ in range(30):
        p = tuple(int(v) for v in rng.integers(0, 8, 3))
        voxels[p] = m2 if rng.random() < 0.5 else m1
    f_packed.set_voxels(voxels, True)
    f_plain.set_voxels(voxels, True)
    assert len(f_packed.data6) > 0, "packing should produce boxes"
    got = f_packed.get_voxels()
    want = f_plain.get_voxels()
    assert got.keys() == want.keys()
    assert all(got[k] is want[k] for k in got)
    # point queries agree everywhere in the region
    for x in range(-1, 9):
        for y in range(-1, 9):
            for z in range(-1, 9):
                assert f_packed.get_voxel((x, y, z)) is f_plain.get_voxel((x, y, z))


def test_edit_after_pack_unpacks_box():
    m = _mat()
    f = Frame(packed=True)
    f.set_voxels({(x, 0, 0): m for x in range(6)}, True)
    assert f.data6
    f.set_voxel((3, 0, 0), None, True)
    assert f.get_voxel((3, 0, 0)) is None
    for x in [0, 1, 2, 4, 5]:
        assert f.get_voxel((x, 0, 0)) is m


def test_resolution_filtering():
    """Resolution r stores only positions divisible by r, queried via
    floor-division (reference data.py:136-175)."""
    m = _mat()
    f = Frame(resolution=2)
    f.set_voxels({(0, 0, 0): m, (2, 4, 6): m, (1, 0, 0): m, (3, 3, 3): m}, True)
    # (1,0,0) and (3,3,3) were filtered out
    assert f.get_voxel((0, 0, 0)) is m
    assert f.get_voxel((1, 1, 1)) is m  # //2 -> (0,0,0)
    assert f.get_voxel((2, 4, 6)) is m
    assert f.get_voxel((3, 5, 7)) is m
    assert f.get_voxel((4, 4, 6)) is None
    # get_voxels expands each stored cell to an r-cube (data.py:119-133)
    out = f.get_voxels()
    assert (1, 1, 1) in out and (3, 5, 7) in out and len(out) == 16


def test_to_dense_matches_get_voxel():
    rng = np.random.default_rng(1)
    reg = MaterialRegistry()
    mats = [_mat() for _ in range(3)]
    f = Frame(packed=True)
    vox = {}
    for _ in range(100):
        p = tuple(int(v) for v in rng.integers(0, 10, 3))
        vox[p] = mats[int(rng.integers(0, 3))]
    f.set_voxels(vox, True)
    dense = f.to_dense(reg, (10, 10, 10))
    for x in range(10):
        for y in range(10):
            for z in range(10):
                m = f.get_voxel((x, y, z))
                want = 0 if m is None else reg.register(m)
                assert dense[x, y, z] == want
