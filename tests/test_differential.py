"""Randomized differential test vs the live reference engine
(tools/differential.py): random materials/voxels/rotations, bit-exact."""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.path.exists("/root/reference/init.py"),
                    reason="reference not mounted")
@pytest.mark.parametrize("seed", [0, 7, 11])
def test_random_scene_matches_reference(seed):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    cwd = os.getcwd()
    try:
        from differential import run_seed

        r = run_seed(seed)
        assert r["mismatched"] == 0, r
    finally:
        os.chdir(cwd)
