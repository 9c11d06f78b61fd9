"""Multi-region world stitching."""

import os

import numpy as np

from octree_pathtracing_tpu.models.mca import load_world, make_region_fixture
from tests.test_build import query_pool


def test_two_region_stitch(tmp_path):
    # region (0,0): stone at chunk (0,0) section 0 (y_pos 4) voxel (0,64,0)
    ind_a = np.zeros(4096, np.uint16)
    ind_a[0] = 1  # lx=0, lz=0, ly=0
    buf_a = make_region_fixture({(0, 0): {0: (["minecraft:air", "minecraft:stone"], ind_a)}})
    # region (1,0): dirt at the same local spot -> world x offset 512
    ind_b = np.zeros(4096, np.uint16)
    ind_b[0] = 1
    buf_b = make_region_fixture({(0, 0): {0: (["minecraft:air", "minecraft:dirt"], ind_b)}})

    d = tmp_path / "region"
    d.mkdir()
    (d / "r.0.0.mca").write_bytes(buf_a)
    (d / "r.1.0.mca").write_bytes(buf_b)

    tree, bmap = load_world(str(tmp_path), use_native=False)
    assert tree is not None
    assert tree.depth == 10  # spans 1024 on x
    stone = bmap["minecraft:stone"]
    dirt = bmap["minecraft:dirt"]
    assert query_pool(tree, 0, 64, 0) == stone
    assert query_pool(tree, 512, 64, 0) == dirt
    assert query_pool(tree, 100, 64, 0) == 0
