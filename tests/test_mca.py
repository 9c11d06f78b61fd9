"""Minecraft region ingestion: NBT codec, packed indices, .mca -> octree."""

import numpy as np
import pytest

from octree_pathtracing_tpu.models.nbt import read_nbt, write_nbt
from octree_pathtracing_tpu.models.mca import (
    build_region_octree,
    make_region_fixture,
    parse_region_bytes,
    unpack_block_indices,
)
from tests.test_build import query_pool


def test_nbt_roundtrip():
    root = {
        "name": "hello",
        "num": 42,
        "big": 2**40,
        "pi": 3.5,
        "arr": np.arange(5, dtype=np.int64),
        "ints": np.arange(3, dtype=np.int32),
        "nested": {"a": 1, "list": [{"x": 1}, {"x": 2}]},
    }
    buf = write_nbt(root)
    back = read_nbt(buf)
    assert back["name"] == "hello"
    assert back["num"] == 42
    assert back["big"] == 2**40
    assert back["pi"] == 3.5
    np.testing.assert_array_equal(back["arr"], root["arr"])
    np.testing.assert_array_equal(back["ints"], root["ints"])
    assert back["nested"]["list"][1]["x"] == 2


def test_packed_indices_roundtrip():
    rng = np.random.default_rng(0)
    for psize in (2, 5, 16, 17, 200):
        bits = max(4, int(np.ceil(np.log2(max(psize, 2)))))
        per_long = 64 // bits
        indices = rng.integers(0, psize, 4096).astype(np.uint64)
        n_longs = (4096 + per_long - 1) // per_long
        longs = np.zeros(n_longs, np.uint64)
        idx = np.arange(4096)
        np.bitwise_or.at(
            longs, idx // per_long, indices << ((idx % per_long) * bits).astype(np.uint64)
        )
        out = unpack_block_indices(longs.astype(np.int64), psize)
        np.testing.assert_array_equal(out, indices.astype(np.uint16))


def _fixture_region():
    # chunk (0,0): section y=0 with a stone floor layer (ly=0) + one glowstone
    indices = np.zeros(4096, np.uint16)
    # YZX order: i = (ly*16 + lz)*16 + lx
    for lz in range(16):
        for lx in range(16):
            indices[lz * 16 + lx] = 1  # ly=0 floor of stone
    indices[(3 * 16 + 5) * 16 + 7] = 2  # glowstone at (7, 3, 5)
    palette = ["minecraft:air", "minecraft:stone", "minecraft:glowstone"]
    # chunk (1, 0): section y=-4 (window bottom) full of dirt
    full_dirt = np.ones(4096, np.uint16)
    return make_region_fixture(
        {
            (0, 0): {0: (palette, indices)},
            (1, 0): {-4: (["minecraft:air", "minecraft:dirt"], full_dirt)},
        }
    )


def test_parse_region_sections():
    buf = _fixture_region()
    secs = parse_region_bytes(buf)
    assert len(secs) == 2
    by_chunk = {(s.chunk_x, s.chunk_z): s for s in secs}
    s00 = by_chunk[(0, 0)]
    assert s00.y_pos == 4  # y=0 shifted by +4
    assert s00.palette[1] == "minecraft:stone"
    s10 = by_chunk[(1, 0)]
    assert s10.y_pos == 0


def test_region_to_octree_voxels():
    buf = _fixture_region()
    tree, bmap = build_region_octree(buf, use_native=False)
    assert tree is not None
    assert tree.depth == 9
    stone = bmap["minecraft:stone"]
    glow = bmap["minecraft:glowstone"]
    dirt = bmap["minecraft:dirt"]
    # chunk (0,0), section y_pos=4: floor voxel (0, 64, 0) .. (15, 64, 15)
    assert query_pool(tree, 0, 64, 0) == stone
    assert query_pool(tree, 15, 64, 15) == stone
    assert query_pool(tree, 7, 64 + 3, 5) == glow
    assert query_pool(tree, 0, 65, 0) == 0
    # chunk (1,0) at x in [16,32): dirt fills section 0 (y 0..15)
    assert query_pool(tree, 16, 0, 0) == dirt
    assert query_pool(tree, 31, 15, 15) == dirt
    assert query_pool(tree, 16, 16, 0) == 0


def test_region_scene_renders():
    import tempfile, os
    from octree_pathtracing_tpu.models.blockpalette import minecraft_scene_from_region
    from octree_pathtracing_tpu.render.preview import preview_image

    buf = _fixture_region()
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "r.0.0.mca")
        with open(p, "wb") as f:
            f.write(buf)
        scene, cam = minecraft_scene_from_region(p)
    img = np.asarray(preview_image(scene, cam, 32, 24))
    assert np.isfinite(img).all()
    assert img.std() > 0.01
