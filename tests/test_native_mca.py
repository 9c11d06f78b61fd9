"""Native C++ .mca parser parity with the numpy reference parser."""

import numpy as np
import pytest

from octree_pathtracing_tpu.models.mca import make_region_fixture, parse_region_bytes


def _have_native():
    try:
        from octree_pathtracing_tpu.models.native import get_lib

        get_lib()
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _have_native(), reason="no native toolchain")


def test_native_matches_python():
    from octree_pathtracing_tpu.models.native import parse_region_native

    rng = np.random.default_rng(0)
    palette = ["minecraft:air", "minecraft:stone", "minecraft:dirt",
               "minecraft:oak_log#axis=y", "minecraft:glowstone"]
    chunks = {}
    for (cx, cz) in [(0, 0), (3, 1), (31, 31)]:
        secs = {}
        for y in (-4, 0, 7, 19):
            indices = rng.integers(0, len(palette), 4096).astype(np.uint16)
            secs[y] = (palette, indices)
        chunks[(cx, cz)] = secs
    buf = make_region_fixture(chunks)

    py = parse_region_bytes(buf)
    nat = parse_region_native(buf)
    assert len(py) == len(nat) == 12

    key = lambda s: (s.chunk_x, s.chunk_z, s.y_pos)
    py.sort(key=key)
    nat.sort(key=key)
    for a, b in zip(py, nat):
        assert key(a) == key(b)
        assert a.palette == b.palette
        np.testing.assert_array_equal(a.indices, b.indices)


def test_native_out_of_window_sections_dropped():
    from octree_pathtracing_tpu.models.native import parse_region_native

    indices = np.ones(4096, np.uint16)
    buf = make_region_fixture(
        {(0, 0): {-4: (["minecraft:air", "minecraft:stone"], indices),
                  20: (["minecraft:air", "minecraft:stone"], indices)}}
    )
    nat = parse_region_native(buf)
    assert len(nat) == 1
    assert nat[0].y_pos == 0
