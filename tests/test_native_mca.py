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


def test_native_biome_parity():
    """Protocol v2: the C++ parser must emit the same per-section biome
    palettes and unpacked 4x4x4 cell indices as the numpy path — both the
    whole-section single-palette form and the packed multi-biome form."""
    from octree_pathtracing_tpu.models.native import parse_region_native

    rng = np.random.default_rng(5)
    idx = rng.integers(0, 3, 4096).astype(np.uint16)
    pal = ["minecraft:air", "minecraft:stone", "minecraft:dirt"]
    b_idx = rng.integers(0, 3, 64).astype(np.uint16)
    b_pal = ["minecraft:plains", "minecraft:desert", "minecraft:badlands"]
    chunks = {
        (0, 0): {0: (pal, idx, (b_pal, b_idx))},  # packed multi-biome
        (1, 0): {1: (pal, idx, "minecraft:plains")},  # single-palette
        (2, 0): {2: (pal, idx)},  # no biome tag
    }
    buf = make_region_fixture(chunks)
    nat = sorted(parse_region_native(buf), key=lambda s: s.chunk_x)
    ref = sorted(parse_region_bytes(buf), key=lambda s: s.chunk_x)
    assert len(nat) == len(ref) == 3
    for a, b in zip(nat, ref):
        assert a.biome_palette == b.biome_palette
        if b.biome_indices is None:
            assert a.biome_indices is None
        else:
            np.testing.assert_array_equal(a.biome_indices, b.biome_indices)
    # the multi-biome section round-trips the exact cells
    np.testing.assert_array_equal(nat[0].biome_indices, b_idx)
    assert nat[1].biome_palette == ["minecraft:plains"]
    assert nat[2].biome_palette is None
