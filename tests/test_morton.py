import numpy as np

from octree_pathtracing_tpu.octree import (
    encode_morton,
    decode_morton,
    morton_order_dense,
)


def test_roundtrip_random():
    rng = np.random.default_rng(0)
    xyz = rng.integers(0, 1 << 21, size=(10_000, 3)).astype(np.uint64)
    codes = encode_morton(xyz[:, 0], xyz[:, 1], xyz[:, 2])
    x, y, z = decode_morton(codes)
    np.testing.assert_array_equal(x, xyz[:, 0])
    np.testing.assert_array_equal(y, xyz[:, 1])
    np.testing.assert_array_equal(z, xyz[:, 2])


def test_bit_layout():
    # child slot within an octant is x | y<<1 | z<<2 (new_octree.rs:753-755)
    assert int(encode_morton(1, 0, 0)) == 1
    assert int(encode_morton(0, 1, 0)) == 2
    assert int(encode_morton(0, 0, 1)) == 4
    assert int(encode_morton(2, 0, 0)) == 8


def test_order_is_monotone_in_interleave():
    # exhaustive small sweep matches the LUT-equivalence intent of
    # new_octree.rs:875-884 (section-range equivalence)
    for x in range(16):
        for y in range(16):
            for z in range(16):
                c = int(encode_morton(x, y, z))
                ref = 0
                for b in range(4):
                    ref |= ((x >> b) & 1) << (3 * b)
                    ref |= ((y >> b) & 1) << (3 * b + 1)
                    ref |= ((z >> b) & 1) << (3 * b + 2)
                assert c == ref


def test_morton_order_dense_matches_codes():
    rng = np.random.default_rng(1)
    for d in (1, 2, 3, 4):
        s = 1 << d
        grid = rng.integers(0, 100, size=(s, s, s)).astype(np.uint32)
        flat = morton_order_dense(grid)
        xs, ys, zs = np.meshgrid(np.arange(s), np.arange(s), np.arange(s), indexing="ij")
        codes = encode_morton(xs.ravel(), ys.ravel(), zs.ravel())
        expect = np.zeros(s**3, np.uint32)
        expect[codes.astype(np.int64)] = grid.ravel()
        np.testing.assert_array_equal(flat, expect)
