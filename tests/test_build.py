import numpy as np

from octree_pathtracing_tpu.octree import (
    build_from_dense,
    build_octree,
    expand_by,
    octree_to_gpu_words,
    gpu_words_to_pool,
)


def query_pool(tree, x, y, z):
    """Read one voxel from the pool by walking down from the root (test helper)."""
    node = tree.root
    for level in range(tree.depth - 1, -1, -1):
        slot = ((x >> level) & 1) | (((y >> level) & 1) << 1) | (((z >> level) & 1) << 2)
        mask = int(tree.child_mask[node])
        if not (mask >> slot) & 1:
            return 0
        value = int(tree.child_data[node, slot])
        if (mask >> (slot + 8)) & 1:
            return value  # leaf (possibly a coarse LOD leaf)
        node = value
    raise AssertionError("walked past leaf depth without finding a leaf")


def test_single_voxel():
    tree = build_octree(np.array([[3, 1, 2]]), np.array([7]), depth=2)
    assert query_pool(tree, 3, 1, 2) == 7
    assert query_pool(tree, 0, 0, 0) == 0
    assert query_pool(tree, 3, 1, 3) == 0


def test_dense_roundtrip_random():
    rng = np.random.default_rng(2)
    for d in (1, 2, 3):
        s = 1 << d
        grid = rng.integers(0, 3, size=(s, s, s)).astype(np.uint32)
        tree = build_from_dense(grid)
        for x in range(s):
            for y in range(s):
                for z in range(s):
                    assert query_pool(tree, x, y, z) == grid[x, y, z], (x, y, z)


def test_lod_compaction_uniform_region():
    # A fully-uniform 8-voxel block must collapse to a single coarse leaf
    # (new_octree.rs:228-233 is_compactable)
    s = 4
    grid = np.zeros((s, s, s), np.uint32)
    grid[0:2, 0:2, 0:2] = 5
    tree = build_from_dense(grid)
    # pool should contain exactly 2 nodes: the root and one level-1 octant is
    # NOT needed — the uniform 2x2x2 block is one leaf at depth 1.
    assert tree.n_nodes == 1
    assert query_pool(tree, 0, 0, 0) == 5
    assert query_pool(tree, 1, 1, 1) == 5
    assert query_pool(tree, 2, 2, 2) == 0


def test_uniform_world_root():
    grid = np.full((4, 4, 4), 9, np.uint32)
    tree = build_from_dense(grid)
    # all-leaf root octant with 8 identical children (new_octree.rs:481-492)
    assert tree.n_nodes == 1
    assert int(tree.child_mask[tree.root]) == 0xFFFF
    assert query_pool(tree, 3, 3, 3) == 9


def test_empty_world():
    tree = build_from_dense(np.zeros((4, 4, 4), np.uint32))
    assert query_pool(tree, 1, 2, 3) == 0


def test_gpu_words_roundtrip():
    rng = np.random.default_rng(3)
    grid = rng.integers(0, 4, size=(8, 8, 8)).astype(np.uint32)
    tree = build_from_dense(grid)
    words = octree_to_gpu_words(tree)
    assert words.shape == (tree.n_nodes, 12)
    mask, data = gpu_words_to_pool(words)
    np.testing.assert_array_equal(mask, np.asarray(tree.child_mask))
    np.testing.assert_array_equal(data, np.asarray(tree.child_data))
    # WGSL decode invariants (svo.wgsl:298-299)
    headers = np.zeros((words.shape[0], 8), np.uint32)
    headers[:, 0::2] = words[:, 0:4] & 0xFFFF
    headers[:, 1::2] = words[:, 0:4] >> 16
    for i in range(words.shape[0]):
        for s in range(8):
            is_child = (headers[i, s] & 255) != 0
            is_leaf = headers[i, s] == 0xFFFF
            assert is_child == bool((int(tree.child_mask[i]) >> s) & 1)
            assert is_leaf == bool((int(tree.child_mask[i]) >> (s + 8)) & 1)


def test_expand_by():
    tree = build_octree(np.array([[1, 1, 1]]), np.array([4]), depth=1)
    big = expand_by(tree, 2)
    assert big.depth == 3
    assert query_pool(big, 1, 1, 1) == 4
    assert query_pool(big, 5, 1, 1) == 0


def test_duplicate_coords_last_wins():
    tree = build_octree(
        np.array([[0, 0, 0], [0, 0, 0]]), np.array([1, 2]), depth=1
    )
    assert query_pool(tree, 0, 0, 0) == 2
