"""Lane-for-lane validation of the JAX wavefront traversal vs the scalar oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octree_pathtracing_tpu.octree import build_from_dense, traverse_oracle
from octree_pathtracing_tpu.ops import traverse


def random_scene(rng, depth, fill=0.12):
    s = 1 << depth
    grid = (rng.random((s, s, s)) < fill).astype(np.uint32) * rng.integers(
        1, 10, size=(s, s, s)
    ).astype(np.uint32)
    return grid, build_from_dense(grid)


def random_rays(rng, s, n):
    origins = rng.uniform(-s, 2 * s, size=(n, 3))
    targets = rng.uniform(0, s, size=(n, 3))
    d = targets - origins
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return origins.astype(np.float32), d.astype(np.float32)


@pytest.mark.parametrize("depth", [2, 3, 4])
def test_matches_oracle(depth):
    rng = np.random.default_rng(7 + depth)
    grid, tree = random_scene(rng, depth)
    s = 1 << depth
    origins, dirs = random_rays(rng, s, 256)

    res = jax.jit(
        lambda o, d: traverse(
            jnp.asarray(tree.child_mask),
            jnp.asarray(tree.child_data),
            tree.root,
            tree.scale(),
            o,
            d,
        )
    )(origins, dirs)
    res = jax.tree.map(np.asarray, res)

    mismatches = 0
    for i in range(origins.shape[0]):
        o = traverse_oracle(
            tree.child_mask, tree.child_data, tree.root, tree.scale(), origins[i], dirs[i]
        )
        if bool(res.hit[i]) != o.hit:
            mismatches += 1
            continue
        if o.hit:
            assert res.leaf_value[i] == o.leaf_value, i
            assert res.face_id[i] == o.face_id, (i, res.face_id[i], o.face_id)
            np.testing.assert_allclose(
                res.t[i] * tree.scale(), o.t, rtol=1e-5, atol=1e-6
            )
            np.testing.assert_allclose(res.uv[i, 0], o.u, rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(res.uv[i, 1], o.v, rtol=1e-4, atol=1e-4)
    assert mismatches == 0, mismatches


def test_accept_fn_skips_leaves():
    s = 4
    grid = np.zeros((s, s, s), np.uint32)
    grid[:, :, 1] = 1
    grid[:, :, 3] = 2
    tree = build_from_dense(grid)
    origins = np.array([[1.5, 1.5, -2.0]], np.float32)
    dirs = np.array([[0.0, 0.0, 1.0]], np.float32)

    def reject_ones(leaf, face, uv, t, voxel_pos, voxel_size, fresh=None):
        return leaf != 1

    res = traverse(
        jnp.asarray(tree.child_mask),
        jnp.asarray(tree.child_data),
        tree.root,
        tree.scale(),
        jnp.asarray(origins),
        jnp.asarray(dirs),
        accept_fn=reject_ones,
    )
    assert bool(res.hit[0])
    assert int(res.leaf_value[0]) == 2


def test_world_space_outputs():
    # single voxel at (2,1,3) in an 8^3 world; axis-aligned ray hits West face
    s = 8
    grid = np.zeros((s, s, s), np.uint32)
    grid[2, 1, 3] = 5
    tree = build_from_dense(grid)
    origins = np.array([[-3.0, 1.5, 3.5]], np.float32)
    dirs = np.array([[1.0, 0.0, 0.0]], np.float32)
    res = traverse(
        jnp.asarray(tree.child_mask),
        jnp.asarray(tree.child_data),
        tree.root,
        tree.scale(),
        jnp.asarray(origins),
        jnp.asarray(dirs),
    )
    assert bool(res.hit[0])
    assert int(res.face_id[0]) == 0  # West (+x travel hits -x face)
    np.testing.assert_allclose(float(res.t[0]), 5.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res.voxel_pos[0]), [2, 1, 3], atol=1e-4)
    np.testing.assert_allclose(float(res.voxel_size[0]), 1.0, rtol=1e-6)
    # uv within the face
    assert 0.0 <= float(res.uv[0, 0]) <= 1.0
    assert 0.0 <= float(res.uv[0, 1]) <= 1.0


# (test_two_level_matches_single_level retired in r4 with the two-level
# machinery itself — the experiment's evidence lives in tools/PERF_NOTES.md.)
