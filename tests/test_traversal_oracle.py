"""Validate the scalar ESVO oracle against a brute-force voxel DDA.

Property (SURVEY.md §4): traversal hit == brute-force voxel marching hit on
randomized octrees and rays — same leaf value, same entry t (within float32
tolerance), consistent entry face.
"""

import numpy as np
import pytest

from octree_pathtracing_tpu.octree import build_from_dense, traverse_oracle


def dda_first_hit(grid, origin, direction, max_dst=1024.0):
    """Amanatides–Woo voxel march in world units (voxel = unit cube).

    Returns (hit, t_entry, voxel, face_axis, face_sign) of the first nonzero
    voxel with entry t > 0.
    """
    s = grid.shape[0]
    o = np.asarray(origin, np.float64)
    d = np.asarray(direction, np.float64)
    d = d / np.linalg.norm(d)

    # entry into the [0, s]^3 box
    t0, t1 = -np.inf, np.inf
    for i in range(3):
        if abs(d[i]) < 1e-12:
            if o[i] < 0 or o[i] >= s:
                return False, None, None, None, None
            continue
        ta = (0 - o[i]) / d[i]
        tb = (s - o[i]) / d[i]
        t0 = max(t0, min(ta, tb))
        t1 = min(t1, max(ta, tb))
    if t1 <= max(t0, 0.0):
        return False, None, None, None, None
    t_start = max(t0, 0.0) + 1e-9
    p = o + d * t_start
    ijk = np.clip(np.floor(p).astype(int), 0, s - 1)

    step = np.where(d > 0, 1, -1)
    inv = np.where(np.abs(d) < 1e-12, np.inf, 1.0 / np.where(d == 0, 1, d))
    t_next = np.empty(3)
    for i in range(3):
        if abs(d[i]) < 1e-12:
            t_next[i] = np.inf
        else:
            boundary = ijk[i] + (1 if d[i] > 0 else 0)
            t_next[i] = (boundary - o[i]) * inv[i]
    t_cur = t_start
    entry_axis, entry_sign = -1, 0
    for i in range(3):  # which axis did we enter the box through
        pass

    for _ in range(4 * s + 10):
        if np.all((0 <= ijk) & (ijk < s)):
            if grid[tuple(ijk)] != 0 and t_cur > 0:
                # recompute exact entry t for this voxel
                te = -np.inf
                ax = -1
                for i in range(3):
                    if abs(d[i]) < 1e-12:
                        continue
                    lo = ijk[i] if d[i] > 0 else ijk[i] + 1
                    t_face = (lo - o[i]) * inv[i]
                    if t_face > te:
                        te = t_face
                        ax = i
                if te > max_dst:
                    return False, None, None, None, None
                if te > 0:  # a voxel containing the origin is not a surface hit
                    sign = 1 if d[ax] < 0 else 0
                    return True, te, tuple(ijk), ax, sign
        else:
            return False, None, None, None, None
        axis = int(np.argmin(t_next))
        t_cur = t_next[axis]
        if t_cur > max_dst:
            return False, None, None, None, None
        ijk[axis] += step[axis]
        t_next[axis] += abs(inv[axis])
    return False, None, None, None, None


@pytest.mark.parametrize("depth", [2, 3, 4])
def test_oracle_matches_dda(depth):
    rng = np.random.default_rng(42 + depth)
    s = 1 << depth
    grid = (rng.random((s, s, s)) < 0.12).astype(np.uint32) * rng.integers(
        1, 10, size=(s, s, s)
    ).astype(np.uint32)
    tree = build_from_dense(grid)
    scale = tree.scale()

    n_rays, disagreements = 200, 0
    for _ in range(n_rays):
        origin = rng.uniform(-s, 2 * s, size=3)
        target = rng.uniform(0, s, size=3)
        d = target - origin
        d = d / np.linalg.norm(d)
        hit = traverse_oracle(
            tree.child_mask, tree.child_data, tree.root, scale, origin, d
        )
        bhit, bt, bvox, bax, bsign = dda_first_hit(grid, origin, d)
        if hit.hit != bool(bhit):
            disagreements += 1
            continue
        if hit.hit:
            t_world = hit.t / scale
            assert abs(t_world - bt) < 1e-2, (t_world, bt, origin, d)
            # hit voxel's value must match (LOD leaves report the region value)
            assert hit.leaf_value == grid[bvox], (hit.leaf_value, grid[bvox])
            assert hit.face_id == (bax << 1) | bsign, (hit.face_id, bax, bsign)
            assert -1e-3 <= hit.u <= 1 + 1e-3 and -1e-3 <= hit.v <= 1 + 1e-3
    # allow a tiny number of boundary-epsilon disagreements
    assert disagreements <= 2, disagreements


def test_oracle_reject_leaves_skips_through():
    # a wall of value 1 in front of a wall of value 2: rejecting 1 must hit 2
    s = 4
    grid = np.zeros((s, s, s), np.uint32)
    grid[:, :, 1] = 1
    grid[:, :, 3] = 2
    tree = build_from_dense(grid)
    scale = tree.scale()
    origin = np.array([1.5, 1.5, -2.0])
    d = np.array([0.0, 0.0, 1.0])
    h1 = traverse_oracle(tree.child_mask, tree.child_data, tree.root, scale, origin, d)
    assert h1.hit and h1.leaf_value == 1
    h2 = traverse_oracle(
        tree.child_mask, tree.child_data, tree.root, scale, origin, d, reject_leaves={1}
    )
    assert h2.hit and h2.leaf_value == 2
    assert h2.t > h1.t


def test_oracle_miss_empty():
    tree = build_from_dense(np.zeros((4, 4, 4), np.uint32))
    h = traverse_oracle(
        tree.child_mask,
        tree.child_data,
        tree.root,
        tree.scale(),
        np.array([-1.0, 2.0, 2.0]),
        np.array([1.0, 0.0, 0.0]),
    )
    assert not h.hit
