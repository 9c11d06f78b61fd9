"""Host-side leaf enumeration over a packed node pool.

Vectorized top-down sweep (one numpy pass per level, no per-node Python):
used at scene-build time to derive tables keyed by leaf voxels — e.g. the
emissive-leaf table for ``EmitterSampling.ONE`` (the reference declares the
strategy but never implements it, ``/root/reference/src/scene/mod.rs:39-57``;
``src/ray/path_tracer.rs:217-221`` is a ``todo!()``-shaped stub).

Child slot convention matches the Morton builders (``octree/morton.py``):
slot = x | y<<1 | z<<2 within the parent's cell.
"""

from __future__ import annotations

import numpy as np


def enumerate_leaves(child_mask, child_data, root: int, depth: int):
    """All leaf cells of the tree, including LOD-collapsed ones.

    Returns ``(pos (M, 3) int64, size (M,) int64, value (M,) uint32)`` where
    ``pos`` is the cell's min corner in voxel units ``[0, 2**depth)`` and
    ``size`` its side length (1 for bottom-level leaves, larger for collapsed
    octants).
    """
    mask = np.asarray(child_mask, np.uint32)
    data = np.asarray(child_data, np.uint32)
    slots = np.arange(8, dtype=np.uint32)
    off = np.stack([slots & 1, (slots >> 1) & 1, (slots >> 2) & 1], axis=1).astype(
        np.int64
    )  # (8, 3)

    nodes = np.array([root], np.int64)
    pos = np.zeros((1, 3), np.int64)
    size = np.int64(1 << depth)

    out_pos, out_size, out_val = [], [], []
    for _level in range(depth):
        half = size >> 1
        m = mask[nodes]  # (F,)
        present = ((m[:, None] >> slots) & 1) != 0  # (F, 8)
        leaf = ((m[:, None] >> (slots + 8)) & 1) != 0
        cpos = pos[:, None, :] + off[None, :, :] * half  # (F, 8, 3)
        vals = data[nodes]  # (F, 8)

        is_leaf = present & leaf
        if is_leaf.any():
            out_pos.append(cpos[is_leaf])
            out_size.append(np.full(int(is_leaf.sum()), half, np.int64))
            out_val.append(vals[is_leaf])

        is_int = present & ~leaf
        nodes = vals[is_int].astype(np.int64)
        pos = cpos[is_int]
        size = half
        if nodes.size == 0:
            break

    if not out_pos:
        return (
            np.zeros((0, 3), np.int64),
            np.zeros((0,), np.int64),
            np.zeros((0,), np.uint32),
        )
    return (
        np.concatenate(out_pos),
        np.concatenate(out_size),
        np.concatenate(out_val),
    )
