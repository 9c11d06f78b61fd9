"""Vectorized SVO builders: sparse voxels / dense grids -> compacted node pool.

The reference builds octrees two ways: a bottom-up streaming section builder
(``/root/reference/src/octree/new_octree.rs:616-710``) and a top-down
Morton-prefix region builder (``new_octree.rs:501-594``), both applying the
same LOD compaction rule (``new_octree.rs:228-233``): an octant collapses to a
single leaf iff all 8 slots are leaves holding the same value, and to Empty
iff it has no children.

On TPU hosts we replace per-voxel recursion with one vectorized bottom-up
level reduction over Morton-sorted voxels: each level groups codes by
``code >> 3``, scatters the <=8 children of each group into ``(G, 8)`` arrays,
applies the compaction predicate as a masked reduction, and appends surviving
octants to the pool.  O(levels) numpy passes, no Python per-voxel loops.
"""

from __future__ import annotations

import numpy as np

from .morton import encode_morton, morton_order_dense
from .node_pool import Octree

_EMPTY, _LEAF, _OCTANT = 0, 1, 2


def build_octree(coords: np.ndarray, values: np.ndarray, depth: int) -> Octree:
    """Build a compacted SVO from sparse voxels.

    Args:
      coords: ``(M, 3)`` integer voxel coordinates in ``[0, 2**depth)``.
      values: ``(M,)`` nonzero uint32 leaf values (0 = air is dropped).
      depth: octree depth (voxel grid side = ``2**depth``), <= 21.

    Duplicate coordinates keep the last-written value (matching dict-insert
    order semantics of the reference's Morton scatter,
    ``new_octree.rs:734-745``).
    """
    coords = np.asarray(coords, dtype=np.int64)
    values = np.asarray(values, dtype=np.uint32)
    keep = values != 0
    coords, values = coords[keep], values[keep]
    codes = encode_morton(coords[:, 0], coords[:, 1], coords[:, 2])
    return build_octree_from_codes(codes, values, depth)


def build_octree_from_codes(
    codes: np.ndarray, values: np.ndarray, depth: int, presorted: bool = False
) -> Octree:
    """Build from precomputed Morton codes (last write wins on duplicates).

    ``presorted=True`` skips the sort (dense-grid flattening emits codes in
    Morton order already) — on bandwidth-poor hosts the sort dominates.
    """
    codes = np.asarray(codes, dtype=np.uint64)
    values = np.asarray(values, dtype=np.uint32)
    if codes.size == 0:
        # Degenerate empty world: a root with no children; traversal misses.
        return Octree(
            child_mask=np.zeros((1,), np.uint32),
            child_data=np.zeros((1, 8), np.uint32),
            root=0,
            depth=depth,
        )
    if not presorted:
        order = np.argsort(codes, kind="stable")
        codes, values = codes[order], values[order]
        # Deduplicate, keeping the last occurrence of each code.
        last = np.ones(codes.shape[0], dtype=bool)
        last[:-1] = codes[:-1] != codes[1:]
        codes, values = codes[last], values[last]

    masks: list[np.ndarray] = []
    datas: list[np.ndarray] = []
    pool_size = 0

    types = np.full(codes.shape[0], _LEAF, dtype=np.uint8)
    vals = values
    for _level in range(depth, 0, -1):
        parent = codes >> np.uint64(3)
        slot = (codes & np.uint64(7)).astype(np.int64)
        # group boundaries on the (sorted) parent stream — O(n), avoids
        # np.unique's internal re-sort which dominates on slow hosts
        if parent.shape[0] == 1:
            start = np.zeros(1, np.int64)
        else:
            start = np.concatenate(
                [np.zeros(1, np.int64), np.flatnonzero(parent[1:] != parent[:-1]) + 1]
            )
        uniq = parent[start]
        g = uniq.shape[0]
        group_id = np.repeat(
            np.arange(g, dtype=np.int64), np.diff(np.append(start, codes.shape[0]))
        )
        data8 = np.zeros((g, 8), dtype=np.uint32)
        type8 = np.zeros((g, 8), dtype=np.uint8)
        data8[group_id, slot] = vals
        type8[group_id, slot] = types

        all_leaf = np.all(type8 == _LEAF, axis=1)
        all_equal = np.all(data8 == data8[:, :1], axis=1)
        collapse = all_leaf & all_equal  # new_octree.rs:228-233

        kept = ~collapse
        kept_ids = pool_size + np.cumsum(kept) - 1  # pool index per kept group

        k_mask = (
            np.sum((type8[kept] != _EMPTY).astype(np.uint32) << np.arange(8, dtype=np.uint32), axis=1)
            | np.sum(
                (type8[kept] == _LEAF).astype(np.uint32) << (np.arange(8, dtype=np.uint32) + 8),
                axis=1,
            )
        ).astype(np.uint32)
        masks.append(k_mask)
        datas.append(data8[kept])
        pool_size += int(kept.sum())

        codes = uniq
        vals = np.where(collapse, data8[:, 0], kept_ids.astype(np.uint32)).astype(np.uint32)
        types = np.where(collapse, np.uint8(_LEAF), np.uint8(_OCTANT))

    # After the loop there is exactly one level-0 entry: the root.
    assert codes.shape[0] == 1
    if types[0] == _OCTANT:
        root = int(vals[0])
    else:
        # Whole world is one value: emit the reference's all-leaf root octant
        # (new_octree.rs:481-492).
        masks.append(np.array([0xFFFF], dtype=np.uint32))
        datas.append(np.full((1, 8), vals[0], dtype=np.uint32))
        root = pool_size
        pool_size += 1

    return Octree(
        child_mask=np.concatenate(masks) if masks else np.zeros((1,), np.uint32),
        child_data=np.concatenate(datas) if datas else np.zeros((1, 8), np.uint32),
        root=root,
        depth=depth,
    )


def build_from_dense(grid: np.ndarray, depth: int | None = None) -> Octree:
    """Build from a dense ``(S, S, S)`` uint32 grid indexed ``[x, y, z]``."""
    grid = np.asarray(grid, dtype=np.uint32)
    s = grid.shape[0]
    d = int(s).bit_length() - 1
    assert (1 << d) == s, "grid side must be a power of two"
    if depth is None:
        depth = d
    assert depth == d
    mvals = morton_order_dense(grid)
    codes = np.flatnonzero(mvals).astype(np.uint64)
    # Morton-order flattening emits codes already sorted and unique
    return build_octree_from_codes(codes, mvals[codes], depth, presorted=True)


def expand_by(tree: Octree, extra_depth: int) -> Octree:
    """Wrap the root in ``extra_depth`` new roots, old tree at child slot 0.

    Semantics of ``new_octree.rs:55-65`` (``expand_by``): each wrap doubles the
    world size; existing content lands in the low corner octant.
    """
    mask = np.asarray(tree.child_mask, np.uint32)
    data = np.asarray(tree.child_data, np.uint32)
    root = tree.root
    for _ in range(extra_depth):
        new_mask = np.concatenate([mask, np.array([0x01], np.uint32)])  # slot 0, interior
        new_row = np.zeros((1, 8), np.uint32)
        new_row[0, 0] = root
        data = np.concatenate([data, new_row])
        root = mask.shape[0]
        mask = new_mask
    return Octree(mask, data, root, tree.depth + extra_depth)
