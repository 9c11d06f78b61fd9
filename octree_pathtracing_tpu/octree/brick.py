"""Brick-leaf octree: internal SVO over 4^3-voxel brick rows.

TPU gathers are row-rate-bound (~10 ns/row regardless of row width up to
256 B — ``tools/PERF_NOTES.md``), so the per-step 32 B node row of the plain
ESVO loop wastes ~87% of every gather. This layout collapses the bottom two
octree levels into 64-voxel **bricks** stored as ``(NB, 64) uint32`` rows —
exactly the free 256 B row width: entering a brick costs ONE gather, after
which the ray DDA-marches up to 10 cells entirely on the VPU
(``ops/brick_traversal.py``).

Semantically equivalent to the plain pool (same voxel grid, same LOD
compaction above brick scale): ``brickify`` converts a built ``Octree``
(``octree/build.py``) and traversal parity is tested lane-for-lane.

Layout:
- ``child_mask/child_data``: the internal pool, format identical to
  ``node_pool.Octree`` (levels ``0..depth-3`` of the original tree).
- Brick pointers are leaf words with ``BRICK_BIT`` (bit 29) set; the low 29
  bits index ``bricks``. Ordinary leaf values must stay below 2^29.
- ``bricks[b, x + 4*y + 16*z]`` = voxel material/model id (0 = air), with
  (x, y, z) the unmirrored in-brick cell coordinate.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from .node_pool import Octree

BRICK_BIT = np.uint32(1 << 29)
BRICK_ID_MASK = np.uint32(BRICK_BIT - 1)

_SLOTS = np.arange(8, dtype=np.uint32)


@dataclasses.dataclass
class BrickOctree:
    """Internal node pool + brick table. Duck-compatible with ``Octree``
    (same ``child_mask/child_data/root/depth/scale()``); traversal must use
    ``ops.brick_traversal.traverse_brick``."""

    child_mask: Any  # (N,) uint32 — internal tree, brick leaves flagged
    child_data: Any  # (N, 8) uint32
    bricks: Any  # (NB, 64) uint32
    root: int
    depth: int  # depth of the VOXEL grid (brick leaves sit at depth-2)

    def scale(self) -> float:
        return float(2.0 ** (-self.depth))

    @property
    def n_nodes(self) -> int:
        return int(self.child_mask.shape[0])

    def tree_flatten(self):
        return (self.child_mask, self.child_data, self.bricks), (self.root, self.depth)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], ch[1], ch[2], aux[0], aux[1])


try:
    import jax.tree_util as _jtu

    _jtu.register_pytree_node(
        BrickOctree,
        BrickOctree.tree_flatten,
        lambda aux, ch: BrickOctree.tree_unflatten(aux, ch),
    )
except Exception:  # pragma: no cover
    pass


def _node_levels(mask: np.ndarray, data: np.ndarray, root: int, depth: int):
    """BFS level of every pool node (-1 = unreachable)."""
    n = mask.shape[0]
    level = np.full(n, -1, dtype=np.int32)
    level[root] = 0
    frontier = np.array([root], dtype=np.int64)
    for lv in range(depth):
        if frontier.size == 0:
            break
        m = mask[frontier]
        present = ((m[:, None] >> _SLOTS[None, :]) & 1) != 0
        leaf = ((m[:, None] >> (_SLOTS[None, :] + 8)) & 1) != 0
        internal = present & ~leaf
        nxt = data[frontier][internal].astype(np.int64)
        level[nxt] = lv + 1
        frontier = nxt
    return level


# (slot, subslot) -> brick cell index x + 4y + 16z, with slot/subslot octant
# bits (x | y<<1 | z<<2) per node_pool.py's child-slot convention.
def _cell_table() -> np.ndarray:
    s = np.arange(8)[:, None]
    q = np.arange(8)[None, :]
    x = ((s & 1) << 1) | (q & 1)
    y = (s & 2) | ((q >> 1) & 1)
    z = ((s >> 2) & 1) << 1 | ((q >> 2) & 1)
    return (x + 4 * y + 16 * z).astype(np.int64)  # (8, 8)


_CELLS = _cell_table()


def debrickify(bt: BrickOctree) -> Octree:
    """Reconstruct the plain pool the brick kernel *effectively* traverses.

    Bricks are exploded exactly: every non-air brick cell becomes a 1-voxel
    leaf (no re-compaction), so plain-ESVO traversal of the result is
    lane-for-lane identical to ``traverse_brick`` on ``bt`` — including
    origin-inside-solid rays.  Used to hand brick scenes to consumers of the
    plain layout (the NumPy oracle, the fused megakernel).
    """
    mask = np.asarray(bt.child_mask, dtype=np.uint32)
    data = np.asarray(bt.child_data, dtype=np.uint32)
    bricks = np.asarray(bt.bricks, dtype=np.uint32)
    n = mask.shape[0]

    present = ((mask[:, None] >> _SLOTS[None, :]) & 1) != 0
    leaf = ((mask[:, None] >> (_SLOTS[None, :] + 8)) & 1) != 0
    is_brick = present & leaf & ((data & BRICK_BIT) != 0)

    # referenced brick ids, in slot-major order of appearance
    bids = (data[is_brick] & BRICK_ID_MASK).astype(np.int64)
    nb = bids.shape[0]
    vox = bricks[bids][:, _CELLS]  # (nb, 8 slots, 8 subslots)

    # depth-1 nodes: one per non-empty slot of each exploded brick
    sub_nonempty = vox != 0  # (nb, 8, 8)
    slot_used = sub_nonempty.any(axis=2)  # (nb, 8)
    d1_count = slot_used.sum()
    d1_of = np.cumsum(slot_used.reshape(-1)).reshape(nb, 8) - 1  # index among d1

    d1_mask = (
        np.sum(sub_nonempty << _SLOTS[None, None, :], axis=2)
        | (np.sum(sub_nonempty << (_SLOTS[None, None, :] + 8), axis=2))
    ).astype(np.uint32)[slot_used]
    d1_data = np.where(sub_nonempty, vox, 0).astype(np.uint32)[slot_used]

    # depth-2 nodes: one per brick, children = the depth-1 nodes
    d2_base = n
    d1_base = n + nb
    d2_mask = np.sum(slot_used << _SLOTS[None, :], axis=1).astype(np.uint32)
    d2_data = np.where(slot_used, d1_base + d1_of, 0).astype(np.uint32)

    # rewrite brick slots in the internal pool to point at the new d2 nodes
    new_data = data.copy()
    new_mask = mask.copy()
    brick_seq = np.zeros(is_brick.sum(), dtype=np.uint32)
    brick_seq[:] = d2_base + np.arange(nb, dtype=np.uint32)
    new_data[is_brick] = brick_seq
    # clear the leaf flag on those slots (they become internal children)
    rows, slots = np.nonzero(is_brick)
    clear = np.zeros(n, np.uint32)
    np.bitwise_or.at(clear, rows, (1 << (slots + 8)).astype(np.uint32))
    new_mask = new_mask & ~clear

    return Octree(
        child_mask=np.concatenate([new_mask, d2_mask, d1_mask]),
        child_data=np.concatenate(
            [new_data, d2_data, d1_data.reshape(-1, 8)]
        ),
        root=bt.root,
        depth=bt.depth,
    )


def brickify(tree: Octree) -> BrickOctree:
    """Convert a built octree into the brick layout.

    Internal nodes at level ``depth-2`` become brick rows; their parent slots
    turn into BRICK_BIT-flagged leaves; levels ``depth-2``/``depth-1`` are
    dropped and the remaining pool is compacted/reindexed. LOD-compacted
    leaves at any level stay ordinary leaves (uniform regions need no brick).
    Requires ``depth >= 3``.
    """
    assert tree.depth >= 3, "brickify needs depth >= 3"
    mask = np.asarray(tree.child_mask, dtype=np.uint32)
    data = np.asarray(tree.child_data, dtype=np.uint32)
    depth = tree.depth
    level = _node_levels(mask, data, tree.root, depth)

    present_all = ((mask[:, None] >> _SLOTS[None, :]) & 1) != 0
    leaf_all = ((mask[:, None] >> (_SLOTS[None, :] + 8)) & 1) != 0
    leaf_vals = data[present_all & leaf_all]
    assert (
        leaf_vals.size == 0 or int(leaf_vals.max()) < (1 << 29)
    ), "leaf values must fit 29 bits to coexist with BRICK_BIT"

    # ---- brick rows from level depth-2 internal nodes ----
    d2 = np.flatnonzero(level == depth - 2)
    nb = d2.shape[0]
    m2, rows2 = mask[d2], data[d2]
    present2 = ((m2[:, None] >> _SLOTS[None, :]) & 1) != 0
    leaf2 = ((m2[:, None] >> (_SLOTS[None, :] + 8)) & 1) != 0
    internal2 = present2 & ~leaf2

    ci = np.where(internal2, rows2, 0).astype(np.int64)
    sub_data = data[ci]  # (NB, 8, 8)
    sub_mask = mask[ci]
    sub_present = ((sub_mask[:, :, None] >> _SLOTS[None, None, :]) & 1) != 0
    sub_leaf = ((sub_mask[:, :, None] >> (_SLOTS[None, None, :] + 8)) & 1) != 0
    assert not np.any(
        internal2[:, :, None] & sub_present & ~sub_leaf
    ), "depth-1 nodes must hold only voxel leaves"

    vox = np.where(
        internal2[:, :, None],
        np.where(sub_present, sub_data, 0),
        np.where((present2 & leaf2)[:, :, None], rows2[:, :, None], 0),
    ).astype(np.uint32)  # (NB, 8 slots, 8 subslots)
    bricks = np.zeros((max(nb, 1), 64), dtype=np.uint32)
    if nb:
        bricks[:nb, _CELLS.reshape(-1)] = vox.reshape(nb, 64)

    brick_of = np.full(mask.shape[0], 0, dtype=np.uint32)
    brick_of[d2] = np.arange(nb, dtype=np.uint32)

    # ---- compact the internal pool (levels 0..depth-3) ----
    keep = (level >= 0) & (level <= depth - 3)
    keep_idx = np.flatnonzero(keep)
    new_id = np.cumsum(keep, dtype=np.int64) - 1

    k_mask = mask[keep_idx]
    k_rows = data[keep_idx]
    k_present = ((k_mask[:, None] >> _SLOTS[None, :]) & 1) != 0
    k_leaf = ((k_mask[:, None] >> (_SLOTS[None, :] + 8)) & 1) != 0
    k_internal = k_present & ~k_leaf
    child = np.where(k_internal, k_rows, 0).astype(np.int64)
    child_is_brick = k_internal & (level[child] == depth - 2)

    new_rows = np.where(
        child_is_brick,
        brick_of[child] | BRICK_BIT,
        np.where(k_internal, new_id[child].astype(np.uint32), k_rows),
    ).astype(np.uint32)
    new_mask = (
        k_mask
        | np.sum(
            child_is_brick.astype(np.uint32) << (_SLOTS[None, :] + 8), axis=1
        ).astype(np.uint32)
    )

    return BrickOctree(
        child_mask=new_mask,
        child_data=new_rows,
        bricks=bricks,
        root=int(new_id[tree.root]),
        depth=depth,
    )
