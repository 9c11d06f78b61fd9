"""Flat sparse-voxel-octree node pool — the HBM-resident scene structure.

The reference keeps octants as ``u16 child_mask + [u32; 8] children``
(``/root/reference/src/octree/new_octree.rs:70-74``) and ships a 12-word GPU
node to the shader (``src/gpu_structs/gpu_octree.rs:6-27``; authoritative
decode in ``assets/shaders/svo.wgsl:293-299``).  We adopt the same *logical*
format, stored as structure-of-arrays for TPU-friendly gathers:

- ``child_mask (N,) uint32`` — low 8 bits: child present; bits 8..15: leaf
  flag (exactly the reference's u16 semantics).
- ``child_data (N, 8) uint32`` — per-slot child octant index or leaf value.

Child slot index within an octant is ``x | y<<1 | z<<2`` (Morton digit).

A leaf value of 0 is reserved for "air"/empty, matching the reference's global
blockstate id 0 (``new_octree.rs:300-301``).

The 12-word interchange format (words 0-3 = 8x16-bit headers, words 4-11 =
child data) is provided for parity checks with the reference's GPU layout.
Header bit convention (reconciling ``gpu_octree.rs:24-26`` with the WGSL
decode): empty = 0x0000, interior child = CHILD_BIT (0x2), leaf = 0xFFFF
(all bits set — WGSL tests ``header == 0xFFFF`` for leaves and
``(header & 255) != 0`` for presence).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

LEAF_BIT = 0x1
CHILD_BIT = 0x2
LOD_BIT = 0x4
LEAF_HEADER = 0xFFFF

MAX_DEPTH = 21  # Morton 21 bits/axis envelope (new_octree.rs:14,817)


@dataclasses.dataclass
class Octree:
    """A built octree: node pool + root + depth.

    ``depth`` is static Python metadata (it sets traversal scale constants at
    trace time); the arrays live on device as a pytree.  ``scale() = 2^-depth``
    maps world voxel units into the traversal's [1, 2) cube
    (``new_octree.rs:40-42``).
    """

    child_mask: Any  # (N,) uint32
    child_data: Any  # (N, 8) uint32
    root: int
    depth: int

    def scale(self) -> float:
        return float(2.0 ** (-self.depth))

    @property
    def n_nodes(self) -> int:
        return int(self.child_mask.shape[0])

    def tree_flatten(self):
        return (self.child_mask, self.child_data), (
            self.root,
            self.depth,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])


try:  # register as a JAX pytree when jax is importable (host-only use works without)
    import jax.tree_util as _jtu

    _jtu.register_pytree_node(
        Octree, Octree.tree_flatten, lambda aux, ch: Octree.tree_unflatten(aux, ch)
    )
except Exception:  # pragma: no cover
    pass


def is_child(child_mask: np.ndarray, slot) -> np.ndarray:
    return (child_mask >> slot) & 1


def is_leaf(child_mask: np.ndarray, slot) -> np.ndarray:
    return (child_mask >> (slot + 8)) & 1


def octree_to_gpu_words(tree: Octree) -> np.ndarray:
    """Encode the pool into the reference's 12-word node format.

    Vectorized equivalent of the (stubbed) encode pass at
    ``gpu_octree.rs:28-66`` under the header convention documented above.
    """
    mask = np.asarray(tree.child_mask, dtype=np.uint32)
    data = np.asarray(tree.child_data, dtype=np.uint32)
    n = mask.shape[0]
    slots = np.arange(8, dtype=np.uint32)
    present = (mask[:, None] >> slots[None, :]) & 1
    leaf = (mask[:, None] >> (slots[None, :] + 8)) & 1
    headers = np.where(
        leaf != 0,
        np.uint32(LEAF_HEADER),
        np.where(present != 0, np.uint32(CHILD_BIT), np.uint32(0)),
    ).astype(np.uint32)
    words = np.zeros((n, 12), dtype=np.uint32)
    words[:, 0:4] = headers[:, 0::2] | (headers[:, 1::2] << np.uint32(16))
    words[:, 4:12] = data
    return words


def gpu_words_to_pool(words: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode 12-word nodes back into (child_mask, child_data) SoA arrays.

    Mirrors the WGSL consumer (``svo.wgsl:293-299``).
    """
    words = np.asarray(words, dtype=np.uint32)
    headers = np.zeros((words.shape[0], 8), dtype=np.uint32)
    headers[:, 0::2] = words[:, 0:4] & np.uint32(0xFFFF)
    headers[:, 1::2] = words[:, 0:4] >> np.uint32(16)
    present = (headers & np.uint32(0xFF)) != 0
    leaf = headers == np.uint32(LEAF_HEADER)
    slots = np.arange(8, dtype=np.uint32)
    mask = (
        np.sum(present.astype(np.uint32) << slots[None, :], axis=1)
        | np.sum(leaf.astype(np.uint32) << (slots[None, :] + 8), axis=1)
    ).astype(np.uint32)
    return mask, words[:, 4:12].copy()
