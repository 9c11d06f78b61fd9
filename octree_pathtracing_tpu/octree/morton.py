"""Vectorized Morton (Z-order) codecs.

The reference implements 21-bit-per-axis Morton encode/decode with bit-spread
("part by 2") tricks plus 12-bit LUTs for 16^3 Minecraft sections
(``/root/reference/src/octree/new_octree.rs:753-850``).  On TPU/host we use the
same magic-constant bit spreads but fully vectorized over numpy/jnp arrays —
no LUTs needed (the spread is already branch-free).

Two families:

- 64-bit host codecs (numpy uint64) used by the octree builders — up to 21
  bits/axis, matching the reference's depth<=21 envelope.
- 30-bit device codecs (jnp uint32) used for ray-locality sorting on TPU,
  where x64 is off by default — 10 bits/axis.
"""

from __future__ import annotations

import numpy as np

_M64 = [
    np.uint64(0x1FFFFF),
    np.uint64(0x1F00000000FFFF),
    np.uint64(0x1F0000FF0000FF),
    np.uint64(0x100F00F00F00F00F),
    np.uint64(0x10C30C30C30C30C3),
    np.uint64(0x1249249249249249),
]


def part_by_2(v: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits of each element so they occupy every 3rd bit.

    Semantics of ``new_octree.rs:816-824`` (``part_by_2``), vectorized.
    """
    x = np.asarray(v, dtype=np.uint64) & _M64[0]
    x = (x | (x << np.uint64(32))) & _M64[1]
    x = (x | (x << np.uint64(16))) & _M64[2]
    x = (x | (x << np.uint64(8))) & _M64[3]
    x = (x | (x << np.uint64(4))) & _M64[4]
    x = (x | (x << np.uint64(2))) & _M64[5]
    return x


def compact_by_2(v: np.ndarray) -> np.ndarray:
    """Inverse of :func:`part_by_2` (``new_octree.rs:827-835``)."""
    x = np.asarray(v, dtype=np.uint64) & _M64[5]
    x = (x | (x >> np.uint64(2))) & _M64[4]
    x = (x | (x >> np.uint64(4))) & _M64[3]
    x = (x | (x >> np.uint64(8))) & _M64[2]
    x = (x | (x >> np.uint64(16))) & _M64[1]
    x = (x | (x >> np.uint64(32))) & _M64[0]
    return x


def encode_morton(x, y, z) -> np.ndarray:
    """Interleave three <=21-bit coordinates into a Morton code.

    Bit layout matches ``new_octree.rs:753-755``: z gets the high bit of each
    triple, then y, then x (child index within an octant = x | y<<1 | z<<2).
    """
    return (part_by_2(z) << np.uint64(2)) | (part_by_2(y) << np.uint64(1)) | part_by_2(x)


def decode_morton(code) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_morton` (``new_octree.rs:807-813``)."""
    c = np.asarray(code, dtype=np.uint64)
    return (
        compact_by_2(c),
        compact_by_2(c >> np.uint64(1)),
        compact_by_2(c >> np.uint64(2)),
    )


def morton_order_dense(grid: np.ndarray) -> np.ndarray:
    """Flatten a dense ``(S, S, S)`` grid (indexed ``[x, y, z]``) into Morton
    order without computing per-voxel codes.

    A 2^d cube in Morton order is a pure axis permutation: view the grid as
    ``(2,)*3d`` with x-bits, y-bits, z-bits as separate axes, then interleave
    the axes most-significant-first as (z_b, y_b, x_b) per level.  This is the
    vectorized equivalent of the reference's per-voxel LUT scatter
    (``new_octree.rs:734-745``) and runs at memcpy speed.
    """
    s = grid.shape[0]
    assert grid.shape == (s, s, s), "grid must be a cube"
    d = int(s).bit_length() - 1
    assert (1 << d) == s, "side must be a power of two"
    if d == 0:
        return grid.reshape(-1)
    # axes: x-bits [0..d), y-bits [d..2d), z-bits [2d..3d), each MSB-first.
    v = grid.reshape((2,) * (3 * d))
    # output axis order: level 0 (most significant octant digit) = (z0, y0, x0), ...
    perm = []
    for lvl in range(d):
        perm.extend([2 * d + lvl, d + lvl, lvl])
    return v.transpose(perm).reshape(-1)
