"""Block model tables — non-cube geometry inside voxels.

TPU-native form of the reference's model layer
(``/root/reference/src/scene/resource_manager.rs:920-927`` ``ModelData::
{SimpleAABB, Cuboids}``, ``src/gpu_structs/model.rs`` packed model table,
``octree_traversal.rs:192-215`` leaf-model dispatch):

- leaf value -> model id,
- model: SIMPLE flag (full cube; 6 per-face materials, like the packed
  Cuboid's ``[u16; 6]`` texture table, ``gpu_structs/cuboid.rs:37-44``) or a
  quad range into a shared :class:`~..ops.geometry.QuadSoA` (quads in
  block-local [0,1]^3 coordinates, e.g. cross-plants, torch shafts),
- traversal candidates on quad models are accepted only if a quad hit with
  alpha > eps exists (the reference's model.intersect fall-through).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import QuadSoA, make_quads

MAX_MODEL_QUADS = 8  # static bound on quads tested per candidate

FLAG_SIMPLE = 1  # full-cube model (SIMPLE_AABB, gpu_structs/model.rs:15-21)


@dataclasses.dataclass
class BlockModels:
    leaf_model: Any  # (L,) int32: leaf value -> model id
    flags: Any  # (M,) int32
    face_material: Any  # (M, 6) int32 — per-face materials for simple models
    quad_start: Any  # (M,) int32
    quad_count: Any  # (M,) int32
    quads: QuadSoA  # block-local quads for non-simple models

    def tree_flatten(self):
        return (
            self.leaf_model,
            self.flags,
            self.face_material,
            self.quad_start,
            self.quad_count,
            self.quads,
        ), ()

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


jax.tree_util.register_pytree_node(
    BlockModels, BlockModels.tree_flatten, lambda aux, ch: BlockModels.tree_unflatten(aux, ch)
)


class ModelBuilder:
    """Accumulates models + quads; the host-side asset compiler core."""

    def __init__(self):
        self.flags: list[int] = []
        self.face_material: list[list[int]] = []
        self.quad_start: list[int] = []
        self.quad_count: list[int] = []
        self._qo: list = []
        self._qu: list = []
        self._qv: list = []
        self._qm: list = []
        self._qur: list = []
        self._qvr: list = []

    def add_simple(self, face_materials) -> int:
        """Full-cube model; ``face_materials``: scalar or 6 per-face ids."""
        if np.isscalar(face_materials):
            face_materials = [int(face_materials)] * 6
        mid = len(self.flags)
        self.flags.append(FLAG_SIMPLE)
        self.face_material.append([int(x) for x in face_materials])
        self.quad_start.append(0)
        self.quad_count.append(0)
        return mid

    def add_quad_model(self, quads: list[dict]) -> int:
        """Quad-list model; each quad: {origin, u, v, material, [uv_range]}.

        Coordinates are block-local [0,1]^3 (the reference divides element
        coords by 16, ``resource_manager.rs:830-872``).
        """
        assert 0 < len(quads) <= MAX_MODEL_QUADS
        mid = len(self.flags)
        self.flags.append(0)
        self.face_material.append([int(quads[0]["material"])] * 6)
        self.quad_start.append(len(self._qo))
        self.quad_count.append(len(quads))
        for q in quads:
            self._qo.append(q["origin"])
            self._qu.append(q["u"])
            self._qv.append(q["v"])
            self._qm.append(int(q["material"]))
            ur, vr = q.get("uv_range", ((0.0, 1.0), (0.0, 1.0)))
            self._qur.append(ur)
            self._qvr.append(vr)
        return mid

    def build(self, leaf_model) -> BlockModels:
        if not self._qo:  # keep a dummy quad so the SoA is non-empty
            self._qo = [[0.0, 0.0, 0.0]]
            self._qu = [[1.0, 0.0, 0.0]]
            self._qv = [[0.0, 1.0, 0.0]]
            self._qm = [0]
            self._qur = [(0.0, 1.0)]
            self._qvr = [(0.0, 1.0)]
        quads = make_quads(
            np.asarray(self._qo, np.float32),
            np.asarray(self._qu, np.float32),
            np.asarray(self._qv, np.float32),
            np.asarray(self._qm, np.int32),
            np.asarray(self._qur, np.float32),
            np.asarray(self._qvr, np.float32),
        )
        return BlockModels(
            leaf_model=jnp.asarray(leaf_model, jnp.int32),
            flags=jnp.asarray(self.flags, jnp.int32),
            face_material=jnp.asarray(self.face_material, jnp.int32),
            quad_start=jnp.asarray(self.quad_start, jnp.int32),
            quad_count=jnp.asarray(self.quad_count, jnp.int32),
            quads=quads,
        )


def cross_plant_quads(material: int, inset: float = 0.15) -> list[dict]:
    """The classic X-shaped plant model (two double-sided diagonal quads ->
    four single-sided quads)."""
    a, b = inset, 1.0 - inset
    return [
        dict(origin=[a, 0.0, a], u=[b - a, 0.0, b - a], v=[0.0, 1.0, 0.0], material=material),
        dict(origin=[b, 0.0, b], u=[a - b, 0.0, a - b], v=[0.0, 1.0, 0.0], material=material),
        dict(origin=[a, 0.0, b], u=[b - a, 0.0, a - b], v=[0.0, 1.0, 0.0], material=material),
        dict(origin=[b, 0.0, a], u=[a - b, 0.0, b - a], v=[0.0, 1.0, 0.0], material=material),
    ]


def slab_quads(material: int, height: float = 0.5) -> list[dict]:
    """Bottom slab: top face + 4 half-height sides + bottom face."""
    h = height
    return [
        dict(origin=[0.0, h, 0.0], u=[0.0, 0.0, 1.0], v=[1.0, 0.0, 0.0], material=material),
        dict(origin=[0.0, 0.0, 0.0], u=[1.0, 0.0, 0.0], v=[0.0, 0.0, 1.0], material=material),
        dict(origin=[0.0, 0.0, 0.0], u=[0.0, 0.0, 1.0], v=[0.0, h, 0.0], material=material),
        dict(origin=[1.0, 0.0, 1.0], u=[0.0, 0.0, -1.0], v=[0.0, h, 0.0], material=material),
        dict(origin=[1.0, 0.0, 0.0], u=[-1.0, 0.0, 0.0], v=[0.0, h, 0.0], material=material),
        dict(origin=[0.0, 0.0, 1.0], u=[1.0, 0.0, 0.0], v=[0.0, h, 0.0], material=material),
    ]
