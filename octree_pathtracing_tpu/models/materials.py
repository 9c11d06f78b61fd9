"""Material table — structure-of-arrays, every field a differentiable leaf.

The reference's ``Material`` struct (``/root/reference/src/textures/material.rs:92-101``)
becomes a table of float arrays indexed by material id; flags keep the
reference's bit layout (``material.rs:5-14``).  Material id 0 is AIR
(``material.rs:104-113``): ior = 1.000293, no flags, default texture.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

FLAG_OPAQUE = 0x01
FLAG_SUBSURFACE_SCATTER = 0x02
FLAG_REFRACTIVE = 0x04
FLAG_WATERLOGGED = 0x08
FLAG_SOLID = 0x10

DEFAULT_IOR = 1.000293


@dataclasses.dataclass
class MaterialTable:
    ior: Any  # (M,) f32
    specular: Any  # (M,) f32
    emittance: Any  # (M,) f32
    roughness: Any  # (M,) f32
    metalness: Any  # (M,) f32
    flags: Any  # (M,) uint32
    texture_index: Any  # (M,) int32 — layer into the texture atlas
    tint_index: Any  # (M,) int32

    def tree_flatten(self):
        return (
            self.ior,
            self.specular,
            self.emittance,
            self.roughness,
            self.metalness,
            self.flags,
            self.texture_index,
            self.tint_index,
        ), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def count(self) -> int:
        return int(self.ior.shape[0])


jax.tree_util.register_pytree_node(
    MaterialTable,
    MaterialTable.tree_flatten,
    lambda aux, ch: MaterialTable.tree_unflatten(aux, ch),
)


def make_material_table(materials: list[dict]) -> MaterialTable:
    """Build a table from dicts; index 0 should be AIR (use :func:`air`)."""
    def col(key, default, dtype=np.float32):
        return jnp.asarray(
            np.array([m.get(key, default) for m in materials], dtype=dtype)
        )

    return MaterialTable(
        ior=col("ior", DEFAULT_IOR),
        specular=col("specular", 0.0),
        emittance=col("emittance", 0.0),
        roughness=col("roughness", 0.0),
        metalness=col("metalness", 0.0),
        flags=col("flags", FLAG_OPAQUE | FLAG_SOLID, np.uint32),
        texture_index=col("texture_index", 0, np.int32),
        tint_index=col("tint_index", 0, np.int32),
    )


def gather_rows(m: MaterialTable, mat):
    """Fetch every per-material scalar of ``mat`` (B,) in ONE row-gather.

    The shading path otherwise issues 7-8 separate (B,) gathers
    (metalness/specular/roughness/emittance/ior/flags/texture_index), each
    paying the fixed per-gather-op cost (tools/PERF_NOTES.md gather model:
    row-rate-bound, row width free).  The (M, 7) pack is built at trace time
    with ``jnp.stack`` — M is tiny, and the stack's VJP routes cotangents
    back to the differentiable leaves, so ``emittance`` stays trainable.
    Int/flag fields ride as f32 bitcasts (a gather copies bits, never
    computes).  Returns a dict of (B,) columns, values bit-identical to the
    per-field gathers.
    """
    from jax import lax

    def fi(x):
        return lax.bitcast_convert_type(x.astype(jnp.int32), jnp.float32)

    pk = jnp.stack(
        [
            m.ior,
            m.specular,
            m.emittance,
            m.roughness,
            m.metalness,
            fi(m.flags),
            fi(m.texture_index),
        ],
        axis=1,
    )  # (M, 7)
    row = pk[mat]  # (B, 7) — the single gather

    def ii(c):
        return lax.bitcast_convert_type(c, jnp.int32)

    return dict(
        ior=row[:, 0],
        specular=row[:, 1],
        emittance=row[:, 2],
        roughness=row[:, 3],
        metalness=row[:, 4],
        flags=ii(row[:, 5]).astype(jnp.uint32),
        texture_index=ii(row[:, 6]),
    )


def air() -> dict:
    """Material id 0 (``material.rs:104-113``)."""
    return dict(ior=DEFAULT_IOR, flags=0, texture_index=0)


def has_flag(flags, bit):
    return (flags & bit) != 0
