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


# Spatial-selection grid defaults (VERDICT r4 #4: uniform pick's variance
# grows linearly with world size; a shading point should prefer NEARBY
# lights).  The world is covered by a 2^GRID_BITS-per-side supercell grid;
# each cell stores its GRID_K highest-weight emitters (weight = solid-angle
# proxy size^2/d^2 from the cell) with a normalized weight row.  Sampling
# mixes that list with a GRID_LAMBDA uniform floor over ALL emitters, so
# every emitter keeps nonzero probability everywhere — the estimator stays
# unbiased no matter what the grid missed; the mixture pdf is exactly
# computable per lane (membership test against the K-row).
GRID_BITS = 4
GRID_K = 8
GRID_LAMBDA = 0.25

# EmitterSampling.ALL issues 3 truncated shadow traversals per emitter per
# diffuse bounce (a lax.scan over the table) — O(E) full traversals per
# frame.  Fine for a Cornell-style test room; catastrophic for a village of
# torches, so the integrator refuses above this count rather than silently
# compiling a program that renders at seconds per frame.  Use ONE (spatially
# selected, O(1) per bounce) for large tables.
ALL_MAX_EMITTERS = 64


@dataclasses.dataclass
class EmitterTable:
    """Flat emissive-cell table (device pytree).

    pos: (E, 3) float32 — cell min corner, world voxel units.
    size: (E,) float32 — cell side length (LOD-collapsed leaves are > 1).
    mat: (E,) int32 — material id (emittance/texture lookups).
    grid_idx: (C, K) int32 — per-supercell candidate emitter ids (or None:
        uniform pick, the pre-r5 behavior).
    grid_w: (C, K) float32 — normalized candidate weights (rows sum to 1).
    grid_bits/cell_size/lam: static grid geometry + uniform-mixture weight.
    """

    pos: Any
    size: Any
    mat: Any
    grid_idx: Any = None
    grid_w: Any = None
    grid_bits: int = GRID_BITS
    cell_size: float = 1.0
    lam: float = GRID_LAMBDA

    @property
    def count(self) -> int:
        return int(self.pos.shape[0])

    def tree_flatten(self):
        return (self.pos, self.size, self.mat, self.grid_idx, self.grid_w), (
            self.grid_bits,
            self.cell_size,
            self.lam,
        )

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, *aux)


jax.tree_util.register_pytree_node(
    EmitterTable,
    EmitterTable.tree_flatten,
    lambda aux, ch: EmitterTable.tree_unflatten(aux, ch),
)


def build_spatial_grid(pos: np.ndarray, size: np.ndarray, extent: float,
                       bits: int = GRID_BITS, k: int = GRID_K):
    """Host-side spatial-selection grid build.

    Per supercell, the ``k`` emitters with the largest conservative
    solid-angle proxy ``size_e^2 / d^2`` (d = distance from the cell center,
    reduced by the cell radius, floored at the emitter size so adjacent big
    lights don't overflow) — normalized into a weight row.  Chunked over
    cells so the (C, E) distance matrix never materializes whole.

    Returns (grid_idx (C, k) int32, grid_w (C, k) float32).
    """
    e = pos.shape[0]
    k = min(k, e)
    g = 1 << bits
    cell = extent / g
    centers_e = pos + 0.5 * size[:, None]  # (E, 3)
    lin = (np.arange(g) + 0.5) * cell
    cx, cy, cz = np.meshgrid(lin, lin, lin, indexing="ij")
    cell_centers = np.stack([cx, cy, cz], -1).reshape(-1, 3)  # (C, 3)
    c_tot = cell_centers.shape[0]
    cell_rad = 0.5 * cell * np.sqrt(3.0)

    grid_idx = np.zeros((c_tot, k), np.int32)
    grid_w = np.zeros((c_tot, k), np.float32)
    sz2 = (size * size).astype(np.float64)
    chunk = max(1, int(4e6 // max(e, 1)))
    for c0 in range(0, c_tot, chunk):
        cc = cell_centers[c0 : c0 + chunk]  # (c, 3)
        d = np.linalg.norm(
            cc[:, None, :] - centers_e[None, :, :], axis=-1
        )  # (c, E)
        d = np.maximum(d - cell_rad, np.maximum(size[None, :], 1e-3))
        w = sz2[None, :] / (d * d)  # (c, E)
        if k < e:
            top = np.argpartition(-w, k - 1, axis=1)[:, :k]
        else:
            top = np.broadcast_to(np.arange(e), (w.shape[0], e)).copy()
        tw = np.take_along_axis(w, top, axis=1)
        order = np.argsort(-tw, axis=1)  # descending for cheap CDF reads
        top = np.take_along_axis(top, order, axis=1)
        tw = np.take_along_axis(tw, order, axis=1)
        grid_idx[c0 : c0 + chunk] = top
        grid_w[c0 : c0 + chunk] = (
            tw / np.maximum(tw.sum(axis=1, keepdims=True), 1e-30)
        )
    return grid_idx, grid_w


def _spatial_pick(em: "EmitterTable", p, u_pick):
    """Spatially-weighted emitter pick; returns (idx (B,) i32, inv_p (B,)).

    Mixture sampler: with probability ``lam`` pick uniformly over all E
    (unbiasedness floor — every emitter reachable from everywhere); else
    draw from the shading point's supercell candidate row by weight.  The
    realized pdf is computed EXACTLY per lane via a K-wide membership test
    (the chosen id may appear in the row whichever branch drew it):
    ``p = lam/E + (1-lam) * w_row[match]``.  Uniforms are reused by bin
    rescale (the integer/fractional split trick, as in the face pick).
    """
    import jax.numpy as jnp

    e = em.pos.shape[0]
    if em.grid_idx is None:
        idx = jnp.minimum((u_pick * e).astype(jnp.int32), e - 1)
        return idx, jnp.full_like(u_pick, float(e))
    g = 1 << em.grid_bits
    lam = em.lam
    cell = jnp.clip(
        (p / em.cell_size).astype(jnp.int32), 0, g - 1
    )  # (B, 3)
    c = (cell[:, 0] * g + cell[:, 1]) * g + cell[:, 2]
    gi = em.grid_idx[c]  # (B, K) — small-table gathers
    gw = em.grid_w[c]  # (B, K)

    uni = u_pick < lam
    u_u = jnp.clip(u_pick / lam, 0.0, 1.0 - 1e-7)
    idx_u = jnp.minimum((u_u * e).astype(jnp.int32), e - 1)
    u_s = jnp.clip((u_pick - lam) / (1.0 - lam), 0.0, 1.0 - 1e-7)
    cdf = jnp.cumsum(gw, axis=1)
    j = jnp.sum((u_s[:, None] > cdf).astype(jnp.int32), axis=1)
    j = jnp.minimum(j, gi.shape[1] - 1)
    idx_s = jnp.take_along_axis(gi, j[:, None], axis=1)[:, 0]
    idx = jnp.where(uni, idx_u, idx_s)
    w_match = jnp.sum(jnp.where(gi == idx[:, None], gw, 0.0), axis=1)
    p_pick = lam / e + (1.0 - lam) * w_match
    return idx, 1.0 / p_pick


def sample_emitter_point(em: "EmitterTable", p, u_pick, u1, u2, n=None):
    """Sample (emitter, surface point) from the table toward shading point p.

    ``n``: optional (B, 3) shading normal.  The supercell lookup uses
    ``p + 0.01 * cell_size * n`` — shading points sit exactly ON voxel
    faces, which coincide with grid-cell boundary planes, so an un-nudged
    floor(p / cell) is a float knife-edge on EVERY wall hit (f32 kernel and
    f64 oracle would disagree systematically).  Nudging along the normal
    moves the lookup decisively into the open cell in front of the surface
    — which is also the semantically right cell to select lights from.

    The emitter is picked by the spatial mixture sampler (``_spatial_pick``:
    supercell candidate weights + uniform floor; uniform over all E when the
    table has no grid); the FACE is importance-sampled among the (up to) 3
    faces oriented toward ``p``, weighted by the cosine of the face normal
    against the cell→p direction — back and side-away faces can only ever
    contribute zero (their ``cosθ_e`` gate fails for every point on them),
    so sampling them is pure variance; a slab light viewed from below then
    draws its bottom face ~always instead of 1/6 of the time.  ``u1`` picks
    the face by cumulative weight and is rescaled within the chosen bin for
    the first in-face coordinate (the integer/fractional split trick);
    ``u2`` is the second coordinate.

    Returns dict(q (B,3) point, ne (B,3) outward face normal, mat (B,) i32,
    uv (B,2) in-face coordinates, inv_pdf (B,) = size^2/p_pick * Σw/w_axis).
    """
    import jax.numpy as jnp

    p_cell = p if n is None else p + (0.01 * em.cell_size) * n
    idx, pick_inv = _spatial_pick(em, p_cell, u_pick)
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
    inv_pdf = pick_inv * size * size * total / w_a
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
    pos_k = pos[keep].astype(np.float32)
    size_k = size[keep].astype(np.float32)
    extent = float(1 << octree.depth)
    g_idx, g_w = build_spatial_grid(pos_k, size_k, extent)
    return EmitterTable(
        pos=jnp.asarray(pos_k, jnp.float32),
        size=jnp.asarray(size_k, jnp.float32),
        mat=jnp.asarray(mats[keep], jnp.int32),
        grid_idx=jnp.asarray(g_idx),
        grid_w=jnp.asarray(g_w),
        grid_bits=GRID_BITS,
        cell_size=extent / (1 << GRID_BITS),
        lam=GRID_LAMBDA,
    )
