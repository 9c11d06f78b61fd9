"""Analytic (non-voxel) scene primitives: free spheres and free quads.

The reference ``Scene`` holds free-standing quads and (stub) spheres next to
the octree (``/root/reference/src/scene/mod.rs:146-156``,
``src/geometry/sphere.rs``, ``src/hittable/mod.rs:137-148`` — a linear
``HitList`` scan).  TPU-native form: small SoA tables intersected by every
lane in parallel with the octree traversal result; the nearer surface wins.

Primitive counts are tiny (a handful per scene), so a static Python loop over
primitives — each a fully vectorized batch test — is the right shape: no
gathers, no dynamic control flow, everything fuses into the shading kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import QuadSoA, make_quads, quad_hit, sphere_hit


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Primitives:
    """SoA analytic primitives.  ``quads`` is a world-space :class:`QuadSoA`
    (or None); spheres are (S,)-tables."""

    sphere_center: Any  # (S, 3) float32
    sphere_radius: Any  # (S,) float32
    sphere_mat: Any  # (S,) int32
    quads: Any = None  # QuadSoA | None

    @property
    def n_spheres(self) -> int:
        return self.sphere_center.shape[0]

    def tree_flatten(self):
        return (self.sphere_center, self.sphere_radius, self.sphere_mat, self.quads), None

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


def make_primitives(spheres=(), quads=None) -> Primitives:
    """``spheres``: iterable of (center(3,), radius, material_id).
    ``quads``: optional (origins, us, vs, material_ids) arrays for
    :func:`make_quads`, or a prebuilt :class:`QuadSoA`."""
    if spheres:
        centers = np.stack([np.asarray(c, np.float32) for c, _, _ in spheres])
        radii = np.array([r for _, r, _ in spheres], np.float32)
        mats = np.array([m for _, _, m in spheres], np.int32)
    else:
        centers = np.zeros((0, 3), np.float32)
        radii = np.zeros((0,), np.float32)
        mats = np.zeros((0,), np.int32)
    if quads is not None and not isinstance(quads, QuadSoA):
        quads = make_quads(*quads)
    return Primitives(
        sphere_center=jnp.asarray(centers),
        sphere_radius=jnp.asarray(radii),
        sphere_mat=jnp.asarray(mats),
        quads=quads,
    )


def intersect_prims(prims: Primitives, origins, dirs, t_max):
    """Nearest analytic-primitive hit per lane (``HitList`` linear scan,
    ``hittable/mod.rs:137-148``).

    Returns (hit (B,), t (B,), mat (B,), uv (B, 2), normal (B, 3)); ``t`` is
    jnp.inf on miss.  Backface-culled quads (quad.rs:176-179); spheres take
    the nearest positive root with lat/long uv (sphere.rs:31-69).
    """
    b = origins.shape[0]
    best_t = jnp.full((b,), jnp.inf, jnp.float32)
    best_mat = jnp.zeros((b,), jnp.int32)
    best_uv = jnp.zeros((b, 2), jnp.float32)
    best_n = jnp.zeros((b, 3), jnp.float32)

    for s in range(int(prims.n_spheres)):
        hit, t, uv, n = sphere_hit(
            prims.sphere_center[s], prims.sphere_radius[s], origins, dirs
        )
        take = hit & (t < best_t) & (t < t_max)
        best_t = jnp.where(take, t, best_t)
        best_mat = jnp.where(take, prims.sphere_mat[s], best_mat)
        best_uv = jnp.where(take[:, None], uv, best_uv)
        best_n = jnp.where(take[:, None], n, best_n)

    if prims.quads is not None:
        zero_vox = jnp.zeros_like(origins)
        for q in range(int(prims.quads.count)):
            q_idx = jnp.full((b,), q, jnp.int32)
            ok, t, uu, vv = quad_hit(
                prims.quads, q_idx, origins, dirs, zero_vox, jnp.minimum(best_t, t_max)
            )
            take = ok & (t < best_t) & (t < t_max)
            best_t = jnp.where(take, t, best_t)
            best_mat = jnp.where(take, prims.quads.material_id[q], best_mat)
            best_uv = jnp.where(
                take[:, None], jnp.stack([uu, vv], -1), best_uv
            )
            best_n = jnp.where(take[:, None], prims.quads.normal[q], best_n)

    return jnp.isfinite(best_t), best_t, best_mat, best_uv, best_n


def intersect_prims_np(prims_np: dict, origin, direction, t_max=np.inf):
    """Scalar NumPy mirror for the oracle: one ray against the same tables.

    ``prims_np``: dict from :func:`prims_to_numpy`.  Returns
    (hit, t, mat, (u, v), normal)."""
    best = (False, np.inf, 0, (0.0, 0.0), np.zeros(3))
    eps = 5e-8
    for s in range(len(prims_np["sphere_radius"])):
        c = prims_np["sphere_center"][s]
        r = prims_np["sphere_radius"][s]
        oc = c - origin
        a = float(direction @ direction)
        h = float(direction @ oc)
        cc = float(oc @ oc) - r * r
        disc = h * h - a * cc
        if disc < 0.0:
            continue
        sq = np.sqrt(disc)
        t0, t1 = (h - sq) / a, (h + sq) / a
        t = t0 if t0 > eps else t1
        if t <= eps or t >= min(best[1], t_max):
            continue
        p = origin + direction * t
        n = (p - c) / r
        theta = np.arccos(np.clip(-n[1], -1.0, 1.0))
        phi = np.arctan2(-n[2], n[0]) + np.pi
        best = (True, t, int(prims_np["sphere_mat"][s]),
                (phi / (2 * np.pi), theta / np.pi), n)
    q = prims_np.get("quads")
    if q is not None:
        for k in range(len(q["d"])):
            qn, qd = q["normal"][k], q["d"][k]
            denom = float(direction @ qn)
            if denom >= -eps:
                continue
            t = (qd - float(qn @ origin)) / denom
            if t <= 0.0 or t >= min(best[1], t_max):
                continue
            p = origin + direction * t - q["origin"][k]
            alpha = float(q["w"][k] @ np.cross(p, q["v"][k]))
            beta = float(q["w"][k] @ np.cross(q["u"][k], p))
            if not (0.0 <= alpha <= 1.0 and 0.0 <= beta <= 1.0):
                continue
            ur, vr = q["tex_u_range"][k], q["tex_v_range"][k]
            uv = (ur[0] + alpha * (ur[1] - ur[0]), vr[0] + beta * (vr[1] - vr[0]))
            best = (True, t, int(q["material_id"][k]), uv, np.asarray(qn, np.float64))
    return best


def prims_to_numpy(prims: Primitives) -> dict:
    out = dict(
        sphere_center=np.asarray(prims.sphere_center, np.float64),
        sphere_radius=np.asarray(prims.sphere_radius, np.float64),
        sphere_mat=np.asarray(prims.sphere_mat),
        quads=None,
    )
    if prims.quads is not None:
        q = prims.quads
        out["quads"] = dict(
            origin=np.asarray(q.origin, np.float64),
            u=np.asarray(q.u, np.float64),
            v=np.asarray(q.v, np.float64),
            w=np.asarray(q.w, np.float64),
            normal=np.asarray(q.normal, np.float64),
            d=np.asarray(q.d, np.float64),
            material_id=np.asarray(q.material_id),
            tex_u_range=np.asarray(q.tex_u_range, np.float64),
            tex_v_range=np.asarray(q.tex_v_range, np.float64),
        )
    return out
