"""Vectorized geometry primitives: AABB slabs, quads, spheres, cuboid faces.

Reference semantics from ``/root/reference/src/geometry/``:

- AABB branchless slab test (``aabb.rs:173-191``),
- parametric quad hit with barycentric alpha/beta via the w-vector
  (``quad.rs:89-200``) including the voxel-translated origin,
- sphere quadratic hit + lat/long uv (``sphere.rs:31-69`` — upstream body is
  stubbed behind a ``todo!``; this implements the evident intent),
- face-id <-> normal mapping (``cuboid.rs:10-29``).

All functions are batched over SoA arrays and differentiable (hit positions
and uv are smooth in the geometric parameters away from silhouettes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

EPSILON = 5e-8  # Ray::EPSILON


def aabb_intersect(box_min, box_max, origins, inv_dirs):
    """Branchless slab test (``aabb.rs:173-191``): returns (t0, t1); hit iff
    t0 <= t1 (and t1 > 0 for forward hits)."""
    t_bot = (box_min - origins) * inv_dirs
    t_top = (box_max - origins) * inv_dirs
    mins = jnp.minimum(t_bot, t_top)
    maxs = jnp.maximum(t_bot, t_top)
    t0 = jnp.max(mins, axis=-1)
    t1 = jnp.min(maxs, axis=-1)
    return t0, t1


class QuadSoA(NamedTuple):
    """Quad table (``quad.rs:89-114``): derived w/normal/d precomputed."""

    origin: jnp.ndarray  # (Q, 3)
    u: jnp.ndarray  # (Q, 3)
    v: jnp.ndarray  # (Q, 3)
    w: jnp.ndarray  # (Q, 3)  n / (n.n)
    normal: jnp.ndarray  # (Q, 3) unit
    d: jnp.ndarray  # (Q,)
    material_id: jnp.ndarray  # (Q,) int32
    tex_u_range: jnp.ndarray  # (Q, 2)
    tex_v_range: jnp.ndarray  # (Q, 2)

    @property
    def count(self):
        return self.origin.shape[0]


def make_quads(origins, us, vs, material_ids, tex_u_ranges=None, tex_v_ranges=None) -> QuadSoA:
    """Batch constructor (``Quad::new``, quad.rs:90-114)."""
    origins = jnp.asarray(origins, jnp.float32)
    us = jnp.asarray(us, jnp.float32)
    vs = jnp.asarray(vs, jnp.float32)
    q = origins.shape[0]
    n = jnp.cross(us, vs)
    nn = jnp.sum(n * n, axis=-1, keepdims=True)
    normal = n / jnp.sqrt(nn)
    w = n / nn
    d = jnp.sum(normal * origins, axis=-1)
    if tex_u_ranges is None:
        tex_u_ranges = jnp.broadcast_to(jnp.array([0.0, 1.0]), (q, 2))
    if tex_v_ranges is None:
        tex_v_ranges = jnp.broadcast_to(jnp.array([0.0, 1.0]), (q, 2))
    return QuadSoA(
        origin=origins,
        u=us,
        v=vs,
        w=w,
        normal=normal,
        d=d,
        material_id=jnp.asarray(material_ids, jnp.int32),
        tex_u_range=jnp.asarray(tex_u_ranges, jnp.float32),
        tex_v_range=jnp.asarray(tex_v_ranges, jnp.float32),
    )


def quad_hit(quads: QuadSoA, q_idx, ray_origin, ray_dir, voxel_pos, t_next):
    """Batched ``Quad::hit`` (quad.rs:172-200) against per-lane quad ids.

    Args are (B, ...) lanes; ``q_idx`` selects one quad per lane.  Returns
    (hit (B,), t (B,), uu (B,), vv (B,)) with the backface cull
    (denom >= -eps -> miss) and [0,1] alpha/beta containment.
    """
    qo = quads.origin[q_idx]
    qu = quads.u[q_idx]
    qv = quads.v[q_idx]
    qw = quads.w[q_idx]
    qn = quads.normal[q_idx]
    qd = quads.d[q_idx]

    tro = ray_origin - voxel_pos
    denom = jnp.sum(ray_dir * qn, axis=-1)
    t = (qd - jnp.sum(qn * tro, axis=-1)) / denom
    inter = tro + ray_dir * t[:, None]
    p = inter - qo
    alpha = jnp.sum(qw * jnp.cross(p, qv), axis=-1)
    beta = jnp.sum(qw * jnp.cross(qu, p), axis=-1)
    ok = (
        (denom < -EPSILON)
        & (t > 0.0)
        & (t <= t_next)
        & (alpha >= 0.0)
        & (alpha <= 1.0)
        & (beta >= 0.0)
        & (beta <= 1.0)
    )
    ur = quads.tex_u_range[q_idx]
    vr = quads.tex_v_range[q_idx]
    uu = ur[:, 0] + alpha * (ur[:, 1] - ur[:, 0])
    vv = vr[:, 0] + beta * (vr[:, 1] - vr[:, 0])
    return ok, t, uu, vv


def sphere_hit(center, radius, origins, dirs):
    """Quadratic sphere intersection + lat/long uv (sphere.rs:31-69).

    Returns (hit, t, uv (B,2), normal (B,3)); nearest positive root.
    """
    oc = center - origins
    a = jnp.sum(dirs * dirs, axis=-1)
    h = jnp.sum(dirs * oc, axis=-1)
    cc = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = h * h - a * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (h - sq) / a
    t1 = (h + sq) / a
    t = jnp.where(t0 > EPSILON, t0, t1)
    hit = (disc >= 0.0) & (t > EPSILON)
    point = origins + dirs * t[:, None]
    normal = (point - center) / radius
    theta = jnp.arccos(jnp.clip(-normal[:, 1], -1.0, 1.0))
    phi = jnp.arctan2(-normal[:, 2], normal[:, 0]) + np.pi
    uv = jnp.stack([phi / (2 * np.pi), theta / np.pi], axis=-1)
    return hit, jnp.where(hit, t, jnp.inf), uv, normal


FACE_NORMALS = np.array(
    [[-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1]],
    np.float32,
)


def face_normal(face_id):
    """face id -> outward normal (cuboid.rs:19-29 layout, see models/scene.py)."""
    return jnp.asarray(FACE_NORMALS)[jnp.clip(face_id, 0, 5)]
