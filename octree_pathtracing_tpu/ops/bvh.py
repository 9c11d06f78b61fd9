"""Flat BVH: host-side full-sweep SAH build + batched stack traversal.

Reference: ``/root/reference/src/geometry/bvh.rs`` — flat array nodes, full
SAH sweep over every axis/split (``:68-98``), in-place partition
(``:111-124``), ordered near-child-first traversal with a 64-deep stack
(``:197-247``).  The build is host numpy (scene prep); traversal is a
batched ``lax.while_loop`` with per-lane stacks, mirroring the octree kernel's
layout rules.  In this framework the octree is the primary structure
(SURVEY.md §2) — the BVH serves quad-soup scenes and block-model interiors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax

MAX_STACK = 64  # bvh.rs:197-247
LEAF_FLAG = 1 << 30


class BVH(NamedTuple):
    node_min: jnp.ndarray  # (N, 3)
    node_max: jnp.ndarray  # (N, 3)
    # packed child word: left child index | LEAF_FLAG + prim start
    left: jnp.ndarray  # (N,) int32 — left child or (LEAF_FLAG | prim_start)
    right: jnp.ndarray  # (N,) int32 — right child or prim_count for leaves
    prim_order: jnp.ndarray  # (P,) int32 — primitive permutation


def build_bvh(prim_min: np.ndarray, prim_max: np.ndarray, leaf_size: int = 2) -> BVH:
    """Full-sweep SAH build (bvh.rs:64-124), host-side numpy."""
    p = prim_min.shape[0]
    centroid = (prim_min + prim_max) * 0.5
    order = np.arange(p)

    node_min, node_max, left, right = [], [], [], []

    def area(mn, mx):
        e = np.maximum(mx - mn, 0)
        return 2.0 * (e[..., 0] * e[..., 1] + e[..., 0] * e[..., 2] + e[..., 1] * e[..., 2])

    def build(idx):
        node_id = len(node_min)
        mn = prim_min[idx].min(axis=0)
        mx = prim_max[idx].max(axis=0)
        node_min.append(mn)
        node_max.append(mx)
        left.append(0)
        right.append(0)
        if len(idx) <= leaf_size:
            start = build.prim_cursor
            build.order_out[start : start + len(idx)] = idx
            build.prim_cursor += len(idx)
            left[node_id] = LEAF_FLAG | start
            right[node_id] = len(idx)
            return node_id
        # full sweep SAH over each axis (bvh.rs:68-98)
        best = (np.inf, None, None)
        for axis in range(3):
            o = idx[np.argsort(centroid[idx, axis], kind="stable")]
            lmn = np.minimum.accumulate(prim_min[o], axis=0)
            lmx = np.maximum.accumulate(prim_max[o], axis=0)
            rmn = np.minimum.accumulate(prim_min[o][::-1], axis=0)[::-1]
            rmx = np.maximum.accumulate(prim_max[o][::-1], axis=0)[::-1]
            n = len(o)
            counts = np.arange(1, n)
            cost = area(lmn[:-1], lmx[:-1]) * counts + area(rmn[1:], rmx[1:]) * (
                n - counts
            )
            k = int(np.argmin(cost))
            if cost[k] < best[0]:
                best = (cost[k], o[: k + 1], o[k + 1 :])
        _, li, ri = best
        if li is None or len(li) == 0 or len(ri) == 0:
            half = len(idx) // 2
            li, ri = idx[:half], idx[half:]
        lid = build(li)
        rid = build(ri)
        left[node_id] = lid
        right[node_id] = rid
        return node_id

    build.prim_cursor = 0
    build.order_out = np.zeros(p, np.int64)
    build(order)

    return BVH(
        node_min=jnp.asarray(np.stack(node_min), jnp.float32),
        node_max=jnp.asarray(np.stack(node_max), jnp.float32),
        left=jnp.asarray(left, jnp.int32),
        right=jnp.asarray(right, jnp.int32),
        prim_order=jnp.asarray(build.order_out, jnp.int32),
    )


def bvh_intersect(bvh: BVH, origins, dirs, prim_hit_fn, t_init=None):
    """Batched ordered BVH traversal (bvh.rs:197-247).

    ``prim_hit_fn(prim_id, origins, dirs, t_best) -> (hit, t, payload)``
    intersects one primitive id per lane (vectorized over lanes); payload is
    an int32 per lane (e.g. quad id) recorded for the closest hit.

    Returns (hit (B,), t (B,), payload (B,)).
    """
    b = origins.shape[0]
    inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12, 1e-12, dirs)
    t_best = jnp.full((b,), jnp.inf) if t_init is None else t_init
    payload = jnp.full((b,), -1, jnp.int32)

    stack = jnp.zeros((MAX_STACK, b), jnp.int32)
    sp = jnp.ones((b,), jnp.int32)  # stack[0] = root(0)
    active = jnp.ones((b,), bool)

    def cond(c):
        return jnp.any(c[0])

    def body(c):
        active, sp, stack, t_best, payload = c
        sp_new = sp - 1
        node = jnp.take_along_axis(stack, jnp.maximum(sp_new, 0)[None, :], 0)[0]
        node = jnp.where(active, node, 0)

        mn = bvh.node_min[node]
        mx = bvh.node_max[node]
        t_bot = (mn - origins) * inv
        t_top = (mx - origins) * inv
        t0 = jnp.max(jnp.minimum(t_bot, t_top), axis=-1)
        t1 = jnp.min(jnp.maximum(t_bot, t_top), axis=-1)
        box_hit = (t0 <= t1) & (t1 > 0.0) & (t0 < t_best)

        lw = bvh.left[node]
        rw = bvh.right[node]
        is_leaf = (lw & LEAF_FLAG) != 0

        proc = active & box_hit
        # --- leaf: test primitives (bounded small leaves) ---
        start = lw & ~LEAF_FLAG
        new_t, new_payload = t_best, payload
        for k in range(2):  # leaf_size cap
            pid = bvh.prim_order[jnp.clip(start + k, 0, bvh.prim_order.shape[0] - 1)]
            valid = proc & is_leaf & (k < rw)
            hit_k, t_k, pay_k = prim_hit_fn(pid, origins, dirs, new_t)
            take = valid & hit_k & (t_k < new_t)
            new_t = jnp.where(take, t_k, new_t)
            new_payload = jnp.where(take, pay_k, new_payload)

        # --- interior: push far then near (near-first pop order) ---
        push = proc & ~is_leaf
        # near child by direction sign on the split axis is approximated by
        # entry distance: compute child entries and order.
        lmn, lmx = bvh.node_min[lw], bvh.node_max[lw]
        rmn, rmx = bvh.node_min[rw], bvh.node_max[rw]
        lt0 = jnp.max(jnp.minimum((lmn - origins) * inv, (lmx - origins) * inv), -1)
        rt0 = jnp.max(jnp.minimum((rmn - origins) * inv, (rmx - origins) * inv), -1)
        near_is_left = lt0 <= rt0
        near = jnp.where(near_is_left, lw, rw)
        far = jnp.where(near_is_left, rw, lw)

        sp_after = jnp.where(push, sp_new + 2, sp_new)
        rows = jnp.arange(MAX_STACK, dtype=jnp.int32)[:, None]
        put_far = push[None, :] & (rows == sp_new[None, :])
        put_near = push[None, :] & (rows == (sp_new + 1)[None, :])
        stack = jnp.where(put_far, far[None, :], stack)
        stack = jnp.where(put_near, near[None, :], stack)

        sp_out = jnp.where(active, sp_after, sp)
        active_out = active & (sp_out > 0)
        return active_out, sp_out, stack, new_t, new_payload

    active, sp, stack, t_best, payload = lax.while_loop(
        cond, body, (active, sp, stack, t_best, payload)
    )
    hit = payload >= 0
    return hit, t_best, payload
