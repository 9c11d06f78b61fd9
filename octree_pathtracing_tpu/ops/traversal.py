"""Batched wavefront ESVO traversal — the hot kernel, in pure JAX/XLA.

TPU-native re-design of the reference's per-thread stack traversal
(``/root/reference/src/octree/octree_traversal.rs:54-302``, WGSL twin at
``assets/shaders/svo.wgsl:226-485``).  Instead of one scalar loop per ray, a
whole structure-of-arrays ray batch advances in lockstep under one
``lax.while_loop``: every iteration performs two gathers from the HBM node
pool (child mask + child word) and fully-masked PUSH / ADVANCE / POP lane
updates on the VPU.  Per-lane traversal stacks are ``(B, 24)`` arrays; the
float-bit scale tricks map to ``lax.bitcast_convert_type`` and ``lax.clz``.

Lanes terminate independently (leaf candidate / miss / step cap); the loop
runs until every lane is done.  An optional ``accept_fn`` implements the
reference's "model intersection failed -> fall through to ADVANCE" semantics
(``octree_traversal.rs:192-215``) for alpha-tested leaves: rejected candidates
re-enter the loop with a one-step forced ADVANCE.

Validated lane-for-lane against ``octree.traversal_ref.traverse_oracle``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

MAX_STEPS = 1000
MAX_SCALE = 23
EPSILON = 1.1920929e-7  # 2^-23

ACTIVE, CANDIDATE, MISS = 0, 1, 2

_u32 = jnp.uint32
_f32 = jnp.float32
_SIGN = jnp.uint32(0x80000000)


def _bits(x):
    return lax.bitcast_convert_type(x, jnp.uint32)


def _fbits(x):
    return lax.bitcast_convert_type(x, jnp.float32)


def _bitmask3(b):  # (..., 3) bool -> (...,) uint32 with bits x|y<<1|z<<2
    b = b.astype(jnp.uint32)
    return b[..., 0] | (b[..., 1] << 1) | (b[..., 2] << 2)


class TraversalState(NamedTuple):
    # per-ray constants
    ro: jnp.ndarray  # (B,3) origin in [1,2) cube space
    rd: jnp.ndarray  # (B,3) epsilon-clamped direction
    t_coef: jnp.ndarray  # (B,3)
    t_bias: jnp.ndarray  # (B,3) mirrored
    mirror: jnp.ndarray  # (B,) uint32
    max_dst: jnp.ndarray  # (B,) in cube units
    # loop state
    pos: jnp.ndarray  # (B,3)
    index: jnp.ndarray  # (B,) uint32 (mirrored child index)
    parent: jnp.ndarray  # (B,) uint32
    scale: jnp.ndarray  # (B,) int32
    scale_exp2: jnp.ndarray  # (B,)
    t_min: jnp.ndarray  # (B,)
    t_max: jnp.ndarray  # (B,)
    h: jnp.ndarray  # (B,)
    stack_idx: jnp.ndarray  # (B,24) uint32
    stack_t: jnp.ndarray  # (B,24)
    status: jnp.ndarray  # (B,) int32
    reject: jnp.ndarray  # (B,) bool — force ADVANCE on next step (alpha reject)
    steps: jnp.ndarray  # (B,) int32
    # outputs (valid where status == CANDIDATE)
    out_t: jnp.ndarray  # (B,) hit t in cube units
    out_face: jnp.ndarray  # (B,) int32 face id (axis*2 | negative-dir bit)
    out_uv: jnp.ndarray  # (B,2)
    out_leaf: jnp.ndarray  # (B,) uint32 leaf value
    out_voxel_pos: jnp.ndarray  # (B,3) leaf corner in [1,2) space (unmirrored)
    out_voxel_size: jnp.ndarray  # (B,)


class HitResult(NamedTuple):
    hit: jnp.ndarray  # (B,) bool
    t: jnp.ndarray  # (B,) world-space t
    face_id: jnp.ndarray  # (B,) int32
    uv: jnp.ndarray  # (B,2)
    leaf_value: jnp.ndarray  # (B,) uint32
    voxel_pos: jnp.ndarray  # (B,3) world-space voxel min corner
    voxel_size: jnp.ndarray  # (B,) world-space voxel side
    steps: jnp.ndarray  # (B,) int32


def init_state(
    root: jnp.ndarray,
    octree_scale: float,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    max_dst: float = 1024.0,
) -> TraversalState:
    """Per-lane traversal init (``octree_traversal.rs:69-125``)."""
    origins = origins.astype(_f32)
    rd = directions.astype(_f32)
    b = origins.shape[0]
    ro = origins * _f32(octree_scale) + 1.0

    eps_bits = _bits(jnp.float32(EPSILON)) & ~_SIGN
    small = jnp.abs(rd) < EPSILON
    rd = jnp.where(small, _fbits(eps_bits | (_bits(rd) & _SIGN)), rd)

    t_coef = 1.0 / -jnp.abs(rd)
    t_bias = t_coef * ro
    pos_dir = rd > 0.0
    mirror = _bitmask3(pos_dir)
    t_bias = jnp.where(pos_dir, 3.0 * t_coef - t_bias, t_bias)

    t_min = jnp.maximum(jnp.max(2.0 * t_coef - t_bias, axis=-1), 0.0)
    t_max = jnp.min(t_coef - t_bias, axis=-1)
    upper_gt = (1.5 * t_coef - t_bias) > t_min[:, None]
    index = _bitmask3(upper_gt)
    pos = jnp.where(upper_gt, _f32(1.5), _f32(1.0))

    # Derive every constant-initialized carry array from a data-dependent zero
    # so that under shard_map the whole while_loop carry is uniformly
    # device-varying (JAX's varying-manual-axes check rejects mixed carries).
    zf = jnp.zeros_like(t_min)  # (B,) f32, varying
    zu = zf.astype(_u32)
    zi = zf.astype(jnp.int32)

    return TraversalState(
        ro=ro,
        rd=rd,
        t_coef=t_coef,
        t_bias=t_bias,
        mirror=mirror,
        max_dst=zf + max_dst * octree_scale,
        pos=pos,
        index=index,
        parent=zu + jnp.uint32(root),
        scale=zi + (MAX_SCALE - 1),
        scale_exp2=zf + 0.5,
        t_min=t_min,
        t_max=t_max,
        h=t_max,
        stack_idx=jnp.broadcast_to(zu[:, None], (b, MAX_SCALE + 1)) + 0,
        stack_t=jnp.broadcast_to(zf[:, None], (b, MAX_SCALE + 1)) + 0,
        status=zi,
        reject=zu != 0,
        steps=zi,
        out_t=zf + jnp.inf,
        out_face=zi - 1,
        out_uv=jnp.broadcast_to(zf[:, None], (b, 2)) + 0,
        out_leaf=zu,
        out_voxel_pos=jnp.broadcast_to(zf[:, None], (b, 3)) + 0,
        out_voxel_size=zf,
    )


def _hit_info(s: TraversalState):
    """Face id + uv of the current leaf voxel (``octree_traversal.rs:149-190``).

    face_id = axis*2 | sign(rd) with the reference's evident intent for the x
    case (see traversal_ref.py docstring for the deviation note).
    """
    mirror_bit = ((s.mirror[:, None] >> jnp.arange(3, dtype=_u32)[None, :]) & 1) != 0
    unmirrored_pos = jnp.where(
        mirror_bit, 3.0 - s.scale_exp2[:, None] - s.pos, s.pos
    )
    t_corner_h = (s.pos + s.scale_exp2[:, None]) * s.t_coef - s.t_bias
    tc_min = jnp.max(t_corner_h, axis=-1)
    eq = t_corner_h == tc_min[:, None]
    axis = jnp.where(eq[:, 0], 0, jnp.where(eq[:, 1], 1, 2))
    sign = (_bits(jnp.take_along_axis(s.rd, axis[:, None], 1)[:, 0]) >> 31).astype(
        jnp.int32
    )
    face = axis * 2 + sign

    a1 = jnp.array([2, 0, 0], jnp.int32)[axis]
    a2 = jnp.array([1, 2, 1], jnp.int32)[axis]

    def pick(arr, ax):
        return jnp.take_along_axis(arr, ax[:, None], 1)[:, 0]

    tm = tc_min
    uu = (pick(s.ro, a1) + pick(s.rd, a1) * tm - pick(unmirrored_pos, a1)) / s.scale_exp2
    vv = (pick(s.ro, a2) + pick(s.rd, a2) * tm - pick(unmirrored_pos, a2)) / s.scale_exp2
    rd_ax_neg = pick(s.rd, axis) < 0.0
    flip_u = rd_ax_neg & ((axis == 0) | (axis == 2))
    flip_v = rd_ax_neg & (axis == 1)
    uu = jnp.where(flip_u, 1.0 - uu, uu)
    vv = jnp.where(flip_v, 1.0 - vv, vv)
    return face, uu, vv, unmirrored_pos


def traversal_step(
    child_mask: jnp.ndarray, child_data: jnp.ndarray, s: TraversalState
) -> TraversalState:
    """One lockstep iteration of the ESVO loop over the whole batch."""
    active = s.status == ACTIVE

    # loop-top distance cap (octree_traversal.rs:128-130)
    dist_miss = active & (s.t_min > s.max_dst)

    t_corner = s.pos * s.t_coef - s.t_bias
    tc_max = jnp.min(t_corner, axis=-1)

    slot = (s.index ^ s.mirror).astype(jnp.int32)
    node_mask = child_mask[s.parent]
    value = child_data[s.parent, slot]
    present = ((node_mask >> slot.astype(_u32)) & 1) != 0
    leafb = ((node_mask >> (slot.astype(_u32) + 8)) & 1) != 0

    valid = present & (s.t_min <= s.t_max)
    is_hit = active & ~dist_miss & valid & leafb & (s.t_min > 0.0) & ~s.reject

    half = s.scale_exp2 * 0.5
    t_center = half[:, None] * s.t_coef + t_corner
    tv_max = jnp.minimum(s.t_max, tc_max)
    do_push = (
        active & ~dist_miss & valid & ~leafb & (s.t_min <= tv_max) & ~s.reject
    )
    do_adv = active & ~dist_miss & ~is_hit & ~do_push

    # ---- PUSH (octree_traversal.rs:216-243) ----
    h_cond = tc_max < s.h
    lanes = jnp.arange(MAX_SCALE + 1, dtype=jnp.int32)[None, :]
    sel = (do_push & h_cond)[:, None] & (lanes == s.scale[:, None])
    stack_idx = jnp.where(sel, s.parent[:, None], s.stack_idx)
    stack_t = jnp.where(sel, s.t_max[:, None], s.stack_t)

    push_bits = t_center > s.t_min[:, None]
    push_index = _bitmask3(push_bits)
    push_pos = s.pos + jnp.where(push_bits, half[:, None], 0.0)

    # ---- ADVANCE (octree_traversal.rs:249-260) ----
    adv_bits = t_corner <= tc_max[:, None]
    step_mask = _bitmask3(adv_bits)
    adv_pos = s.pos - jnp.where(adv_bits, s.scale_exp2[:, None], 0.0)
    adv_index = s.index ^ step_mask
    pop_needed = do_adv & ((adv_index & step_mask) != 0)

    # ---- POP (octree_traversal.rs:262-299) ----
    diff_axis = _bits(adv_pos) ^ _bits(adv_pos + s.scale_exp2[:, None])
    stepped = ((step_mask[:, None] >> jnp.arange(3, dtype=_u32)[None, :]) & 1) != 0
    differing = (
        jnp.where(stepped[:, 0], diff_axis[:, 0], 0)
        | jnp.where(stepped[:, 1], diff_axis[:, 1], 0)
        | jnp.where(stepped[:, 2], diff_axis[:, 2], 0)
    )
    p_scale = (31 - lax.clz(jnp.maximum(differing, 1))).astype(jnp.int32)
    p_scale_c = jnp.clip(p_scale, 0, MAX_SCALE)
    pop_miss = pop_needed & (p_scale >= MAX_SCALE)
    p_scale_exp2 = jnp.exp2((p_scale_c - MAX_SCALE).astype(_f32))
    p_parent = jnp.take_along_axis(stack_idx, p_scale_c[:, None], 1)[:, 0]
    p_t_max = jnp.take_along_axis(stack_t, p_scale_c[:, None], 1)[:, 0]
    sh = _bits(adv_pos) >> p_scale_c[:, None].astype(_u32)
    p_pos = _fbits(sh << p_scale_c[:, None].astype(_u32))
    p_index = (sh[:, 0] & 1) | ((sh[:, 1] & 1) << 1) | ((sh[:, 2] & 1) << 2)

    do_pop = pop_needed & ~pop_miss

    # ---- merge lane updates ----
    def sel3(c, a, b):
        return jnp.where(c[:, None], a, b)

    pos = sel3(do_push, push_pos, s.pos)
    pos = sel3(do_adv, adv_pos, pos)
    pos = sel3(do_pop, p_pos, pos)

    index = jnp.where(do_push, push_index, s.index)
    index = jnp.where(do_adv, adv_index, index)
    index = jnp.where(do_pop, p_index, index)

    parent = jnp.where(do_push, value, s.parent)
    parent = jnp.where(do_pop, p_parent, parent)

    scale = jnp.where(do_push, s.scale - 1, s.scale)
    scale = jnp.where(do_pop, p_scale_c, scale)

    scale_exp2 = jnp.where(do_push, half, s.scale_exp2)
    scale_exp2 = jnp.where(do_pop, p_scale_exp2, scale_exp2)

    t_min = jnp.where(do_adv, tc_max, s.t_min)
    t_max = jnp.where(do_push, tv_max, s.t_max)
    t_max = jnp.where(do_pop, p_t_max, t_max)

    h = jnp.where(do_push, tc_max, s.h)
    h = jnp.where(do_pop, 0.0, h)

    steps = jnp.where(active, s.steps + 1, s.steps)
    step_cap = active & ~is_hit & (steps >= MAX_STEPS)

    status = s.status
    status = jnp.where(is_hit, CANDIDATE, status)
    status = jnp.where(dist_miss | pop_miss | step_cap, MISS, status)

    # ---- hit outputs for freshly-minted candidates ----
    face, uu, vv, unmirrored_pos = _hit_info(s)
    out_t = jnp.where(is_hit, s.t_min, s.out_t)
    out_face = jnp.where(is_hit, face, s.out_face)
    out_uv = sel3(is_hit, jnp.stack([uu, vv], -1), s.out_uv)
    out_leaf = jnp.where(is_hit, value, s.out_leaf)
    out_voxel_pos = sel3(is_hit, unmirrored_pos, s.out_voxel_pos)
    out_voxel_size = jnp.where(is_hit, s.scale_exp2, s.out_voxel_size)

    return s._replace(
        pos=pos,
        index=index,
        parent=parent,
        scale=scale,
        scale_exp2=scale_exp2,
        t_min=t_min,
        t_max=t_max,
        h=h,
        stack_idx=stack_idx,
        stack_t=stack_t,
        status=status,
        reject=jnp.where(active, False, s.reject),
        steps=steps,
        out_t=out_t,
        out_face=out_face,
        out_uv=out_uv,
        out_leaf=out_leaf,
        out_voxel_pos=out_voxel_pos,
        out_voxel_size=out_voxel_size,
    )


def traverse(
    child_mask: jnp.ndarray,
    child_data: jnp.ndarray,
    root,
    octree_scale: float,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    max_dst: float = 1024.0,
    accept_fn: Optional[Callable] = None,
) -> HitResult:
    """Trace a ray batch to its first (accepted) leaf hits.

    ``accept_fn(leaf_value, face_id, uv, t_world) -> (B,) bool`` decides
    whether a leaf candidate counts as a hit (e.g. texture alpha test); lanes
    whose candidate is rejected resume with a forced ADVANCE, reproducing
    ``octree_traversal.rs:192-215``'s fall-through.  ``None`` accepts all.
    """
    s0 = init_state(root, octree_scale, origins, directions, max_dst)
    inv_scale = 1.0 / octree_scale

    def cond(s):
        return jnp.any(s.status == ACTIVE)

    def body(s):
        s = traversal_step(child_mask, child_data, s)
        if accept_fn is not None:
            cand = s.status == CANDIDATE
            ok = accept_fn(s.out_leaf, s.out_face, s.out_uv, s.out_t * inv_scale)
            rej = cand & ~ok
            s = s._replace(
                status=jnp.where(rej, ACTIVE, s.status),
                reject=rej | s.reject,
            )
        return s

    s = lax.while_loop(cond, body, s0)
    hit = s.status == CANDIDATE
    return HitResult(
        hit=hit,
        t=jnp.where(hit, s.out_t * inv_scale, jnp.inf),
        face_id=s.out_face,
        uv=s.out_uv,
        leaf_value=jnp.where(hit, s.out_leaf, 0),
        voxel_pos=(s.out_voxel_pos - 1.0) * inv_scale,
        voxel_size=s.out_voxel_size * inv_scale,
        steps=s.steps,
    )
