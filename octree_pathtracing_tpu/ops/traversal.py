"""Batched wavefront ESVO traversal — the hot kernel, in pure JAX/XLA.

TPU-native re-design of the reference's per-thread stack traversal
(``/root/reference/src/octree/octree_traversal.rs:54-302``, WGSL twin at
``assets/shaders/svo.wgsl:226-485``).  Instead of one scalar loop per ray, a
whole structure-of-arrays ray batch advances in lockstep under one
``lax.while_loop``: every iteration performs ONE 8-word row-gather from the
HBM node pool and fully-masked PUSH / ADVANCE / POP lane updates on the VPU
(run twice per fetched row — a same-parent ADVANCE immediately examines its
new sibling).  The float-bit scale tricks map to
``lax.bitcast_convert_type`` and ``lax.clz``.

TPU layout decisions (the difference between ~1e5 and ~1e7 rays/s):

- every per-lane vector is stored **component-major** ``(3, B)`` / stacks
  ``(S, B)`` so the minor (vector-lane) dimension is the big ray axis, not a
  3- or 24-wide stub that wastes 97% of each VPU register;
- per-ray constants (t_coef, t_bias, mirror mask, ...) are closed over, not
  carried, so the loop state is minimal;
- per-lane traversal stacks have ``depth`` rows (the reference's fixed 24
  is sized for max depth; a depth-9 region tree only ever touches 9 —
  SURVEY.md §7 hard part (c));
- the step counter is a single scalar (lanes advance in lockstep);
- leaf hit info (face id, uv) is reconstructed once after the loop from the
  frozen candidate state — unless an accept callback needs it inline.

Lanes terminate independently (leaf candidate / miss / step cap); the loop
runs until every lane is done.  An optional ``accept_fn`` implements the
reference's "model intersection failed -> fall through to ADVANCE" semantics
(``octree_traversal.rs:192-215``) for alpha-tested leaves: rejected candidates
re-enter the loop with a one-step forced ADVANCE.

With ``accept_state`` the callback becomes stateful —
``accept_fn(state, ...) -> (ok, state)`` — letting one traversal implement
multi-surface walks (the shadow-ray attenuation march of
``path_tracer.rs:458-483``) by collecting each rejected surface into the
carried state instead of relaunching a fresh traversal per surface.

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
# default masked-examine passes per fetched node row (fused same-parent
# ADVANCE chains).  Measured on chip r4: primaries-only look flat-to-better
# at k=3/4 (55.1/54.8/54.1 ms for k=2/3/4), but END-TO-END the extra VPU
# pass loses (full bench fwd 48.6/52.1/52.6 ms, fwd+bwd 65.0/66.2/69.3) —
# k=2 stays (tools/PERF_NOTES.md r4).  Trace-time constant; override per
# call via traverse(k_examine=).
K_EXAMINE = 2

ACTIVE, CANDIDATE, MISS, BRICK = 0, 1, 2, 3

_u32 = jnp.uint32
_f32 = jnp.float32
_SIGN = jnp.uint32(0x80000000)


def _bits(x):
    return lax.bitcast_convert_type(x, jnp.uint32)


def _fbits(x):
    return lax.bitcast_convert_type(x, jnp.float32)


class RayConstants(NamedTuple):
    """Per-ray loop invariants (component-major)."""

    ro: jnp.ndarray  # (3, B) origin in [1,2) cube space
    rd: jnp.ndarray  # (3, B) epsilon-clamped direction
    t_coef: jnp.ndarray  # (3, B)
    t_bias: jnp.ndarray  # (3, B) mirrored
    mirror: jnp.ndarray  # (B,) int32 bitmask
    max_dst: jnp.ndarray  # () scalar in cube units


class Carry(NamedTuple):
    pos: jnp.ndarray  # (3, B)
    index: jnp.ndarray  # (B,) int32 mirrored child index
    parent: jnp.ndarray  # (B,) int32 node id
    scale: jnp.ndarray  # (B,) int32
    scale_exp2: jnp.ndarray  # (B,)
    t_min: jnp.ndarray  # (B,)
    t_max: jnp.ndarray  # (B,)
    h: jnp.ndarray  # (B,)
    stack_idx: jnp.ndarray  # (S, B) int32
    stack_t: jnp.ndarray  # (S, B)
    status: jnp.ndarray  # (B,) int32
    reject: jnp.ndarray  # (B,) bool
    cand: jnp.ndarray  # (B,) int32 — value word of the current leaf candidate
    step: jnp.ndarray  # () int32
    user: tuple  # accept_state pytree (possibly empty)


class HitResult(NamedTuple):
    hit: jnp.ndarray  # (B,) bool
    t: jnp.ndarray  # (B,) world-space t
    face_id: jnp.ndarray  # (B,) int32 (axis*2 | negative-dir bit)
    uv: jnp.ndarray  # (B, 2)
    leaf_value: jnp.ndarray  # (B,) uint32
    voxel_pos: jnp.ndarray  # (B, 3) world-space voxel min corner
    voxel_size: jnp.ndarray  # (B,) world-space voxel side
    steps: jnp.ndarray  # () int32 — loop iterations executed


def _init(root, octree_scale, origins, directions, max_dst, stack_rows,
          t_start=None):
    """Per-lane traversal init (``octree_traversal.rs:69-125``).

    ``t_start``: optional (B,) WORLD-space parameter to restart the march at
    (beam pre-pass): ``t_min`` clamps up to it and the root-level child
    selection below then picks the cell containing the ray at that t — the
    same init math already handles origins inside the volume."""
    ro = origins.astype(_f32).T * _f32(octree_scale) + 1.0  # (3, B)
    rd = directions.astype(_f32).T
    b = ro.shape[1]

    eps_bits = _bits(jnp.float32(EPSILON)) & ~_SIGN
    small = jnp.abs(rd) < EPSILON
    rd = jnp.where(small, _fbits(eps_bits | (_bits(rd) & _SIGN)), rd)

    t_coef = 1.0 / -jnp.abs(rd)
    t_bias = t_coef * ro
    pos_dir = rd > 0.0
    mirror = (
        pos_dir[0].astype(jnp.int32)
        | (pos_dir[1].astype(jnp.int32) << 1)
        | (pos_dir[2].astype(jnp.int32) << 2)
    )
    t_bias = jnp.where(pos_dir, 3.0 * t_coef - t_bias, t_bias)

    t_min = jnp.maximum(jnp.max(2.0 * t_coef - t_bias, axis=0), 0.0)
    t_max = jnp.min(t_coef - t_bias, axis=0)
    if t_start is not None:
        t_min = jnp.maximum(t_min, t_start.astype(_f32) * _f32(octree_scale))
    upper_gt = (1.5 * t_coef - t_bias) > t_min[None, :]
    index = (
        upper_gt[0].astype(jnp.int32)
        | (upper_gt[1].astype(jnp.int32) << 1)
        | (upper_gt[2].astype(jnp.int32) << 2)
    )
    pos = jnp.where(upper_gt, _f32(1.5), _f32(1.0))

    zf = jnp.zeros_like(t_min)  # varying zeros (shard_map VMA-uniform carry)
    zi = zf.astype(jnp.int32)

    consts = RayConstants(
        ro=ro,
        rd=rd,
        t_coef=t_coef,
        t_bias=t_bias,
        mirror=mirror,
        max_dst=jnp.float32(max_dst * octree_scale),
    )
    carry = Carry(
        pos=pos,
        index=index,
        parent=zi + jnp.int32(root),
        scale=zi + (MAX_SCALE - 1),
        scale_exp2=zf + 0.5,
        t_min=t_min,
        t_max=t_max,
        h=t_max,
        stack_idx=jnp.broadcast_to(zi[None, :], (stack_rows, b)) + 0,
        stack_t=jnp.broadcast_to(zf[None, :], (stack_rows, b)) + 0,
        status=zi,
        reject=zi != 0,
        cand=zi,
        step=jnp.int32(0),
        user=(),
    )
    return consts, carry


VALUE_MASK = 0x3FFFFFFF  # low 30 bits: child index / leaf value
PRESENT_BIT = 30
LEAF_BIT_PACKED = 31


def _mux8(slot, cols):
    """Select cols[slot] per lane via a 3-level select tree (avoids a second
    gather op — TPU gathers have ~ms per-op cost, selects are VPU-cheap)."""
    s0 = (slot & 1) != 0
    s1 = (slot & 2) != 0
    s2 = (slot & 4) != 0
    a0 = jnp.where(s0, cols[1], cols[0])
    a1 = jnp.where(s0, cols[3], cols[2])
    a2 = jnp.where(s0, cols[5], cols[4])
    a3 = jnp.where(s0, cols[7], cols[6])
    b0 = jnp.where(s1, a1, a0)
    b1 = jnp.where(s1, a3, a2)
    return jnp.where(s2, b1, b0)


def _step(nodes_packed, c: RayConstants, s: Carry, scale_base, brick_bit=None,
          k_examine=2, stop_scale=None):
    """One lockstep iteration of the ESVO loop over the whole batch.

    ``nodes_packed``: (N, 8) int32 — one word per child slot: low 30 bits =
    child index / leaf value, bit 30 = present, bit 31 = leaf.  One 8-wide
    row-gather per iteration fetches the whole node (TPU gather cost is per
    row, nearly independent of row width); the slot select is a VPU mux tree.

    The iteration runs the decision block ``k_examine`` times against the one
    fetched row (``_examine``): lanes whose action keeps them inside the
    cached row immediately act again — the row is already in registers, and
    the VPU select-tree body is ~free next to the gather (PERF_NOTES:
    same-parent ADVANCE alone is ~23% of steps).

    (A two-level 72-word supernode variant was built, proven bit-exact, and
    measured 2-4x SLOWER on TPU v5e — wide-row word extraction is cross-lane
    bound; evidence in tools/PERF_NOTES.md r3.  The machinery was removed
    from this kernel in r4.)

    ``scale_base`` = MAX_SCALE - depth: stack rows are indexed by
    ``scale - scale_base`` (the only scales a depth-deep tree can visit).

    ``brick_bit``: when set (brick-leaf pools, ``octree/brick.py``), a leaf
    word with that value bit becomes status=BRICK (frozen for the DDA phase
    of ``ops/brick_traversal.py``) instead of CANDIDATE.  Brick entry does
    not require ``t_min > 0``: a ray starting inside a brick must still DDA
    its tail cells (the per-cell t>0 check applies instead).
    """
    row = nodes_packed[s.parent]  # (B, 8) — the step's single gather
    mask = None
    for _ in range(k_examine):
        s, mask = _examine(row, c, s, scale_base, brick_bit, mask, stop_scale)
    return s._replace(step=s.step + 1)


def _examine(row, c: RayConstants, s: Carry, scale_base, brick_bit, act_mask,
             stop_scale=None):
    """One masked PUSH/ADVANCE/POP/hit decision against a fetched node row.

    ``act_mask``: lanes allowed to act (None = all).  Returns
    ``(new_carry, cont)`` where ``cont`` marks lanes whose next examination
    can reuse the same row (a same-parent ADVANCE).

    ``stop_scale``: static int — any PRESENT child cell at scale <=
    stop_scale counts as a leaf (conservative coarse/LOD traversal: its
    entry t lower-bounds every surface t inside it; the beam pre-pass).
    """
    active = s.status == ACTIVE
    if act_mask is not None:
        active = active & act_mask

    # loop-top distance cap (octree_traversal.rs:128-130)
    dist_miss = active & (s.t_min > c.max_dst)

    t_corner = s.pos * c.t_coef - c.t_bias  # (3, B)
    tc_max = jnp.min(t_corner, axis=0)

    slot = s.index ^ c.mirror
    word = _mux8(slot, [row[:, i] for i in range(8)])
    value = word & VALUE_MASK
    present = ((word >> PRESENT_BIT) & 1) != 0
    leafb = (word >> LEAF_BIT_PACKED) != 0  # arithmetic shift of the sign bit
    t_ok = s.t_min > 0.0
    if stop_scale is not None:
        # an INTERNAL stop-scale cell hits even at t_min == 0: a ray starting
        # inside it may still face sub-geometry at t > 0, and a conservative
        # pre-pass must not skip past that (real leaves keep the reference's
        # origin-inside-voxel skip, matching the fine pass)
        stop_internal = (s.scale <= stop_scale) & ~leafb
        leafb = leafb | stop_internal
        t_ok = t_ok | stop_internal

    valid = present & (s.t_min <= s.t_max)
    is_hit = active & ~dist_miss & valid & leafb & t_ok & ~s.reject
    if brick_bit is not None:
        brickf = (value & jnp.int32(brick_bit)) != 0
        brick_hit = active & ~dist_miss & valid & leafb & brickf & ~s.reject
        is_hit = is_hit & ~brickf
    else:
        brick_hit = None

    half = s.scale_exp2 * 0.5
    t_center = half[None, :] * c.t_coef + t_corner
    tv_max = jnp.minimum(s.t_max, tc_max)
    do_push = active & ~dist_miss & valid & ~leafb & (s.t_min <= tv_max) & ~s.reject
    do_adv = active & ~dist_miss & ~is_hit & ~do_push
    if brick_hit is not None:
        do_adv = do_adv & ~brick_hit

    # ---- PUSH (octree_traversal.rs:216-243) ----
    h_cond = tc_max < s.h
    rows = jnp.arange(s.stack_idx.shape[0], dtype=jnp.int32)[:, None]
    rel_scale = s.scale - scale_base
    sel = (do_push & h_cond)[None, :] & (rows == rel_scale[None, :])
    stack_idx = jnp.where(sel, s.parent[None, :], s.stack_idx)
    stack_t = jnp.where(sel, s.t_max[None, :], s.stack_t)

    push_bits = t_center > s.t_min[None, :]
    push_index = (
        push_bits[0].astype(jnp.int32)
        | (push_bits[1].astype(jnp.int32) << 1)
        | (push_bits[2].astype(jnp.int32) << 2)
    )
    push_pos = s.pos + jnp.where(push_bits, half[None, :], 0.0)

    # ---- ADVANCE (octree_traversal.rs:249-260) ----
    adv_bits = t_corner <= tc_max[None, :]
    step_mask = (
        adv_bits[0].astype(jnp.int32)
        | (adv_bits[1].astype(jnp.int32) << 1)
        | (adv_bits[2].astype(jnp.int32) << 2)
    )
    adv_pos = s.pos - jnp.where(adv_bits, s.scale_exp2[None, :], 0.0)
    adv_index = s.index ^ step_mask
    pop_needed = do_adv & ((adv_index & step_mask) != 0)

    # ---- POP (octree_traversal.rs:262-299) ----
    diff_axis = _bits(adv_pos) ^ _bits(adv_pos + s.scale_exp2[None, :])
    differing = (
        jnp.where(adv_bits[0], diff_axis[0], 0)
        | jnp.where(adv_bits[1], diff_axis[1], 0)
        | jnp.where(adv_bits[2], diff_axis[2], 0)
    )
    p_scale = (31 - lax.clz(jnp.maximum(differing, 1))).astype(jnp.int32)
    pop_miss = pop_needed & (p_scale >= MAX_SCALE)
    p_scale_c = jnp.clip(p_scale, scale_base, MAX_SCALE - 1)
    p_rel = p_scale_c - scale_base
    # exp2(p_scale - 23) via exponent-field construction (no transcendental)
    p_scale_exp2 = _fbits(((p_scale_c - MAX_SCALE + 127) << 23).astype(_u32))
    # stack read as a select chain over the (few) rows — take_along_axis
    # would lower to a gather op, whose per-op cost dominates the loop on TPU
    p_parent = stack_idx[0]
    p_t_max = stack_t[0]
    for r in range(1, stack_idx.shape[0]):
        sel_r = p_rel == r
        p_parent = jnp.where(sel_r, stack_idx[r], p_parent)
        p_t_max = jnp.where(sel_r, stack_t[r], p_t_max)
    sh = (_bits(adv_pos) >> p_scale_c[None, :].astype(_u32)).astype(jnp.int32)
    p_pos = _fbits((sh << p_scale_c[None, :]).astype(_u32))
    p_index = (sh[0] & 1) | ((sh[1] & 1) << 1) | ((sh[2] & 1) << 2)

    do_pop = pop_needed & ~pop_miss

    # ---- merge lane updates ----
    pos = jnp.where(do_push[None, :], push_pos, s.pos)
    pos = jnp.where(do_adv[None, :], adv_pos, pos)
    pos = jnp.where(do_pop[None, :], p_pos, pos)

    index = jnp.where(do_push, push_index, s.index)
    index = jnp.where(do_adv, adv_index, index)
    index = jnp.where(do_pop, p_index, index)

    parent = jnp.where(do_push, value.astype(jnp.int32), s.parent)
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

    status = s.status
    status = jnp.where(is_hit, CANDIDATE, status)
    if brick_hit is not None:
        status = jnp.where(brick_hit, BRICK, status)
    status = jnp.where(dist_miss | pop_miss, MISS, status)

    # the candidate's leaf word rides the carry: the accept path and the
    # post-loop hit info read it from registers instead of re-gathering the
    # (894k-row) node pool — one whole gather op per firing iteration saved
    # (measured: the accept block multiplied per-iteration cost ~7x on a
    # cutout scene, and the row re-fetch was the biggest line item)
    cand = jnp.where(is_hit, value, s.cand)

    same_parent = do_adv & ~do_pop & (status == ACTIVE)
    return Carry(
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
        cand=cand,
        step=s.step,
        user=s.user,
    ), same_parent


def _hit_info(c: RayConstants, s: Carry):
    """Face id + uv + voxel corner of the frozen candidate state
    (``octree_traversal.rs:149-190``); see traversal_ref.py for the
    x-axis face-id deviation note."""
    mbit = jnp.stack(
        [(c.mirror >> i) & 1 for i in range(3)]
    ).astype(bool)  # (3, B)
    unmirrored_pos = jnp.where(mbit, 3.0 - s.scale_exp2[None, :] - s.pos, s.pos)
    t_corner_h = (s.pos + s.scale_exp2[None, :]) * c.t_coef - c.t_bias
    tc_min = jnp.max(t_corner_h, axis=0)
    eq = t_corner_h == tc_min[None, :]
    axis = jnp.where(eq[0], 0, jnp.where(eq[1], 1, 2))
    rd_ax = jnp.where(axis == 0, c.rd[0], jnp.where(axis == 1, c.rd[1], c.rd[2]))
    sign = (_bits(rd_ax) >> 31).astype(jnp.int32)
    face = axis * 2 + sign

    def pick(arr, ax_idx):
        return jnp.where(
            ax_idx == 0, arr[0], jnp.where(ax_idx == 1, arr[1], arr[2])
        )

    a1 = jnp.where(axis == 0, 2, 0)
    a2 = jnp.where(axis == 1, 2, 1)
    uu = (pick(c.ro, a1) + pick(c.rd, a1) * tc_min - pick(unmirrored_pos, a1)) / s.scale_exp2
    vv = (pick(c.ro, a2) + pick(c.rd, a2) * tc_min - pick(unmirrored_pos, a2)) / s.scale_exp2
    neg = rd_ax < 0.0
    uu = jnp.where(neg & (axis != 1), 1.0 - uu, uu)
    vv = jnp.where(neg & (axis == 1), 1.0 - vv, vv)
    return face, uu, vv, unmirrored_pos


def _leaf_value(nodes_packed, c: RayConstants, s: Carry):
    slot = s.index ^ c.mirror
    row = nodes_packed[s.parent]
    return _mux8(slot, [row[:, i] for i in range(8)]) & VALUE_MASK


def pack_nodes(child_mask, child_data):
    """(N,) mask + (N, 8) children -> (N, 8) int32 flags-in-word table.

    Per child word: value (30 bits) | present << 30 | leaf << 31.  Child
    indices and leaf values must fit 30 bits (tree sizes up to 1B nodes;
    leaf values are material/model ids).
    """
    present = (child_mask[:, None].astype(jnp.int32) >> jnp.arange(8, dtype=jnp.int32)) & 1
    leaf = (
        child_mask[:, None].astype(jnp.int32) >> (jnp.arange(8, dtype=jnp.int32) + 8)
    ) & 1
    value = child_data.astype(jnp.int32) & VALUE_MASK
    return value | (present << PRESENT_BIT) | (leaf << LEAF_BIT_PACKED)


def traverse(
    child_mask: jnp.ndarray,
    child_data: jnp.ndarray,
    root,
    octree_scale: float,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    max_dst: float = 1024.0,
    accept_fn: Optional[Callable] = None,
    depth: Optional[int] = None,
    accept_state=None,
    active_mask=None,
    k_examine: Optional[int] = None,
    stop_cells: Optional[int] = None,
    t_start=None,
    max_steps: Optional[int] = None,
    export_resume: bool = False,
):
    """Trace a ray batch to its first (accepted) leaf hits.

    ``k_examine``: decision blocks run per fetched node row (default 2 —
    the fused same-parent-ADVANCE win of PERF_NOTES r3).

    ``stop_cells``: coarse/LOD mode — any present cell of ``stop_cells``
    voxels per side counts as a leaf (requires ``depth``).  Conservative:
    the reported t lower-bounds every surface t inside the cell.  Used by
    the beam pre-pass and LOD previews; ``leaf_value`` is then the child
    word's value field (a node index for internal cells — don't shade it).

    ``t_start``: optional (B,) world-space parameter to restart the march at
    (``t_min = max(entry, t_start)``) — the fine pass of a beam-restart
    resumes just before the coarse cell the pre-pass found.  All t values
    re-derive from the current position each iteration, so a restarted
    march lands on bit-identical hits.

    ``max_steps``/``export_resume``: straggler-drain support.  ``max_steps``
    caps the lockstep loop below the default MAX_STEPS; with
    ``export_resume`` the call returns ``(HitResult, resume_t, unfinished)``
    where ``unfinished`` marks lanes still ACTIVE at the cap and
    ``resume_t`` is their current world-space march parameter — re-calling
    with ``t_start = resume_t - margin`` continues the walk (restart-from-t,
    see above).  The drain orchestration lives in the integrator
    (``render/pathtracer.py``).

    ``active_mask``: optional (B,) bool — lanes that are False start as
    MISS and contribute no loop iterations (wavefront compaction: a tile of
    dead lanes exits its lockstep loop immediately).

    ``accept_fn(leaf_value, face_id, uv, t_world, voxel_pos, voxel_size) ->
    (B,) bool`` decides whether a leaf candidate counts as a hit (texture
    alpha test / block-model intersection); lanes whose candidate is rejected
    resume with a forced ADVANCE, reproducing ``octree_traversal.rs:192-215``'s
    fall-through.  ``None`` accepts all.  ``voxel_pos``/``voxel_size`` are
    world-space (the leaf's min corner and side).

    With ``accept_state`` (an initial pytree of (B, ...) arrays) the callback
    is stateful: ``accept_fn(state, leaf_value, ...) -> ((B,) ok, state)``.
    The state is threaded through the traversal carry and the call returns
    ``(HitResult, final_state)`` instead of just ``HitResult`` — one
    traversal can then record every surface it falls through (shadow
    attenuation walks).  Everything inside the loop is non-differentiable;
    recompute any gradient-bearing quantity from the recorded state outside.

    ``depth``: static octree depth; sizes the per-lane stacks (defaults to
    the max 23 when unknown).
    """
    stack_rows = int(depth) + 1 if depth is not None else MAX_SCALE + 1
    scale_base = MAX_SCALE - (int(depth) if depth is not None else MAX_SCALE)
    stop_scale = None
    if stop_cells is not None:
        if depth is None:
            raise ValueError("stop_cells requires depth")
        import math

        stop_scale = scale_base + int(math.log2(stop_cells))
    consts, carry0 = _init(
        root, octree_scale, origins, directions, max_dst, stack_rows,
        t_start=t_start,
    )
    nodes_packed = pack_nodes(child_mask, child_data)
    loop_table = nodes_packed
    k = k_examine if k_examine is not None else K_EXAMINE
    inv_scale = 1.0 / octree_scale
    stateful = accept_state is not None
    if stateful:
        carry0 = carry0._replace(user=accept_state)
    if active_mask is not None:
        carry0 = carry0._replace(
            status=jnp.where(active_mask, carry0.status, MISS)
        )

    step_cap = MAX_STEPS if max_steps is None else int(max_steps)

    def cond(s):
        return jnp.any(s.status == ACTIVE) & (s.step < step_cap)

    if accept_fn is None:

        def body(s):
            return _step(loop_table, consts, s, scale_base, k_examine=k,
                         stop_scale=stop_scale)

    else:

        def body(s):
            prev_status = s.status
            s = _step(loop_table, consts, s, scale_base, k_examine=k,
                      stop_scale=stop_scale)
            fresh = (s.status == CANDIDATE) & (prev_status == ACTIVE)

            def run_accept(s, fresh=fresh):
                face, uu, vv, unmirrored_pos = _hit_info(consts, s)
                args = (
                    s.cand.astype(_u32),  # carried candidate word: no re-gather
                    face,
                    jnp.stack([uu, vv], axis=-1),
                    s.t_min * inv_scale,
                    ((unmirrored_pos - 1.0) * inv_scale).T,
                    s.scale_exp2 * inv_scale,
                )
                if stateful:
                    ok, user = accept_fn(s.user, *args, fresh=fresh)
                    s = s._replace(user=user)
                else:
                    ok = accept_fn(*args, fresh=fresh)
                rej = fresh & ~ok
                return s._replace(
                    status=jnp.where(rej, ACTIVE, s.status),
                    reject=rej | s.reject,
                )

            # the accept path costs several gather ops (leaf word, material
            # row, atlas texel — each with the fixed per-gather-op cost of
            # tools/PERF_NOTES.md); most lockstep iterations produce no fresh
            # candidate in any lane, so gate the whole block on one runtime
            # flag.  The loop is fully detached from AD (no VJP through
            # lax.cond here).
            return lax.cond(jnp.any(fresh), run_accept, lambda s: s, s)

    s = lax.while_loop(cond, body, carry0)

    hit = s.status == CANDIDATE
    face, uu, vv, unmirrored_pos = _hit_info(consts, s)
    leaf = s.cand  # carried at hit time; saves the post-loop pool gather
    res = HitResult(
        hit=hit,
        t=jnp.where(hit, s.t_min * inv_scale, jnp.inf),
        face_id=jnp.where(hit, face, -1),
        uv=jnp.stack([uu, vv], axis=-1),
        leaf_value=jnp.where(hit, leaf.astype(_u32), 0),
        voxel_pos=((unmirrored_pos - 1.0) * inv_scale).T,
        voxel_size=s.scale_exp2 * inv_scale,
        steps=s.step,
    )
    if export_resume:
        unfinished = s.status == ACTIVE
        resume_t = s.t_min * inv_scale
        if stateful:
            return res, s.user, resume_t, unfinished
        return res, resume_t, unfinished
    if stateful:
        return res, s.user
    return res
