"""Phase-split traversal over brick-leaf octrees — the gather-minimal kernel.

TPU dynamic gathers cost ~10 ns/row regardless of row width (256 B rows are
as cheap as 16 B ones — ``tools/PERF_NOTES.md``), and they are ~99% of the
plain wavefront ESVO loop's per-iteration time.  This kernel restructures the
walk so most iterations need NO gather:

- **tree phase** — the validated ESVO lockstep loop (``ops/traversal.py``)
  over the *internal* pool (depth-2 levels); leaf words flagged with
  ``BRICK_BIT`` freeze their lane in status=BRICK;
- **brick phase** — ONE ``(B, 64)`` row gather fetches each frozen lane's
  4^3 brick, then a bounded ``fori_loop`` DDA-marches up to 10 cells per ray
  entirely on the VPU (cell select = a 6-level mux tree over the 64 fetched
  words); hits become candidates, exits resume the tree phase via the
  reject/ADVANCE fall-through, exactly like a rejected leaf
  (``octree_traversal.rs:192-215`` semantics).

The two phases alternate under an outer ``while_loop`` until every lane
terminates.  Results are lane-for-lane identical to ``traversal.traverse`` on
the equivalent plain pool (tested in ``tests/test_brick.py``): same hit/t/
face/uv/leaf/voxel outputs, same accept-callback protocol (stateless and
stateful), because cell entry times, faces and uvs are computed with the same
mirrored-plane formulas (t = x * t_coef - t_bias).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from jax import lax

from ..octree.brick import BRICK_BIT as _BRICK_BIT_NP
from .traversal import (
    ACTIVE,
    BRICK,
    CANDIDATE,
    HitResult,
    MAX_STEPS,
    MISS,
    _hit_info,
    _init,
    _leaf_value,
    _mux8,
    _step,
    pack_nodes,
)

BRICK_BIT = int(_BRICK_BIT_NP)
BRICK_ID_MASK = BRICK_BIT - 1
DDA_STEPS = 10  # max cells a segment can cross in a 4^3 grid (4+4+4-2)
MAX_ROUNDS = 256  # outer tree/brick alternations (bounds brick entries/ray)


def _mux(idx, cols):
    """cols[idx] per lane via a log2(len) select tree (no gather op)."""
    cols = list(cols)
    bit = 0
    while len(cols) > 1:
        sel = ((idx >> bit) & 1) != 0
        cols = [
            jnp.where(sel, cols[i + 1], cols[i]) for i in range(0, len(cols), 2)
        ]
        bit += 1
    return cols[0]


def traverse_tree(
    tree,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    max_dst: float = 1024.0,
    accept_fn: Optional[Callable] = None,
    accept_state=None,
    active_mask=None,
    stop_cells: Optional[int] = None,
    t_start=None,
    max_steps: Optional[int] = None,
    export_resume: bool = False,
):
    """Dispatch a ray batch to the kernel matching the pool layout:
    ``BrickOctree`` -> ``traverse_brick``; plain ``Octree`` -> ``traverse``.
    Same contract either way (accept protocol, HitResult, world units,
    ``active_mask`` dead-lane skip).

    (A two-level supernode path existed here through r3; measured 4x slower
    on TPU v5e and removed in r4 — evidence in tools/PERF_NOTES.md.)
    """
    from ..octree.brick import BrickOctree
    from .traversal import traverse

    if isinstance(tree, BrickOctree):
        if stop_cells is not None or t_start is not None:
            raise ValueError("beam/LOD traversal is plain-Octree only")
        return traverse_brick(
            tree,
            origins,
            directions,
            max_dst=max_dst,
            accept_fn=accept_fn,
            accept_state=accept_state,
            active_mask=active_mask,
        )
    return traverse(
        tree.child_mask,
        tree.child_data,
        tree.root,
        tree.scale(),
        origins,
        directions,
        max_dst=max_dst,
        accept_fn=accept_fn,
        depth=tree.depth,
        accept_state=accept_state,
        active_mask=active_mask,
        stop_cells=stop_cells,
        t_start=t_start,
        max_steps=max_steps,
        export_resume=export_resume,
    )


def traverse_brick(
    tree,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    max_dst: float = 1024.0,
    accept_fn: Optional[Callable] = None,
    accept_state=None,
    active_mask=None,
):
    """Trace a ray batch against a ``BrickOctree``; same contract as
    ``traversal.traverse`` (accept protocol, HitResult fields, world units).
    """
    depth = tree.depth
    eff_depth = depth - 2  # internal tree's leaf (= brick) level
    stack_rows = eff_depth + 1
    scale_base = 23 - eff_depth  # MAX_SCALE - eff_depth
    octree_scale = tree.scale()
    inv_scale = 1.0 / octree_scale

    consts, carry0 = _init(
        tree.root, octree_scale, origins, directions, max_dst, stack_rows
    )
    nodes_packed = pack_nodes(
        jnp.asarray(tree.child_mask), jnp.asarray(tree.child_data)
    )
    bricks = jnp.asarray(tree.bricks).astype(jnp.int32)  # (NB, 64)
    b = origins.shape[0]

    stateful = accept_state is not None
    if stateful:
        carry0 = carry0._replace(user=accept_state)
    if active_mask is not None:
        carry0 = carry0._replace(
            status=jnp.where(active_mask, carry0.status, MISS)
        )

    mbit = jnp.stack([(consts.mirror >> i) & 1 for i in range(3)])  # (3, B)

    def _accept(s, fresh, pos_v, h_v, t_v, leaf):
        """Invoke the accept callback on fresh voxel candidates using the
        same frozen-state geometry as the tree path."""
        sv = s._replace(pos=pos_v, scale_exp2=h_v, t_min=t_v)
        face, uu, vv, unmirrored_pos = _hit_info(consts, sv)
        args = (
            leaf.astype(jnp.uint32),
            face,
            jnp.stack([uu, vv], axis=-1),
            t_v * inv_scale,
            ((unmirrored_pos - 1.0) * inv_scale).T,
            h_v * inv_scale,
        )
        if stateful:
            ok, user = accept_fn(s.user, *args, fresh=fresh)
            return ok, s._replace(user=user)
        return accept_fn(*args, fresh=fresh), s

    # ---- tree phase (gathers) ----
    def tree_cond(st):
        s, _, _ = st
        return jnp.any(s.status == ACTIVE) & (s.step < MAX_STEPS)

    def tree_body(st):
        s, brick_leaf, from_brick = st
        prev_status = s.status
        s = _step(nodes_packed, consts, s, scale_base, brick_bit=BRICK_BIT)
        if accept_fn is not None:
            fresh = (s.status == CANDIDATE) & (prev_status == ACTIVE)
            leaf = _leaf_value(nodes_packed, consts, s)
            ok, s = _accept(s, fresh, s.pos, s.scale_exp2, s.t_min, leaf)
            rej = fresh & ~ok
            s = s._replace(
                status=jnp.where(rej, ACTIVE, s.status),
                reject=rej | s.reject,
            )
        return s, brick_leaf, from_brick

    # ---- brick phase (one gather + VPU DDA) ----
    def brick_phase(st):
        s, brick_leaf, from_brick = st
        in_brick = s.status == BRICK
        bid = _leaf_value(nodes_packed, consts, s) & BRICK_ID_MASK
        row = bricks[jnp.where(in_brick, bid, 0)]  # (B, 64) — THE gather
        cols = [row[:, i] for i in range(64)]

        h_b = s.scale_exp2  # brick side (cube units); frozen at entry
        h_v = h_b * 0.25
        t_enter = jnp.maximum(s.t_min, 0.0)

        # mirrored entry cell: count internal planes still ahead of t_enter
        # (mirrored rays move high->low, so cell k's low plane is pos + k*h_v)
        ks = jnp.arange(1, 4, dtype=jnp.float32)[:, None, None]  # (3, 1, B)
        t_planes = (s.pos[None, :, :] + ks * h_v[None, None, :]) * consts.t_coef[
            None, :, :
        ] - consts.t_bias[None, :, :]
        mc0 = jnp.sum((t_planes > t_enter[None, None, :]).astype(jnp.int32), axis=0)

        def dda_body(_, dst):
            s, mc, t_cur, dda_on, brick_leaf, from_brick = dst
            inside = jnp.all(mc >= 0, axis=0)
            live = dda_on & inside
            ucell = jnp.where(mbit != 0, 3 - mc, mc)  # unmirror
            cell_idx = ucell[0] + (ucell[1] << 2) + (ucell[2] << 4)
            word = _mux(cell_idx, cols)

            # cell exit: crossing the low (mirrored) boundary per axis
            t_exit_ax = (s.pos + mc.astype(jnp.float32) * h_v[None, :]) * (
                consts.t_coef
            ) - consts.t_bias
            t_exit = jnp.min(t_exit_ax, axis=0)

            cand = live & (word != 0) & (t_cur > 0.0)
            if accept_fn is not None:
                ok, s = _accept(
                    s, cand, s.pos + mc.astype(jnp.float32) * h_v[None, :],
                    h_v, t_cur, word,
                )
                cand = cand & ok
            hit = cand

            # freeze hit lanes at the voxel (HitResult reads pos/scale/t_min)
            pos_v = s.pos + mc.astype(jnp.float32) * h_v[None, :]
            s = s._replace(
                pos=jnp.where(hit[None, :], pos_v, s.pos),
                scale_exp2=jnp.where(hit, h_v, s.scale_exp2),
                t_min=jnp.where(hit, t_cur, s.t_min),
                status=jnp.where(hit, CANDIDATE, s.status),
            )
            brick_leaf = jnp.where(hit, word, brick_leaf)
            from_brick = from_brick | hit

            # DDA step for surviving lanes
            step_ax = t_exit_ax <= t_exit[None, :]
            adv = live & ~hit
            mc = jnp.where(step_ax & adv[None, :], mc - 1, mc)
            t_cur = jnp.where(adv, t_exit, t_cur)
            dist_miss = adv & (t_cur > consts.max_dst)
            s = s._replace(status=jnp.where(dist_miss, MISS, s.status))
            dda_on = adv & ~dist_miss
            return s, mc, t_cur, dda_on, brick_leaf, from_brick

        dst = (s, mc0, t_enter, in_brick, brick_leaf, from_brick)
        s, mc, t_cur, dda_on, brick_leaf, from_brick = lax.fori_loop(
            0, DDA_STEPS, dda_body, dst
        )

        # lanes that exited their brick resume the tree walk with the
        # rejected-leaf fall-through (forced ADVANCE past the brick node)
        resume = (s.status == BRICK)
        s = s._replace(
            status=jnp.where(resume, ACTIVE, s.status),
            reject=resume | s.reject,
        )
        return s, brick_leaf, from_brick

    def outer_cond(st):
        (s, _, _), rounds = st
        return (
            jnp.any((s.status == ACTIVE) | (s.status == BRICK))
            & (rounds < MAX_ROUNDS)
            & (s.step < MAX_STEPS)
        )

    def outer_body(st):
        inner, rounds = st
        inner = lax.while_loop(tree_cond, tree_body, inner)
        s, brick_leaf, from_brick = inner
        inner = lax.cond(
            jnp.any(s.status == BRICK),
            brick_phase,
            lambda x: x,
            (s, brick_leaf, from_brick),
        )
        return inner, rounds + 1

    # derive from a varying per-lane array so the while_loop carry keeps
    # consistent varying-manual-axes under shard_map (see traversal._init)
    zi = carry0.index * 0
    st0 = ((carry0, zi, zi != 0), jnp.int32(0))
    (s, brick_leaf, from_brick), _rounds = lax.while_loop(
        outer_cond, outer_body, st0
    )

    hit = s.status == CANDIDATE
    face, uu, vv, unmirrored_pos = _hit_info(consts, s)
    tree_leaf = _leaf_value(nodes_packed, consts, s)
    leaf = jnp.where(from_brick, brick_leaf, tree_leaf)
    res = HitResult(
        hit=hit,
        t=jnp.where(hit, s.t_min * inv_scale, jnp.inf),
        face_id=jnp.where(hit, face, -1),
        uv=jnp.stack([uu, vv], axis=-1),
        leaf_value=jnp.where(hit, leaf.astype(jnp.uint32), 0),
        voxel_pos=((unmirrored_pos - 1.0) * inv_scale).T,
        voxel_size=s.scale_exp2 * inv_scale,
        steps=s.step,
    )
    if stateful:
        return res, s.user
    return res
