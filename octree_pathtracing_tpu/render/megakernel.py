"""Persistent-wavefront fused integrator — traversal + shading in ONE loop.

The bounce-loop integrator (``pathtracer.trace_paths``) runs five sequential
wavefront traversals, each paying the lockstep straggler tax (the batch waits
for its slowest lane every bounce; measured step counts are mean ~10 /
max ~100+, so most iterations run for a tail of stragglers).  This kernel
fuses the bounce loop into the traversal loop, GPU persistent-threads style:

- every iteration advances all in-flight traversal lanes (one node-row gather
  — the per-iteration cost that dominates on TPU);
- lanes that finish (leaf candidate / miss) wait in a ready set;
- when enough lanes are ready (or nothing is left in flight), one *shade
  event* (a ``lax.cond`` branch, so its atlas/material gathers only execute
  when taken) processes the whole ready set: sky for misses, lobe scatter for
  hits, and re-spawns scattered lanes into the traversal with re-initialized
  per-lane state.

The straggler tax is paid once at the end instead of five times, and shading
costs ~a dozen events instead of executing per-iteration.  Semantics are
identical to ``trace_paths`` for strategies without sun NEE (the default
IMPORTANCE strategy; NEE shadow walks still use the bounce-loop integrator) —
both consume the same fixed-slot uniform blocks, so parity is testable
lane-for-lane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..models.scene import Scene, MAX_DIST
from ..ops import traversal as T
from ..ops.shading import OFFSET
from .hit import make_accept_fn, resolve_hit
from .pathtracer import _albedo_at, lobe_scatter, sky_radiance

DONE = 3  # extends the traversal's ACTIVE/CANDIDATE/MISS lane statuses
SHADE_FRACTION = 0.35


def _merge_consts(mask_b, new: T.RayConstants, old: T.RayConstants) -> T.RayConstants:
    m3 = mask_b[None, :]
    return T.RayConstants(
        ro=jnp.where(m3, new.ro, old.ro),
        rd=jnp.where(m3, new.rd, old.rd),
        t_coef=jnp.where(m3, new.t_coef, old.t_coef),
        t_bias=jnp.where(m3, new.t_bias, old.t_bias),
        mirror=jnp.where(mask_b, new.mirror, old.mirror),
        max_dst=old.max_dst,
    )


def _merge_carry(mask_b, new: T.Carry, old: T.Carry) -> T.Carry:
    m3 = mask_b[None, :]
    mS = mask_b[None, :]
    return T.Carry(
        pos=jnp.where(m3, new.pos, old.pos),
        index=jnp.where(mask_b, new.index, old.index),
        parent=jnp.where(mask_b, new.parent, old.parent),
        scale=jnp.where(mask_b, new.scale, old.scale),
        scale_exp2=jnp.where(mask_b, new.scale_exp2, old.scale_exp2),
        t_min=jnp.where(mask_b, new.t_min, old.t_min),
        t_max=jnp.where(mask_b, new.t_max, old.t_max),
        h=jnp.where(mask_b, new.h, old.h),
        stack_idx=jnp.where(mS, new.stack_idx, old.stack_idx),
        stack_t=jnp.where(mS, new.stack_t, old.stack_t),
        status=jnp.where(mask_b, new.status, old.status),
        reject=jnp.where(mask_b, new.reject, old.reject),
        cand=jnp.where(mask_b, new.cand, old.cand),
        step=old.step,
        user=old.user,
    )


def trace_paths_fused(scene: Scene, origins, dirs, uniforms):
    """Drop-in replacement for ``trace_paths`` (no-NEE strategies).

    uniforms: (B, n_bounces, N_UNIFORMS) — the bounce axis sets the depth cap.
    """
    n_bounces = uniforms.shape[1]
    global_step_cap = T.MAX_STEPS * n_bounces
    assert not scene.sun_sampling.sun_sampling, (
        "fused kernel covers strategies without sun NEE; "
        "use trace_paths for FAST/HIGH_QUALITY"
    )
    from ..octree.brick import BrickOctree, debrickify

    if isinstance(scene.octree, BrickOctree):
        # interim: the fused loop walks the plain layout; explode the bricks
        # (host-side -> requires concrete arrays, i.e. call outside jit)
        import dataclasses

        plain = debrickify(scene.octree)
        scene = dataclasses.replace(
            scene,
            octree=type(plain)(
                jnp.asarray(plain.child_mask),
                jnp.asarray(plain.child_data),
                plain.root,
                plain.depth,
            ),
        )
    sg = lax.stop_gradient
    scene_sg = jax.tree.map(sg, scene)
    tree = scene_sg.octree
    octree_scale = tree.scale()
    inv_scale = 1.0 / octree_scale
    stack_rows = tree.depth + 1
    scale_base = T.MAX_SCALE - tree.depth
    nodes = T.pack_nodes(tree.child_mask, tree.child_data)

    b = origins.shape[0]
    origins = origins.astype(jnp.float32)
    dirs = dirs.astype(jnp.float32)

    consts0, carry0 = T._init(
        tree.root, octree_scale, sg(origins), sg(dirs), MAX_DIST, stack_rows
    )

    state = dict(
        consts=consts0,
        carry=carry0,
        w_origin=origins,
        w_dir=dirs,
        throughput=jnp.ones((b, 3), jnp.float32),
        radiance=jnp.zeros((b, 3), jnp.float32),
        bounce=jnp.zeros((b,), jnp.int32),
        specular=jnp.ones((b,), bool),
        cur_mat=jnp.zeros((b,), jnp.int32),
        iters=jnp.int32(0),
    )

    opaque = scene.opaque_only

    def hit_result(st):
        s = st["carry"]
        c = st["consts"]
        face, uu, vv, unmirrored_pos = T._hit_info(c, s)
        leaf = T._leaf_value(nodes, c, s)
        hit = s.status == T.CANDIDATE
        return T.HitResult(
            hit=hit,
            t=jnp.where(hit, s.t_min * inv_scale, jnp.inf),
            face_id=jnp.where(hit, face, -1),
            uv=jnp.stack([uu, vv], axis=-1),
            leaf_value=jnp.where(hit, leaf.astype(jnp.uint32), 0),
            voxel_pos=((unmirrored_pos - 1.0) * inv_scale).T,
            voxel_size=s.scale_exp2 * inv_scale,
            steps=s.step,
        )

    def shade(st):
        s = st["carry"]
        res = hit_result(st)
        ready_hit = s.status == T.CANDIDATE
        ready_miss = s.status == T.MISS

        bounce0 = st["bounce"] == 0
        # uniforms for each lane's current bounce
        bidx = jnp.clip(st["bounce"], 0, n_bounces - 1)
        u = jnp.take_along_axis(uniforms, bidx[:, None, None], axis=1)[:, 0]

        # --- misses: sky ---
        sky_rgb = sky_radiance(scene, st["w_dir"], bounce0, st["specular"])
        radiance = st["radiance"] + jnp.where(
            ready_miss[:, None], st["throughput"] * sky_rgb, 0.0
        )

        # --- hits: scatter or depth-cap ---
        scatter = ready_hit & (st["bounce"] + 1 < n_bounces)
        mat, hit_uv, n, t_hit = resolve_hit(scene, st["w_origin"], st["w_dir"], res)
        albedo = _albedo_at(scene, mat, hit_uv)
        hitpoint = st["w_origin"] + st["w_dir"] * t_hit[:, None]
        sc = lobe_scatter(
            scene, u, st["w_dir"], n, albedo, mat, st["cur_mat"], bounce0
        )
        radiance = radiance + jnp.where(
            scatter[:, None], st["throughput"] * sc["emit_rgb"], 0.0
        )
        new_origin = hitpoint + sc["new_dir"] * OFFSET
        w_origin = jnp.where(scatter[:, None], new_origin, st["w_origin"])
        w_dir = jnp.where(scatter[:, None], sc["new_dir"], st["w_dir"])
        throughput = jnp.where(
            scatter[:, None], st["throughput"] * sc["tp_mult"], st["throughput"]
        )
        specular = jnp.where(
            scatter & sc["clears_specular"], False, st["specular"]
        )
        cur_mat = jnp.where(scatter & sc["enters"], mat, st["cur_mat"])
        bounce = jnp.where(scatter, st["bounce"] + 1, st["bounce"])

        # --- respawn scattered lanes into the traversal ---
        consts_new, carry_new = T._init(
            tree.root, octree_scale, sg(w_origin), sg(w_dir), MAX_DIST, stack_rows
        )
        consts = _merge_consts(scatter, consts_new, st["consts"])
        carry = _merge_carry(scatter, carry_new, st["carry"])
        status = jnp.where(
            scatter, T.ACTIVE, jnp.where(ready_hit | ready_miss, DONE, s.status)
        )
        carry = carry._replace(status=status, step=s.step)

        return dict(
            consts=consts,
            carry=carry,
            w_origin=w_origin,
            w_dir=w_dir,
            throughput=throughput,
            radiance=radiance,
            bounce=bounce,
            specular=specular,
            cur_mat=cur_mat,
            iters=st["iters"],
        )

    def body(st):
        carry = T._step(nodes, st["consts"], st["carry"], scale_base)
        if not opaque:
            prev = st["carry"].status
            fresh = (carry.status == T.CANDIDATE) & (prev == T.ACTIVE)
            st2 = dict(st, carry=carry)
            res = hit_result(st2)
            accept = make_accept_fn(scene_sg, st["w_origin"], st["w_dir"])
            ok = accept(
                res.leaf_value, res.face_id, res.uv, res.t, res.voxel_pos, res.voxel_size
            )
            rej = fresh & ~ok
            carry = carry._replace(
                status=jnp.where(rej, T.ACTIVE, carry.status),
                reject=rej | carry.reject,
            )
        st = dict(st, carry=carry, iters=st["iters"] + 1)

        in_flight = carry.status == T.ACTIVE
        ready = (carry.status == T.CANDIDATE) | (carry.status == T.MISS)
        # shade when a large absolute share of the batch is parked (bounds the
        # number of shade events at ~bounces/fraction) or nothing is in flight
        b_total = carry.status.shape[0]
        shade_now = (
            jnp.sum(ready) >= jnp.int32(SHADE_FRACTION * b_total)
        ) | (~jnp.any(in_flight) & jnp.any(ready))
        return lax.cond(shade_now, shade, lambda x: x, st)

    def cond(st):
        return jnp.any(st["carry"].status != DONE) & (st["iters"] < global_step_cap)

    state = lax.while_loop(cond, body, state)
    return state["radiance"]
