"""Wavefront path tracer — the reference's recursive integrator, flattened.

Semantics from ``/root/reference/src/ray/path_tracer.rs``: per hit, one lobe is
chosen (metal / specular / diffuse / refraction / transmission,
``path_tracer.rs:69-119``), with sky+sun on miss (``:26-37``), emitter and
sun-NEE terms in the diffuse lobe (``:190-316``), Fresnel–Schlick refraction
(``:318-401``) and alpha-tinted transmission (``:403-437``), depth cap 5
(``:56``).  The recursion becomes an iterative bounce loop over a
structure-of-arrays lane batch: ``radiance += throughput * emitted`` terms
accumulate in-place and ``throughput`` absorbs albedo/reweight products — the
standard wavefront transformation of the recursive estimator.

Null materials (alpha+specular < eps with matching IOR, ``:52-54``) are
skipped inside the traversal via its accept protocol.

Deviations (all in favor of the evidently-intended math; our NumPy oracle
implements the same choices — see ``render/oracle.py``):
- importance-sampling reweights are applied to throughput (the reference
  computes then discards them, ``path_tracer.rs:293-313``);
- the Fresnel-reflect branch traces once, not twice (``:363-399`` calls
  ``path_trace`` on both the reflect and shared tail paths).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.materials import FLAG_REFRACTIVE, FLAG_SUBSURFACE_SCATTER
from ..models.scene import Scene, EmitterSampling, face_normals, MAX_DIST
from ..models.sun import (
    add_sun_color,
    add_sun_color_diffuse,
    random_sun_direction,
    sky_color,
)
from ..ops.shading import (
    EPSILON,
    OFFSET,
    N_UNIFORMS,
    U_METAL,
    U_SPECULAR,
    U_DIFFUSE,
    U_FRESNEL,
    U_SUBSURFACE,
    U_SUN1,
    U_SUN2,
    U_EM_PICK,
    U_EM1,
    U_EM2,
    diffuse_dir_and_weight,
    fresnel_schlick,
    refract_dir,
    specular_reflect_dir,
)
from ..ops.texture import sample_atlas
from ..ops.brick_traversal import traverse_tree

MAX_BOUNCES = 5  # path_tracer.rs:56 (default; callers size the uniform block)
SHADOW_MAX_SURFACES = 4


def _albedo_at(scene: Scene, mat_id, uv):
    layer = scene.materials.texture_index[mat_id]
    return sample_atlas(scene.atlas, layer, uv[:, 0], uv[:, 1])


BEAM_CELLS = 16  # coarse-cell side (voxels) of the beam pre-pass


def _trace(scene: Scene, origins, dirs, active=None, beam=False):
    """Traversal with the visibility structure detached from AD.

    All inputs are stop_gradient'ed so the while_loop carries no tangents:
    gradients flow through the *shading* chain (albedo/emittance gathers and
    the radiance arithmetic), never through discrete visibility — the
    detached-traversal design of SURVEY.md §7.5.

    Candidate acceptance (texel alpha / block-model intersection) lives in
    ``render/hit.py``; a leaf whose model rejects the ray falls through to
    ADVANCE exactly like ``octree_traversal.rs:192-215``.

    ``beam``: conservative coarse pre-pass (internal cells of BEAM_CELLS
    voxels count as leaves) whose entry t restarts the fine march and whose
    misses deactivate lanes outright — the empty-space skip of the original
    ESVO beam optimization, per-ray instead of per-beam (every t re-derives
    from the current position, so restarted hits are bit-identical; see
    ``ops.traversal.traverse``).  Plain-Octree scenes only.
    """
    from .hit import make_accept_fn
    from ..octree.brick import BrickOctree

    sg = jax.lax.stop_gradient
    scene_sg = jax.tree.map(sg, scene)
    tree = scene_sg.octree
    origins = sg(origins)
    dirs = sg(dirs)
    active_sg = None if active is None else sg(active)
    t_start = None
    if beam and not isinstance(tree, BrickOctree) and (
        tree.depth >= 6  # coarse cells must be coarser than leaves to pay
    ):
        coarse = traverse_tree(
            tree,
            origins,
            dirs,
            max_dst=MAX_DIST,
            active_mask=active_sg,
            stop_cells=BEAM_CELLS,
        )
        # back off one ulp-ish margin so the fine init's strict > picks the
        # cell containing the restart point, never the one just past it
        t_start = jnp.maximum(coarse.t - 1e-3, 0.0)
        active_sg = coarse.hit if active_sg is None else active_sg & coarse.hit
    return traverse_tree(
        tree,
        origins,
        dirs,
        max_dst=MAX_DIST,
        accept_fn=make_accept_fn(scene_sg, origins, dirs),
        active_mask=active_sg,
        t_start=t_start,
    )


def _trace_stateful(scene: Scene, origins, dirs, accept_builder, state, active=None):
    """Detached traversal with a stateful accept callback; returns
    (HitResult, final_state)."""
    sg = jax.lax.stop_gradient
    scene_sg = jax.tree.map(sg, scene)
    tree = scene_sg.octree
    origins = sg(origins)
    dirs = sg(dirs)
    return traverse_tree(
        tree,
        origins,
        dirs,
        max_dst=MAX_DIST,
        accept_fn=accept_builder(scene_sg, origins, dirs),
        accept_state=jax.tree.map(sg, state),
        active_mask=None if active is None else sg(active),
    )


def shadow_attenuation(scene: Scene, origins, dirs, cur_mat, active=None,
                       max_t=None):
    """Direct-light attenuation walk (``path_tracer.rs:458-483``).

    Marches the shadow ray through up to SHADOW_MAX_SURFACES alpha surfaces:
    att.rgb *= albedo*alpha + (1-alpha); att.w *= (1-alpha); strict mode kills
    the ray on IOR change.  Returns (B, 4) attenuation.

    One traversal collects the surface list via the stateful accept protocol
    (the reference re-marches per surface — 4x the traversals); the
    attenuation product is then recomputed *differentiably* from the recorded
    (mat, uv) sequence, so albedo gradients through shadow blockers are
    preserved despite the detached loop.

    ``max_t``: optional (B,) world-space distance cap — surfaces at or beyond
    it don't attenuate (emitter NEE: the light's own entry face must not
    shadow itself).  ``None`` (the sun walk) records no t and pays nothing.

    ``scene.shadow_binary`` (every texel alpha exactly 1, no quad models):
    the first recorded surface always zeroes the alpha budget, so the
    stateful walk records exactly one surface and stops — replaced by ONE
    plain first-hit traversal (no in-loop albedo gather, no state carry) +
    the same single-surface differentiable recompute.  Values AND gradients
    are bit-identical to the stateful path; the loop body is the slim
    primary-ray body (measured on the NEE bench line, tools/PERF_NOTES r4).
    """
    from .hit import make_shadow_accept_fn, shadow_state_init

    strict = scene.sun_sampling.strict_direct_light

    if scene.shadow_binary:
        res = _trace(scene, origins + dirs * OFFSET, dirs, active=active)
        return _binary_att_from_res(scene, origins, dirs, res, cur_mat, max_t,
                                    strict)

    def builder(scene_sg, o_sg, d_sg):
        return make_shadow_accept_fn(scene_sg, o_sg, d_sg, strict)

    state0 = shadow_state_init(cur_mat, SHADOW_MAX_SURFACES,
                               record_t=max_t is not None)
    _, st = _trace_stateful(
        scene, origins + dirs * OFFSET, dirs, builder, state0, active=active
    )
    return _stateful_att_from_state(scene, origins, dirs, cur_mat, st, max_t,
                                    strict)


def _stateful_att_from_state(scene: Scene, origins, dirs, cur_mat, st, max_t,
                             strict: bool):
    """Differentiable attenuation recompute from a walk's recorded-surface
    state (shared by the in-shade single-phase walk and the pooled drained
    walk of the drain integrator)."""
    b = origins.shape[0]
    att_rgb = jnp.ones((b, 3), jnp.float32)
    w = jnp.ones((b,), jnp.float32)
    cm = cur_mat
    count = st["count"]
    for k in range(SHADOW_MAX_SURFACES):
        mat = st["mats"][k]
        uv = jnp.stack([st["uu"][k], st["vv"][k]], -1)
        albedo = _albedo_at(scene, mat, uv)
        mult = 1.0 - albedo[:, 3]
        new_rgb = att_rgb * (albedo[:, :3] * albedo[:, 3:4] + mult[:, None])
        new_w = w * mult
        if strict:
            ior_change = scene.materials.ior[cm] != scene.materials.ior[mat]
            new_w = jnp.where(ior_change, 0.0, new_w)
        upd = (k < count) & (w > 0.0)
        if max_t is not None:
            upd = upd & (st["ts"][k] < max_t)
        att_rgb = jnp.where(upd[:, None], new_rgb, att_rgb)
        w = jnp.where(upd, new_w, w)
        cm = jnp.where(upd, mat, cm)

    return _shadow_prims(scene, origins, dirs, cur_mat, att_rgb, w, max_t,
                         strict)


def _binary_att_from_res(scene: Scene, origins, dirs, res, cur_mat, max_t,
                         strict: bool):
    """The binary shadow walk's attenuation recompute, given an already-run
    first-hit traversal ``res``.  Factored out of ``shadow_attenuation`` so a
    pooled caller could reuse it (the r4 whole-batch sun-walk experiment did,
    and was reverted as slower — tools/PERF_NOTES.md r4); the in-shade path
    above is the only live caller."""
    from .hit import resolve_hit
    from ..models.materials import gather_rows

    o_walk = origins + dirs * OFFSET
    mat, uv, _, t_hit = resolve_hit(scene, o_walk, dirs, res)
    blocked = res.hit
    if max_t is not None:
        blocked = blocked & (t_hit < max_t)
    mrow = gather_rows(scene.materials, mat)
    albedo = sample_atlas(scene.atlas, mrow["texture_index"], uv[:, 0], uv[:, 1])
    mult = 1.0 - albedo[:, 3]
    att_rgb = jnp.where(
        blocked[:, None], albedo[:, :3] * albedo[:, 3:4] + mult[:, None], 1.0
    )
    w = jnp.where(blocked, mult, 1.0)
    if strict:
        ior_change = scene.materials.ior[cur_mat] != mrow["ior"]
        w = jnp.where(blocked & ior_change, 0.0, w)
    return _shadow_prims(scene, origins, dirs, cur_mat, att_rgb, w, max_t,
                         strict)


def _shadow_prims(scene: Scene, origins, dirs, cur_mat, att_rgb, w, max_t,
                  strict: bool):
    """Fold analytic primitives into a shadow attenuation: the nearest prim
    surface contributes one attenuation factor (spec shared with the oracle;
    a translucent prim behind another prim is not re-marched)."""
    if scene.prims is not None:
        p_hit, p_t, p_mat, p_uv, _ = _prim_hit(scene, origins + dirs * OFFSET, dirs)
        if max_t is not None:
            p_hit = p_hit & (p_t < max_t)
        albedo_p = _albedo_at(scene, p_mat, p_uv)
        mult_p = 1.0 - albedo_p[:, 3]
        att_rgb = jnp.where(
            p_hit[:, None],
            att_rgb * (albedo_p[:, :3] * albedo_p[:, 3:4] + mult_p[:, None]),
            att_rgb,
        )
        new_w = w * mult_p
        if strict:
            ior_change = scene.materials.ior[cur_mat] != scene.materials.ior[p_mat]
            new_w = jnp.where(ior_change, 0.0, new_w)
        w = jnp.where(p_hit, new_w, w)
    return jnp.concatenate([att_rgb, w[:, None]], -1)


def _prim_hit(scene: Scene, origins, dirs):
    """Detached analytic-primitive intersection (scene/mod.rs:146-156 free
    quads/spheres; HitList scan hittable/mod.rs:137-148).  Geometry is
    stop_gradient'ed like the traversal; shading gradients flow through the
    albedo gather downstream.  Returns (hit, t, mat, uv (B,2), n (B,3))."""
    from ..models.prims import intersect_prims

    sg = jax.lax.stop_gradient
    return intersect_prims(
        jax.tree.map(sg, scene.prims), sg(origins), sg(dirs), MAX_DIST
    )


TILE_LANES = 4096  # measured sweet spot on TPU v5e (see BASELINE.md)

DRAIN_STEPS = 32  # phase-1 loop cap of the straggler drain (r4 sweep)
# Per-bounce phase-1 caps (k1 only changes scheduling — results are
# bit-identical under any schedule).  The knob exists because late bounces
# pack few live lanes into 1-2 tiles, where a drain round's fixed cost looked
# wasteful — but raising late-bounce caps was tried on chip and REFUTED:
# pooled drain resumes beat per-tile stragglers even at 6% occupancy
# ((32,)x5 fwd+bwd 61.7 ms vs 63.6-64.3 for rising schedules,
# tools/PERF_NOTES.md r4).  The measured best schedule is flat.
DRAIN_K1_SCHEDULE = (DRAIN_STEPS, DRAIN_STEPS, DRAIN_STEPS, DRAIN_STEPS,
                     DRAIN_STEPS)
DRAIN_BUF = 4096  # straggler-buffer lanes per drain round


def _pack_hitres(r):
    """HitResult -> ((..., 7) float rows, (..., 3) int rows)."""
    f = jnp.concatenate(
        [r.t[..., None], r.uv, r.voxel_pos, r.voxel_size[..., None]], axis=-1
    )
    i = jnp.stack(
        [r.face_id, r.leaf_value.astype(jnp.int32), r.hit.astype(jnp.int32)],
        axis=-1,
    )
    return f, i


def _traverse_drain(scene_sg, origins, dirs, active, t: int,
                    k1: int = DRAIN_STEPS, margin: float = 1e-3,
                    accept_builder=None):
    """Tiled traversal with a straggler drain (all-opaque scenes).

    The census (tools/PERF_NOTES.md r4) shows each 4096-lane tile pays its
    own straggler: per-tile loop maxima ~50-140 against ~11 mean active
    steps.  Phase 1 caps every tile's lockstep loop at ``k1`` iterations;
    lanes still walking are then pulled ACROSS tile boundaries into a
    DRAIN_BUF-lane buffer (rank-select scatter — no full-batch permutation:
    whole-batch row gathers at 65k rows cost ~0.5 ms each and ate the win
    in the first design) and resumed via restart-from-t
    (``ops.traversal.traverse(t_start=)`` — bit-identical hits).  A
    ``lax.while_loop`` repeats rounds until no lane is left, so overflow
    beyond one buffer costs extra rounds, not a standing fallback pass; the
    whole block is visibility-only and detached from AD (shading happens in
    a separate differentiable pass).

    ``accept_builder``: optional ``(origins, dirs) -> accept_fn`` for scenes
    that need the STATELESS accept callback (alpha cutouts / quad models,
    ``make_accept_fn``).  Restart-from-t stays exact under a stateless
    accept: a re-encountered rejected candidate is re-rejected
    deterministically (alpha/quad tests depend only on the candidate), and
    accepted hits re-derive bit-identically.  Stateful accept walks (the
    shadow march) use ``_shadow_walk_drain`` instead, which carries the
    recorded-surface state across rounds.  Returns a HitResult over the
    full batch (``steps`` = summed loop iterations across phases).
    """
    from ..ops.traversal import HitResult

    tree = scene_sg.octree
    b = origins.shape[0]
    bt = b // t
    s_buf = min(DRAIN_BUF, b)
    act = jnp.ones((b,), bool) if active is None else active

    def tile1(xs):
        o_, d_, a_ = xs
        r, rt_, unf_ = traverse_tree(
            tree, o_, d_, max_dst=MAX_DIST, active_mask=a_,
            accept_fn=None if accept_builder is None else accept_builder(o_, d_),
            max_steps=k1, export_resume=True,
        )
        f_, i_ = _pack_hitres(r)
        return f_, i_, rt_, unf_, r.steps

    r3 = lambda x: x.reshape((t, bt) + x.shape[1:])
    f1, i1, rt, unf, steps1 = jax.lax.map(
        tile1, (r3(origins), r3(dirs), act.reshape(t, bt))
    )
    f1 = f1.reshape(b, 7)
    i1 = i1.reshape(b, 3)
    rt = rt.reshape(b)
    unf = unf.reshape(b)

    # ray data the drain rounds gather per selected lane (B, 7)
    ray_pk = jnp.concatenate(
        [origins, dirs, jnp.maximum(rt - margin, 0.0)[:, None]], axis=1
    )
    lane_ids = jnp.arange(b, dtype=jnp.int32)

    def drain_cond(c):
        return jnp.any(c[0])

    def drain_round(c):
        remaining, f_acc, i_acc, steps = c
        rank = jnp.cumsum(remaining.astype(jnp.int32)) - 1
        takes = remaining & (rank < s_buf)
        # rank-select: buffer slot -> lane id (sentinel b = empty slot)
        sel = jnp.full((s_buf,), b, jnp.int32).at[
            jnp.where(takes, rank, s_buf)
        ].set(lane_ids, mode="drop")
        valid = sel < b
        selc = jnp.minimum(sel, b - 1)
        rows = ray_pk[selc]  # (S, 7) gather — S rows, not B
        res = traverse_tree(
            tree,
            rows[:, 0:3],
            rows[:, 3:6],
            max_dst=MAX_DIST,
            accept_fn=None
            if accept_builder is None
            else accept_builder(rows[:, 0:3], rows[:, 3:6]),
            active_mask=valid,
            t_start=rows[:, 6],
        )
        f_r, i_r = _pack_hitres(res)
        f_acc = f_acc.at[sel].set(f_r, mode="drop")
        i_acc = i_acc.at[sel].set(i_r, mode="drop")
        remaining = remaining & ~takes
        return remaining, f_acc, i_acc, steps + res.steps

    _, f1, i1, steps = jax.lax.while_loop(
        drain_cond, drain_round, (unf, f1, i1, steps1.sum())
    )
    return HitResult(
        hit=i1[:, 2] != 0,
        t=f1[:, 0],
        face_id=i1[:, 0],
        uv=f1[:, 1:3],
        leaf_value=i1[:, 1].astype(jnp.uint32),
        voxel_pos=f1[:, 3:6],
        voxel_size=f1[:, 6],
        steps=steps,
    )


def _pack_shadow_state(st):
    """Shadow accept-state -> ((10, B) float rows, (6, B) int rows)."""
    f = jnp.concatenate(
        [st["w"][None], st["t_last"][None], st["uu"], st["vv"]], axis=0
    )
    i = jnp.concatenate([st["count"][None], st["cm"][None], st["mats"]], axis=0)
    return f, i


def _unpack_shadow_state(f, i, n_surf: int):
    return dict(
        count=i[0],
        cm=i[1],
        mats=i[2 : 2 + n_surf],
        w=f[0],
        t_last=f[1],
        uu=f[2 : 2 + n_surf],
        vv=f[2 + n_surf : 2 + 2 * n_surf],
    )


def _shadow_walk_drain(scene_sg, origins, dirs, cur_mat, active, t: int,
                       k1=None, margin: float = 1e-3):
    """Whole-batch straggler-drained stateful shadow walk.

    The per-tile stateful walk pays each tile's own straggler (the cutout
    bench decomposition put the sun walk at ~55 ms of the 126 ms frame —
    tools/PERF_NOTES.md r5).  Same two-phase scheme as ``_traverse_drain``,
    with the ACCEPT STATE carried across the restart: phase 1 caps every
    tile's walk at ``k1``; unfinished lanes are rank-selected into a pooled
    buffer together with their packed recorded-surface state and resumed
    via restart-from-t under ``make_shadow_accept_fn(resume=True)``, whose
    ``t_last`` guard skips the (margin-window) surfaces already recorded.
    Exact on CPU (locked by test); on TPU lanes that switch phase can move
    by ulps (callsite contraction — same caveat as the k1 schedule).

    Inputs are the walk rays (origin WITHOUT the OFFSET nudge — applied
    here), detached.  Returns the final accept state over the full batch.
    """
    from .hit import make_shadow_accept_fn, shadow_state_init

    k1 = DRAIN_STEPS if k1 is None else k1  # runtime lookup (tests patch it)
    strict = scene_sg.sun_sampling.strict_direct_light
    tree = scene_sg.octree
    b = origins.shape[0]
    bt = b // t
    s_buf = min(DRAIN_BUF, b)
    n_surf = SHADOW_MAX_SURFACES
    o_off = origins + dirs * OFFSET

    def tile1(xs):
        o_, d_, a_, cm_ = xs
        accept = make_shadow_accept_fn(scene_sg, o_, d_, strict)
        st0 = shadow_state_init(cm_, n_surf)
        _, user, rt_, unf_ = traverse_tree(
            tree, o_, d_, max_dst=MAX_DIST,
            accept_fn=accept, accept_state=st0,
            active_mask=a_, max_steps=k1, export_resume=True,
        )
        f_, i_ = _pack_shadow_state(user)
        return f_, i_, rt_, unf_

    r3 = lambda x: x.reshape((t, bt) + x.shape[1:])
    f1, i1, rt, unf = jax.lax.map(
        tile1,
        (r3(o_off), r3(dirs), active.reshape(t, bt), r3(cur_mat)),
    )
    # (t, rows, bt) -> (rows, B)
    f1 = jnp.moveaxis(f1, 0, 1).reshape(f1.shape[1], b)
    i1 = jnp.moveaxis(i1, 0, 1).reshape(i1.shape[1], b)
    rt = rt.reshape(b)
    unf = unf.reshape(b)

    ray_pk = jnp.concatenate(
        [o_off, dirs, jnp.maximum(rt - margin, 0.0)[:, None]], axis=1
    )
    lane_ids = jnp.arange(b, dtype=jnp.int32)

    def drain_cond(c):
        return jnp.any(c[0])

    def drain_round(c):
        remaining, f_acc, i_acc = c
        rank = jnp.cumsum(remaining.astype(jnp.int32)) - 1
        takes = remaining & (rank < s_buf)
        sel = jnp.full((s_buf,), b, jnp.int32).at[
            jnp.where(takes, rank, s_buf)
        ].set(lane_ids, mode="drop")
        valid = sel < b
        selc = jnp.minimum(sel, b - 1)
        rows = ray_pk[selc]  # (S, 7)
        st_in = _unpack_shadow_state(f_acc[:, selc], i_acc[:, selc], n_surf)
        accept = make_shadow_accept_fn(
            scene_sg, rows[:, 0:3], rows[:, 3:6], strict, resume=True
        )
        _, user = traverse_tree(
            tree,
            rows[:, 0:3],
            rows[:, 3:6],
            max_dst=MAX_DIST,
            accept_fn=accept,
            accept_state=st_in,
            active_mask=valid,
            t_start=rows[:, 6],
        )
        f_r, i_r = _pack_shadow_state(user)
        f_acc = f_acc.at[:, sel].set(f_r, mode="drop")
        i_acc = i_acc.at[:, sel].set(i_r, mode="drop")
        return remaining & ~takes, f_acc, i_acc

    _, f1, i1 = jax.lax.while_loop(drain_cond, drain_round, (unf, f1, i1))
    return _unpack_shadow_state(f1, i1, n_surf)


def _pooled_sun_att(scene: Scene, st, u, res, is_first: bool,
                    may_scatter: bool, t: int):
    """Whole-batch sun-NEE attenuation for the drain integrator: replicate
    ``_shade``'s gating (detached — it only feeds the visibility walk),
    run the DRAINED stateful walk, and recompute attenuation differentiably
    from the recorded surfaces.  Returns (B, 4) att for ``_shade(sun_att=)``.
    The duplicated gating measured ~2 ms whole-batch (r4); the pooled drain
    saves far more on stateful-walk scenes (PERF_NOTES r5)."""
    from .hit import resolve_hit
    from ..models.materials import gather_rows

    sg = jax.lax.stop_gradient
    scene_sg = jax.tree.map(sg, scene)
    st_sg = jax.tree.map(sg, st)
    u = sg(u)
    strat = scene.sun_sampling

    active = st_sg["active"]
    if scene_sg.prims is not None:
        p_hit, p_t, p_mat, p_uv, p_n = _prim_hit(
            scene_sg, st_sg["origin"], st_sg["dir"]
        )
        any_hit = res.hit | p_hit
    else:
        any_hit = res.hit
    hit = active & any_hit
    can_scatter = hit & may_scatter
    mat, hit_uv, n, t_hit = resolve_hit(
        scene_sg, st_sg["origin"], st_sg["dir"], res
    )
    if scene_sg.prims is not None:
        t_oct = jnp.where(res.hit, t_hit, jnp.inf)
        use_p = p_hit & (p_t < t_oct)
        mat = jnp.where(use_p, p_mat, mat)
        hit_uv = jnp.where(use_p[:, None], p_uv, hit_uv)
        n = jnp.where(use_p[:, None], p_n, n)
        t_hit = jnp.where(use_p, p_t, t_hit)
    mrow = gather_rows(scene_sg.materials, mat)
    albedo = sample_atlas(
        scene_sg.atlas, mrow["texture_index"], hit_uv[:, 0], hit_uv[:, 1]
    )
    hitpoint = st_sg["origin"] + st_sg["dir"] * t_hit[:, None]
    b = hitpoint.shape[0]
    bounce0 = jnp.full((b,), is_first)
    sc = lobe_scatter(
        scene_sg, u, st_sg["dir"], n, albedo, mat, st_sg["cur_mat"], bounce0,
        mrow=mrow,
    )
    sun_dir = random_sun_direction(scene_sg.sun, u[:, U_SUN1], u[:, U_SUN2])
    front = jnp.sum(sun_dir * n, axis=-1) > 0.0
    sss = (
        ((mrow["flags"] & FLAG_SUBSURFACE_SCATTER) != 0)
        & (u[:, U_SUBSURFACE] < scene.f_sub_surface)
    )
    shadow_on = sc["do_diff"] & can_scatter & (front | sss)
    shadow_origin = jnp.where(front[:, None], hitpoint, hitpoint - OFFSET * n)

    walk_st = _shadow_walk_drain(
        scene_sg, shadow_origin, sun_dir, st_sg["cur_mat"], shadow_on, t
    )
    # differentiable recompute against the REAL scene
    return _stateful_att_from_state(
        scene, shadow_origin, sun_dir, st_sg["cur_mat"], walk_st, None,
        strat.strict_direct_light,
    )


def _init_state(origins, dirs):
    # every array derives from the varying per-lane ``origins`` so downstream
    # while_loop carries (traversal accept-state, shadow walk) keep consistent
    # varying-manual-axes under shard_map (see ops/traversal.py:137)
    zf = origins[:, 0].astype(jnp.float32) * 0
    zi = zf.astype(jnp.int32)
    return dict(
        origin=origins.astype(jnp.float32),
        dir=dirs.astype(jnp.float32),
        throughput=zf[:, None] + jnp.ones((1, 3), jnp.float32),
        radiance=zf[:, None] + jnp.zeros((1, 3), jnp.float32),
        active=zi == 0,
        specular=zi == 0,
        cur_mat=zi,
    )


def _trace_paths_block(scene: Scene, origins, dirs, uniforms, beam=False):
    """The untiled integrator over one contiguous lane block.

    Bounce count is the uniform block's bounce axis (``uniforms.shape[1]``) —
    the reference's depth cap 5 is the default, BASELINE config 5 uses 8."""
    state = _init_state(origins, dirs)
    n_bounces = uniforms.shape[1]
    for bounce in range(n_bounces):
        state = _bounce(
            scene,
            state,
            uniforms[:, bounce, :],
            is_first=bounce == 0,
            may_scatter=bounce + 1 < n_bounces,
            beam=beam,
        )
    return state["radiance"]


def _auto_tiles(b: int) -> int:
    t = max(1, b // TILE_LANES)
    while t > 1 and b % t:
        t //= 2
    return t


def _morton3_coarse(p, extent: float, bits: int):
    """(B, 3) world positions -> (B,) int32 coarse Morton codes (``bits`` per
    axis: the supercell grid is ``2^bits`` per side over ``extent``)."""
    n = 1 << bits
    g = jnp.clip((p * (n / extent)).astype(jnp.int32), 0, n - 1)
    code = g[:, 0] * 0
    for i in range(bits):
        code = (
            code
            | (((g[:, 0] >> i) & 1) << (3 * i))
            | (((g[:, 1] >> i) & 1) << (3 * i + 1))
            | (((g[:, 2] >> i) & 1) << (3 * i + 2))
        )
    return code


def _sort_state_by_active(st, key="active", extent: float = 512.0,
                          morton_bits: int = 4):
    """Stable-partition the lane state: active lanes first, dead lanes last.

    Dead lanes then cluster into whole tiles whose lockstep ``while_loop``
    exits immediately — the between-bounce wavefront compaction of SURVEY §7.4
    under static shapes.  The float state packs into one (B, 12) matrix and
    the int state into one (B, 3) matrix so the permutation costs TWO
    row-gathers total (TPU gathers are row-rate-bound; 15 separate (B,)
    gathers would cost ~7x more — tools/PERF_NOTES.md).

    ``key="octant"`` additionally groups live lanes by direction octant
    (stable within a group, preserving pixel-order position coherence), so a
    tile's lockstep traversal sees directionally coherent rays — fewer
    straggler iterations on incoherent bounce wavefronts.  Measured on chip
    before defaulting (tools/profile_sortkeys.py).

    ``key="morton"`` groups live lanes by the coarse Morton code of their
    current origin (the hit voxel that spawned the bounce ray): tiles then
    traverse *spatially* clustered wavefronts, so each tile's lockstep
    iteration count tracks its own neighborhood's walk length instead of the
    global straggler (VERDICT r3 #3 — position coherence is what the failed
    direction-octant key destroyed).
    """
    b = st["active"].shape[0]
    active = st["active"]
    a = active.astype(jnp.int32)
    if key == "octant":
        d = st["dir"]
        octant = (
            (d[:, 0] < 0).astype(jnp.int32)
            | ((d[:, 1] < 0).astype(jnp.int32) << 1)
            | ((d[:, 2] < 0).astype(jnp.int32) << 2)
        )
        bucket = jnp.where(active, octant, 8)  # dead lanes last
        perm = jnp.argsort(bucket, stable=True).astype(jnp.int32)
    elif key == "morton":
        code = _morton3_coarse(st["origin"], extent, morton_bits)
        bucket = jnp.where(active, code, 1 << (3 * morton_bits))  # dead last
        perm = jnp.argsort(bucket, stable=True).astype(jnp.int32)
    else:
        n_act = jnp.cumsum(a)
        pos = jnp.where(active, n_act - 1, n_act[-1] + jnp.cumsum(1 - a) - 1)
        perm = jnp.zeros((b,), jnp.int32).at[pos].set(jnp.arange(b, dtype=jnp.int32))

    flags = a | (st["specular"].astype(jnp.int32) << 1)
    packed_f = jnp.concatenate(
        [st["origin"], st["dir"], st["throughput"], st["radiance"]], axis=1
    )  # (B, 12)
    packed_i = jnp.stack([st["cur_mat"], flags, st["idx"]], axis=1)  # (B, 3)
    sf = packed_f[perm]
    si = packed_i[perm]
    return dict(
        origin=sf[:, 0:3],
        dir=sf[:, 3:6],
        throughput=sf[:, 6:9],
        radiance=sf[:, 9:12],
        cur_mat=si[:, 0],
        active=(si[:, 1] & 1) != 0,
        specular=(si[:, 1] & 2) != 0,
        idx=si[:, 2],
    )


def _is_inexact(x):
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)


def _split_inexact(tree):
    """-> (float leaves list, rebuild(float_leaves, fill) -> tree).

    Integer/bool leaves have float0 cotangents, which cannot cross a
    ``lax.cond`` boundary; the cond carries only the float leaves and the
    rebuild reattaches the constant float0 zeros."""
    import numpy as _np
    from jax.dtypes import float0

    leaves, treedef = jax.tree.flatten(tree)
    f_idx = [i for i, l in enumerate(leaves) if _is_inexact(l)]

    def rebuild(f_leaves):
        out = [
            _np.zeros(_np.shape(l), float0) for l in leaves
        ]
        for k, i in enumerate(f_idx):
            out[i] = f_leaves[k]
        return jax.tree.unflatten(treedef, out)

    return [leaves[i] for i in f_idx], f_idx, rebuild


def _dummy_hitres(b: int):
    from ..ops.traversal import HitResult

    return HitResult(
        hit=jnp.zeros((b,), bool),
        t=jnp.full((b,), jnp.inf, jnp.float32),
        face_id=jnp.full((b,), -1, jnp.int32),
        uv=jnp.zeros((b, 2), jnp.float32),
        leaf_value=jnp.zeros((b,), jnp.uint32),
        voxel_pos=jnp.zeros((b, 3), jnp.float32),
        voxel_size=jnp.zeros((b,), jnp.float32),
        steps=jnp.int32(0),
    )


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bounce_skip(scene, st, u, may_scatter):
    """Non-primary bounce with whole-tile dead skip (forward) and live-only
    shade relinearization (backward).  Differentiable in (scene, st); ``u``
    is sample data (zero cotangent)."""
    return jax.lax.cond(
        jnp.any(st["active"]),
        lambda s: _bounce(scene, s, u, is_first=False, may_scatter=may_scatter),
        lambda s: s,
        st,
    )


def _bounce_skip_fwd(scene, st, u, may_scatter):
    live = jnp.any(st["active"])
    b = st["dir"].shape[0]

    def live_b(s):
        # == _bounce(is_first=False) split so the (detached) traversal result
        # can be saved as a residual — the backward then remats only _shade,
        # never the while_loop (the naive remat re-traversed: 173 ms fwd+bwd
        # vs 69, tools/PERF_NOTES round 3)
        res = _trace(scene, s["origin"], s["dir"], s["active"])
        return _shade(scene, s, u, res, False, may_scatter), res

    def dead_b(s):
        return s, _dummy_hitres(b)

    out, res = jax.lax.cond(live, live_b, dead_b, st)
    return out, (scene, st, u, res)


def _bounce_skip_bwd(may_scatter, resid, g):
    scene, st, u, res = resid
    live = jnp.any(st["active"])

    g_f, _, _ = _split_inexact(g)
    sc_f, sc_idx, sc_rebuild = _split_inexact(scene)
    st_f, st_idx, st_rebuild = _split_inexact(st)

    def live_branch(gf):
        _, vjp = jax.vjp(
            lambda sc, s: _shade(sc, s, u, res, False, may_scatter),
            scene,
            st,
        )
        # rebuild the full output cotangent (float0 zeros on int leaves)
        import numpy as _np
        from jax.dtypes import float0

        g_leaves, g_def = jax.tree.flatten(g)
        gi = 0
        full = []
        for l in g_leaves:
            if _is_inexact(l):
                full.append(gf[gi])
                gi += 1
            else:
                full.append(_np.zeros(_np.shape(l), float0))
        d_scene, d_st = vjp(jax.tree.unflatten(g_def, full))
        ds_l = jax.tree.leaves(d_scene)
        dt_l = jax.tree.leaves(d_st)
        return [ds_l[i] for i in sc_idx], [dt_l[i] for i in st_idx]

    def dead_branch(gf):
        # identity bounce: state cotangent passes through, scene gets zero
        return [jnp.zeros_like(x) for x in sc_f], list(gf)

    d_sc_f, d_st_f = jax.lax.cond(live, live_branch, dead_branch, g_f)
    return sc_rebuild(d_sc_f), st_rebuild(d_st_f), _zero_cotangent(u)


def _zero_cotangent(tree):
    import numpy as _np
    from jax.dtypes import float0

    return jax.tree.map(
        lambda x: jnp.zeros_like(x)
        if _is_inexact(x)
        else _np.zeros(_np.shape(x), float0),
        tree,
    )


_bounce_skip.defvjp(_bounce_skip_fwd, _bounce_skip_bwd)


def _trace_paths_compacted(scene: Scene, origins, dirs, uniforms, t: int,
                           sort_key: str = "active", skip_dead: bool = False,
                           beam: bool = False, drain: bool = False,
                           sort_bounces=None, pool_sun_walk: bool = False):
    """Per-bounce tiled integrator with between-bounce liveness compaction.

    Every bounce runs as ``t`` sequential tiles (``lax.map``); before each
    non-primary bounce the lanes are stable-partitioned active-first
    (``_sort_state_by_active``), so terminated lanes fill whole tiles whose
    traversal ``while_loop`` exits immediately — bounce cost tracks the live
    fraction instead of staying flat (measured flat ~20 ms/bounce unsorted on
    TPU v5e, tools/PERF_NOTES.md round 2).  Per-lane math is unchanged (each
    lane keeps its own uniforms via the carried original index), so results
    equal the unsorted path lane-for-lane.
    """
    b = origins.shape[0]
    bt = b // t
    n_bounces = uniforms.shape[1]
    st = _init_state(origins, dirs)
    st["idx"] = jnp.arange(b, dtype=jnp.int32)

    extent = float(1 << scene.octree.depth)
    for bounce in range(n_bounces):
        if bounce > 0:
            # ``sort_bounces``: optional static subset of bounces that
            # re-sort (scheduling-only: skipping a re-sort leaves lanes
            # dying IN PLACE inside already-packed tiles; per-lane uniforms
            # always ride the carried original index, so results are
            # bit-identical under any schedule — locked by
            # test_integrator_paths).
            if sort_bounces is None or bounce in sort_bounces:
                st = _sort_state_by_active(st, key=sort_key, extent=extent)
            u_b = jnp.take(uniforms[:, bounce, :], st["idx"], axis=0)
        else:
            u_b = uniforms[:, 0, :]
        is_first = bounce == 0
        may = bounce + 1 < n_bounces

        idx = st.pop("idx")
        st_tiles = jax.tree.map(lambda x: x.reshape((t, bt) + x.shape[1:]), st)
        u_tiles = u_b.reshape(t, bt, -1)

        if drain:
            # straggler-drain traversal over the WHOLE batch, then a tiled
            # shade pass on the precomputed hits (mirrors _bounce_skip_fwd's
            # trace/shade split; traversal is detached so AD only sees the
            # differentiable _shade)
            from .hit import make_accept_fn

            sgf = jax.lax.stop_gradient
            scene_sg = jax.tree.map(sgf, scene)
            res = _traverse_drain(
                scene_sg,
                sgf(st["origin"]),
                sgf(st["dir"]),
                None if is_first else sgf(st["active"]),
                t,
                k1=DRAIN_K1_SCHEDULE[min(bounce, len(DRAIN_K1_SCHEDULE) - 1)],
                accept_builder=None
                if scene.opaque_only
                else (lambda o, d: make_accept_fn(scene_sg, o, d)),
            )
            # (A pooled whole-batch sun walk — hoisting the binary shadow
            # walk out of the tiled shade into _traverse_drain — was built,
            # proven bit-identical, and measured SLOWER: NEE fwd 80.8 ->
            # 83.0 ms.  The duplicated whole-batch pre-shade gating costs
            # more than pooled stragglers save; per-tile shadow rays are
            # already pixel-coherent.  tools/PERF_NOTES.md r4.)
            # pooled drained stateful sun walk (r5): hoist the walk out of
            # the per-tile shade and drain its stragglers across tile
            # boundaries (accept-state carried through restart-from-t).
            # Implemented, proven bit-identical, and measured SLOWER on the
            # cutout bench line (139.4/156.4 vs 125.8/135.2 ms — the
            # duplicated whole-batch gating + the wider drained carry cost
            # more than pooled stragglers save; the walk's cost is its
            # texel-testing body, not per-tile maxima — PERF_NOTES r5, the
            # stateful twin of r4's rejected pooled binary walk).  OPT-IN
            # via trace_paths(pool_sun_walk=True); kept as the recorded
            # implementation of stateful drain resume.
            sun_att = None
            if may and pool_sun_walk and scene.sun_sampling.sun_sampling \
                    and not scene.shadow_binary:
                sun_att = _pooled_sun_att(
                    scene, st, u_b, res, is_first, may, t
                )

            res = res._replace(steps=jnp.broadcast_to(res.steps, (t,)))
            res_tiles = jax.tree.map(
                lambda x: x.reshape((t, bt) + x.shape[1:])
                if x.ndim >= 1 and x.shape[0] == b
                else x,
                res,
            )

            if sun_att is None:

                def shade_fn(xs, first=is_first, m=may):
                    st_t, u_t, res_t = xs
                    if first:
                        return _shade(scene, st_t, u_t, res_t, first, m)
                    # dead tiles skip shading's fixed-cost gathers entirely
                    return jax.lax.cond(
                        jnp.any(st_t["active"]),
                        lambda a: _shade(scene, a[0], a[1], a[2], first, m),
                        lambda a: a[0],
                        (st_t, u_t, res_t),
                    )

                xs = (st_tiles, u_tiles, res_tiles)
            else:

                def shade_fn(xs, first=is_first, m=may):
                    st_t, u_t, res_t, att_t = xs
                    if first:
                        return _shade(
                            scene, st_t, u_t, res_t, first, m, sun_att=att_t
                        )
                    return jax.lax.cond(
                        jnp.any(st_t["active"]),
                        lambda a: _shade(
                            scene, a[0], a[1], a[2], first, m, sun_att=a[3]
                        ),
                        lambda a: a[0],
                        (st_t, u_t, res_t, att_t),
                    )

                xs = (st_tiles, u_tiles, res_tiles, sun_att.reshape(t, bt, 4))

            st = jax.tree.map(
                lambda x: x.reshape((b,) + x.shape[2:]),
                jax.lax.map(shade_fn, xs),
            )
            st["idx"] = idx
            continue

        def tile_fn(xs, first=is_first, m=may):
            st_t, u_t = xs
            if first or not skip_dead:
                return _bounce(
                    scene, st_t, u_t, is_first=first, may_scatter=m, beam=beam
                )
            # skip_dead: a fully-dead tile skips the whole bounce body — not
            # just the traversal loop but also resolve_hit/shading, whose
            # gather ops carry a fixed ~40-70us cost each regardless of
            # liveness (PERF_NOTES gather cost model).  _bounce_skip is a
            # custom_vjp: naive AD through lax.cond measured 114.7 ms fwd+bwd
            # vs 69 without (round-3 bench); the custom rule re-linearizes
            # only live tiles in the backward (remat) and zero-skips dead
            # ones.
            return _bounce_skip(scene, st_t, u_t, m)

        st = jax.tree.map(
            lambda x: x.reshape((b,) + x.shape[2:]),
            jax.lax.map(tile_fn, (st_tiles, u_tiles)),
        )
        st["idx"] = idx

    return jnp.zeros((b, 3), jnp.float32).at[st["idx"]].set(st["radiance"])


def trace_paths(scene: Scene, origins, dirs, uniforms, tiles="auto", compact=True,
                sort_key: str = "active", skip_dead: bool = False,
                beam: bool = False, drain: bool = True, sort_bounces="auto",
                pool_sun_walk: bool = False):
    """Trace a lane batch to completion; returns (B, 3) linear radiance.

    ``uniforms``: (B, n_bounces, N_UNIFORMS) pre-drawn uniform block (see
    ``ops/shading.py`` for the slot map); the bounce axis sets the depth cap.

    ``tiles``: split the batch into this many sequentially-traced tiles
    (``lax.map``), each with its own traversal loops.  A tile's lockstep
    ``while_loop`` exits at the tile's own max step count instead of the
    whole batch's — pixel-order lanes are spatially coherent, so tiles of
    ~``TILE_LANES`` lanes cut the straggler tax 2.4-2.6x on a 512^3 scene
    (TPU v5e measurement; the gather engine is row-rate-bound, so smaller
    batches lose no throughput).  ``"auto"`` targets TILE_LANES-lane tiles;
    pass 1 to disable.

    ``compact``: sort lanes active-first between bounces so dead lanes pack
    into tiles that exit instantly (wavefront compaction under static
    shapes).  Semantics are tile- and compaction-independent (per-lane RNG).

    ``drain``: two-phase straggler-drain traversal (``_traverse_drain``) —
    cap each tile's lockstep loop, pull the unfinished lanes across tile
    boundaries into a drain buffer, resume them via restart-from-t.
    Bit-identical results in exact arithmetic and on the CPU backend
    (locked by test_integrator_paths); on TPU, changing WHICH lanes drain
    (the k1 cap) can flip knife-edge lanes by ulps because XLA:TPU may
    contract the tile-path and drain-path arithmetic differently (measured
    max radiance diff 6.7e-3 on one 65k-lane frame between k1 schedules,
    tools/PERF_NOTES.md r5) — any FIXED schedule is deterministic.
    Measured -38% iterations on primary traversal
    and -5% on the full fwd+bwd bench (PERF_NOTES r4).  Applies on plain
    (non-brick) pools in the compacted path — including alpha-cutout /
    quad-model scenes, whose stateless accept callback re-evaluates
    deterministically across restart-from-t (r5); quietly off on brick
    pools, and off when ``skip_dead`` is chosen — the two are alternative
    bounce strategies and skip_dead measures faster for forward-only
    rendering while drain wins differentiated (PERF_NOTES r4).

    ``sort_bounces``: which bounces re-sort (compaction schedule).  The
    default ``"auto"`` = {1, 2}: the r5 phase decomposition measured each
    65k-lane re-sort at ~2.15 ms while bounce-3+ re-sorts no longer shrink
    the live tile count (lanes die IN PLACE inside tiles already packed at
    bounce 2, and a tile's lockstep loop tracks its live lanes' max
    either way) — skipping them was worth -7% headline fwd+bwd and won on
    every bench line (tools/PERF_NOTES.md r5).  ``None`` = every bounce;
    results are bit-identical under any schedule.

    ``pool_sun_walk``: hoist the stateful sun shadow walk out of the tiled
    shade into a whole-batch straggler-drained phase (``_pooled_sun_att`` /
    ``_shadow_walk_drain`` — accept-state carried through restart-from-t).
    Measured SLOWER than the per-tile walk on the cutout bench line and
    kept opt-in as the recorded implementation (PERF_NOTES r5).
    """
    from ..octree.brick import BrickOctree

    if sort_bounces == "auto":
        sort_bounces = (1, 2)
    b = origins.shape[0]
    t = _auto_tiles(b) if tiles == "auto" else max(1, int(tiles))
    drain = (
        drain
        and not skip_dead
        and not isinstance(scene.octree, BrickOctree)
    )
    if t <= 1 or b % t:
        return _trace_paths_block(scene, origins, dirs, uniforms, beam=beam)
    if compact:
        return _trace_paths_compacted(
            scene, origins, dirs, uniforms, t, sort_key, skip_dead, beam=beam,
            drain=drain, sort_bounces=sort_bounces,
            pool_sun_walk=pool_sun_walk,
        )
    bt = b // t
    o = origins.reshape(t, bt, 3)
    d = dirs.reshape(t, bt, 3)
    u = uniforms.reshape((t, bt) + uniforms.shape[1:])
    out = jax.lax.map(
        lambda xs: _trace_paths_block(scene, xs[0], xs[1], xs[2], beam=beam),
        (o, d, u),
    )
    return out.reshape(b, 3)


def trace_paths_census(scene: Scene, origins, dirs, uniforms):
    """Untiled integrator that also returns per-bounce live-lane counts.

    Returns (radiance (B,3), live (n_bounces,) int32) where ``live[i]`` is
    the number of lanes entering bounce ``i`` active.  A "ray" in the
    nominal ``lanes * n_bounces`` convention traverses only when its lane is
    live — this census is the honest denominator for rays/s (VERDICT r2 #8:
    compaction must not silently inflate the headline metric).  Diagnostic
    path: unsorted/untiled, so counts are layout-independent.
    """
    state = _init_state(origins, dirs)
    n_bounces = uniforms.shape[1]
    live = []
    for bounce in range(n_bounces):
        live.append(jnp.sum(state["active"].astype(jnp.int32)))
        state = _bounce(
            scene,
            state,
            uniforms[:, bounce, :],
            is_first=bounce == 0,
            may_scatter=bounce + 1 < n_bounces,
        )
    return state["radiance"], jnp.stack(live)


def _trace_paths_branched_block(scene: Scene, origins, dirs, uniforms):
    """Untiled first-hit branch replication over one lane block.

    uniforms: (B, K, n_bounces, N_UNIFORMS)."""
    b, k, n_bounces = uniforms.shape[:3]
    res = _trace(scene, origins, dirs)  # THE one primary traversal

    rep = lambda x: jnp.repeat(x, k, axis=0) if getattr(x, "ndim", 0) else x
    res_k = jax.tree.map(rep, res)
    st = _init_state(rep(origins.astype(jnp.float32)), rep(dirs.astype(jnp.float32)))
    u = uniforms.reshape(b * k, n_bounces, uniforms.shape[-1])

    st = _shade(scene, st, u[:, 0, :], res_k, is_first=True, may_scatter=n_bounces > 1)
    for bounce in range(1, n_bounces):
        st = _bounce(
            scene,
            st,
            u[:, bounce, :],
            is_first=False,
            may_scatter=bounce + 1 < n_bounces,
        )
    return st["radiance"].reshape(b, k, 3).mean(axis=1)


def trace_paths_branched(scene: Scene, origins, dirs, uniforms, tiles="auto"):
    """First-hit branch replication (``path_tracer.rs:66-121``): trace the
    primary ray ONCE per lane, then run ``K = uniforms.shape[1]`` independent
    continuations from the frozen first hit — each with its own lobe choice,
    NEE sample, and bounce tail — and average.  The primary traversal (the
    longest walk of the path) is paid once instead of K times.

    uniforms: (B, K, n_bounces, N_UNIFORMS).  Returns (B, 3) radiance, the
    mean of the K branch estimators (the reference's ``cumulative /= count``).
    Equivalent to ``mean_k trace_paths(..., uniforms[:, k])`` lane-for-lane
    (the primary trace is deterministic), tested in test_pathtracer.py.
    """
    b = origins.shape[0]
    t = _auto_tiles(b) if tiles == "auto" else max(1, int(tiles))
    if t <= 1 or b % t:
        return _trace_paths_branched_block(scene, origins, dirs, uniforms)
    bt = b // t
    o = origins.reshape(t, bt, 3)
    d = dirs.reshape(t, bt, 3)
    u = uniforms.reshape((t, bt) + uniforms.shape[1:])
    out = jax.lax.map(
        lambda xs: _trace_paths_branched_block(scene, xs[0], xs[1], xs[2]),
        (o, d, u),
    )
    return out.reshape(b, 3)


def sky_radiance(scene: Scene, dirs, bounce0_mask, specular_mask):
    """Sky+sun color for miss rays (path_tracer.rs:26-37), (B, 3)."""
    strat = scene.sun_sampling
    sky = sky_color((dirs.shape[0],))
    sky_specular = add_sun_color(scene.sun, dirs, sky)[:, :3]
    if strat.diffuse_sun:
        sky_diffuse = add_sun_color_diffuse(scene.sun, dirs, sky)[:, :3]
    else:
        sky_diffuse = sky[:, :3]
    return jnp.where(
        (bounce0_mask | specular_mask)[:, None], sky_specular, sky_diffuse
    )


def lobe_scatter(scene: Scene, u, d_in, n, albedo, mat, cur_mat, bounce0_mask,
                 mrow=None):
    """Single-lobe scatter decision + outgoing ray for a resolved hit.

    The shared core of the recursive integrator (path_tracer.rs:64-119 lobe
    selection; specular/diffuse/refraction/transmission continuations) used
    by both the bounce-loop integrator and the fused persistent-wavefront
    kernel.  Returns a dict:

      new_dir (B,3), tp_mult (B,3) [throughput multiplier], enters (B,)
      [lane enters the hit material], clears_specular (B,), emit_rgb (B,3)
      [emitted radiance, pre-throughput, already lobe-masked].

    ``mrow``: optional pre-fetched material row (``materials.gather_rows``) —
    the caller's single row-gather replaces the 6 per-field gathers below.
    """
    m = scene.materials
    strat = scene.sun_sampling
    alpha = albedo[:, 3]
    if mrow is None:
        from ..models.materials import gather_rows

        mrow = gather_rows(m, mat)
    metal = mrow["metalness"]
    spec = mrow["specular"]
    rough = mrow["roughness"]
    emit = mrow["emittance"]
    ior1 = mrow["ior"]
    ior2 = m.ior[cur_mat]

    do_metal = (metal > EPSILON) & (u[:, U_METAL] < metal)
    do_spec = ~do_metal & (spec > EPSILON) & (u[:, U_SPECULAR] < spec)
    do_diff = ~do_metal & ~do_spec & (u[:, U_DIFFUSE] < alpha)
    do_refr = ~do_metal & ~do_spec & ~do_diff & (jnp.abs(ior1 - ior2) >= EPSILON)
    do_trans = ~do_metal & ~do_spec & ~do_diff & ~do_refr

    # emitter term (do_diffuse_reflection, path_tracer.rs:203-213)
    if scene.emitters_enabled:
        if scene.emitter_sampling == EmitterSampling.NONE:
            emit_when = do_diff
        else:
            emit_when = do_diff & bounce0_mask
    else:
        emit_when = jnp.zeros_like(do_diff)
    emit_cond = emit_when & (emit > EPSILON)
    emit_rgb = jnp.where(
        emit_cond[:, None], albedo[:, :3] * albedo[:, :3] * emit[:, None], 0.0
    )

    diff_dir, diff_w = diffuse_dir_and_weight(n, scene.sun, u, strat.importance_sampling)
    spec_dir = specular_reflect_dir(d_in, n, rough, u)

    refractive = (mrow["flags"] & FLAG_REFRACTIVE) != 0
    ratio = ior1 / ior2
    cos_theta = -jnp.sum(d_in * n, axis=-1)
    radicand = 1.0 - ratio * ratio * (1.0 - cos_theta * cos_theta)
    tir = refractive & (radicand < EPSILON)
    refl_p = fresnel_schlick(ior1, ior2, cos_theta)
    refr_reflect = do_refr & (tir | (u[:, U_FRESNEL] < refl_p))
    refr_refract = do_refr & ~refr_reflect & refractive
    refr_pass = do_refr & ~refr_reflect & ~refractive
    refracted = refract_dir(d_in, n, ratio, cos_theta, radicand)

    new_dir = d_in
    new_dir = jnp.where((do_metal | do_spec | refr_reflect)[:, None], spec_dir, new_dir)
    new_dir = jnp.where(do_diff[:, None], diff_dir, new_dir)
    new_dir = jnp.where(refr_refract[:, None], refracted, new_dir)

    tint = albedo[:, :3] * alpha[:, None]
    tp_mult = jnp.ones_like(albedo[:, :3])
    tp_mult = jnp.where(do_metal[:, None], albedo[:, :3], tp_mult)
    tp_mult = jnp.where(
        do_diff[:, None], albedo[:, :3] * diff_w[:, None], tp_mult
    )
    tp_mult = jnp.where((refr_refract | refr_pass | do_trans)[:, None], tint, tp_mult)

    return dict(
        new_dir=new_dir,
        tp_mult=tp_mult,
        enters=refr_refract | refr_pass | do_trans,
        clears_specular=do_diff,
        emit_rgb=emit_rgb,
        do_diff=do_diff,
    )


def _bounce(scene: Scene, st, u, is_first: bool, may_scatter: bool,
            beam: bool = False):
    # dead lanes skip the traversal entirely (a fully-dead tile's lockstep
    # loop runs zero iterations — the compaction payoff)
    res = _trace(
        scene,
        st["origin"],
        st["dir"],
        None if is_first else st["active"],
        beam=beam and is_first,
    )
    return _shade(scene, st, u, res, is_first, may_scatter)


def _shade(scene: Scene, st, u, res, is_first: bool, may_scatter: bool,
           sun_att=None):
    """Shade one resolved traversal: sky on miss, lobe scatter on hit.

    Split from the trace so the branched estimator can reuse ONE primary
    traversal across its replicated continuations (``trace_paths_branched``).
    ``is_first``/``may_scatter`` are static per-unroll flags (bounce == 0 /
    bounce + 1 < n_bounces).

    ``sun_att``: optional precomputed (B, 4) sun-NEE attenuation
    (``_pooled_sun_att`` — the drain integrator's whole-batch drained
    stateful walk); replaces the in-shade ``shadow_attenuation`` call."""
    from .hit import resolve_hit

    strat = scene.sun_sampling

    active = st["active"]
    # analytic primitives compete with the octree hit; nearest surface wins
    if scene.prims is not None:
        p_hit, p_t, p_mat, p_uv, p_n = _prim_hit(scene, st["origin"], st["dir"])
        any_hit = res.hit | p_hit
    else:
        any_hit = res.hit
    miss = active & ~any_hit
    hit = active & any_hit  # res.hit is already False on masked-dead lanes
    b = st["dir"].shape[0]
    bounce0 = jnp.full((b,), is_first)

    # ---- sky on miss (path_tracer.rs:26-37) ----
    sky_rgb = sky_radiance(scene, st["dir"], bounce0, st["specular"])
    radiance = st["radiance"] + jnp.where(
        miss[:, None], st["throughput"] * sky_rgb, 0.0
    )

    # depth cap: ray.hit.depth + 1 >= 5 breaks before scattering
    # (path_tracer.rs:56-59); bounce index == depth of the ray here.
    can_scatter = hit & may_scatter
    new_active = can_scatter

    # ---- hit shading ----
    mat, hit_uv, n, t_hit = resolve_hit(scene, st["origin"], st["dir"], res)
    if scene.prims is not None:
        t_oct = jnp.where(res.hit, t_hit, jnp.inf)
        use_p = p_hit & (p_t < t_oct)
        mat = jnp.where(use_p, p_mat, mat)
        hit_uv = jnp.where(use_p[:, None], p_uv, hit_uv)
        n = jnp.where(use_p[:, None], p_n, n)
        t_hit = jnp.where(use_p, p_t, t_hit)
    from ..models.materials import gather_rows

    m = scene.materials
    # one row-gather serves the albedo layer, the lobe fields, and the
    # subsurface flag below (8 per-field gathers otherwise; PERF_NOTES
    # gather model: fixed cost is per OP, row width is free)
    mrow = gather_rows(m, mat)
    albedo = sample_atlas(
        scene.atlas, mrow["texture_index"], hit_uv[:, 0], hit_uv[:, 1]
    )
    hitpoint = st["origin"] + st["dir"] * t_hit[:, None]

    sc = lobe_scatter(
        scene, u, st["dir"], n, albedo, mat, st["cur_mat"], bounce0, mrow=mrow
    )
    radiance = radiance + jnp.where(
        can_scatter[:, None], st["throughput"] * sc["emit_rgb"], 0.0
    )

    # sun NEE on diffuse bounces (do_diffuse_reflection, path_tracer.rs:225-262)
    if strat.sun_sampling:
        sun_dir = random_sun_direction(scene.sun, u[:, U_SUN1], u[:, U_SUN2])
        front = jnp.sum(sun_dir * n, axis=-1) > 0.0
        sss = (
            ((mrow["flags"] & FLAG_SUBSURFACE_SCATTER) != 0)
            & (u[:, U_SUBSURFACE] < scene.f_sub_surface)
        )
        shadow_on = sc["do_diff"] & can_scatter & (front | sss)
        shadow_origin = jnp.where(front[:, None], hitpoint, hitpoint - OFFSET * n)
        if sun_att is not None:
            att = sun_att
        else:
            att = shadow_attenuation(
                scene, shadow_origin, sun_dir, st["cur_mat"], active=shadow_on
            )
        lum = scene.sun.luminosity_pdf if strat.sun_luminosity else 1.0
        mult = jnp.abs(jnp.sum(sun_dir * n, axis=-1)) * lum * att[:, 3]
        direct = att[:, :3] * mult[:, None]
        nee = albedo[:, :3] * direct * scene.sun.emittance[None, :3]
        radiance = radiance + jnp.where(
            shadow_on[:, None], st["throughput"] * nee, 0.0
        )

    # emitter NEE on diffuse bounces (EmitterSampling.{ONE,ONE_BLOCK,ALL} —
    # this framework's implementation of the strategies the reference only
    # declares, scene/mod.rs:39-57; estimator spec in models/emitters.py:
    # ONE importance-samples one face of one block, ONE_BLOCK sums the 3
    # toward faces of one block, ALL sums the 3 toward faces of EVERY block)
    if (
        scene.emitter_sampling != EmitterSampling.NONE
        and scene.emitters is not None
        and scene.emitters_enabled
    ):
        from ..models.emitters import sample_emitter_point, toward_face_sample

        em = scene.emitters
        base_on = sc["do_diff"] & can_scatter
        hp_sg = jax.lax.stop_gradient(hitpoint)

        def em_face_contrib(q, ne, mat_e, uv, inv_pdf):
            """Area-form NEE contribution of one sampled emitter point
            (pre-throughput, masked to zero off-lobe / back-facing)."""
            to_q = jax.lax.stop_gradient(q) - hitpoint
            # sqrt(max(., eps^2)) keeps the backward finite on masked lanes
            # where q == hitpoint (jnp.where's 0 * nan cotangent trap)
            dist = jnp.sqrt(
                jnp.maximum(jnp.sum(to_q * to_q, -1), EPSILON * EPSILON)
            )
            wi = to_q / dist[:, None]
            cos_s = jnp.sum(wi * n, axis=-1)
            cos_e = jnp.sum(-wi * ne, axis=-1)
            on = base_on & (cos_s > 0.0) & (cos_e > 0.0)
            # truncate the attenuation walk just short of the emitter so its
            # own entry face never self-shadows
            att = shadow_attenuation(
                scene,
                hitpoint,
                wi,
                st["cur_mat"],
                active=on,
                max_t=dist * (1.0 - 1e-3),
            )
            from ..models.materials import gather_rows

            mrow_e = gather_rows(scene.materials, mat_e)
            albedo_e = sample_atlas(
                scene.atlas, mrow_e["texture_index"], uv[:, 0], uv[:, 1]
            )
            l_e = (
                albedo_e[:, :3] * albedo_e[:, :3] * mrow_e["emittance"][:, None]
            )
            geom = cos_s * cos_e / jnp.maximum(dist * dist, EPSILON) / jnp.pi
            contrib = (
                albedo[:, :3]
                * l_e
                * att[:, :3]
                * (geom * inv_pdf * att[:, 3])[:, None]
            )
            return jnp.where(on[:, None], contrib, 0.0)

        if scene.emitter_sampling == EmitterSampling.ONE:
            smp = sample_emitter_point(
                em, hp_sg, u[:, U_EM_PICK], u[:, U_EM1], u[:, U_EM2],
                n=jax.lax.stop_gradient(n),
            )
            em_contrib = em_face_contrib(
                smp["q"], smp["ne"], smp["mat"], smp["uv"], smp["inv_pdf"]
            )
        # ONE_BLOCK/ALL reuse the single (U_EM1, U_EM2) pair for all 3 faces
        # of a block (and, in ALL, for every block): the per-face point
        # samples of one pixel-bounce are fully correlated.  Intentional and
        # unbiased (each face term is individually unbiased; correlation
        # affects only variance) and what the oracle twin mirrors
        # lane-for-lane.  Decorrelating (hashing the face axis / block index
        # into the uniforms) is an available variance reduction — change the
        # kernel and render/oracle.py together if taken.
        elif scene.emitter_sampling == EmitterSampling.ONE_BLOCK:
            e_cnt = em.pos.shape[0]
            idx = jnp.minimum(
                (u[:, U_EM_PICK] * e_cnt).astype(jnp.int32), e_cnt - 1
            )
            pos_e, size_e, mat_e = em.pos[idx], em.size[idx], em.mat[idx]
            inv_pdf = jnp.float32(e_cnt) * size_e * size_e
            em_contrib = jnp.zeros_like(albedo[:, :3])
            for axis in range(3):
                q, ne, uv = toward_face_sample(
                    pos_e, size_e, hp_sg, axis, u[:, U_EM1], u[:, U_EM2]
                )
                em_contrib = em_contrib + em_face_contrib(
                    q, ne, mat_e, uv, inv_pdf
                )
        else:  # EmitterSampling.ALL — one scan step per emitter block
            from ..models.emitters import ALL_MAX_EMITTERS

            e_cnt = em.pos.shape[0]
            if e_cnt > ALL_MAX_EMITTERS:
                raise ValueError(
                    f"EmitterSampling.ALL sums 3 shadow traversals per "
                    f"emitter per diffuse bounce — O(E) work; this scene has "
                    f"E={e_cnt} > {ALL_MAX_EMITTERS}.  Use EmitterSampling."
                    f"ONE (spatially-selected, O(1) per bounce) for large "
                    f"emitter tables."
                )
            b_lanes = hitpoint.shape[0]

            def _all_body(acc, i):
                pos_e = jnp.broadcast_to(em.pos[i], (b_lanes, 3))
                size_e = jnp.broadcast_to(em.size[i], (b_lanes,))
                mat_e = jnp.broadcast_to(em.mat[i], (b_lanes,))
                inv_pdf = size_e * size_e  # deterministic block sum: no pick factor
                for axis in range(3):
                    q, ne, uv = toward_face_sample(
                        pos_e, size_e, hp_sg, axis, u[:, U_EM1], u[:, U_EM2]
                    )
                    acc = acc + em_face_contrib(q, ne, mat_e, uv, inv_pdf)
                return acc, None

            em_contrib, _ = jax.lax.scan(
                _all_body,
                jnp.zeros_like(albedo[:, :3]),
                jnp.arange(e_cnt, dtype=jnp.int32),
            )
        radiance = radiance + st["throughput"] * em_contrib

    new_origin = hitpoint + sc["new_dir"] * OFFSET
    upd = can_scatter
    return dict(
        origin=jnp.where(upd[:, None], new_origin, st["origin"]),
        dir=jnp.where(upd[:, None], sc["new_dir"], st["dir"]),
        throughput=jnp.where(
            upd[:, None], st["throughput"] * sc["tp_mult"], st["throughput"]
        ),
        radiance=radiance,
        active=new_active,
        specular=jnp.where(upd & sc["clears_specular"], False, st["specular"]),
        cur_mat=jnp.where(upd & sc["enters"], mat, st["cur_mat"]),
    )


def draw_uniforms(key, n_lanes: int, n_bounces: int = MAX_BOUNCES):
    """Pre-draw the full uniform block for a batch."""
    return jax.random.uniform(
        key, (n_lanes, n_bounces, N_UNIFORMS), dtype=jnp.float32
    )


def render_sample(scene: Scene, origins, dirs, key):
    """One sample per lane: radiance (B, 3)."""
    u = draw_uniforms(key, origins.shape[0])
    return trace_paths(scene, origins, dirs, u)
