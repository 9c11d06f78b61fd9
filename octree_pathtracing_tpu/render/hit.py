"""Hit resolution: traversal candidates -> (material, uv, normal, t).

Centralizes the leaf-model dispatch of ``octree_traversal.rs:192-215``:

- no model table: leaf value -> material via ``scene.leaf_material``, face
  uv/normal from the traversal (full-cube SingleBlock path),
- simple models: per-face material (packed Cuboid ``[u16; 6]``,
  ``gpu_structs/cuboid.rs:37-44``),
- quad models: nearest accepted quad in block-local space (ResourceModel::
  Quad, with the alpha test of ``Cuboid::intersect_texture``).

Also provides the acceptance predicate used inside the traversal loop (the
"model intersection failed -> keep traversing" fall-through).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.blockmodels import FLAG_SIMPLE, MAX_MODEL_QUADS
from ..models.scene import Scene, face_normals
from ..ops.geometry import quad_hit
from ..ops.shading import EPSILON
from ..ops.texture import sample_atlas


def _albedo(scene: Scene, mat_id, uv):
    layer = scene.materials.texture_index[mat_id]
    return sample_atlas(scene.atlas, layer, uv[:, 0], uv[:, 1])


def _leaf_mat(scene: Scene, leaf_value):
    return scene.leaf_material[
        jnp.clip(leaf_value.astype(jnp.int32), 0, scene.leaf_material.shape[0] - 1)
    ]


def _quad_scan(scene: Scene, origins, dirs, leaf_value, voxel_pos, voxel_size):
    """Test a candidate's quad model; returns (found, t_world, uv, mat, normal)."""
    m = scene.models
    model = m.leaf_model[
        jnp.clip(leaf_value.astype(jnp.int32), 0, m.leaf_model.shape[0] - 1)
    ]
    start = m.quad_start[model]
    count = m.quad_count[model]
    vs = voxel_size[:, None]
    o_loc = (origins - voxel_pos) / vs
    zero_vox = jnp.zeros_like(voxel_pos)

    best_t = jnp.full(origins.shape[0], jnp.inf)
    best_uu = jnp.zeros(origins.shape[0])
    best_vv = jnp.zeros(origins.shape[0])
    best_q = jnp.full(origins.shape[0], -1, jnp.int32)
    for k in range(MAX_MODEL_QUADS):
        q_idx = jnp.clip(start + k, 0, m.quads.count - 1)
        ok, t, uu, vv = quad_hit(m.quads, q_idx, o_loc, dirs, zero_vox, best_t)
        mat_k = m.quads.material_id[q_idx]
        alpha = _albedo(scene, mat_k, jnp.stack([uu, vv], -1))[:, 3]
        take = (k < count) & ok & (alpha > EPSILON) & (t < best_t)
        best_t = jnp.where(take, t, best_t)
        best_uu = jnp.where(take, uu, best_uu)
        best_vv = jnp.where(take, vv, best_vv)
        best_q = jnp.where(take, q_idx, best_q)
    found = best_q >= 0
    mat = m.quads.material_id[jnp.maximum(best_q, 0)]
    normal = m.quads.normal[jnp.maximum(best_q, 0)]
    t_world = best_t * voxel_size
    return found, t_world, jnp.stack([best_uu, best_vv], -1), mat, normal


def _leaf_alpha_classes(scene: Scene):
    """Per-leaf-value static alpha classes -> (rejectable, binary), (L,) bool.

    ``rejectable[l]``: some texel of the leaf's material(s) has alpha <= eps
    (or the leaf is a quad model), so the accept test could actually reject
    it; anything else is auto-accepted without touching the atlas.
    ``binary[l]``: every texel is alpha == 1 exactly and the model is a plain
    cube face — a shadow-walk surface of this class is a TOTAL blocker whose
    attenuation needs no texel fetch (the per-leaf generalization of
    ``Scene.shadow_binary``, which is the all-leaves special case).

    Tiny jnp reductions over the atlas/material tables — loop-invariant, so
    XLA hoists them out of the traversal ``while_loop``.
    """
    from ..ops.texture import Atlas

    data = scene.atlas.data if isinstance(scene.atlas, Atlas) else scene.atlas
    layer_min = data[..., 3].reshape(data.shape[0], -1).min(axis=1)  # (T,)
    tex = scene.materials.texture_index
    m_min = layer_min[jnp.clip(tex, 0, layer_min.shape[0] - 1)]  # (M,)
    if scene.models is None:
        lm_min = m_min[scene.leaf_material]  # (L,)
        return lm_min <= EPSILON, lm_min >= 1.0
    m = scene.models
    fm_min = m_min[m.face_material]  # (Mm, 6)
    model_min = fm_min.min(axis=1)  # (Mm,)
    simple = (m.flags & FLAG_SIMPLE) != 0  # (Mm,)
    lv_min = model_min[m.leaf_model]  # (L,)
    lv_simple = simple[m.leaf_model]
    return (lv_min <= EPSILON) | ~lv_simple, (lv_min >= 1.0) & lv_simple


def make_accept_fn(scene: Scene, origins, dirs):
    """Candidate acceptance inside the traversal loop: texel alpha > eps for
    cube faces; any accepted quad for quad models.  Returns None when the
    scene is statically all-opaque cubes (no rejection possible).

    Candidates whose leaf class is not rejectable (``_leaf_alpha_classes``)
    are accepted without the atlas fetch, and the fetch itself runs under a
    nested ``lax.cond`` that fires only when some FRESH candidate is
    rejectable — on mixed scenes (solid terrain + cutout canopies) most
    lockstep iterations then skip the whole test block.  Decisions are
    bit-identical: a non-rejectable candidate's texel test is True by
    construction of the class table."""
    if scene.opaque_only:
        return None
    rejectable, _ = _leaf_alpha_classes(scene)
    n_leaf = rejectable.shape[0]

    def full_test(leaf_value, face_id, uv, voxel_pos, voxel_size):
        if scene.models is None:
            mat = _leaf_mat(scene, leaf_value)
            return _albedo(scene, mat, uv)[:, 3] > EPSILON
        m = scene.models
        model = m.leaf_model[
            jnp.clip(leaf_value.astype(jnp.int32), 0, m.leaf_model.shape[0] - 1)
        ]
        simple = (m.flags[model] & FLAG_SIMPLE) != 0
        mat = m.face_material[model, jnp.clip(face_id, 0, 5)]
        ok_simple = _albedo(scene, mat, uv)[:, 3] > EPSILON
        if not scene.has_quad_models:
            return ok_simple
        found, _, _, _, _ = _quad_scan(
            scene, origins, dirs, leaf_value, voxel_pos, voxel_size
        )
        return jnp.where(simple, ok_simple, found)

    def accept(leaf_value, face_id, uv, t_world, voxel_pos, voxel_size,
               fresh=None):
        lv = jnp.clip(leaf_value.astype(jnp.int32), 0, n_leaf - 1)
        needed = rejectable[lv]
        pred = needed if fresh is None else (needed & fresh)
        ok_full = jax.lax.cond(
            jnp.any(pred),
            lambda _: full_test(leaf_value, face_id, uv, voxel_pos, voxel_size),
            lambda _: jnp.ones_like(needed),
            None,
        )
        return ok_full | ~needed

    return accept


def _surface_of_candidate(scene: Scene, origins, dirs, leaf_value, face_id, uv,
                          voxel_pos, voxel_size):
    """Resolve a traversal candidate to its surface (is_surface, mat, uu, vv).

    The shared logic of ``make_accept_fn`` + ``resolve_hit`` for one
    candidate: cube-face material/uv for leaf and simple models, nearest
    accepted quad for quad models.  is_surface applies the texel alpha test
    (``Cuboid::intersect_texture`` semantics).
    """
    if scene.models is None:
        mat = _leaf_mat(scene, leaf_value)
        is_surface = _albedo(scene, mat, uv)[:, 3] > EPSILON
        return is_surface, mat, uv[:, 0], uv[:, 1]
    m = scene.models
    model = m.leaf_model[
        jnp.clip(leaf_value.astype(jnp.int32), 0, m.leaf_model.shape[0] - 1)
    ]
    simple = (m.flags[model] & FLAG_SIMPLE) != 0
    mat = m.face_material[model, jnp.clip(face_id, 0, 5)]
    ok_simple = _albedo(scene, mat, uv)[:, 3] > EPSILON
    if not scene.has_quad_models:
        return ok_simple, mat, uv[:, 0], uv[:, 1]
    found, _, uv_q, mat_q, _ = _quad_scan(
        scene, origins, dirs, leaf_value, voxel_pos, voxel_size
    )
    is_surface = jnp.where(simple, ok_simple, found)
    mat = jnp.where(simple, mat, mat_q)
    uu = jnp.where(simple, uv[:, 0], uv_q[:, 0])
    vv = jnp.where(simple, uv[:, 1], uv_q[:, 1])
    return is_surface, mat, uu, vv


def shadow_state_init(cur_mat, n_surfaces: int, record_t: bool = False):
    """Initial accept_state for the one-traversal shadow attenuation walk.

    Every array is derived from ``cur_mat`` (a varying per-lane input) rather
    than plain ``jnp.zeros`` so the traversal ``while_loop`` carry keeps
    consistent varying-manual-axes under shard_map (see traversal.py:137).

    ``record_t``: additionally record each surface's world-space ``t`` (the
    emitter-NEE walk truncates attenuation at the light's distance; the sun
    walk doesn't pay for the extra carry rows).

    ``t_last`` tracks the largest recorded surface t (−1 before any): the
    drained walk's resume phase uses it to skip candidates already recorded
    before the phase-1 cap (restart-from-t backs up by a margin, so the
    last recorded surface can be re-encountered — see
    ``make_shadow_accept_fn(resume=True)``).
    """
    cm = cur_mat.astype(jnp.int32)
    zi = cm * 0  # varying zeros, int32 (B,)
    zf = zi.astype(jnp.float32)
    rows_i = zi[None, :] + jnp.zeros((n_surfaces, 1), jnp.int32)
    rows_f = zf[None, :] + jnp.zeros((n_surfaces, 1), jnp.float32)
    st = dict(
        count=zi,
        w=zf + 1.0,
        cm=cm,
        t_last=zf - 1.0,
        mats=rows_i,
        uu=rows_f,
        vv=rows_f,
    )
    if record_t:
        st["ts"] = rows_f + jnp.float32(jnp.inf)
    return st


def make_shadow_accept_fn(scene: Scene, origins, dirs, strict: bool,
                          resume: bool = False):
    """Stateful accept: record each alpha surface the shadow ray crosses.

    One traversal replaces the reference's re-march per surface
    (``path_tracer.rs:458-483``): a surface candidate is *recorded* into the
    state and rejected (fall-through ADVANCE continues the walk) until the
    running alpha budget hits zero or the surface cap fills — then accepted,
    ending the lane.  Attenuation itself is recomputed differentiably from
    the recorded (mat, uv) list outside the loop (``shadow_attenuation``);
    the in-loop ``w`` is control flow only (everything here is detached).

    (r4 experiment, measured and REVERTED: a gather-free "record blindly,
    stop at the row cap" accept for all-opaque scenes ran 364 vs 232 ms on
    the NEE bench line — the in-loop alpha-budget early stop, which ends
    the walk at the first opaque blocker, is worth far more than the
    removed per-candidate albedo gather.  tools/PERF_NOTES.md r4.)
    """

    rejectable_tab, binary_tab = _leaf_alpha_classes(scene)
    n_leaf = binary_tab.shape[0]

    def accept(state, leaf_value, face_id, uv, t_world, voxel_pos, voxel_size,
               fresh):
        # binary-class candidates (every texel alpha == 1, plain cube face —
        # _leaf_alpha_classes) are total blockers: their surface attributes
        # are the entry face's (mat from the tiny leaf/face tables, uv
        # as-is) and alpha is exactly 1, so the atlas fetch + quad scan run
        # under a nested cond that fires only when a NON-binary fresh
        # candidate exists.  On mostly-solid worlds the walk then records
        # its (usually single, terrain) blocker without touching the atlas.
        # Bit-identical: for binary candidates the full path provably
        # returns (True, same mat, same uv, 1.0).
        lv = jnp.clip(leaf_value.astype(jnp.int32), 0, n_leaf - 1)
        is_bin = binary_tab[lv]
        if scene.models is None:
            bmat = _leaf_mat(scene, leaf_value)
        else:
            mm = scene.models
            model = mm.leaf_model[
                jnp.clip(
                    leaf_value.astype(jnp.int32), 0, mm.leaf_model.shape[0] - 1
                )
            ]
            bmat = mm.face_material[model, jnp.clip(face_id, 0, 5)]
        need = fresh & ~is_bin

        def full(_):
            is_surface, mat, uu, vv = _surface_of_candidate(
                scene, origins, dirs, leaf_value, face_id, uv, voxel_pos,
                voxel_size,
            )
            alpha = _albedo(scene, mat, jnp.stack([uu, vv], -1))[:, 3]
            return is_surface, mat, uu, vv, alpha

        def cheap(_):
            z = uv[:, 0] * 0
            return is_bin, bmat, z, z, z + 1.0

        fs, fm, fu, fv, fa = jax.lax.cond(jnp.any(need), full, cheap, None)
        is_surface = fresh & jnp.where(is_bin, True, fs)
        mat = jnp.where(is_bin, bmat, fm)
        uu = jnp.where(is_bin, uv[:, 0], fu)
        vv = jnp.where(is_bin, uv[:, 1], fv)
        alpha = jnp.where(is_bin, 1.0, fa)
        if resume:
            # drained-walk resume: restart-from-t backs the march up by a
            # margin, so surfaces recorded just before the phase-1 cap are
            # re-encountered — skip anything at or before the last recorded
            # t (t re-derives bit-identically, so strict > excludes exactly
            # the already-recorded surfaces).
            is_surface = is_surface & (t_world > state["t_last"])
        new_w = state["w"] * (1.0 - alpha)
        if strict:
            ior_change = (
                scene.materials.ior[state["cm"]] != scene.materials.ior[mat]
            )
            new_w = jnp.where(ior_change, 0.0, new_w)
        n_rows = state["mats"].shape[0]
        rows = jnp.arange(n_rows, dtype=jnp.int32)[:, None]
        sel = is_surface[None, :] & (rows == state["count"][None, :])
        count = state["count"] + is_surface.astype(jnp.int32)
        w = jnp.where(is_surface, new_w, state["w"])
        stop = is_surface & ((count >= n_rows) | (w <= 0.0))
        new_state = dict(
            count=count,
            w=w,
            cm=jnp.where(is_surface, mat, state["cm"]),
            t_last=jnp.where(is_surface, t_world, state["t_last"]),
            mats=jnp.where(sel, mat[None, :], state["mats"]),
            uu=jnp.where(sel, uu[None, :], state["uu"]),
            vv=jnp.where(sel, vv[None, :], state["vv"]),
        )
        if "ts" in state:
            new_state["ts"] = jnp.where(sel, t_world[None, :], state["ts"])
        return stop, new_state

    return accept


def resolve_hit(scene: Scene, origins, dirs, res):
    """Final hit attributes for accepted candidates.

    Returns (mat (B,), uv (B,2), normal (B,3), t (B,)).  For quad models the
    hit is the nearest accepted quad (entry-face values otherwise).
    """
    base_uv = res.uv
    base_t = res.t
    base_normal = face_normals()[jnp.clip(res.face_id, 0, 5)]
    if scene.models is None:
        return _leaf_mat(scene, res.leaf_value), base_uv, base_normal, base_t

    m = scene.models
    model = m.leaf_model[
        jnp.clip(res.leaf_value.astype(jnp.int32), 0, m.leaf_model.shape[0] - 1)
    ]
    simple = (m.flags[model] & FLAG_SIMPLE) != 0
    mat = m.face_material[model, jnp.clip(res.face_id, 0, 5)]
    if not scene.has_quad_models:
        return mat, base_uv, base_normal, base_t

    found, t_q, uv_q, mat_q, n_q = _quad_scan(
        scene, origins, dirs, res.leaf_value, res.voxel_pos, res.voxel_size
    )
    use_q = res.hit & ~simple & found
    mat = jnp.where(use_q, mat_q, mat)
    uv = jnp.where(use_q[:, None], uv_q, base_uv)
    normal = jnp.where(use_q[:, None], n_q, base_normal)
    # quad hit t is measured from the ray origin in local frame == world frame
    t = jnp.where(use_q, t_q, base_t)
    return mat, uv, normal, t
