"""shard_map render and train steps — the multi-chip compute path.

Rays shard over the (dp, sp) mesh with the scene replicated; the sample mean
is a ``psum`` over ``sp``; inverse-rendering gradients are ``psum``'d over the
whole mesh (the collective the reference never had — SURVEY.md §5
"Distributed communication backend": absent -> JAX ICI collectives).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.scene import Scene
from ..render.pathtracer import trace_paths
from .mesh import DP_AXIS, SP_AXIS


def sharded_render(mesh: Mesh, scene: Scene, origins, dirs, uniforms):
    """Render (S, B) sample-major lanes on the mesh; returns (B, 3) radiance
    averaged over the sample axis.

    origins/dirs: (S, B, 3); uniforms: (S, B, MAX_BOUNCES, NU).
    S must divide by mesh sp size, B by dp size.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(SP_AXIS, DP_AXIS), P(SP_AXIS, DP_AXIS), P(SP_AXIS, DP_AXIS)),
        out_specs=P(None, DP_AXIS),
    )
    def _render(scene_, o, d, u):
        s_loc, b_loc = o.shape[0], o.shape[1]
        flat = lambda x: x.reshape((s_loc * b_loc,) + x.shape[2:])
        rad = trace_paths(scene_, flat(o), flat(d), flat(u))
        rad = rad.reshape(s_loc, b_loc, 3).mean(axis=0)
        rad = jax.lax.pmean(rad, SP_AXIS)
        return rad[None]  # (1, b_loc, 3) with None-sharded sample axis

    return _render(scene, origins, dirs, uniforms)[0]


def apply_params(scene: Scene, params) -> Scene:
    """Graft trainable leaves (atlas albedo, material emittance) into a scene.

    ``params["atlas"]`` may be either the full atlas pytree or, for a
    variable-resolution scene, just the texel ``data`` array (the int size
    table is structural, not trainable)."""
    import dataclasses

    from ..ops.texture import Atlas

    atlas = params["atlas"]
    if isinstance(scene.atlas, Atlas) and not isinstance(atlas, Atlas):
        atlas = Atlas(atlas, scene.atlas.sizes)
    materials = dataclasses.replace(scene.materials, emittance=params["emittance"])
    return dataclasses.replace(scene, atlas=atlas, materials=materials)


def render_loss(scene: Scene, params, origins, dirs, uniforms, target):
    """Photometric loss with trainable (atlas, emittance) grafted into the
    scene — the inverse-rendering objective (BASELINE config 4)."""
    rad = trace_paths(apply_params(scene, params), origins, dirs, uniforms)
    return jnp.mean((rad - target) ** 2)


def sharded_train_step(mesh: Mesh, scene: Scene, params, origins, dirs, uniforms, target):
    """One inverse-rendering gradient step on the mesh.

    Lanes shard over (sp, dp); the loss is the global mean; parameter grads
    are psum'd across every axis (allreduce over ICI, overlapping XLA's
    backward schedule).  Returns (loss, grads) with grads replicated.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(),
            P(),
            P(SP_AXIS, DP_AXIS),
            P(SP_AXIS, DP_AXIS),
            P(SP_AXIS, DP_AXIS),
            P(SP_AXIS, DP_AXIS),
        ),
        out_specs=(P(), P()),
    )
    def _step(scene_, params_, o, d, u, tgt):
        s_loc, b_loc = o.shape[0], o.shape[1]
        flat = lambda x: x.reshape((s_loc * b_loc,) + x.shape[2:])

        def loss_fn(p):
            return render_loss(scene_, p, flat(o), flat(d), flat(u), flat(tgt))

        loss, grads = jax.value_and_grad(loss_fn)(params_)
        loss = jax.lax.pmean(jax.lax.pmean(loss, DP_AXIS), SP_AXIS)
        grads = jax.tree.map(
            lambda g: jax.lax.pmean(jax.lax.pmean(g, DP_AXIS), SP_AXIS), grads
        )
        return loss, grads

    return _step(scene, params, origins, dirs, uniforms, target)
