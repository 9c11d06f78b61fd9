"""Inverse rendering — optimize voxel albedo + emission from reference views.

BASELINE config 4: given target renders from multiple camera views, recover
the texture-atlas albedo and per-material emittance by gradient descent
through the differentiable wavefront renderer (detached traversal structure,
differentiable shading — SURVEY.md §7.5).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..models.camera import Camera, pixel_grid_rays
from ..models.scene import Scene
from ..parallel.shard import apply_params
from ..render.pathtracer import draw_uniforms, trace_paths


def render_views(scene: Scene, cameras: list[Camera], width: int, height: int, key):
    """Render one sample-per-pixel radiance for each view; returns (V, B, 3)."""
    outs = []
    for i, cam in enumerate(cameras):
        origins, dirs = pixel_grid_rays(cam, width, height)
        u = draw_uniforms(jax.random.fold_in(key, i), origins.shape[0])
        outs.append(trace_paths(scene, origins, dirs, u))
    return jnp.stack(outs)


@dataclasses.dataclass
class InverseResult:
    params: Any
    losses: list


def make_inverse_loss(soft_weight: float = 0.25):
    """The config-4 objective: path-traced photometric MSE, plus
    ``soft_weight`` x the relaxed-visibility single-scatter MSE
    (``diff.soft.soft_radiance``).

    The hard term's traversal is detached, so it carries zero gradient at
    silhouettes (a texel alpha gating whether a voxel face exists at all);
    the soft term is the reparameterized edge-aware estimator that supplies
    exactly that boundary gradient (VERDICT r2 #5: edge-aware gradients in
    the product inverse-rendering path, not beside it)."""

    def loss_all_views(scene, params, all_origins, all_dirs, all_u, targets):
        sp = apply_params(scene, params)

        def one(origins, dirs, u, target):
            rad = trace_paths(sp, origins, dirs, u)
            loss = jnp.mean((rad - target) ** 2)
            if soft_weight > 0.0:
                from .soft import soft_radiance

                # share the first-bounce uniform row so the soft estimator's
                # secondary diffuse sample pairs with the hard pass's
                soft = soft_radiance(sp, origins, dirs, u=u[:, 0, :])
                loss = loss + soft_weight * jnp.mean((soft - target) ** 2)
            return loss

        losses = jax.vmap(one)(all_origins, all_dirs, all_u, targets)
        return jnp.mean(losses)

    return loss_all_views


_loss_all_views = make_inverse_loss(0.0)  # hard-only objective (tests, FD)


def inverse_render(
    scene: Scene,
    cameras: list[Camera],
    targets,
    width: int,
    height: int,
    steps: int = 100,
    lr: float = 5e-2,
    key=None,
    init_params=None,
    soft_weight: float = 0.25,
) -> InverseResult:
    """Optimize (atlas, emittance) to match ``targets`` (V, H*W, 3).

    Fresh uniform streams per step give stochastic gradients over light paths
    (the views' pixel estimators are unbiased in expectation).

    ``soft_weight`` mixes the edge-aware relaxed-visibility term into the
    objective (see :func:`make_inverse_loss`); 0 restores the hard-only
    detached-traversal loss.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if init_params is None:
        from ..ops.texture import Atlas

        tex = scene.atlas.data if isinstance(scene.atlas, Atlas) else scene.atlas
        init_params = {
            # variable-resolution scenes train the texel data array only
            "atlas": jnp.full_like(tex, 0.5).at[..., 3].set(jnp.asarray(tex)[..., 3]),
            "emittance": jnp.zeros_like(scene.materials.emittance),
        }
    params = init_params
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    rays = [pixel_grid_rays(cam, width, height) for cam in cameras]
    all_origins = jnp.stack([r[0] for r in rays])
    all_dirs = jnp.stack([r[1] for r in rays])
    n_lanes = all_origins.shape[1]
    targets = jnp.asarray(targets)

    grad_fn = jax.jit(jax.value_and_grad(make_inverse_loss(soft_weight), argnums=1))

    losses = []
    for step in range(steps):
        k = jax.random.fold_in(key, 1000 + step)
        all_u = jnp.stack(
            [
                draw_uniforms(jax.random.fold_in(k, v), n_lanes)
                for v in range(len(cameras))
            ]
        )
        loss, grads = grad_fn(scene, params, all_origins, all_dirs, all_u, targets)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        # keep albedo physical
        params["atlas"] = jnp.clip(params["atlas"], 0.0, 1.0)
        params["emittance"] = jnp.clip(params["emittance"], 0.0, None)
        losses.append(float(loss))
    return InverseResult(params=params, losses=losses)
