"""Inverse rendering — optimize voxel albedo + emission from reference views.

BASELINE config 4: given target renders from multiple camera views, recover
the texture-atlas albedo and per-material emittance by gradient descent
through the differentiable wavefront renderer (detached traversal structure,
differentiable shading — SURVEY.md §7.5).
"""

from __future__ import annotations

import dataclasses
from functools import partial
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


@partial(jax.jit, static_argnames=())
def _loss_all_views(scene, params, all_origins, all_dirs, all_u, targets):
    def one(origins, dirs, u, target):
        rad = trace_paths(apply_params(scene, params), origins, dirs, u)
        return jnp.mean((rad - target) ** 2)

    losses = jax.vmap(one)(all_origins, all_dirs, all_u, targets)
    return jnp.mean(losses)


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
) -> InverseResult:
    """Optimize (atlas, emittance) to match ``targets`` (V, H*W, 3).

    Fresh uniform streams per step give stochastic gradients over light paths
    (the views' pixel estimators are unbiased in expectation).
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

    grad_fn = jax.jit(jax.value_and_grad(_loss_all_views, argnums=1))

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
