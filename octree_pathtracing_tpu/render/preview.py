"""Flat-shaded preview renderer — the reference's Preview mode.

Pipeline (``/root/reference/src/ray/path_tracer.rs:137-158`` +
``src/octree/octree_traversal.rs:306-535`` +
``src/scene/mod.rs:447-452``): primary traversal, leaf hit takes the leaf
material's texture forced opaque, shaded by ``max(AMBIENT, n . sun_dir)`` times
sun emittance; misses draw sky + the sun's angular window.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.camera import Camera, pixel_grid_rays
from ..models.scene import Scene, face_normals
from ..models.sun import add_sun_color, flat_shading, sky_color
from ..ops.texture import sample_atlas
from ..ops.brick_traversal import traverse_tree


def preview_render_rays(scene: Scene, origins, directions):
    """Preview-shade a ray batch; returns (B, 3) linear RGB."""
    from .hit import make_accept_fn, resolve_hit

    tree = scene.octree
    res = traverse_tree(
        tree,
        origins,
        directions,
        accept_fn=make_accept_fn(scene, origins, directions),
    )
    mat_id, uv, normals, _t = resolve_hit(scene, origins, directions, res)
    layer = scene.materials.texture_index[mat_id]
    albedo = sample_atlas(scene.atlas, layer, uv[:, 0], uv[:, 1])
    shaded = flat_shading(scene.sun, normals, albedo[:, :3])

    sky = sky_color((origins.shape[0],))
    sky = add_sun_color(scene.sun, directions, sky)
    return jnp.where(res.hit[:, None], shaded, sky[:, :3])


def preview_image(scene: Scene, camera: Camera, width: int, height: int):
    """Render a full-frame preview; returns (H, W, 3) linear RGB."""
    origins, dirs = pixel_grid_rays(camera, width, height)
    rgb = preview_render_rays(scene, origins, dirs)
    return rgb.reshape(height, width, 3)
