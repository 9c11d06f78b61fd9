"""Thin-lens perspective camera — vectorized ray generation.

Same math as the reference camera (``/root/reference/src/renderer/camera.rs``):
``get_ray(x, y)`` with ``d = cot(fov/2)``, ``right = direction x up``, pixel
coordinates normalized to the [-1, 1] box of the longer image axis with the
reference's exact pixel-center convention
(``src/renderer/tile_renderer.rs:695-699``).  One call produces the whole
pixel grid as an SoA ray batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Camera:
    eye: Any  # (3,)
    direction: Any  # (3,) unit
    up: Any  # (3,) unit, orthogonal to direction
    fov: float = float(np.radians(70.0))
    aperture: float = 0.0
    focal_distance: float = 0.0

    @staticmethod
    def look_at(eye, center, up=(0.0, 1.0, 0.0), fov_radians=float(np.radians(70.0))):
        """Perspective camera looking at a point (``camera.rs:53-66``)."""
        eye = jnp.asarray(eye, jnp.float32)
        center = jnp.asarray(center, jnp.float32)
        up = jnp.asarray(up, jnp.float32)
        direction = center - eye
        direction = direction / jnp.linalg.norm(direction)
        up = up - jnp.dot(up, direction) * direction
        up = up / jnp.linalg.norm(up)
        return Camera(eye=eye, direction=direction, up=up, fov=fov_radians)

    def tree_flatten(self):
        return (self.eye, self.direction, self.up), (
            self.fov,
            self.aperture,
            self.focal_distance,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], *aux)


jax.tree_util.register_pytree_node(
    Camera, Camera.tree_flatten, lambda aux, ch: Camera.tree_unflatten(aux, ch)
)


def normalize_pixel_coords(px, py, width: int, height: int):
    """Pixel index -> [-1, 1] box coords (``tile_renderer.rs:743-749``)."""
    dim = float(max(width, height))
    xn = ((2.0 * px + 1.0) - width) / dim
    yn = ((2.0 * (height - py) - 1.0) - height) / dim
    return xn, yn


def get_rays(camera: Camera, xn, yn):
    """Batched ``Camera::get_ray`` (``camera.rs:77-86``).

    Args:
      xn, yn: (B,) normalized screen coords (include any jitter already).
    Returns:
      origins (B,3), directions (B,3) float32 unit vectors.
    """
    d = 1.0 / jnp.tan(camera.fov * 0.5)
    direction = jnp.asarray(camera.direction, jnp.float32)
    up = jnp.asarray(camera.up, jnp.float32)
    right = jnp.cross(direction, up)
    dirs = (
        d * direction[None, :]
        + xn[:, None] * right[None, :]
        + yn[:, None] * up[None, :]
    )
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(jnp.asarray(camera.eye, jnp.float32), dirs.shape)
    return origins, dirs


def get_rays_dof(camera: Camera, xn, yn, u1, u2):
    """Thin-lens rays with depth of field: aperture-disk origins aimed at the
    focal plane (``Camera::focus`` camera.rs:69-73 + ``defocus_disk_sample``
    util.rs:98-101).  ``u1, u2``: (B,) uniforms for the lens sample."""
    origins, dirs = get_rays(camera, xn, yn)
    if float(camera.aperture) <= 0.0:
        return origins, dirs
    direction = jnp.asarray(camera.direction, jnp.float32)
    up = jnp.asarray(camera.up, jnp.float32)
    right = jnp.cross(direction, up)
    focal_point = origins + dirs * camera.focal_distance
    r = jnp.sqrt(u1) * camera.aperture
    theta = 2.0 * np.pi * u2
    offset = (
        right[None, :] * (r * jnp.cos(theta))[:, None]
        + up[None, :] * (r * jnp.sin(theta))[:, None]
    )
    new_origins = origins + offset
    new_dirs = focal_point - new_origins
    new_dirs = new_dirs / jnp.linalg.norm(new_dirs, axis=-1, keepdims=True)
    return new_origins, new_dirs


def move_camera(camera: Camera, forward=0.0, strafe=0.0, vertical=0.0) -> Camera:
    """WASD/space/shift-style translation (camera.rs:87-114), programmatic."""
    import dataclasses

    d = jnp.asarray(camera.direction, jnp.float32)
    up = jnp.asarray(camera.up, jnp.float32)
    right = jnp.cross(d, up)
    right = right / jnp.linalg.norm(right)
    eye = (
        jnp.asarray(camera.eye, jnp.float32)
        + d * forward
        + right * strafe
        + jnp.array([0.0, 1.0, 0.0]) * vertical
    )
    return dataclasses.replace(camera, eye=eye)


def rotate_camera(camera: Camera, yaw: float, pitch: float) -> Camera:
    """Yaw/pitch orbit with the reference's ±80° pitch clamp and upright
    up-vector reconstruction (camera.rs:118-142).  Angles are absolute."""
    import dataclasses

    pitch = float(np.clip(pitch, -np.radians(80.0), np.radians(80.0)))
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    direction = jnp.asarray([cp * sy, sp, cp * cy], jnp.float32)
    direction = direction / jnp.linalg.norm(direction)
    world_up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    right = jnp.cross(direction, world_up)
    right = right / jnp.linalg.norm(right)
    up = jnp.cross(right, direction)
    up = up / jnp.linalg.norm(up)
    return dataclasses.replace(camera, direction=direction, up=up)


def pixel_grid_rays(camera: Camera, width: int, height: int, jitter=None):
    """Rays for the full pixel grid, row-major (y outer, x inner).

    ``jitter``: optional (H*W, 2) offsets in [-1/dim, 1/dim] (the reference
    jitters uniformly in that square, ``tile_renderer.rs:701-703``).
    """
    px, py = jnp.meshgrid(
        jnp.arange(width, dtype=jnp.float32),
        jnp.arange(height, dtype=jnp.float32),
        indexing="xy",
    )
    xn, yn = normalize_pixel_coords(px.ravel(), py.ravel(), width, height)
    if jitter is not None:
        xn = xn + jitter[:, 0]
        yn = yn + jitter[:, 1]
    return get_rays(camera, xn, yn)
