"""Scalar/vector math helpers (``/root/reference/src/util.rs`` parity).

step/smoothstep (``util.rs:73-85``), angle_distance (``:134-137``),
degrees/radians, near_zero (``:93-96``), unit-disk and defocus-disk sampling
(``:88-101``) with explicit uniforms instead of a stateful RNG.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PI = np.pi


def degrees_to_rads(d):
    return d * PI / 180.0


def step(edge, x):
    return jnp.where(x <= edge, 0.0, 1.0)


def smoothstep(edge0, edge1, x):
    t = jnp.clip((x - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def angle_distance(a1, a2):
    diff = jnp.abs(a1 - a2) % (2.0 * PI)
    return jnp.where(diff > PI, 2.0 * PI - diff, diff)


def near_zero(v, s=1e-8):
    return jnp.all(jnp.abs(v) < s, axis=-1)


def sample_unit_disk(u1, u2):
    """Uniform disk point via polar warp; (B,) uniforms -> (B, 2)."""
    r = jnp.sqrt(u1)
    theta = 2.0 * PI * u2
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def defocus_disk_sample(center, disc_u, disc_v, u1, u2):
    """Thin-lens aperture sample (``util.rs:98-101``)."""
    p = sample_unit_disk(u1, u2)
    return center + p[:, 0:1] * disc_u[None, :] + p[:, 1:2] * disc_v[None, :]
