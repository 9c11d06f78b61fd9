"""Sun + sky model — Chunky-style angular sun with importance sampling knobs.

Pure-function port of the reference's ``Sun`` (``/root/reference/src/scene/mod.rs:271-453``)
and the sky color constants (``scene/mod.rs:170``), with the sampling-strategy
flag sets (``scene/mod.rs:61-127``).  All state is a parameter pytree; the
basis vectors (su, sv, sw) are derived once at construction exactly as
``Sun::new`` does (``scene/mod.rs:321-383``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

PI = np.pi

SKY_COLOR = (0.5, 0.7, 1.0, 1.0)  # scene/mod.rs:170

DEFAULT_AZIMUTH = PI / 2.5
DEFAULT_ALTITUDE = PI / 3.0
DEFAULT_RADIUS = 0.03
DEFAULT_IMPORTANCE_SAMPLE_CHANCE = 0.1
MAX_IMPORTANCE_SAMPLE_CHANCE = 0.9
DEFAULT_IMPORTANCE_SAMPLE_RADIUS = 1.2
AMBIENT = 0.3  # scene/mod.rs:318
INTENSITY = 1.25  # scene/mod.rs:319
GAMMA = 2.2  # scene/mod.rs:320
DEFAULT_LUMINOSITY = 100.0  # scene/mod.rs:375


@dataclasses.dataclass
class SunSampling:
    """Strategy knobs (``scene/mod.rs:61-127``). Defaults = IMPORTANCE."""

    sun_sampling: bool = False
    diffuse_sun: bool = True
    strict_direct_light: bool = False
    sun_luminosity: bool = True
    importance_sampling: bool = True

    @staticmethod
    def off():
        return SunSampling(False, True, False, True, False)

    @staticmethod
    def non_luminous():
        return SunSampling(False, False, False, False, False)

    @staticmethod
    def fast():
        return SunSampling(True, False, False, False, False)

    @staticmethod
    def importance():
        return SunSampling(False, True, False, True, True)

    @staticmethod
    def high_quality():
        return SunSampling(True, True, True, True, False)


@dataclasses.dataclass
class Sun:
    azimuth: Any
    altitude: Any
    radius: Any
    color: Any  # (4,)
    luminosity: Any
    importance_sample_chance: Any
    importance_sample_radius: Any
    # derived (Sun::new, scene/mod.rs:321-383)
    sw: Any  # (3,) direction toward the sun
    su: Any  # (3,)
    sv: Any  # (3,)
    radius_cos: Any
    radius_sin: Any
    emittance: Any  # (4,) color * INTENSITY^GAMMA
    apparent_texture_brightness: Any  # (3,)
    draw_texture: bool = True

    def tree_flatten(self):
        return (
            self.azimuth,
            self.altitude,
            self.radius,
            self.color,
            self.luminosity,
            self.importance_sample_chance,
            self.importance_sample_radius,
            self.sw,
            self.su,
            self.sv,
            self.radius_cos,
            self.radius_sin,
            self.emittance,
            self.apparent_texture_brightness,
        ), (self.draw_texture,)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, aux[0])

    @property
    def luminosity_pdf(self):
        return 1.0 / self.luminosity


jax.tree_util.register_pytree_node(
    Sun, Sun.tree_flatten, lambda aux, ch: Sun.tree_unflatten(aux, ch)
)


def make_sun(
    azimuth=DEFAULT_AZIMUTH,
    altitude=DEFAULT_ALTITUDE,
    radius=DEFAULT_RADIUS,
    color=(1.0, 1.0, 1.0, 1.0),
    luminosity=DEFAULT_LUMINOSITY,
    draw_texture=True,
) -> Sun:
    """``Sun::new`` (``scene/mod.rs:321-383``)."""
    theta, phi = float(azimuth), float(altitude)
    r = abs(np.cos(phi))
    sw = np.array([np.cos(theta) * r, np.sin(phi), np.sin(theta) * r], np.float32)
    su = (
        np.array([0.0, 1.0, 0.0], np.float32)
        if abs(sw[0]) > 0.1
        else np.array([1.0, 0.0, 0.0], np.float32)
    )
    sv = np.cross(sw, su)
    sv = sv / np.linalg.norm(sv)
    su = np.cross(sv, sw)
    color = np.asarray(color, np.float32)
    emittance = color * (INTENSITY**GAMMA)
    apparent = np.ones(3, np.float32) * (INTENSITY**GAMMA)
    return Sun(
        azimuth=jnp.float32(azimuth),
        altitude=jnp.float32(altitude),
        radius=jnp.float32(radius),
        color=jnp.asarray(color),
        luminosity=jnp.float32(luminosity),
        importance_sample_chance=jnp.float32(DEFAULT_IMPORTANCE_SAMPLE_CHANCE),
        importance_sample_radius=jnp.float32(DEFAULT_IMPORTANCE_SAMPLE_RADIUS),
        sw=jnp.asarray(sw),
        su=jnp.asarray(su),
        sv=jnp.asarray(sv),
        radius_cos=jnp.float32(np.cos(radius)),
        radius_sin=jnp.float32(np.sin(radius)),
        emittance=jnp.asarray(emittance),
        apparent_texture_brightness=jnp.asarray(apparent),
        draw_texture=draw_texture,
    )


def sun_disk_factor(sun: Sun, directions):
    """Angular-window sun draw (``Sun::intersect``, scene/mod.rs:384-405).

    Returns (in_disk (B,), rgb_mult (B,3)): whether each direction lands in the
    sun's texture window and the apparent-brightness multiplier.  The sun
    texture here is the default flat white (texture support plugs in via the
    window uv if needed).
    """
    d = directions
    cos_sw = d @ sun.sw
    width = sun.radius * 4.0
    width2 = width * 2.0
    a = PI / 2.0 - jnp.arccos(jnp.clip(d @ sun.su, -1.0, 1.0)) + width
    b = PI / 2.0 - jnp.arccos(jnp.clip(d @ sun.sv, -1.0, 1.0)) + width
    in_disk = (cos_sw >= 0.5) & (a >= 0.0) & (a < width2) & (b >= 0.0) & (b < width2)
    return in_disk, a / width2, b / width2


def add_sun_color(sun: Sun, directions, color):
    """Specular/sky-interp sun draw: doubles sky color inside the window with
    the apparent texture brightness x10 (``scene/mod.rs:244-253,384-405``)."""
    if not sun.draw_texture:
        return color
    in_disk, _, _ = sun_disk_factor(sun, directions)
    sun_rgb = sun.apparent_texture_brightness * 10.0
    add = jnp.where(in_disk[:, None], color[:, :3] + sun_rgb[None, :], color[:, :3])
    return color.at[:, :3].set(add) if hasattr(color, "at") else add


def add_sun_color_diffuse(sun: Sun, directions, color):
    """Diffuse-path sun draw: luminosity-scaled (``scene/mod.rs:255-265,406-426``)."""
    in_disk, _, _ = sun_disk_factor(sun, directions)
    sun_rgb = sun.color[:3] * 10.0 * sun.luminosity
    add = jnp.where(in_disk[:, None], color[:, :3] + sun_rgb[None, :], color[:, :3])
    return color.at[:, :3].set(add)


def sky_color(batch_shape):
    return jnp.broadcast_to(
        jnp.asarray(SKY_COLOR, jnp.float32), tuple(batch_shape) + (4,)
    )


def random_sun_direction(sun: Sun, u1, u2):
    """Uniform cone sample toward the sun (``scene/mod.rs:427-445``).

    Note the reference adds ``normalize(w) * cos_a`` where w = sw (already
    unit), i.e. dir = su*cos(phi)*sin_a + sv*sin(phi)*sin_a + sw*cos_a.
    """
    cos_a = 1.0 - u1 + u1 * sun.radius_cos
    sin_a = jnp.sqrt(1.0 - cos_a * cos_a)
    phi = 2.0 * PI * u2
    d = (
        sun.su[None, :] * (jnp.cos(phi) * sin_a)[:, None]
        + sun.sv[None, :] * (jnp.sin(phi) * sin_a)[:, None]
        + sun.sw[None, :] * cos_a[:, None]
    )
    return d


def flat_shading(sun: Sun, normals, color):
    """Preview shading: n·sw clamped at AMBIENT times emittance
    (``scene/mod.rs:447-452``)."""
    shading = jnp.maximum(normals @ sun.sw, AMBIENT)
    return color * (sun.emittance[None, :3] * shading[:, None])
