"""Display-path sanity images: Mandelbrot orbit trap + Kleinian fractal.

Ports of the reference's shadertoy ports (``/root/reference/src/
ported_shaders/mandelbrot.rs`` and ``ourple.rs``) — unrelated to the octree
renderer, but they exercise the framebuffer/gamma/display path end-to-end
with purely procedural content (SURVEY.md §2 "Ported shaders" row).
Vectorized jnp over the pixel grid.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def mandelbrot_image(width: int, height: int, max_iter: int = 96):
    """Smooth-colored orbit-trap Mandelbrot (mandelbrot.rs:6-76 spirit)."""
    x = jnp.linspace(-2.2, 0.8, width)
    y = jnp.linspace(-1.3, 1.3, height)
    cr, ci = jnp.meshgrid(x, y)
    zr = jnp.zeros_like(cr)
    zi = jnp.zeros_like(ci)
    trap = jnp.full(cr.shape, 1e9)
    esc = jnp.zeros(cr.shape)
    for i in range(max_iter):
        live = esc == 0
        nzr = zr * zr - zi * zi + cr
        nzi = 2 * zr * zi + ci
        zr = jnp.where(live, nzr, zr)
        zi = jnp.where(live, nzi, zi)
        r2 = zr * zr + zi * zi
        # orbit trap: distance to the unit circle
        trap = jnp.where(live, jnp.minimum(trap, jnp.abs(jnp.sqrt(r2) - 1.0)), trap)
        esc = jnp.where(live & (r2 > 4.0), i + 1.0, esc)
    t = jnp.where(esc == 0, 0.0, esc / max_iter)
    g = jnp.exp(-3.0 * trap)
    rgb = jnp.stack(
        [
            0.5 + 0.5 * jnp.cos(6.2831 * (t + 0.0)) * (1 - g) + g * 0.9,
            0.5 + 0.5 * jnp.cos(6.2831 * (t + 0.33)) * (1 - g) + g * 0.6,
            0.5 + 0.5 * jnp.cos(6.2831 * (t + 0.67)) * (1 - g) + g * 0.9,
        ],
        axis=-1,
    )
    return jnp.where((esc == 0)[..., None], jnp.array([0.05, 0.02, 0.08]), rgb)


def kleinian_image(width: int, height: int, iters: int = 12):
    """Kleinian-style sphere-inversion fractal ("ourple", ourple.rs:71-83)."""
    x = jnp.linspace(-1.6, 1.6, width)
    y = jnp.linspace(-1.2, 1.2, height)
    px, py = jnp.meshgrid(x, y)
    p = jnp.stack([px, py, jnp.full(px.shape, 0.35)], -1)
    scale = jnp.ones(px.shape)
    for _ in range(iters):
        # box fold
        p = jnp.clip(p, -1.0, 1.0) * 2.0 - p
        # sphere inversion
        r2 = jnp.sum(p * p, axis=-1, keepdims=True)
        k = jnp.clip(1.1 / jnp.maximum(r2, 1e-6), 1.0, 4.0)
        p = p * k
        scale = scale * k[..., 0]
    d = jnp.sqrt(jnp.sum(p * p, -1)) / jnp.maximum(scale, 1e-6)
    # log-normalized distance field -> purple palette ("ourple")
    ld = jnp.log10(jnp.maximum(d, 1e-12))
    v = jnp.clip((jnp.max(ld) - ld) / (jnp.max(ld) - jnp.min(ld) + 1e-6), 0.0, 1.0)
    v = v**3
    rgb = jnp.stack([0.45 * v + 0.1 * v * v, 0.12 * v, 0.55 * v + 0.2 * v * v], -1)
    return rgb
