"""Texture atlas sampling + gamma transforms.

The reference samples nearest-neighbor with a v-flip and an sRGB->linear LUT
(``/root/reference/src/textures/texture.rs:64-93``; LUTs at ``:42-62``:
``linear[i] = (i/255)^2.2``, ``byte[i] = 255*(i/255)^(1/2.2)``).  On TPU the
LUT becomes the closed-form power (identical values), textures live in one
stacked ``(T, H, W, 4)`` float32 *linear* atlas, and sampling is a batched
gather — which keeps albedo a differentiable parameter for inverse rendering.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

GAMMA = 2.2


def srgb_to_linear(c):
    """Byte-channel [0,1] sRGB -> linear, LUT semantics of texture.rs:51-53."""
    return jnp.power(jnp.clip(c, 0.0, 1.0), GAMMA)


def linear_to_srgb(c):
    """Linear -> display, texture.rs:55-62 (simple power gamma, not piecewise)."""
    return jnp.power(jnp.clip(c, 0.0, 1.0), 1.0 / GAMMA)


def float_to_u8(img):
    """Linear float image -> gamma-compressed u8 (``colors/mod.rs:183-208``)."""
    return np.asarray(
        np.clip(np.asarray(linear_to_srgb(img)) * 255.0, 0, 255)
    ).astype(np.uint8)


def build_atlas(images: list[np.ndarray], size: int = 16) -> jnp.ndarray:
    """Stack RGBA8 images into a (T, size, size, 4) linear float32 atlas.

    Images larger/smaller than ``size`` are nearest-resampled (block textures
    are 16x16 in the reference's Minecraft pipeline).  RGB converts
    sRGB->linear; alpha stays linear (texture.rs:85-88).
    """
    atlas = np.zeros((len(images), size, size, 4), np.float32)
    for t, img in enumerate(images):
        img = np.asarray(img)
        if img.ndim == 2:
            img = np.stack([img] * 3 + [np.full_like(img, 255)], -1)
        if img.shape[2] == 3:
            img = np.concatenate([img, np.full(img.shape[:2] + (1,), 255, img.dtype)], -1)
        h, w = img.shape[:2]
        yi = (np.arange(size) * h // size).clip(0, h - 1)
        xi = (np.arange(size) * w // size).clip(0, w - 1)
        rs = img[yi][:, xi].astype(np.float32) / 255.0
        atlas[t, :, :, :3] = rs[:, :, :3] ** GAMMA
        atlas[t, :, :, 3] = rs[:, :, 3]
    return jnp.asarray(atlas)


def sample_atlas(atlas: jnp.ndarray, layer, u, v):
    """Nearest-neighbor fetch with the reference's clamp + v-flip
    (``texture.rs:75-88``).  Returns (B, 4) RGBA, linear.

    Differentiable w.r.t. ``atlas`` (gather); ``u, v`` gradients are zero
    (nearest sampling), matching the detached-structure gradient design.
    """
    t_h, t_w = atlas.shape[1], atlas.shape[2]
    uu = jnp.clip(u, 0.0, 1.0)
    vv = 1.0 - jnp.clip(v, 0.0, 1.0)
    i = jnp.clip((uu * t_w).astype(jnp.int32), 0, t_w - 1)
    j = jnp.clip((vv * t_h).astype(jnp.int32), 0, t_h - 1)
    return atlas[layer, j, i]
