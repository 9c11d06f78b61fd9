"""Texture atlas sampling + gamma transforms.

The reference samples nearest-neighbor with a v-flip and an sRGB->linear LUT
(``/root/reference/src/textures/texture.rs:64-93``; LUTs at ``:42-62``:
``linear[i] = (i/255)^2.2``, ``byte[i] = 255*(i/255)^(1/2.2)``).  On TPU the
LUT becomes the closed-form power (identical values), textures live in one
stacked ``(T, H, W, 4)`` float32 *linear* atlas, and sampling is a batched
gather — which keeps albedo a differentiable parameter for inverse rendering.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
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


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Atlas:
    """Variable-resolution texture atlas (``rtw_image.rs:49-122`` parity):
    every layer keeps its native resolution, stored edge-padded into one
    ``(T, Hmax, Wmax, 4)`` linear float32 array with a ``(T, 2)`` per-layer
    ``(h, w)`` size table consulted at sample time.  Edge padding (clamp
    replication) keeps reductions over the full layer (e.g. min-alpha for
    the opaque-only fast path) exact."""

    data: Any  # (T, Hmax, Wmax, 4) linear float32
    sizes: Any  # (T, 2) int32: per-layer (h, w)

    @property
    def shape(self):
        return self.data.shape

    def tree_flatten(self):
        return (self.data, self.sizes), None

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


def _to_rgba8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.ndim == 2:
        img = np.stack([img] * 3 + [np.full_like(img, 255)], -1)
    if img.shape[2] == 3:
        img = np.concatenate([img, np.full(img.shape[:2] + (1,), 255, img.dtype)], -1)
    return img


def _to_linear(img: np.ndarray) -> np.ndarray:
    """RGBA8 -> linear float32; RGB converts sRGB->linear, alpha stays linear
    (texture.rs:85-88)."""
    f = img.astype(np.float32) / 255.0
    f[:, :, :3] **= GAMMA
    return f


def build_atlas(images: list[np.ndarray], size: int | None = 16):
    """Stack RGBA8 images into a linear float32 atlas.

    ``size`` given (default 16, the reference's Minecraft block-texture size):
    nearest-resample every image to (size, size), returning a plain
    ``(T, size, size, 4)`` array.  ``size=None``: keep native resolutions
    (``rtw_image.rs`` accepts any size) and return an :class:`Atlas`.
    """
    if size is None:
        imgs = [_to_rgba8(im) for im in images]
        hmax = max(im.shape[0] for im in imgs)
        wmax = max(im.shape[1] for im in imgs)
        atlas = np.zeros((len(imgs), hmax, wmax, 4), np.float32)
        sizes = np.zeros((len(imgs), 2), np.int32)
        for t, img in enumerate(imgs):
            h, w = img.shape[:2]
            f = _to_linear(img)
            # clamp-replicate into the padded frame (never sampled, but keeps
            # full-layer reductions identical to the valid region)
            yi = np.arange(hmax).clip(0, h - 1)
            xi = np.arange(wmax).clip(0, w - 1)
            atlas[t] = f[yi][:, xi]
            sizes[t] = (h, w)
        return Atlas(jnp.asarray(atlas), jnp.asarray(sizes))
    atlas = np.zeros((len(images), size, size, 4), np.float32)
    for t, img in enumerate(images):
        img = _to_rgba8(img)
        h, w = img.shape[:2]
        yi = (np.arange(size) * h // size).clip(0, h - 1)
        xi = (np.arange(size) * w // size).clip(0, w - 1)
        atlas[t] = _to_linear(img[yi][:, xi])
    return jnp.asarray(atlas)


def sample_atlas(atlas, layer, u, v):
    """Nearest-neighbor fetch with the reference's clamp + v-flip
    (``texture.rs:75-88``).  Returns (B, 4) RGBA, linear.  Accepts a plain
    uniform-size array or a variable-resolution :class:`Atlas` (per-layer
    sizes gathered per lane).

    Differentiable w.r.t. the atlas texels (gather); ``u, v`` gradients are
    zero (nearest sampling), matching the detached-structure gradient design.
    """
    if isinstance(atlas, Atlas):
        data = atlas.data
        hw = atlas.sizes[layer]
        t_h, t_w = hw[..., 0], hw[..., 1]
    else:
        data = atlas
        t_h, t_w = data.shape[1], data.shape[2]
    uu = jnp.clip(u, 0.0, 1.0)
    vv = 1.0 - jnp.clip(v, 0.0, 1.0)
    i = jnp.clip((uu * t_w).astype(jnp.int32), 0, t_w - 1)
    j = jnp.clip((vv * t_h).astype(jnp.int32), 0, t_h - 1)
    return data[layer, j, i]
