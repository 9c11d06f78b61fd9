"""Color conversions: linear float RGBA <-> gamma-compressed bytes.

Parity with ``/root/reference/src/colors/mod.rs`` + the gamma LUTs of
``src/textures/texture.rs:42-62`` — on TPU the 256-entry LUT is the closed
form ``(c/255)^2.2`` / ``(c/255)^(1/2.2)`` (identical values at byte inputs).
"""

from __future__ import annotations

import numpy as np

GAMMA = 2.2

# The reference's actual LUT tables, for byte-exact conversions.
LUT_FLOAT = (np.arange(256) / 255.0) ** GAMMA  # texture.rs:51-53
LUT_BYTE = ((np.arange(256) / 255.0) ** (1.0 / GAMMA) * 255.0).astype(np.uint8)


def u8_to_f32(rgba_u8: np.ndarray) -> np.ndarray:
    """U8Color -> F32Color: LUT-gamma RGB, linear alpha (colors/mod.rs:55-64)."""
    rgba_u8 = np.asarray(rgba_u8, np.uint8)
    out = np.empty(rgba_u8.shape, np.float32)
    out[..., :3] = LUT_FLOAT[rgba_u8[..., :3]]
    out[..., 3] = rgba_u8[..., 3] / 255.0
    return out


def f32_to_u8(rgba_f32: np.ndarray) -> np.ndarray:
    """F32Color -> U8Color via the byte gamma LUT (colors/mod.rs:183-208)."""
    c = np.clip(np.asarray(rgba_f32), 0.0, 1.0)
    idx = (c[..., :3] * 255.0).astype(np.uint8)
    out = np.empty(c.shape, np.uint8)
    out[..., :3] = LUT_BYTE[idx]
    if c.shape[-1] == 4:
        out[..., 3] = (c[..., 3] * 255.0).astype(np.uint8)
    return out
