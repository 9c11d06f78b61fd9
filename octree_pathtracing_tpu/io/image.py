"""Image I/O — linear float frames to gamma-compressed files.

Replaces the reference's stb_image loader + egui texture output
(``/root/reference/src/textures/rtw_image.rs``, gamma LUTs at
``src/textures/texture.rs:42-62``) with host-side numpy/PIL.
"""

from __future__ import annotations

import numpy as np

from ..ops.texture import float_to_u8


def save_image(path: str, img) -> None:
    """Save a linear-float (H, W, 3|4) image as PNG (PIL) or PPM fallback."""
    u8 = float_to_u8(np.asarray(img))
    if u8.shape[-1] == 4:
        u8 = u8[..., :3]
    try:
        from PIL import Image

        Image.fromarray(u8, "RGB").save(path)
    except Exception:
        if not path.endswith(".ppm"):
            path = path + ".ppm"
        h, w = u8.shape[:2]
        with open(path, "wb") as f:
            f.write(f"P6\n{w} {h}\n255\n".encode())
            f.write(u8.tobytes())


def load_image(path: str) -> np.ndarray:
    """Load an image file to RGBA8 (rtw_image.rs normalize-to-RGBA semantics)."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGBA"))
    return img
