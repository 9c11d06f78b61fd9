from .image import save_image, load_image
from .checkpoint import (
    save_render_checkpoint,
    load_render_checkpoint,
    save_arrays,
    load_arrays,
)

__all__ = [
    "save_image",
    "load_image",
    "save_render_checkpoint",
    "load_render_checkpoint",
    "save_arrays",
    "load_arrays",
]
