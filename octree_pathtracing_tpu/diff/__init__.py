from .inverse import inverse_render, render_views, InverseResult
from .soft import soft_radiance, soft_loss, record_surfaces

__all__ = [
    "inverse_render",
    "render_views",
    "InverseResult",
    "soft_radiance",
    "soft_loss",
    "record_surfaces",
]
