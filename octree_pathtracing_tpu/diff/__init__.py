from .inverse import inverse_render, render_views, InverseResult

__all__ = ["inverse_render", "render_views", "InverseResult"]
