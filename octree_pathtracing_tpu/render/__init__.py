from .preview import preview_image, preview_render_rays
from .pathtracer import (
    trace_paths,
    trace_paths_branched,
    draw_uniforms,
    render_sample,
    MAX_BOUNCES,
)
from .renderer import Renderer, render_pass, render_pass_branched, branch_schedule
from .oracle import trace_path_oracle, scene_to_numpy

__all__ = [
    "preview_image",
    "preview_render_rays",
    "trace_paths",
    "trace_paths_branched",
    "draw_uniforms",
    "render_sample",
    "MAX_BOUNCES",
    "Renderer",
    "render_pass",
    "render_pass_branched",
    "branch_schedule",
    "trace_path_oracle",
    "scene_to_numpy",
]
