from .mesh import make_mesh, DP_AXIS, SP_AXIS, ray_spec, pixel_spec, replicated_spec
from .shard import sharded_render, sharded_train_step, render_loss, apply_params

__all__ = [
    "make_mesh",
    "DP_AXIS",
    "SP_AXIS",
    "ray_spec",
    "pixel_spec",
    "replicated_spec",
    "sharded_render",
    "sharded_train_step",
    "render_loss",
    "apply_params",
]
