from .traversal import (
    traverse,
    HitResult,
    MAX_STEPS,
    MAX_SCALE,
    EPSILON,
)
from .brick_traversal import traverse_brick, traverse_tree

__all__ = [
    "traverse",
    "traverse_brick",
    "traverse_tree",
    "HitResult",
    "MAX_STEPS",
    "MAX_SCALE",
    "EPSILON",
]
