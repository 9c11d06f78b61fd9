from .traversal import (
    traverse,
    HitResult,
    MAX_STEPS,
    MAX_SCALE,
    EPSILON,
)

__all__ = [
    "traverse",
    "HitResult",
    "MAX_STEPS",
    "MAX_SCALE",
    "EPSILON",
]
