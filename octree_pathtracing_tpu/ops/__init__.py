from .traversal import (
    traverse,
    traversal_step,
    init_state,
    TraversalState,
    HitResult,
    MAX_STEPS,
    MAX_SCALE,
    EPSILON,
)

__all__ = [
    "traverse",
    "traversal_step",
    "init_state",
    "TraversalState",
    "HitResult",
    "MAX_STEPS",
    "MAX_SCALE",
    "EPSILON",
]
