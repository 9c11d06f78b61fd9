from .morton import encode_morton, decode_morton, morton_order_dense, part_by_2, compact_by_2
from .node_pool import (
    Octree,
    octree_to_gpu_words,
    gpu_words_to_pool,
    MAX_DEPTH,
)
from .build import build_octree, build_octree_from_codes, build_from_dense, expand_by
from .traversal_ref import traverse_oracle, OracleHit, MAX_STEPS, MAX_SCALE, EPSILON

__all__ = [
    "encode_morton",
    "decode_morton",
    "morton_order_dense",
    "part_by_2",
    "compact_by_2",
    "Octree",
    "octree_to_gpu_words",
    "gpu_words_to_pool",
    "MAX_DEPTH",
    "build_octree",
    "build_octree_from_codes",
    "build_from_dense",
    "expand_by",
    "traverse_oracle",
    "OracleHit",
    "MAX_STEPS",
    "MAX_SCALE",
    "EPSILON",
]
