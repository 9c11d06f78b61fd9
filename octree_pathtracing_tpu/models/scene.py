"""Scene pytree — octree + material table + texture atlas + sun + strategies.

TPU-native form of the reference ``Scene`` struct
(``/root/reference/src/scene/mod.rs:146-156``): every component is a device
array in one pytree passed whole into jitted render steps ("bind groups" of
the GPU renderer become pytree leaves).  Sampling strategies are static
Python flags (they select code paths at trace time, exactly like the
reference's strategy constants ``scene/mod.rs:39-127``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..octree.node_pool import Octree
from .materials import MaterialTable
from .sun import Sun, SunSampling, make_sun

MAX_DIST = 1024.0  # scene/mod.rs:181
F_SUB_SURFACE_DEFAULT = 0.3


class EmitterSampling:
    """Emitter sampling strategies (``scene/mod.rs:39-57``)."""

    NONE = "none"
    ONE = "one"
    ONE_BLOCK = "one_block"
    ALL = "all"


@dataclasses.dataclass
class Scene:
    octree: Octree
    materials: MaterialTable
    atlas: Any  # (T, H, W, 4) linear float32
    sun: Sun
    # leaf_value -> material id map (uint32); identity when leaves are material ids
    leaf_material: Any  # (L,) int32
    # optional block-model table (non-cube leaf geometry); None = all cubes
    models: Any = None  # BlockModels | None
    # optional analytic primitives (free spheres/quads, scene/mod.rs:146-156)
    prims: Any = None  # Primitives | None
    # optional emissive-leaf table for EmitterSampling.ONE (models/emitters.py)
    emitters: Any = None  # EmitterTable | None
    sun_sampling: SunSampling = dataclasses.field(default_factory=SunSampling.importance)
    emitter_sampling: str = EmitterSampling.NONE
    emitters_enabled: bool = True
    f_sub_surface: float = F_SUB_SURFACE_DEFAULT
    # static: True when no material can ever satisfy the null-skip or
    # alpha-cutout predicates, letting the traversal skip its accept callback.
    opaque_only: bool = False
    # static: True when some model has quad geometry (enables the
    # quad-refinement + retry path in the integrator).
    has_quad_models: bool = False
    # static: True when every reachable texel alpha is exactly 1 (and no quad
    # models), so any shadow-walk surface is a total blocker: the stateful
    # multi-surface walk reduces to ONE plain first-hit traversal + a
    # single-surface differentiable recompute (bit-identical values AND
    # gradients — see render/pathtracer.shadow_attenuation).
    shadow_binary: bool = False

    def tree_flatten(self):
        return (
            self.octree,
            self.materials,
            self.atlas,
            self.sun,
            self.leaf_material,
            self.models,
            self.prims,
            self.emitters,
        ), (
            self.sun_sampling,
            self.emitter_sampling,
            self.emitters_enabled,
            self.f_sub_surface,
            self.opaque_only,
            self.has_quad_models,
            self.shadow_binary,
        )

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], ch[1], ch[2], ch[3], ch[4], ch[5], ch[6], ch[7], *aux)


jax.tree_util.register_pytree_node(
    Scene, Scene.tree_flatten, lambda aux, ch: Scene.tree_unflatten(aux, ch)
)


def face_normals():
    """face_id -> outward normal, Face enum layout (``src/geometry/cuboid.rs:10-29``):
    0 West(-x), 1 East(+x), 2 Bottom(-y), 3 Top(+y), 4 South... note the
    traversal's z faces map sign-bit style: 4 = -z entry face (North), 5 = +z.
    We use axis*2|sign with sign=1 for negative ray dir, so: face 0 hit by +x
    ray = voxel's -x (West) face with normal -x... the *outward* normal the
    shading needs is the face the ray entered, opposing the ray:
    normal(face) = -axis_dir if sign==0 else +axis_dir.
    """
    return jnp.asarray(
        np.array(
            [
                [-1, 0, 0],  # 0: entered -x face (ray going +x)
                [1, 0, 0],  # 1: entered +x face (ray going -x)
                [0, -1, 0],
                [0, 1, 0],
                [0, 0, -1],
                [0, 0, 1],
            ],
            np.float32,
        )
    )


def make_scene(
    octree: Octree,
    materials: MaterialTable,
    atlas,
    sun: Sun | None = None,
    leaf_material=None,
    models=None,
    brick: bool = False,
    **kwargs,
) -> Scene:
    """``brick=True`` converts the pool to the brick-leaf layout
    (``octree/brick.py``); traversal dispatch is by pool type
    (``ops.traverse_tree``).  Depth<3 trees stay plain.

    Default is OFF: on-chip measurement (tools/PERF_NOTES.md round 2) showed
    the phase-alternating brick kernel 12x SLOWER than the plain lockstep
    loop at depth 9 — each tree/brick round re-synchronizes the whole batch,
    multiplying total lockstep iterations.  The layout stays available for
    the fused-DDA experiments; flip per-scene once a variant measures faster."""
    from ..octree.brick import BrickOctree, brickify

    if sun is None:
        sun = make_sun()
    if leaf_material is None:
        # leaves hold material ids directly; identity map sized by table
        leaf_material = jnp.arange(materials.count, dtype=jnp.int32)
    if brick and not isinstance(octree, BrickOctree) and octree.depth >= 3:
        octree = brickify(octree)
    if isinstance(octree, BrickOctree):
        octree = BrickOctree(
            child_mask=jnp.asarray(np.asarray(octree.child_mask)),
            child_data=jnp.asarray(np.asarray(octree.child_data)),
            bricks=jnp.asarray(np.asarray(octree.bricks)),
            root=octree.root,
            depth=octree.depth,
        )
    else:
        octree = Octree(
            child_mask=jnp.asarray(np.asarray(octree.child_mask)),
            child_data=jnp.asarray(np.asarray(octree.child_data)),
            root=octree.root,
            depth=octree.depth,
        )
    if models is not None and "has_quad_models" not in kwargs:
        from .blockmodels import FLAG_SIMPLE

        kwargs["has_quad_models"] = bool(
            np.any((np.asarray(models.flags) & FLAG_SIMPLE) == 0)
        )
    if "opaque_only" not in kwargs or "shadow_binary" not in kwargs:
        # The traversal's accept callback is only needed when some leaf could
        # be rejected: an alpha-cutout texel (alpha <= eps within a texture,
        # Cuboid::intersect_texture semantics cuboid.rs:73-90) or a quad-model
        # miss.  All-opaque cube scenes skip it entirely.  Variable-resolution
        # atlases edge-pad, so the full-layer min equals the valid-region min.
        from ..ops.texture import Atlas

        atlas_np = np.asarray(atlas.data if isinstance(atlas, Atlas) else atlas)
        min_alpha = atlas_np[..., 3].reshape(atlas_np.shape[0], -1).min(axis=1)
        tex_idx = np.asarray(materials.texture_index)
        m_min_alpha = min_alpha[np.clip(tex_idx, 0, len(min_alpha) - 1)]
        no_quads = not kwargs.get("has_quad_models", False)
        kwargs.setdefault(
            "opaque_only", bool(np.all(m_min_alpha > 5e-8)) and no_quads
        )
        # stronger predicate: alpha EXACTLY 1 everywhere means any shadow
        # surface is a total blocker (u8 255 -> 1.0 exactly), enabling the
        # single-traversal binary shadow walk
        kwargs.setdefault(
            "shadow_binary", bool(np.all(m_min_alpha >= 1.0 - 1e-7)) and no_quads
        )
    if (
        kwargs.get("emitter_sampling", EmitterSampling.NONE) != EmitterSampling.NONE
        and "emitters" not in kwargs
        and not isinstance(octree, BrickOctree)
    ):
        from .emitters import build_emitter_table

        kwargs["emitters"] = build_emitter_table(
            octree, leaf_material, materials, models
        )
    from ..ops.texture import Atlas as _Atlas

    if isinstance(atlas, _Atlas):
        atlas = _Atlas(jnp.asarray(atlas.data), jnp.asarray(atlas.sizes, jnp.int32))
    else:
        atlas = jnp.asarray(atlas)
    return Scene(
        octree=octree,
        materials=materials,
        atlas=atlas,
        sun=sun,
        leaf_material=jnp.asarray(leaf_material, jnp.int32),
        models=models,
        **kwargs,
    )
