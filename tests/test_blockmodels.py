"""Block-model integration: quad models inside voxels, per-face materials."""

import jax
import jax.numpy as jnp
import numpy as np

from octree_pathtracing_tpu.models import make_material_table, air, make_scene
from octree_pathtracing_tpu.models.blockmodels import (
    ModelBuilder,
    cross_plant_quads,
    slab_quads,
)
from octree_pathtracing_tpu.octree import build_from_dense
from octree_pathtracing_tpu.ops.texture import build_atlas
from octree_pathtracing_tpu.ops.traversal import traverse
from octree_pathtracing_tpu.render.hit import make_accept_fn, resolve_hit


def _solid(rgb, alpha=255):
    img = np.zeros((16, 16, 4), np.uint8)
    img[..., :3] = rgb
    img[..., 3] = alpha
    return img


def _plant_scene():
    """4^3 world: stone floor (leaf 1, simple) + a cross-plant (leaf 2, quads)."""
    s = 4
    grid = np.zeros((s, s, s), np.uint32)
    grid[:, 0, :] = 1
    grid[1, 1, 1] = 2  # plant voxel on the floor
    tree = build_from_dense(grid)

    materials = [air(), dict(texture_index=1), dict(texture_index=2)]
    atlas = build_atlas([_solid((255, 0, 255)), _solid((128, 128, 128)), _solid((40, 200, 40))])

    mb = ModelBuilder()
    m_air = mb.add_simple(0)
    m_stone = mb.add_simple(1)
    m_plant = mb.add_quad_model(cross_plant_quads(material=2))
    leaf_model = [m_air, m_stone, m_plant]
    models = mb.build(leaf_model)

    scene = make_scene(tree, make_material_table(materials), atlas, models=models)
    assert scene.has_quad_models and not scene.opaque_only
    return scene


def _trace_one(scene, origin, direction):
    o = jnp.asarray([origin], jnp.float32)
    d = jnp.asarray([direction], jnp.float32)
    d = d / jnp.linalg.norm(d)
    tree = scene.octree
    res = traverse(
        tree.child_mask,
        tree.child_data,
        tree.root,
        tree.scale(),
        o,
        d,
        accept_fn=make_accept_fn(scene, o, d),
        depth=tree.depth,
    )
    mat, uv, normal, t = resolve_hit(scene, o, d, res)
    return res, int(mat[0]), np.asarray(uv[0]), np.asarray(normal[0]), float(t[0])


def test_ray_through_plant_corner_passes_through():
    scene = _plant_scene()
    # ray through the plant voxel near its corner: misses the X quads,
    # continues to the floor behind/below
    res, mat, uv, n, t = _trace_one(scene, (1.02, 1.98, -2.0), (0.0, -0.28, 1.0))
    assert bool(res.hit[0])
    assert mat == 1  # stone floor, not plant


def test_ray_through_plant_center_hits_quads():
    scene = _plant_scene()
    res, mat, uv, n, t = _trace_one(scene, (1.5, 1.5, -2.0), (0.0, 0.0, 1.0))
    assert bool(res.hit[0])
    assert mat == 2  # plant material from the quad
    # hit t: the first X quad plane crossing inside voxel [1,2)^3
    assert 3.0 < t < 4.0
    # normal is one of the diagonal quad normals (horizontal)
    assert abs(n[1]) < 1e-5


def test_simple_per_face_materials():
    s = 2
    grid = np.zeros((s, s, s), np.uint32)
    grid[0, 0, 0] = 1
    tree = build_from_dense(grid)
    materials = [air(), dict(texture_index=1), dict(texture_index=2)]
    atlas = build_atlas([_solid((255, 0, 255)), _solid((100, 60, 40)), _solid((60, 160, 60))])
    mb = ModelBuilder()
    mb.add_simple(0)
    mb.add_simple([1, 1, 1, 2, 1, 1])  # grass: top face (id 3) -> material 2
    models = mb.build([0, 1])
    scene = make_scene(tree, make_material_table(materials), atlas, models=models)

    # from above: top face -> material 2
    _, mat_top, *_ = _trace_one(scene, (0.5, 3.0, 0.5), (0.0, -1.0, 0.0))
    assert mat_top == 2
    # from the side: west face -> material 1
    _, mat_side, *_ = _trace_one(scene, (-2.0, 0.5, 0.5), (1.0, 0.0, 0.0))
    assert mat_side == 1


def test_slab_model_half_height():
    s = 2
    grid = np.zeros((s, s, s), np.uint32)
    grid[0, 0, 0] = 1
    tree = build_from_dense(grid)
    materials = [air(), dict(texture_index=1)]
    atlas = build_atlas([_solid((255, 0, 255)), _solid((150, 150, 150))])
    mb = ModelBuilder()
    mb.add_simple(0)
    mb.add_quad_model(slab_quads(material=1, height=0.5))
    models = mb.build([0, 1])
    scene = make_scene(tree, make_material_table(materials), atlas, models=models)

    # ray crossing the voxel at y=0.75 (above the slab): pass through
    res, *_ = _trace_one(scene, (-2.0, 0.75, 0.5), (1.0, 0.0, 0.0))
    assert not bool(res.hit[0])
    # at y=0.25: hits the slab side
    res, mat, uv, n, t = _trace_one(scene, (-2.0, 0.25, 0.5), (1.0, 0.0, 0.0))
    assert bool(res.hit[0]) and mat == 1
    np.testing.assert_allclose(t, 2.0, rtol=1e-5)


def test_plant_scene_pathtraces():
    from octree_pathtracing_tpu.models import Camera
    from octree_pathtracing_tpu.models.camera import pixel_grid_rays
    from octree_pathtracing_tpu.render import draw_uniforms, trace_paths

    scene = _plant_scene()
    cam = Camera.look_at(eye=(2.0, 2.5, -3.0), center=(1.5, 1.0, 1.5))
    origins, dirs = pixel_grid_rays(cam, 8, 6)
    u = draw_uniforms(jax.random.PRNGKey(0), origins.shape[0])
    rad = np.asarray(trace_paths(scene, origins, dirs, u))
    assert np.isfinite(rad).all()
    assert rad.mean() > 0.0
