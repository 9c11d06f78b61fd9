"""End-to-end preview render tests: JAX wavefront frame vs per-pixel oracle."""

import numpy as np
import jax.numpy as jnp

from octree_pathtracing_tpu.models import sphere_scene, face_normals
from octree_pathtracing_tpu.models.camera import pixel_grid_rays
from octree_pathtracing_tpu.models.sun import add_sun_color, flat_shading, sky_color
from octree_pathtracing_tpu.octree import traverse_oracle
from octree_pathtracing_tpu.ops.texture import sample_atlas
from octree_pathtracing_tpu.render.preview import preview_image


def test_preview_matches_oracle_traversal():
    scene, cam = sphere_scene(depth=4)
    w, h = 24, 18
    img = np.asarray(preview_image(scene, cam, w, h))
    assert img.shape == (h, w, 3)

    origins, dirs = pixel_grid_rays(cam, w, h)
    origins, dirs = np.asarray(origins), np.asarray(dirs)
    # the oracle walks the plain layout; explode the scene's brick pool
    from octree_pathtracing_tpu.octree.brick import BrickOctree, debrickify

    tree = scene.octree
    if isinstance(tree, BrickOctree):
        tree = debrickify(tree)
    cm, cd = np.asarray(tree.child_mask), np.asarray(tree.child_data)

    n_hit = 0
    for i in range(origins.shape[0]):
        o = traverse_oracle(cm, cd, tree.root, tree.scale(), origins[i], dirs[i])
        y, x = divmod(i, w)
        px = img[y, x]
        if o.hit:
            n_hit += 1
            mat = int(np.asarray(scene.leaf_material)[o.leaf_value])
            layer = int(np.asarray(scene.materials.texture_index)[mat])
            albedo = np.asarray(
                sample_atlas(scene.atlas, jnp.array([layer]), jnp.array([o.u]), jnp.array([o.v]))
            )[0, :3]
            normal = np.asarray(face_normals())[o.face_id]
            expect = np.asarray(
                flat_shading(scene.sun, jnp.asarray(normal)[None], jnp.asarray(albedo)[None])
            )[0]
        else:
            sky = sky_color((1,))
            sky = add_sun_color(scene.sun, jnp.asarray(dirs[i])[None], sky)
            expect = np.asarray(sky)[0, :3]
        np.testing.assert_allclose(px, expect, rtol=1e-4, atol=1e-5, err_msg=f"pixel {x},{y}")
    # scene must actually be visible
    assert n_hit > 20, n_hit


def test_preview_has_structure():
    scene, cam = sphere_scene(depth=5)
    img = np.asarray(preview_image(scene, cam, 48, 36))
    assert np.isfinite(img).all()
    assert img.std() > 0.05  # not a flat frame
    # sky pixels present and equal SKY_COLOR (+ maybe sun disk)
    sky_px = np.isclose(img[..., 2], 1.0, atol=1e-5).sum()
    assert sky_px > 10
