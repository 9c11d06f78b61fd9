"""Analytic primitives (free spheres/quads) in the render path.

Covers the reference's Scene-held non-voxel geometry
(``/root/reference/src/scene/mod.rs:146-156``, ``src/geometry/sphere.rs``,
``src/hittable/mod.rs:137-148``): device integrator vs scalar oracle parity,
plus direct intersection sanity.
"""

import jax
import jax.numpy as jnp
import numpy as np

from octree_pathtracing_tpu.models import analytic_sphere_scene
from octree_pathtracing_tpu.models.camera import pixel_grid_rays
from octree_pathtracing_tpu.models.prims import (
    intersect_prims,
    intersect_prims_np,
    make_primitives,
    prims_to_numpy,
)
from octree_pathtracing_tpu.models.sun import SunSampling
from octree_pathtracing_tpu.render import (
    draw_uniforms,
    scene_to_numpy,
    trace_path_oracle,
    trace_paths,
)


def test_sphere_hit_jax_vs_np():
    prims = make_primitives(spheres=[((0.0, 0.0, 5.0), 1.0, 7)])
    origins = jnp.asarray(
        np.array([[0, 0, 0], [0, 3.0, 0], [0.5, 0.2, -1.0]], np.float32)
    )
    dirs = jnp.asarray(np.array([[0, 0, 1.0], [0, 0, 1.0], [0, 0, 1.0]], np.float32))
    hit, t, mat, uv, n = intersect_prims(prims, origins, dirs, 1024.0)
    hit, t, mat = np.asarray(hit), np.asarray(t), np.asarray(mat)
    assert hit.tolist() == [True, False, True]
    assert mat[0] == 7
    np.testing.assert_allclose(t[0], 4.0, rtol=1e-5)

    pn = prims_to_numpy(prims)
    for i in range(3):
        ph, pt, pm, puv, _ = intersect_prims_np(
            pn, np.asarray(origins[i], np.float64), np.asarray(dirs[i], np.float64)
        )
        assert ph == bool(hit[i])
        if ph:
            np.testing.assert_allclose(pt, t[i], rtol=1e-5)
            assert pm == mat[i]
            got_uv = np.asarray(uv[i], np.float64)
            np.testing.assert_allclose(puv, got_uv, atol=1e-5)


def test_quad_prim_backface_cull():
    prims = make_primitives(
        quads=(
            np.array([[0.0, 0.0, 2.0]], np.float32),
            np.array([[0.0, 1.0, 0.0]], np.float32),
            np.array([[1.0, 0.0, 0.0]], np.float32),
            np.array([1], np.int32),
        )
    )
    o = jnp.asarray(np.array([[0.5, 0.5, 0.0], [0.5, 0.5, 4.0]], np.float32))
    d = jnp.asarray(np.array([[0, 0, 1.0], [0, 0, -1.0]], np.float32))
    hit, t, mat, uv, n = intersect_prims(prims, o, d, 1024.0)
    # front-facing lane hits; the reverse direction is backface-culled
    assert np.asarray(hit).tolist() == [True, False]
    np.testing.assert_allclose(np.asarray(t)[0], 2.0, rtol=1e-5)


def _parity(scene, cam, w, h, seed, allowed_bad=5):
    # allowed_bad: tangent rays at the analytic-sphere silhouette are knife
    # edges where f32 (device) vs f64 (oracle) discriminants legitimately
    # disagree; a flipped hit changes the whole path.
    origins, dirs = pixel_grid_rays(cam, w, h)
    u = draw_uniforms(jax.random.PRNGKey(seed), origins.shape[0])
    got = np.asarray(trace_paths(scene, origins, dirs, u))
    assert np.isfinite(got).all()
    sc = scene_to_numpy(scene)
    o_np, d_np = np.asarray(origins, np.float64), np.asarray(dirs, np.float64)
    u_np = np.asarray(u, np.float64)
    bad = 0
    worst = None
    for i in range(origins.shape[0]):
        expect = trace_path_oracle(sc, o_np[i], d_np[i], u_np[i])
        if not np.allclose(got[i], expect, rtol=2e-3, atol=2e-3):
            bad += 1
            worst = (i, got[i], expect)
    assert bad <= allowed_bad, (bad, worst)
    return got


def test_analytic_scene_parity_importance():
    scene, cam = analytic_sphere_scene(depth=4)
    img = _parity(scene, cam, 10, 8, seed=21)
    assert img.mean() > 0.01


def test_analytic_scene_parity_with_nee():
    """Sun NEE shadow rays must see analytic blockers identically on both
    sides (the prim factor in shadow_attenuation)."""
    scene, cam = analytic_sphere_scene(depth=4)
    scene.sun_sampling = SunSampling.fast()
    _parity(scene, cam, 8, 6, seed=23)


def test_sphere_shadows_ground():
    """The analytic sphere occludes the sun for ground points under it:
    NEE-lit ground directly below the sphere is darker than open ground."""
    from octree_pathtracing_tpu.models.sun import make_sun

    scene, cam = analytic_sphere_scene(depth=5)
    scene.sun_sampling = SunSampling.fast()
    # sun straight up so the occluded patch is exactly below the sphere
    import dataclasses

    scene = dataclasses.replace(scene, sun=make_sun(altitude=np.pi / 2))
    s = 1 << 5
    ground_y = float(max(1, s // 16))
    below = np.array([[s * 0.5, ground_y + 0.1, s * 0.5]], np.float32)
    open_ = np.array([[s * 0.08, ground_y + 0.1, s * 0.08]], np.float32)
    up = np.array([[0.0, -1.0, 0.0]], np.float32)  # ray INTO the ground
    origins = jnp.asarray(np.concatenate([below, open_]))
    dirs = jnp.asarray(np.tile(up, (2, 1)))
    u = draw_uniforms(jax.random.PRNGKey(5), 2, n_bounces=2)
    # force the diffuse lobe + front-facing sun sample
    u = u.at[:, :, :].set(0.25)
    rad = np.asarray(trace_paths(scene, origins, dirs, u))
    assert rad[1].mean() > rad[0].mean() * 1.5, rad
