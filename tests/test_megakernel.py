"""Fused persistent-wavefront kernel parity vs the bounce-loop integrator."""

import jax
import numpy as np

from octree_pathtracing_tpu.models import cornell_scene, sphere_scene
from octree_pathtracing_tpu.models.camera import pixel_grid_rays
from octree_pathtracing_tpu.render import draw_uniforms, trace_paths
from octree_pathtracing_tpu.render.megakernel import trace_paths_fused


def _compare(scene, cam, w, h, seed, atol=2e-4, allowed_bad=1):
    origins, dirs = pixel_grid_rays(cam, w, h)
    u = draw_uniforms(jax.random.PRNGKey(seed), origins.shape[0])
    a = np.asarray(trace_paths(scene, origins, dirs, u))
    b = np.asarray(trace_paths_fused(scene, origins, dirs, u))
    assert np.isfinite(b).all()
    bad = (~np.isclose(a, b, rtol=1e-4, atol=atol)).any(axis=-1).sum()
    assert bad <= allowed_bad, (bad, a[:5], b[:5])


def test_fused_matches_sphere():
    scene, cam = sphere_scene(depth=4)
    _compare(scene, cam, 16, 12, seed=0)


def test_fused_matches_cornell():
    scene, cam = cornell_scene(depth=4)
    _compare(scene, cam, 16, 12, seed=3)


def test_fused_matches_plant_scene():
    from tests.test_blockmodels import _plant_scene
    from octree_pathtracing_tpu.models import Camera

    scene = _plant_scene()
    cam = Camera.look_at(eye=(2.0, 2.5, -3.0), center=(1.5, 1.0, 1.5))
    _compare(scene, cam, 12, 9, seed=5)
