"""Path tracer parity: wavefront JAX lanes vs the scalar NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octree_pathtracing_tpu.models import sphere_scene, cornell_scene
from octree_pathtracing_tpu.models.camera import pixel_grid_rays
from octree_pathtracing_tpu.models.sun import SunSampling
from octree_pathtracing_tpu.render import (
    draw_uniforms,
    scene_to_numpy,
    trace_path_oracle,
    trace_paths,
)


def _run_parity(scene, cam, w, h, seed=0, rtol=2e-3, atol=2e-3, allowed_bad=2):
    origins, dirs = pixel_grid_rays(cam, w, h)
    u = draw_uniforms(jax.random.PRNGKey(seed), origins.shape[0])
    got = np.asarray(trace_paths(scene, origins, dirs, u))
    assert np.isfinite(got).all()

    sc = scene_to_numpy(scene)
    u_np = np.asarray(u, np.float64)
    o_np, d_np = np.asarray(origins, np.float64), np.asarray(dirs, np.float64)
    bad = 0
    worst = None
    for i in range(origins.shape[0]):
        expect = trace_path_oracle(sc, o_np[i], d_np[i], u_np[i])
        if not np.allclose(got[i], expect, rtol=rtol, atol=atol):
            bad += 1
            worst = (i, got[i], expect)
    assert bad <= allowed_bad, (bad, worst)
    return got


def test_sphere_importance_default():
    scene, cam = sphere_scene(depth=4)
    img = _run_parity(scene, cam, 10, 8)
    assert img.mean() > 0.01  # light reaches the film


def test_cornell_emissive():
    scene, cam = cornell_scene(depth=4)
    img = _run_parity(scene, cam, 10, 8, seed=3)
    assert img.mean() > 0.001


def test_sun_sampling_fast_nee():
    scene, cam = sphere_scene(depth=4)
    scene.sun_sampling = SunSampling.fast()
    _run_parity(scene, cam, 8, 6, seed=5)


def test_sun_sampling_high_quality():
    scene, cam = sphere_scene(depth=4)
    scene.sun_sampling = SunSampling.high_quality()
    _run_parity(scene, cam, 8, 6, seed=7)


def test_sky_only():
    scene, cam = sphere_scene(depth=4)
    # aim at the sky
    from octree_pathtracing_tpu.models import Camera

    cam2 = Camera.look_at(eye=np.asarray(cam.eye), center=(0.0, 1000.0, 0.0))
    origins, dirs = pixel_grid_rays(cam2, 6, 6)
    u = draw_uniforms(jax.random.PRNGKey(1), origins.shape[0])
    got = np.asarray(trace_paths(scene, origins, dirs, u))
    # every lane is sky: blue channel == 1.0 unless the sun disk adds more
    assert (got[:, 2] >= 1.0 - 1e-5).all()
