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


def test_shadow_binary_fastpath_matches_stateful():
    """For all-opaque scenes the binary shadow walk (one plain traversal +
    single-surface recompute) must equal the stateful multi-surface walk
    bit-for-bit — values and gradients (render/pathtracer.shadow_attenuation)."""
    import dataclasses

    scene, cam = cornell_scene(depth=4)
    assert scene.shadow_binary  # solid textures: every texel alpha == 1
    scene = dataclasses.replace(scene, sun_sampling=SunSampling.high_quality())
    scene_slow = dataclasses.replace(scene, shadow_binary=False)
    origins, dirs = pixel_grid_rays(cam, 8, 6)
    u = draw_uniforms(jax.random.PRNGKey(9), origins.shape[0], n_bounces=3)

    fast = np.asarray(trace_paths(scene, origins, dirs, u))
    slow = np.asarray(trace_paths(scene_slow, origins, dirs, u))
    np.testing.assert_array_equal(fast, slow)

    from octree_pathtracing_tpu.parallel.shard import apply_params

    params = {"atlas": scene.atlas, "emittance": scene.materials.emittance}

    def loss(p, sc):
        return jnp.mean(trace_paths(apply_params(sc, p), origins, dirs, u))

    g_fast = jax.grad(loss)(params, scene)
    g_slow = jax.grad(loss)(params, scene_slow)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_fast[k]), np.asarray(g_slow[k]), rtol=1e-6, atol=1e-8
        )
    assert float(jnp.abs(g_fast["atlas"]).sum()) > 0.0


def test_branch_replication_equivalence():
    """trace_paths_branched == mean_k trace_paths(uniforms[:, k]) exactly:
    the primary traversal is deterministic, so replicating the first hit is
    the same estimator as re-tracing it per branch (path_tracer.rs:66-121)."""
    from octree_pathtracing_tpu.render import trace_paths_branched

    scene, cam = cornell_scene(depth=4)
    origins, dirs = pixel_grid_rays(cam, 8, 6)
    b = origins.shape[0]
    k = 3
    from octree_pathtracing_tpu.ops.shading import N_UNIFORMS

    u = draw_uniforms(jax.random.PRNGKey(9), b * k).reshape(b, k, -1, N_UNIFORMS)
    got = np.asarray(trace_paths_branched(scene, origins, dirs, u))
    per_branch = np.stack(
        [np.asarray(trace_paths(scene, origins, dirs, u[:, i])) for i in range(k)]
    )
    np.testing.assert_allclose(got, per_branch.mean(axis=0), rtol=1e-5, atol=1e-6)


def test_bounce_count_from_uniform_shape():
    """The bounce axis of the uniform block sets the depth cap (config 5
    wants 8-bounce); deeper paths gather at least as much radiance in the
    Cornell box (more chances to reach the emitter, never fewer)."""
    scene, cam = cornell_scene(depth=4)
    origins, dirs = pixel_grid_rays(cam, 6, 6)
    b = origins.shape[0]
    key = jax.random.PRNGKey(2)
    u2 = draw_uniforms(key, b, n_bounces=2)
    u8 = draw_uniforms(key, b, n_bounces=8)
    r2 = np.asarray(trace_paths(scene, origins, dirs, u2))
    r8 = np.asarray(trace_paths(scene, origins, dirs, u8))
    assert np.isfinite(r2).all() and np.isfinite(r8).all()
    # statistical: u2/u8 are different streams (different block shapes), so
    # the comparison carries ~1% sampling noise at 36 lanes
    assert r8.mean() > r2.mean() * 0.97  # deeper never loses energy here


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


def test_cutout_terrain_stateful_walk_parity():
    """Cutout/translucent terrain (leaf canopies with alpha holes, translucent
    water) — the general stateful multi-surface shadow walk plus
    accept-callback traversal, against the scalar oracle lane-for-lane.  This
    is the configuration resource-pack worlds are in (path_tracer.rs:458-483
    is the reference's default-quality mode); the bench's stateful-walk diag
    line measures the same configuration at depth 9."""
    import dataclasses

    from octree_pathtracing_tpu.models import cutout_chunk_scene

    scene, cam = cutout_chunk_scene(depth=4)
    assert not scene.opaque_only and not scene.shadow_binary
    scene = dataclasses.replace(scene, sun_sampling=SunSampling.high_quality())
    _run_parity(scene, cam, 8, 6, seed=13, allowed_bad=0)
