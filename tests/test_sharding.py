"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from octree_pathtracing_tpu.models import sphere_scene
from octree_pathtracing_tpu.models.camera import pixel_grid_rays
from octree_pathtracing_tpu.parallel import (
    make_mesh,
    sharded_render,
    sharded_train_step,
)
from octree_pathtracing_tpu.render import draw_uniforms, trace_paths


def _lanes(scene, cam, w, h, s, seed=0, n_bounces=None):
    from octree_pathtracing_tpu.render.pathtracer import MAX_BOUNCES
    from octree_pathtracing_tpu.ops.shading import N_UNIFORMS

    if n_bounces is None:
        n_bounces = MAX_BOUNCES
    origins, dirs = pixel_grid_rays(cam, w, h)
    b = origins.shape[0]
    o = jnp.broadcast_to(origins[None], (s, b, 3))
    d = jnp.broadcast_to(dirs[None], (s, b, 3))
    u = draw_uniforms(jax.random.PRNGKey(seed), s * b, n_bounces=n_bounces)
    u = u.reshape(s, b, n_bounces, N_UNIFORMS)
    return o, d, u


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("dp", "sp")


def test_sharded_render_matches_single_device():
    scene, cam = sphere_scene(depth=3)
    mesh = make_mesh()  # (4, 2)
    s, w, h = 2, 8, 4  # B=32 divisible by dp=4; S=2 by sp=2
    # 2 bounces: the sharding semantics under test are bounce-count
    # independent, and the unrolled program compiles ~2.5x faster (VERDICT
    # r2 #6 CI budget)
    o, d, u = _lanes(scene, cam, w, h, s, n_bounces=2)
    out = np.asarray(sharded_render(mesh, scene, o, d, u))

    # single-device reference: flatten all lanes, mean over samples
    flat = lambda x: np.asarray(x).reshape((s * w * h,) + x.shape[2:])
    ref = np.asarray(
        trace_paths(scene, jnp.asarray(flat(o)), jnp.asarray(flat(d)), jnp.asarray(flat(u)))
    ).reshape(s, w * h, 3).mean(axis=0)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_sharded_nee_render_and_grads():
    """The full NEE integrator (stateful shadow walk + quad-model accept)
    under shard_map — the round-2 multichip regression (VMA-uniform
    accept-state carry, `shadow_state_init`) reproduced here so it can never
    land silently again.  Shapes mirror `__graft_entry__.dryrun_multichip`
    exactly (incl. the 2-bounce uniform block) so the two share one
    persistent-cache executable."""
    from octree_pathtracing_tpu.models import plant_scene
    from octree_pathtracing_tpu.ops.shading import N_UNIFORMS

    mesh = make_mesh()  # (4, 2)
    dp, sp = mesh.shape["dp"], mesh.shape["sp"]
    scene, cam = plant_scene(depth=3)
    w, h, s = 4 * dp, 4, 2 * sp  # == dryrun_multichip shapes
    n_bounces = 2  # == dryrun_multichip (bounce count is a data axis)
    origins, dirs = pixel_grid_rays(cam, w, h)
    b = origins.shape[0]
    o = jnp.broadcast_to(origins[None], (s, b, 3))
    d = jnp.broadcast_to(dirs[None], (s, b, 3))
    u = draw_uniforms(jax.random.PRNGKey(0), s * b, n_bounces=n_bounces).reshape(
        s, b, n_bounces, N_UNIFORMS
    )
    params = {"atlas": scene.atlas, "emittance": scene.materials.emittance}
    target = jnp.zeros((s, b, 3), jnp.float32)
    loss, grads = sharded_train_step(mesh, scene, params, o, d, u, target)
    assert np.isfinite(float(loss))
    for g in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(g)).all()


def test_sharded_train_step_grads():
    scene, cam = sphere_scene(depth=3)
    mesh = make_mesh()
    s, w, h = 2, 8, 4
    o, d, u = _lanes(scene, cam, w, h, s, seed=2, n_bounces=2)
    params = {
        "atlas": scene.atlas,
        "emittance": scene.materials.emittance,
    }
    target = jnp.zeros((s, w * h, 3), jnp.float32)
    loss, grads = sharded_train_step(mesh, scene, params, o, d, u, target)
    loss = float(loss)
    assert np.isfinite(loss) and loss > 0.0
    g_atlas = np.asarray(grads["atlas"])
    assert g_atlas.shape == scene.atlas.shape
    assert np.isfinite(g_atlas).all()
    # some albedo gradient must be nonzero (surfaces are visible)
    assert np.abs(g_atlas).max() > 0.0


def test_sharded_emitter_nee_matches_unsharded():
    """Emitter NEE with the r5 spatial pick (supercell grid gathers + the
    normal-nudged cell lookup) under shard_map: the sharded render must
    equal the unsharded one bit-for-bit (grid tables replicated, per-lane
    gathers varying)."""
    import dataclasses

    from octree_pathtracing_tpu.models import emissive_room_scene
    from octree_pathtracing_tpu.ops.shading import N_UNIFORMS
    from octree_pathtracing_tpu.render import trace_paths

    mesh = make_mesh()  # (4, 2)
    scene, cam = emissive_room_scene(depth=3)
    assert scene.emitters is not None and scene.emitters.grid_idx is not None
    w, h, s = 8, 4, 2
    n_bounces = 2
    origins, dirs = pixel_grid_rays(cam, w, h)
    b = origins.shape[0]
    o = jnp.broadcast_to(origins[None], (s, b, 3))
    d = jnp.broadcast_to(dirs[None], (s, b, 3))
    u = draw_uniforms(jax.random.PRNGKey(9), s * b, n_bounces=n_bounces).reshape(
        s, b, n_bounces, N_UNIFORMS
    )
    got = np.asarray(sharded_render(mesh, scene, o, d, u))
    want = np.zeros_like(got)
    for k in range(s):
        want += np.asarray(trace_paths(scene, origins, dirs, u[k])) / s
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    assert np.isfinite(got).all() and got.mean() > 1e-4
