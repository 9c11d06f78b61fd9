"""Gradient validity: finite-difference checks + inverse rendering convergence.

BASELINE gates: "finite-difference allclose on pixel grads (voxel
albedo/emission/texture)" and "inverse-rendering config 4 converges".
"""

import jax
import jax.numpy as jnp
import numpy as np

from octree_pathtracing_tpu.models import sphere_scene, cornell_scene, Camera
from octree_pathtracing_tpu.models.camera import pixel_grid_rays
from octree_pathtracing_tpu.parallel.shard import apply_params
from octree_pathtracing_tpu.render import draw_uniforms, trace_paths


def _setup(depth=3, w=8, h=6, seed=0):
    scene, cam = sphere_scene(depth=depth)
    origins, dirs = pixel_grid_rays(cam, w, h)
    u = draw_uniforms(jax.random.PRNGKey(seed), origins.shape[0])
    params = {"atlas": scene.atlas, "emittance": scene.materials.emittance}

    def f(p):
        rad = trace_paths(apply_params(scene, p), origins, dirs, u)
        return jnp.sum(rad)

    return scene, params, jax.jit(f), jax.jit(jax.grad(f))


def test_grad_matches_finite_difference_atlas():
    scene, params, f, g = _setup()
    grads = g(params)
    ga = np.asarray(grads["atlas"])
    assert np.isfinite(ga).all()
    # probe the 5 largest-|grad| atlas entries with central differences
    flat = np.abs(ga).ravel()
    order = np.argsort(flat)[::-1][:5]
    eps = 1e-3
    for k in order:
        idx = np.unravel_index(k, ga.shape)
        atlas_hi = params["atlas"].at[idx].add(eps)
        atlas_lo = params["atlas"].at[idx].add(-eps)
        f_hi = float(f({**params, "atlas": atlas_hi}))
        f_lo = float(f({**params, "atlas": atlas_lo}))
        fd = (f_hi - f_lo) / (2 * eps)
        an = float(ga[idx])
        assert np.isclose(fd, an, rtol=5e-2, atol=1e-3), (idx, fd, an)


def test_grad_matches_finite_difference_emittance():
    scene, cam = cornell_scene(depth=3)
    origins, dirs = pixel_grid_rays(cam, 8, 6)
    u = draw_uniforms(jax.random.PRNGKey(1), origins.shape[0])
    params = {"atlas": scene.atlas, "emittance": scene.materials.emittance}

    def f(p):
        return jnp.sum(trace_paths(apply_params(scene, p), origins, dirs, u))

    g = jax.jit(jax.grad(f))(params)
    ge = np.asarray(g["emittance"])
    assert np.isfinite(ge).all()
    fj = jax.jit(f)
    eps = 1e-2
    for m in range(len(ge)):
        if abs(ge[m]) < 1e-6:
            continue
        e_hi = params["emittance"].at[m].add(eps)
        e_lo = params["emittance"].at[m].add(-eps)
        fd = (float(fj({**params, "emittance": e_hi})) - float(fj({**params, "emittance": e_lo}))) / (2 * eps)
        assert np.isclose(fd, float(ge[m]), rtol=5e-2, atol=1e-3), (m, fd, ge[m])


def test_inverse_rendering_converges():
    """Stochastic end-to-end recovery on a config whose initial photometric
    mismatch clearly exceeds the 1-spp cross-stream noise floor (the old
    depth-3/12x12 config's signal sat AT the floor, so the loss-halving
    assertion was pure seed luck — r4 note: the per-step loss is an
    estimate under fresh uniforms; only floors well below the initial
    mismatch make convergence observable).  Mirrors the CLI ``train``
    configuration, which demonstrably converges."""
    from octree_pathtracing_tpu.diff import inverse_render, render_views

    scene, cam = sphere_scene(depth=4)
    s = 16
    cams = []
    for i in range(3):
        ang = 2 * np.pi * i / 3
        cams.append(
            Camera.look_at(
                eye=(s * (0.5 + 0.9 * np.cos(ang)), s * 0.75, s * (0.5 + 0.9 * np.sin(ang))),
                center=(s * 0.5, s * 0.3, s * 0.5),
            )
        )
    w = h = 16
    key = jax.random.PRNGKey(0)
    targets = render_views(scene, cams, w, h, key)

    res = inverse_render(scene, cams, targets, w, h, steps=12, lr=0.05, key=key)
    assert res.losses[-1] < res.losses[0] * 0.5, res.losses[:3] + res.losses[-3:]


def test_inverse_loss_deterministic_descent():
    """Gradient correctness end-to-end, minus sampling noise: full-batch
    descent on a FIXED uniform draw must reduce the loss monotonically
    (distinguishes true regressions from the stochastic loop's noise)."""
    from octree_pathtracing_tpu.diff import render_views
    from octree_pathtracing_tpu.diff.inverse import make_inverse_loss
    from octree_pathtracing_tpu.render.pathtracer import draw_uniforms
    from octree_pathtracing_tpu.models.camera import pixel_grid_rays
    from octree_pathtracing_tpu.ops.texture import Atlas
    import jax.numpy as jnp

    scene, cam = sphere_scene(depth=3)
    s = 8
    cams = [
        Camera.look_at(eye=(s * ex, s * 0.8, s * ez), center=(s * 0.5, s * 0.3, s * 0.5))
        for ex, ez in [(-0.5, -0.5), (1.5, -0.5)]
    ]
    w = h = 12
    key = jax.random.PRNGKey(7)
    targets = render_views(scene, cams, w, h, key)
    rays = [pixel_grid_rays(c, w, h) for c in cams]
    ao = jnp.stack([r[0] for r in rays])
    ad = jnp.stack([r[1] for r in rays])
    all_u = jnp.stack(
        [draw_uniforms(jax.random.fold_in(key, 100 + v), ao.shape[1]) for v in range(2)]
    )
    tex = scene.atlas.data if isinstance(scene.atlas, Atlas) else scene.atlas
    params = {
        "atlas": jnp.full_like(tex, 0.5).at[..., 3].set(jnp.asarray(tex)[..., 3]),
        "emittance": jnp.zeros_like(scene.materials.emittance),
    }
    gf = jax.jit(jax.value_and_grad(make_inverse_loss(0.0), argnums=1))
    losses = []
    for _ in range(5):
        l, g = gf(scene, params, ao, ad, all_u, targets)
        params = jax.tree.map(lambda p, gr: p - 0.05 * gr, params, g)
        params["atlas"] = jnp.clip(params["atlas"], 0.0, 1.0)
        params["emittance"] = jnp.clip(params["emittance"], 0.0, None)
        losses.append(float(l))
    assert all(b < a for a, b in zip(losses, losses[1:])), losses
