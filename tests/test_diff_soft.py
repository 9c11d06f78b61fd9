"""Edge-aware (relaxed-visibility) gradients — the north-star contract.

BASELINE: "reparameterized edge-aware gradients".  The production integrator
detaches the traversal, so a texel ALPHA that gates a surface's existence gets
zero gradient through visibility; ``diff/soft.py`` composites the recorded
surfaces front-to-back so alpha carries a real, FD-validated gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np

from octree_pathtracing_tpu.diff.soft import soft_radiance
from octree_pathtracing_tpu.models import make_material_table, make_scene, air
from octree_pathtracing_tpu.octree import build_from_dense
from octree_pathtracing_tpu.ops.shading import U_DIFFUSE
from octree_pathtracing_tpu.ops.texture import build_atlas
from octree_pathtracing_tpu.parallel.shard import apply_params
from octree_pathtracing_tpu.render import draw_uniforms, trace_paths


def _solid(rgb, alpha=255, size=16):
    img = np.zeros((size, size, 4), np.uint8)
    img[..., :3] = rgb
    img[..., 3] = alpha
    return img


def _blocker_scene(alpha=0.6):
    """A semi-transparent 2x2 blocker slab in front of an opaque backdrop."""
    s = 8
    grid = np.zeros((s, s, s), np.uint32)
    grid[:, :, 7] = 2  # backdrop wall
    grid[3:5, 3:5, 3] = 1  # blocker
    tree = build_from_dense(grid)
    textures = [
        _solid((255, 0, 255)),
        _solid((40, 220, 40), alpha=int(round(alpha * 255))),
        _solid((200, 60, 30)),
    ]
    materials = [air(), dict(texture_index=1), dict(texture_index=2)]
    scene = make_scene(tree, make_material_table(materials), build_atlas(textures))
    # ray bundle straight through the blocker toward the backdrop
    xs, ys = np.meshgrid(
        np.linspace(2.6, 5.4, 6), np.linspace(2.6, 5.4, 6), indexing="ij"
    )
    origins = np.stack(
        [xs.ravel(), ys.ravel(), np.full(xs.size, -2.0)], -1
    ).astype(np.float32)
    dirs = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (origins.shape[0], 1))
    return scene, jnp.asarray(origins), jnp.asarray(dirs)


def _alpha_grad(scene, origins, dirs, f):
    params = {"atlas": scene.atlas, "emittance": scene.materials.emittance}
    g = jax.grad(f)(params)
    return params, np.asarray(g["atlas"])[1, :, :, 3]  # blocker layer alpha


def test_hard_path_has_zero_alpha_visibility_gradient():
    """With the diffuse lobe forced (u=0), texel alpha only feeds DISCRETE
    decisions in the hard integrator (accept test, lobe choice) — its
    gradient is identically zero.  This is the gap soft_radiance closes."""
    scene, origins, dirs = _blocker_scene(alpha=0.6)
    u = draw_uniforms(jax.random.PRNGKey(0), origins.shape[0])
    u = u.at[:, :, U_DIFFUSE].set(0.0)  # always-diffuse: no transmission tint

    def f(p):
        return jnp.sum(trace_paths(apply_params(scene, p), origins, dirs, u))

    _, ga = _alpha_grad(scene, origins, dirs, f)
    np.testing.assert_array_equal(ga, 0.0)


def test_soft_alpha_gradient_matches_finite_difference():
    scene, origins, dirs = _blocker_scene(alpha=0.6)

    def f(p):
        return jnp.sum(soft_radiance(apply_params(scene, p), origins, dirs))

    params, ga = _alpha_grad(scene, origins, dirs, f)
    assert np.abs(ga).max() > 1e-3, "soft alpha gradient must be nonzero"

    fj = jax.jit(f)
    flat = np.abs(ga).ravel()
    eps = 1e-3
    for k in np.argsort(flat)[::-1][:4]:
        i, j = np.unravel_index(k, ga.shape)
        idx = (1, i, j, 3)
        hi = float(fj({**params, "atlas": params["atlas"].at[idx].add(eps)}))
        lo = float(fj({**params, "atlas": params["atlas"].at[idx].add(-eps)}))
        fd = (hi - lo) / (2 * eps)
        assert np.isclose(fd, ga[i, j], rtol=5e-2, atol=1e-4), (i, j, fd, ga[i, j])


def test_soft_equals_hard_2bounce_at_binary_alpha():
    """At alpha == 1 the compositing collapses to the first surface, whose
    shading model is the integrator's own single-diffuse-bounce estimate —
    with the SAME first-bounce uniform row, soft_radiance must equal the
    hard 2-bounce trace_paths wherever the secondary ray escapes to the sky
    (the anchor tying the relaxation to the hard model)."""
    scene, origins, dirs = _blocker_scene(alpha=1.0)
    b = origins.shape[0]
    u = draw_uniforms(jax.random.PRNGKey(5), b, n_bounces=2)
    hard = np.asarray(trace_paths(scene, origins, dirs, u))
    soft = np.asarray(soft_radiance(scene, origins, dirs, u=u[:, 0, :]))
    close = np.all(np.isclose(hard, soft, rtol=1e-4, atol=1e-5), axis=-1)
    # secondary rays that re-hit geometry legitimately differ (the soft model
    # assumes escape); in this open scene most escape
    assert close.mean() > 0.6, f"only {close.mean():.2f} of lanes agree"


def test_inverse_render_combined_loss_moves_occupancy():
    """VERDICT r2 #5: the PRODUCT inverse-rendering path (``inverse_render``,
    combined objective) must carry silhouette gradients.  The target differs
    from the init by geometry occupancy — the blocker is solid (alpha 1.0) in
    the target and nearly absent (alpha 0.1) at init, so its texel alpha
    gates the silhouette — and recovery must happen through
    ``inverse_render`` itself, against hard path-traced targets.

    (Direction note: fading IN is the well-posed direction — the reference's
    transmission model multiplies through-light by ``alpha * albedo``
    (``translucent_ray_color``, path_tracer.rs:424-437), so the hard render
    is NOT monotone toward transparency as alpha -> 0; both models agree at
    binary alpha, which is the silhouette limit.)"""
    from octree_pathtracing_tpu.diff.inverse import inverse_render, render_views
    from octree_pathtracing_tpu.models import Camera

    scene_target, origins, dirs = _blocker_scene(alpha=1.0)
    scene, _, _ = _blocker_scene(alpha=0.1)
    cams = [
        Camera.look_at(eye=(4.0, 4.0, -4.0), center=(4.0, 4.0, 4.0)),
        Camera.look_at(eye=(3.0, 4.5, -4.0), center=(4.0, 4.0, 4.0)),
    ]
    key = jax.random.PRNGKey(7)
    targets = render_views(scene_target, cams, 12, 10, key)

    init = {"atlas": scene.atlas, "emittance": scene.materials.emittance}
    res = inverse_render(
        scene, cams, targets, 12, 10, steps=60, lr=0.1, key=key,
        init_params=init, soft_weight=0.5,
    )
    assert res.losses[-1] < res.losses[0] * 0.7, (res.losses[0], res.losses[-1])
    rec = np.asarray(res.params["atlas"])[1, :, :, 3]
    # texels never sampled by any ray stay at the (u8-quantized) init ~0.102
    moved = rec[np.abs(rec - 0.102) > 0.02]
    assert moved.size > 0, "no alpha texel moved — silhouette gradient missing"
    assert moved.mean() > 0.4, f"blocker alpha failed to fade in: {moved.mean():.3f}"


def test_combined_loss_gradient_matches_finite_difference():
    """FD check of the combined (hard + soft) objective on the blocker alpha
    texels — the gate VERDICT r2 #5 names."""
    from octree_pathtracing_tpu.diff.inverse import make_inverse_loss

    scene, origins, dirs = _blocker_scene(alpha=0.6)
    u = draw_uniforms(jax.random.PRNGKey(3), origins.shape[0])
    params = {"atlas": scene.atlas, "emittance": scene.materials.emittance}
    loss_fn = make_inverse_loss(0.5)

    def f(p):
        return loss_fn(
            scene, p, origins[None], dirs[None], u[None],
            jnp.zeros((1, origins.shape[0], 3), jnp.float32),
        )

    fj = jax.jit(f)
    ga = np.asarray(jax.grad(f)(params)["atlas"])[1, :, :, 3]
    assert np.abs(ga).max() > 1e-4
    eps = 1e-3
    for k in np.argsort(np.abs(ga).ravel())[::-1][:3]:
        i, j = np.unravel_index(k, ga.shape)
        idx = (1, i, j, 3)
        hi = float(fj({**params, "atlas": params["atlas"].at[idx].add(eps)}))
        lo = float(fj({**params, "atlas": params["atlas"].at[idx].add(-eps)}))
        fd = (hi - lo) / (2 * eps)
        assert np.isclose(fd, ga[i, j], rtol=5e-2, atol=1e-4), (i, j, fd, ga[i, j])


def test_inverse_recovers_blocker_alpha():
    """Silhouette-requiring inverse problem: fit the blocker's transparency.
    The hard-gradient path cannot move alpha at all (zero grad); the soft
    estimator recovers it."""
    import optax

    from octree_pathtracing_tpu.diff.soft import soft_loss

    scene_target, origins, dirs = _blocker_scene(alpha=0.25)
    target = soft_radiance(scene_target, origins, dirs)

    scene, _, _ = _blocker_scene(alpha=0.85)
    params = {"atlas": scene.atlas, "emittance": scene.materials.emittance}
    opt = optax.adam(0.05)
    opt_state = opt.init(params)
    lf = jax.jit(jax.value_and_grad(lambda p: soft_loss(scene, p, origins, dirs, target)))
    _, g0 = lf(params)
    touched = np.abs(np.asarray(g0["atlas"])[1, :, :, 3]) > 1e-7
    assert touched.any()

    def alpha_only(g):
        # the estimator is (rgb, emittance, alpha)-degenerate for a single
        # view bundle; the silhouette claim under test is the ALPHA gradient,
        # so project the update onto the alpha channel
        return {
            "atlas": g["atlas"].at[..., :3].set(0.0),
            "emittance": jnp.zeros_like(g["emittance"]),
        }

    losses = []
    for _ in range(60):
        loss, g = lf(params)
        upd, opt_state = opt.update(alpha_only(g), opt_state)
        params = optax.apply_updates(params, upd)
        params["atlas"] = jnp.clip(params["atlas"], 0.0, 1.0)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.05, (losses[0], losses[-1])
    # only texels actually sampled by a ray receive gradient; they must have
    # moved from 0.85 to the target transparency 0.25
    rec = float(np.asarray(params["atlas"])[1, :, :, 3][touched].mean())
    assert abs(rec - 0.25) < 0.1, rec
