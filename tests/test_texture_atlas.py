"""Variable-resolution texture atlas: per-texel sampling + render parity.

The reference's image loader accepts any resolution
(``/root/reference/src/textures/rtw_image.rs:49-122``); the atlas here keeps
native sizes per layer (``ops/texture.py::Atlas``) instead of forcing the
16x16 Minecraft block size.
"""

import jax
import numpy as np

from octree_pathtracing_tpu.models import sphere_scene
from octree_pathtracing_tpu.models.camera import pixel_grid_rays
from octree_pathtracing_tpu.ops.texture import GAMMA, Atlas, build_atlas, sample_atlas
from octree_pathtracing_tpu.render import (
    draw_uniforms,
    scene_to_numpy,
    trace_path_oracle,
    trace_paths,
)


def _gradient_texture(h, w):
    """RGBA8 image where every texel is uniquely identifiable from (j, i)."""
    img = np.zeros((h, w, 4), np.uint8)
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img[..., 0] = (ii * 255) // max(1, w - 1)
    img[..., 1] = (jj * 255) // max(1, h - 1)
    img[..., 2] = 128
    img[..., 3] = 255
    return img


def test_atlas_mixed_sizes_per_texel_exact():
    imgs = [_gradient_texture(16, 16), _gradient_texture(48, 64), _gradient_texture(7, 3)]
    atlas = build_atlas(imgs, size=None)
    assert isinstance(atlas, Atlas)
    assert atlas.data.shape == (3, 48, 64, 4)
    np.testing.assert_array_equal(np.asarray(atlas.sizes), [[16, 16], [48, 64], [7, 3]])

    rng = np.random.default_rng(0)
    for layer, img in enumerate(imgs):
        h, w = img.shape[:2]
        # target every texel exactly: uv at texel centers, with the v-flip
        js = rng.integers(0, h, 20)
        is_ = rng.integers(0, w, 20)
        u = (is_ + 0.5) / w
        v = 1.0 - (js + 0.5) / h
        got = np.asarray(
            sample_atlas(atlas, np.full(20, layer), u.astype(np.float32), v.astype(np.float32))
        )
        want_rgb = (img[js, is_, :3].astype(np.float64) / 255.0) ** GAMMA
        np.testing.assert_allclose(got[:, :3], want_rgb, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got[:, 3], img[js, is_, 3] / 255.0, atol=1e-6)


def test_atlas_uniform_size_still_plain_array():
    imgs = [_gradient_texture(16, 16)] * 2
    atlas = build_atlas(imgs)  # default path unchanged
    assert not isinstance(atlas, Atlas)
    assert atlas.shape == (2, 16, 16, 4)


def test_render_parity_with_highres_earthmap():
    """A 64x32 ground texture round-trips through the full integrator and
    matches the scalar oracle per lane (BASELINE config 1 at native res)."""
    scene, cam = sphere_scene(depth=4, earthmap=_gradient_texture(32, 64))
    assert isinstance(scene.atlas, Atlas)
    origins, dirs = pixel_grid_rays(cam, 8, 6)
    u = draw_uniforms(jax.random.PRNGKey(11), origins.shape[0])
    got = np.asarray(trace_paths(scene, origins, dirs, u))
    assert np.isfinite(got).all()

    sc = scene_to_numpy(scene)
    assert sc["atlas_sizes"] is not None
    o_np, d_np = np.asarray(origins, np.float64), np.asarray(dirs, np.float64)
    u_np = np.asarray(u, np.float64)
    bad = 0
    for i in range(origins.shape[0]):
        expect = trace_path_oracle(sc, o_np[i], d_np[i], u_np[i])
        if not np.allclose(got[i], expect, rtol=2e-3, atol=2e-3):
            bad += 1
    assert bad <= 2


def test_atlas_gradients_flow_to_native_res_texels():
    """d(radiance)/d(atlas.data) is nonzero only inside sampled layers —
    the trainable-albedo contract survives variable resolution."""
    import jax.numpy as jnp

    from octree_pathtracing_tpu.parallel.shard import apply_params

    scene, cam = sphere_scene(depth=3, earthmap=_gradient_texture(32, 64))
    origins, dirs = pixel_grid_rays(cam, 6, 6)
    u = draw_uniforms(jax.random.PRNGKey(3), origins.shape[0])

    def loss(data):
        s2 = apply_params(
            scene, {"atlas": data, "emittance": scene.materials.emittance}
        )
        return jnp.mean(trace_paths(s2, origins, dirs, u))

    g = np.asarray(jax.grad(loss)(scene.atlas.data))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0.0
