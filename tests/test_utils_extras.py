"""Utility parity: bit codecs, colors, edit ops, camera DoF/controls,
ported shader test images."""

import numpy as np

from octree_pathtracing_tpu.utils.bits import (
    extract_u30,
    find_msb_i32,
    find_msb_u32,
    write_u30,
)
from octree_pathtracing_tpu.utils.colors import f32_to_u8, u8_to_f32, LUT_BYTE


def test_find_msb():
    assert int(find_msb_u32(16)) == 4
    assert int(find_msb_u32(1)) == 0
    assert int(find_msb_u32(0)) == 0xFFFFFFFF
    assert int(find_msb_u32(0x80000000)) == 31
    vals = np.array([1, 2, 3, 255, 1 << 20, (1 << 32) - 1], np.uint32)
    expect = np.array([0, 1, 1, 7, 20, 31], np.uint32)
    np.testing.assert_array_equal(find_msb_u32(vals), expect)
    assert int(find_msb_i32(-2)) == 0  # msb of ~(-2)=1


def test_u30_bitstream_roundtrip():
    rng = np.random.default_rng(0)
    block = np.zeros(8, np.uint32)
    writes = []
    for start in [0, 7, 30, 31, 64, 100, 199, 226]:
        v = int(rng.integers(0, 1 << 30))
        writes.append((start, v))
        write_u30(block, start, v)
    # non-overlapping subset must read back exactly
    block2 = np.zeros(8, np.uint32)
    for start, v in [(0, 123), (30, (1 << 30) - 1), (60, 7), (226, 42)]:
        write_u30(block2, start, v)
    for start, v in [(0, 123), (30, (1 << 30) - 1), (60, 7), (226, 42)]:
        assert extract_u30(block2, start) == v, start


def test_color_luts_match_reference_formula():
    u8 = np.arange(256, dtype=np.uint8)
    rgba = np.stack([u8, u8, u8, u8], -1)
    f = u8_to_f32(rgba)
    np.testing.assert_allclose(f[..., 0], (u8 / 255.0) ** 2.2, rtol=1e-6)
    np.testing.assert_allclose(f[..., 3], u8 / 255.0, rtol=1e-6)
    back = f32_to_u8(np.stack([u8 / 255.0] * 4, -1).astype(np.float32))
    np.testing.assert_array_equal(back[..., 0], LUT_BYTE[u8])


def test_edit_ops_split_and_compact():
    from octree_pathtracing_tpu.octree import build_from_dense
    from octree_pathtracing_tpu.octree.edit import EditableOctree

    # uniform 4^3 block -> one LOD leaf; editing inside must split it
    grid = np.zeros((8, 8, 8), np.uint32)
    grid[0:4, 0:4, 0:4] = 7
    e = EditableOctree(build_from_dense(grid))
    assert e.get(1, 1, 1) == 7
    e.set(1, 1, 1, 3)
    assert e.get(1, 1, 1) == 3
    assert e.get(0, 0, 0) == 7  # split preserved siblings
    e.set(1, 1, 1, 7)  # restore -> compacts back to uniform
    assert e.get(1, 1, 1) == 7
    e.remove(2, 2, 2)
    assert e.get(2, 2, 2) == 0


def test_camera_dof_and_controls():
    import jax.numpy as jnp

    from octree_pathtracing_tpu.models import Camera
    from octree_pathtracing_tpu.models.camera import (
        get_rays_dof,
        move_camera,
        rotate_camera,
    )

    cam = Camera.look_at(eye=(0, 0, -5), center=(0, 0, 0))
    import dataclasses

    cam_f = dataclasses.replace(cam, aperture=0.2, focal_distance=5.0)
    xn = jnp.zeros(4)
    yn = jnp.zeros(4)
    u1 = jnp.array([0.1, 0.5, 0.9, 0.3])
    u2 = jnp.array([0.2, 0.6, 0.1, 0.8])
    o, d = get_rays_dof(cam_f, xn, yn, u1, u2)
    # origins spread on the aperture disk, all rays converge at focal point
    assert float(jnp.std(o[:, 0])) > 0.0
    fp = o + d * jnp.linalg.norm(
        jnp.array([0.0, 0.0, 0.0]) - o, axis=-1, keepdims=True
    )
    np.testing.assert_allclose(np.asarray(fp), np.broadcast_to([0, 0, 0], (4, 3)), atol=1e-2)

    cam2 = move_camera(cam, forward=1.0, strafe=0.5, vertical=0.25)
    assert not np.allclose(np.asarray(cam2.eye), np.asarray(cam.eye))
    cam3 = rotate_camera(cam, yaw=0.3, pitch=2.0)  # pitch clamps to 80 deg
    assert float(cam3.direction[1]) < np.sin(np.radians(80.5))
    np.testing.assert_allclose(float(jnp.linalg.norm(cam3.direction)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(jnp.dot(cam3.direction, cam3.up)), 0.0, atol=1e-6)


def test_ported_shader_images():
    from octree_pathtracing_tpu.render.testimages import kleinian_image, mandelbrot_image

    m = np.asarray(mandelbrot_image(64, 48))
    k = np.asarray(kleinian_image(64, 48))
    for img in (m, k):
        assert img.shape == (48, 64, 3)
        assert np.isfinite(img).all()
        assert img.std() > 0.02
