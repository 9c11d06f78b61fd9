"""CLI smoke tests, config roundtrip, checkpoint-resume equivalence."""

import os

import numpy as np

from octree_pathtracing_tpu.config import Config, sun_sampling_from_name


def test_config_json_roundtrip():
    c = Config()
    c.render.target_spp = 17
    c.sun.altitude = 0.5
    back = Config.from_json(c.to_json())
    assert back.render.target_spp == 17
    assert back.sun.altitude == 0.5
    assert back.camera.eye == (0.0, 0.0, 10.0)


def test_sun_strategy_names():
    for name in ["off", "non_luminous", "fast", "importance", "high_quality"]:
        s = sun_sampling_from_name(name)
        assert hasattr(s, "sun_sampling")


def test_cli_preview(tmp_path):
    from octree_pathtracing_tpu.cli import main

    out = str(tmp_path / "p.png")
    main(["preview", "--scene", "sphere", "--depth", "4", "--width", "24", "--height", "18", "-o", out])
    assert os.path.exists(out) or os.path.exists(out + ".ppm")


def test_cli_render_with_checkpoint_resume(tmp_path):
    from octree_pathtracing_tpu.cli import main
    from octree_pathtracing_tpu.io.checkpoint import load_render_checkpoint
    from octree_pathtracing_tpu.models import sphere_scene
    from octree_pathtracing_tpu.render.renderer import Renderer

    out = str(tmp_path / "r.png")
    ckpt = str(tmp_path / "ck.npz")
    main(
        [
            "render", "--scene", "sphere", "--depth", "3",
            "--width", "16", "--height", "12", "--spp", "3",
            "--checkpoint", ckpt, "-o", out,
        ]
    )
    assert os.path.exists(ckpt)

    # resume must reproduce continuing the same renderer
    scene, cam = sphere_scene(depth=3)
    r1 = Renderer(scene=scene, camera=cam, width=16, height=12, target_spp=6)
    while r1.spp < 3:
        r1.step()
    fb3 = np.asarray(r1.framebuffer)
    r2 = Renderer(scene=scene, camera=cam, width=16, height=12, target_spp=6)
    load_render_checkpoint(ckpt, r2)
    r2.target_spp = 6
    np.testing.assert_allclose(np.asarray(r2.framebuffer), fb3, rtol=1e-6)
    assert r2.spp == 3
    r1.render()
    r2.render()
    np.testing.assert_allclose(
        np.asarray(r2.framebuffer), np.asarray(r1.framebuffer), rtol=1e-5, atol=1e-6
    )


def test_checkpoint_arrays_roundtrip(tmp_path):
    from octree_pathtracing_tpu.io.checkpoint import load_arrays, save_arrays

    tree = {"a": np.arange(5.0), "nested": {"b": np.ones((2, 3))}}
    p = str(tmp_path / "t.npz")
    save_arrays(p, tree)
    back = load_arrays(p)
    np.testing.assert_array_equal(back["a"], tree["a"])
    np.testing.assert_array_equal(back["nested"]["b"], tree["nested"]["b"])
