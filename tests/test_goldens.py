"""Golden-image regression tests (SURVEY §4 implication (2), VERDICT r4 #5).

Each BASELINE config renders at a fixed seed / tiny resolution on the CPU
backend and must match the committed golden frame.  The per-lane oracle
parity tests are local and tolerance-based; THIS is the guard against slow
whole-frame semantic drift — any estimator change, however small, fails here
until the golden is regenerated intentionally (``tools/make_goldens.py``).

Gate: tonemapped per-pixel |diff| <= TOL on 99% of pixels AND mean |diff|
<= MEAN_TOL — tight enough that a changed frame fails, loose enough to
absorb cross-version float noise (renders are deterministic on one build;
the margin exists for XLA upgrades).
"""

import os

import jax
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
TOL = 5e-3  # tonemapped [0, 1] units
MEAN_TOL = 5e-4
PIXEL_FRACTION = 0.99


def _render(scene, cam, w, h, spp, n_bounces, seed):
    from octree_pathtracing_tpu.models.camera import pixel_grid_rays
    from octree_pathtracing_tpu.render import draw_uniforms, trace_paths

    origins, dirs = pixel_grid_rays(cam, w, h)
    f = jax.jit(lambda o, d, u: trace_paths(scene, o, d, u))
    acc = np.zeros((origins.shape[0], 3), np.float64)
    for k in range(spp):
        u = draw_uniforms(
            jax.random.PRNGKey(seed + k), origins.shape[0], n_bounces=n_bounces
        )
        acc += np.asarray(f(origins, dirs, u), np.float64)
    return (acc / spp).reshape(h, w, 3).astype(np.float32)


def render_config(name: str) -> np.ndarray:
    """Render one named golden config (shared with tools/make_goldens.py)."""
    import dataclasses

    from octree_pathtracing_tpu.models import (
        cornell_scene,
        cutout_chunk_scene,
        emissive_room_scene,
        minecraft_chunk_scene,
        scattered_lights_scene,
        sphere_scene,
    )
    from octree_pathtracing_tpu.models.sun import SunSampling

    if name == "config1_sphere":
        scene, cam = sphere_scene(depth=5)
        return _render(scene, cam, 48, 36, 2, 2, 101)
    if name == "config2_cornell":
        scene, cam = cornell_scene(depth=5)
        return _render(scene, cam, 48, 36, 2, 4, 202)
    if name == "config3_chunk_nee":
        scene, cam = minecraft_chunk_scene(depth=5)
        scene = dataclasses.replace(
            scene, sun_sampling=SunSampling.high_quality()
        )
        return _render(scene, cam, 48, 36, 2, 3, 303)
    if name == "config3b_cutout":
        scene, cam = cutout_chunk_scene(depth=4)
        scene = dataclasses.replace(
            scene, sun_sampling=SunSampling.high_quality()
        )
        return _render(scene, cam, 40, 30, 2, 3, 404)
    if name == "config4_emitter_one":
        scene, cam = emissive_room_scene(depth=4)
        return _render(scene, cam, 32, 24, 2, 2, 505)
    if name == "config4b_scattered":
        scene, cam = scattered_lights_scene(depth=5, n_lights=60)
        return _render(scene, cam, 32, 24, 2, 2, 606)
    raise KeyError(name)


def golden_configs():
    return [
        "config1_sphere",
        "config2_cornell",
        "config3_chunk_nee",
        "config3b_cutout",
        "config4_emitter_one",
        "config4b_scattered",
    ]


def _tonemap(x):
    return np.clip(x, 0.0, 1.0) ** (1.0 / 2.2)


@pytest.mark.parametrize("name", golden_configs())
def test_golden_frame(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    assert os.path.exists(path), (
        f"missing golden {path} — run `python tools/make_goldens.py` and "
        f"commit the result"
    )
    want = np.load(path)["radiance"]
    got = render_config(name)
    assert got.shape == want.shape
    d = np.abs(_tonemap(got) - _tonemap(want))
    frac_ok = float((d <= TOL).mean())
    assert frac_ok >= PIXEL_FRACTION and d.mean() <= MEAN_TOL, (
        f"{name}: frame drifted from golden — {100 * (1 - frac_ok):.2f}% of "
        f"pixels exceed {TOL} (max |d|={d.max():.4f}, mean={d.mean():.5f}). "
        f"If the change is intentional, regenerate via tools/make_goldens.py "
        f"and commit."
    )
