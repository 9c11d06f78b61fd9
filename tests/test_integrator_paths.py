"""Integrator-path equivalences: every scheduling variant is bit-identical.

The compacted integrator has several alternative bounce strategies —
straggler drain, whole-tile dead skip, beam pre-pass, compaction sort keys,
per-bounce drain caps (``render/pathtracer.py``).  All of them are pure
SCHEDULING: they must reproduce the plain path lane-for-lane, bit-for-bit
(the drain's restart-from-t re-derives every t from position; the beam's
coarse entry t restarts the fine march; sorts carry per-lane uniforms by
original index).  These tests lock that property into the suite — the
on-chip perf verdicts live in tools/PERF_NOTES.md.
"""

import dataclasses

import jax
import numpy as np

import octree_pathtracing_tpu.render.pathtracer as pt
from octree_pathtracing_tpu.models import cornell_scene, sphere_scene
from octree_pathtracing_tpu.models.camera import pixel_grid_rays
from octree_pathtracing_tpu.models.sun import SunSampling
from octree_pathtracing_tpu.render import draw_uniforms, trace_paths


def _setup(depth=4, w=8, h=8, n_bounces=3, seed=17, hq=False):
    scene, cam = cornell_scene(depth=depth)
    if hq:
        scene = dataclasses.replace(
            scene, sun_sampling=SunSampling.high_quality()
        )
    origins, dirs = pixel_grid_rays(cam, w, h)
    u = draw_uniforms(jax.random.PRNGKey(seed), origins.shape[0],
                      n_bounces=n_bounces)
    return scene, origins, dirs, u


def test_drain_skipdead_untiled_all_bit_identical():
    """drain / skip_dead / plain-tiled / untiled are the same estimator."""
    scene, o, d, u = _setup()
    assert scene.opaque_only  # drain eligibility
    ref = np.asarray(trace_paths(scene, o, d, u, tiles=1))
    variants = {
        "drain": trace_paths(scene, o, d, u, tiles=4, drain=True),
        "skip_dead": trace_paths(scene, o, d, u, tiles=4, skip_dead=True,
                                 drain=False),
        "plain tiled": trace_paths(scene, o, d, u, tiles=4, drain=False),
        "uncompacted": trace_paths(scene, o, d, u, tiles=4, compact=False),
    }
    for name, out in variants.items():
        np.testing.assert_array_equal(np.asarray(out), ref, err_msg=name)


def test_drain_k1_schedule_bit_identity():
    """The per-bounce phase-1 cap is scheduling only: a tiny cap (many drain
    rounds, buffer overflow -> extra rounds) equals the default exactly."""
    scene, o, d, u = _setup(seed=23)
    ref = np.asarray(trace_paths(scene, o, d, u, tiles=4, drain=True))
    old = pt.DRAIN_K1_SCHEDULE
    try:
        pt.DRAIN_K1_SCHEDULE = (4, 4, 4, 4, 4)  # forces repeated drain rounds
        tiny = np.asarray(trace_paths(scene, o, d, u, tiles=4, drain=True))
        pt.DRAIN_K1_SCHEDULE = (1000,) * 5  # drain never fires
        never = np.asarray(trace_paths(scene, o, d, u, tiles=4, drain=True))
    finally:
        pt.DRAIN_K1_SCHEDULE = old
    np.testing.assert_array_equal(tiny, ref)
    np.testing.assert_array_equal(never, ref)


def test_sort_keys_bit_identity():
    """morton / octant compaction keys only regroup lanes (uniforms ride the
    carried original index): radiance equals the default active-first key."""
    scene, o, d, u = _setup(seed=29)
    ref = np.asarray(trace_paths(scene, o, d, u, tiles=4))
    for key in ("morton", "octant"):
        out = np.asarray(trace_paths(scene, o, d, u, tiles=4, sort_key=key))
        np.testing.assert_array_equal(out, ref, err_msg=key)


def test_beam_pre_pass_bit_identity():
    """The conservative coarse pre-pass restarts the fine march at its entry
    t; restart-from-t re-derives every t from position, so hits (and the
    whole render) are bit-identical.  Needs depth >= 6 (coarser-than-leaf
    cells) and enough empty space for the beam to engage."""
    scene, cam = sphere_scene(depth=6)
    origins, dirs = pixel_grid_rays(cam, 6, 6)
    u = draw_uniforms(jax.random.PRNGKey(31), origins.shape[0], n_bounces=2)
    ref = np.asarray(trace_paths(scene, origins, dirs, u, tiles=1))
    out = np.asarray(
        trace_paths(scene, origins, dirs, u, tiles=1, beam=True)
    )
    np.testing.assert_array_equal(out, ref)


def test_drain_matches_under_high_quality_sun():
    """The drain's trace/shade split must hold with the shadow walk active
    (the binary walk runs inside the tiled shade)."""
    scene, o, d, u = _setup(seed=37, hq=True)
    ref = np.asarray(trace_paths(scene, o, d, u, tiles=1))
    out = np.asarray(trace_paths(scene, o, d, u, tiles=4, drain=True))
    np.testing.assert_array_equal(out, ref)


def test_drain_accept_scenes_bit_identical():
    """r5: the drain now covers accept-callback scenes (alpha cutouts, quad
    models) — restart-from-t under a STATELESS accept re-rejects re-seen
    candidates deterministically, so results must equal the single-phase
    path bit-for-bit on both cutout and quad-model scenes."""
    from octree_pathtracing_tpu.models import cutout_chunk_scene, plant_scene

    for name, (scene, cam) in (
        ("cutout", cutout_chunk_scene(depth=4)),
        ("plant-quads", plant_scene(depth=3)),
    ):
        assert not scene.opaque_only, name
        scene = dataclasses.replace(
            scene, sun_sampling=SunSampling.high_quality()
        )
        origins, dirs = pixel_grid_rays(cam, 8, 8)
        u = draw_uniforms(jax.random.PRNGKey(31), origins.shape[0],
                          n_bounces=3)
        ref = np.asarray(trace_paths(scene, origins, dirs, u, tiles=4,
                                     drain=False))
        old = pt.DRAIN_K1_SCHEDULE
        try:
            # tiny cap forces many drain rounds through the accept path
            pt.DRAIN_K1_SCHEDULE = (6, 6, 6, 6, 6)
            out = np.asarray(trace_paths(scene, origins, dirs, u, tiles=4,
                                         drain=True))
        finally:
            pt.DRAIN_K1_SCHEDULE = old
        np.testing.assert_array_equal(out, ref, err_msg=name)
        out2 = np.asarray(trace_paths(scene, origins, dirs, u, tiles=4,
                                      drain=True))
        np.testing.assert_array_equal(out2, ref, err_msg=name + " default k1")


def test_sort_schedule_bit_identity():
    """The compaction re-sort schedule (r5 ``sort_bounces``) is scheduling
    only: sorting at every bounce, at {1,2} (the auto default), at bounce 1
    only, or never must produce identical radiance (uniforms always ride
    the carried original index)."""
    scene, o, d, u = _setup(seed=37, n_bounces=4)
    ref = np.asarray(trace_paths(scene, o, d, u, tiles=4, sort_bounces=None))
    for sb in ("auto", (1,), (1, 2), ()):
        out = np.asarray(
            trace_paths(scene, o, d, u, tiles=4, sort_bounces=sb)
        )
        np.testing.assert_array_equal(out, ref, err_msg=str(sb))


def test_pooled_drained_sun_walk_bit_identical():
    """The pooled drained stateful sun walk (r5 ``pool_sun_walk=True`` —
    accept-state carried through restart-from-t, t_last re-record guard)
    must equal the per-tile walk bit-for-bit, including under a tiny
    phase-1 cap that forces many walk-drain rounds with partially-recorded
    surface lists."""
    from octree_pathtracing_tpu.models import cutout_chunk_scene

    scene, cam = cutout_chunk_scene(depth=4)
    scene = dataclasses.replace(scene, sun_sampling=SunSampling.high_quality())
    origins, dirs = pixel_grid_rays(cam, 8, 8)
    u = draw_uniforms(jax.random.PRNGKey(41), origins.shape[0], n_bounces=3)
    ref = np.asarray(trace_paths(scene, origins, dirs, u, tiles=4, drain=True))
    pooled = np.asarray(
        trace_paths(scene, origins, dirs, u, tiles=4, drain=True,
                    pool_sun_walk=True)
    )
    np.testing.assert_array_equal(pooled, ref)
    old = pt.DRAIN_K1_SCHEDULE
    old_steps = pt.DRAIN_STEPS
    try:
        pt.DRAIN_K1_SCHEDULE = (6, 6, 6, 6, 6)
        # DRAIN_STEPS also caps the WALK's phase 1 (runtime lookup): 2
        # forces every nontrivial walk through resume rounds with a
        # partially-recorded state and the t_last guard live
        pt.DRAIN_STEPS = 2
        tiny = np.asarray(
            trace_paths(scene, origins, dirs, u, tiles=4, drain=True,
                        pool_sun_walk=True)
        )
    finally:
        pt.DRAIN_K1_SCHEDULE = old
        pt.DRAIN_STEPS = old_steps
    np.testing.assert_array_equal(tiny, ref)
