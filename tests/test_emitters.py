"""EmitterSampling.ONE: leaf enumeration, table build, oracle parity,
convergence vs brute force, and gradient flow.

The reference declares the strategy but never implements the sampling
(``/root/reference/src/scene/mod.rs:39-57``); these tests pin down this
framework's definition (``models/emitters.py``).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from octree_pathtracing_tpu.models import cornell_scene, emissive_room_scene
from octree_pathtracing_tpu.models.camera import pixel_grid_rays
from octree_pathtracing_tpu.models.emitters import build_emitter_table
from octree_pathtracing_tpu.models.scene import EmitterSampling
from octree_pathtracing_tpu.octree.build import build_octree
from octree_pathtracing_tpu.octree.leaves import enumerate_leaves
from octree_pathtracing_tpu.render import (
    draw_uniforms,
    scene_to_numpy,
    trace_path_oracle,
    trace_paths,
)


def test_enumerate_leaves_roundtrip():
    """Leaf enumeration must reproduce the exact voxel set (incl. cells the
    builder LOD-collapsed into bigger leaves)."""
    rng = np.random.default_rng(7)
    depth, s = 4, 16
    grid = np.zeros((s, s, s), np.uint32)
    # a solid 4^3 block (collapses), plus random scattered voxels
    grid[4:8, 4:8, 4:8] = 3
    pts = rng.integers(0, s, (40, 3))
    grid[pts[:, 0], pts[:, 1], pts[:, 2]] = rng.integers(1, 6, 40).astype(np.uint32)
    coords = np.argwhere(grid != 0)
    tree = build_octree(coords, grid[grid != 0], depth)

    pos, size, val = enumerate_leaves(
        tree.child_mask, tree.child_data, tree.root, tree.depth
    )
    recon = np.zeros_like(grid)
    for p, sz, v in zip(pos, size, val):
        recon[p[0] : p[0] + sz, p[1] : p[1] + sz, p[2] : p[2] + sz] = v
    np.testing.assert_array_equal(recon, grid)
    assert (size > 1).any()  # the solid block did collapse


def test_emitter_table_cornell():
    scene, _ = cornell_scene(depth=4)
    em = build_emitter_table(
        scene.octree, scene.leaf_material, scene.materials, scene.models
    )
    assert em is not None and em.count > 0
    # all table entries are the ceiling light (material 4, y at the top layer)
    assert np.all(np.asarray(em.mat) == 4)
    s = 1 << scene.octree.depth
    assert np.all(np.asarray(em.pos)[:, 1] == s - 1)
    # covered area equals the patch area (q x q at depth>=2)
    q = s // 4
    covered = float(np.sum(np.asarray(em.size) ** 2))
    assert covered == float(q * q)


def test_emitter_nee_oracle_parity():
    scene, cam = emissive_room_scene(depth=3)
    assert scene.emitters is not None and scene.emitter_sampling == "one"
    origins, dirs = pixel_grid_rays(cam, 8, 6)
    u = draw_uniforms(jax.random.PRNGKey(11), origins.shape[0], n_bounces=3)
    got = np.asarray(trace_paths(scene, origins, dirs, u))
    assert np.isfinite(got).all() and got.mean() > 1e-4

    sc = scene_to_numpy(scene)
    u_np = np.asarray(u, np.float64)
    o_np, d_np = np.asarray(origins, np.float64), np.asarray(dirs, np.float64)
    # All 48 lanes must match (VERDICT r4 #8: the tolerance that allowed 2
    # mismatching lanes was re-audited 2026-08-21 — zero lanes diverge at the
    # current code state; the historical mismatches predate the r4 shadow-walk
    # rework and no longer reproduce, so the allowance is retired).
    bad = 0
    worst = None
    for i in range(origins.shape[0]):
        expect = trace_path_oracle(sc, o_np[i], d_np[i], u_np[i])
        if not np.allclose(got[i], expect, rtol=2e-3, atol=2e-3):
            bad += 1
            worst = (i, got[i], expect)
    assert bad == 0, (bad, worst)


def test_emitter_nee_matches_brute_force_mean():
    """Closed room: ONE (NEE) and NONE (BSDF-sampled) estimate the same
    direct-light integral — with 2/3 bounces respectively neither sees any
    other transport, so the mean images must agree."""
    scene, cam = emissive_room_scene(depth=3)
    origins, dirs = pixel_grid_rays(cam, 8, 8)
    b = origins.shape[0]
    scene_none = dataclasses.replace(
        scene, emitter_sampling=EmitterSampling.NONE
    )

    def mean_img(sc, n_bounces, spp, seed):
        f = jax.jit(lambda o, d, u: trace_paths(sc, o, d, u))
        acc = np.zeros((b, 3))
        for k in range(spp):
            u = draw_uniforms(
                jax.random.PRNGKey(seed + k), b, n_bounces=n_bounces
            )
            acc += np.asarray(f(origins, dirs, u))
        return acc / spp

    # ONE: NEE at the first hit only (2 bounces); NONE: one BSDF scatter may
    # hit the ceiling (3 bounces so the emit term can fire at bounce 1)
    img_nee = mean_img(scene, 2, 64, 100)
    img_bsdf = mean_img(scene_none, 3, 256, 900)
    # pooled means (anti-correlated per-pixel noise averages out)
    m_nee, m_bsdf = img_nee.mean(), img_bsdf.mean()
    assert m_nee > 0.01 and m_bsdf > 0.01
    assert abs(m_nee - m_bsdf) / m_bsdf < 0.08, (m_nee, m_bsdf)
    # NEE converges radically faster: per-pixel deviation from the smooth
    # truth is much lower at 1/4 the samples
    assert np.abs(img_nee - img_bsdf).mean() < 0.6 * img_bsdf.mean()


def test_emitter_one_block_and_all_oracle_parity():
    """ONE_BLOCK / ALL (scene/mod.rs:49-57, declared-only there) match the
    scalar oracle lane-for-lane."""
    scene, cam = emissive_room_scene(depth=3)
    origins, dirs = pixel_grid_rays(cam, 4, 3)
    u = draw_uniforms(jax.random.PRNGKey(23), origins.shape[0], n_bounces=2)
    u_np = np.asarray(u, np.float64)
    o_np, d_np = np.asarray(origins, np.float64), np.asarray(dirs, np.float64)

    for strat in (EmitterSampling.ONE_BLOCK, EmitterSampling.ALL):
        sc_j = dataclasses.replace(scene, emitter_sampling=strat)
        got = np.asarray(trace_paths(sc_j, origins, dirs, u))
        assert np.isfinite(got).all() and got.mean() > 1e-4, strat
        sc = scene_to_numpy(sc_j)
        bad = 0
        worst = None
        for i in range(origins.shape[0]):
            expect = trace_path_oracle(sc, o_np[i], d_np[i], u_np[i])
            if not np.allclose(got[i], expect, rtol=2e-3, atol=5e-3):
                bad += 1
                worst = (i, got[i], expect)
        assert bad == 0, (strat, bad, worst)


def test_emitter_strategy_means_agree_and_all_is_lowest_variance():
    """The three estimators integrate the same direct light: their mean
    images agree, and ALL (deterministic block sum) has the least per-pixel
    noise at equal spp."""
    scene, cam = emissive_room_scene(depth=3)
    origins, dirs = pixel_grid_rays(cam, 6, 6)
    b = origins.shape[0]

    def mean_img(strat, spp, seed):
        sc = dataclasses.replace(scene, emitter_sampling=strat)
        f = jax.jit(lambda o, d, u: trace_paths(sc, o, d, u))
        acc = np.zeros((b, 3))
        for k in range(spp):
            u = draw_uniforms(jax.random.PRNGKey(seed + k), b, n_bounces=2)
            acc += np.asarray(f(origins, dirs, u))
        return acc / spp

    ref = mean_img(EmitterSampling.ALL, 48, 0)  # near-noiseless reference
    img_one = mean_img(EmitterSampling.ONE, 8, 500)
    img_blk = mean_img(EmitterSampling.ONE_BLOCK, 8, 700)
    img_all = mean_img(EmitterSampling.ALL, 8, 900)
    for name, img in [("one", img_one), ("one_block", img_blk), ("all", img_all)]:
        assert abs(img.mean() - ref.mean()) / ref.mean() < 0.12, (name, img.mean(), ref.mean())
    err_one = np.abs(img_one - ref).mean()
    err_all = np.abs(img_all - ref).mean()
    assert err_all < 0.7 * err_one, (err_all, err_one)


def test_emitter_nee_gradients_flow():
    """Emittance and atlas gradients must flow through the NEE term (the
    emitter's own texels light the scene differentiably)."""
    scene, cam = emissive_room_scene(depth=3)
    origins, dirs = pixel_grid_rays(cam, 4, 4)
    u = draw_uniforms(jax.random.PRNGKey(3), origins.shape[0], n_bounces=2)

    def loss(emitt):
        m = dataclasses.replace(scene.materials, emittance=emitt)
        sc = dataclasses.replace(scene, materials=m)
        return jnp.mean(trace_paths(sc, origins, dirs, u))

    g = jax.grad(loss)(scene.materials.emittance)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert abs(g[2]) > 1e-6  # material 2 = the ceiling light

    # finite-difference check on the emitter material's emittance
    e0 = np.asarray(scene.materials.emittance)
    eps = 1e-2
    ep, em_ = e0.copy(), e0.copy()
    ep[2] += eps
    em_[2] -= eps
    fd = (float(loss(jnp.asarray(ep))) - float(loss(jnp.asarray(em_)))) / (2 * eps)
    np.testing.assert_allclose(float(g[2]), fd, rtol=5e-3, atol=1e-6)


def test_spatial_pick_pdf_is_exact_and_unbiased():
    """The spatial mixture sampler's realized pdf must integrate to 1 over
    the emitter table at any shading point (sum over all emitters of
    p(e | x) == 1), and the sampled histogram must match the pdf."""
    import jax

    from octree_pathtracing_tpu.models import scattered_lights_scene
    from octree_pathtracing_tpu.models.emitters import _spatial_pick

    scene, _ = scattered_lights_scene(depth=5, n_lights=40)
    em = scene.emitters
    assert em is not None and em.grid_idx is not None
    e = em.count
    s = 32.0
    pts = jnp.asarray(
        np.random.default_rng(0).uniform(1, s - 1, (16, 3)), jnp.float32
    )

    # analytic pdf per (point, emitter): lam/E + (1-lam)*w if in cell list
    g = 1 << em.grid_bits
    cell = np.clip(
        (np.asarray(pts) / em.cell_size).astype(np.int64), 0, g - 1
    )
    c = (cell[:, 0] * g + cell[:, 1]) * g + cell[:, 2]
    gi = np.asarray(em.grid_idx)[c]  # (P, K)
    gw = np.asarray(em.grid_w)[c]
    pdf = np.full((pts.shape[0], e), em.lam / e)
    for pi in range(pts.shape[0]):
        for j in range(gi.shape[1]):
            pdf[pi, gi[pi, j]] += (1 - em.lam) * gw[pi, j]
    np.testing.assert_allclose(pdf.sum(axis=1), 1.0, rtol=1e-5)

    # histogram check at one point
    n = 40000
    u = np.asarray(jax.random.uniform(jax.random.PRNGKey(4), (n,)))
    p0 = jnp.broadcast_to(pts[3], (n, 3))
    idx, inv_p = _spatial_pick(em, p0, jnp.asarray(u, jnp.float32))
    idx = np.asarray(idx)
    hist = np.bincount(idx, minlength=e) / n
    np.testing.assert_allclose(hist, pdf[3], atol=4.0 / np.sqrt(n))
    # realized inv_pdf equals the analytic one for every sample
    np.testing.assert_allclose(
        np.asarray(inv_p), 1.0 / pdf[3, idx], rtol=1e-4
    )


def test_spatial_pick_beats_uniform_variance():
    """On a scattered-emitter scene the spatially-selected ONE estimator must
    (a) agree in mean with the uniform-pick estimator (both unbiased) and
    (b) have materially lower error at equal spp (VERDICT r4 #4 criterion)."""
    import dataclasses

    from octree_pathtracing_tpu.models import scattered_lights_scene
    from octree_pathtracing_tpu.models.emitters import EmitterTable

    scene, cam = scattered_lights_scene(depth=5, n_lights=150)
    em = scene.emitters
    assert em.count >= 100
    em_uniform = EmitterTable(pos=em.pos, size=em.size, mat=em.mat)
    scene_u = dataclasses.replace(scene, emitters=em_uniform)
    origins, dirs = pixel_grid_rays(cam, 6, 6)
    b = origins.shape[0]

    def imgs(sc, spp, seed):
        f = jax.jit(lambda o, d, u: trace_paths(sc, o, d, u))
        out = []
        for k in range(spp):
            u = draw_uniforms(jax.random.PRNGKey(seed + k), b, n_bounces=2)
            out.append(np.asarray(f(origins, dirs, u)))
        return np.stack(out)

    spp = 48
    a_sp = imgs(scene, spp, 10)
    a_un = imgs(scene_u, spp, 10)
    ref = imgs(scene, 160, 5000).mean(0)  # near-converged (unbiased) truth
    m_sp, m_un = a_sp.mean(0), a_un.mean(0)
    # (a) unbiasedness: both means near the converged reference
    assert abs(m_sp.mean() - ref.mean()) / ref.mean() < 0.12
    assert abs(m_un.mean() - ref.mean()) / ref.mean() < 0.25
    # (b) error: spatial pick materially lower at equal spp
    err_sp = np.abs(m_sp - ref).mean()
    err_un = np.abs(m_un - ref).mean()
    assert err_sp < 0.6 * err_un, (err_sp, err_un)


def test_emitter_all_refuses_large_tables():
    """EmitterSampling.ALL is O(E) traversals per bounce; it must refuse to
    compile against a large table instead of silently crawling."""
    import dataclasses

    import pytest

    from octree_pathtracing_tpu.models import scattered_lights_scene

    scene, cam = scattered_lights_scene(depth=5, n_lights=150)
    scene = dataclasses.replace(scene, emitter_sampling=EmitterSampling.ALL)
    origins, dirs = pixel_grid_rays(cam, 4, 4)
    u = draw_uniforms(jax.random.PRNGKey(0), origins.shape[0], n_bounces=2)
    with pytest.raises(ValueError, match="EmitterSampling.ALL"):
        trace_paths(scene, origins, dirs, u)
