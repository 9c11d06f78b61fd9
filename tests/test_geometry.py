"""Geometry ops: AABB/quad/sphere intersections + BVH vs brute force."""

import jax.numpy as jnp
import numpy as np

from octree_pathtracing_tpu.ops.bvh import build_bvh, bvh_intersect
from octree_pathtracing_tpu.ops.geometry import (
    aabb_intersect,
    make_quads,
    quad_hit,
    sphere_hit,
)


def test_aabb_slab():
    o = jnp.array([[-2.0, 0.5, 0.5], [0.5, 0.5, 0.5], [-2.0, 5.0, 0.5]])
    d = jnp.array([[1.0, 0.0, 0.0]] * 3)
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    t0, t1 = aabb_intersect(jnp.zeros(3), jnp.ones(3), o, inv)
    assert t0[0] == 2.0 and t1[0] == 3.0
    assert t0[1] < 0 < t1[1]  # origin inside
    assert t0[2] > t1[2]  # miss


def test_quad_hit_and_uv():
    # unit quad in xy plane at z=0, facing +z
    quads = make_quads(
        origins=[[0.0, 0.0, 0.0]],
        us=[[1.0, 0.0, 0.0]],
        vs=[[0.0, 1.0, 0.0]],
        material_ids=[3],
    )
    o = jnp.array([[0.25, 0.75, 2.0], [2.5, 0.5, 2.0], [0.5, 0.5, -1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]] * 3)
    qi = jnp.zeros(3, jnp.int32)
    vox = jnp.zeros((3, 3))
    ok, t, uu, vv = quad_hit(quads, qi, o, d, vox, jnp.full(3, jnp.inf))
    assert bool(ok[0]) and not bool(ok[1])
    assert not bool(ok[2])  # backface (normal +z, ray going -z hits front... )
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-6)
    np.testing.assert_allclose(float(uu[0]), 0.25, atol=1e-6)
    np.testing.assert_allclose(float(vv[0]), 0.75, atol=1e-6)


def test_quad_voxel_translation():
    quads = make_quads(
        origins=[[0.0, 0.0, 1.0]],
        us=[[1.0, 0.0, 0.0]],
        vs=[[0.0, 1.0, 0.0]],
        material_ids=[0],
    )
    o = jnp.array([[5.25, 3.5, 9.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    vox = jnp.array([[5.0, 3.0, 7.0]])  # quad plane at world z=8
    ok, t, uu, vv = quad_hit(
        quads, jnp.zeros(1, jnp.int32), o, d, vox, jnp.full(1, jnp.inf)
    )
    assert bool(ok[0])
    np.testing.assert_allclose(float(t[0]), 1.0, rtol=1e-6)


def test_sphere_hit():
    hit, t, uv, n = sphere_hit(
        jnp.array([0.0, 0.0, 0.0]),
        1.0,
        jnp.array([[-3.0, 0.0, 0.0], [-3.0, 2.0, 0.0]]),
        jnp.array([[1.0, 0.0, 0.0]] * 2),
    )
    assert bool(hit[0]) and not bool(hit[1])
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(n[0]), [-1, 0, 0], atol=1e-6)


def test_bvh_matches_bruteforce():
    rng = np.random.default_rng(0)
    q = 40
    origins = rng.uniform(0, 10, (q, 3)).astype(np.float32)
    us = np.zeros((q, 3), np.float32)
    vs = np.zeros((q, 3), np.float32)
    # axis-aligned unit quads facing +z
    us[:, 0] = 1.0
    vs[:, 1] = 1.0
    quads = make_quads(origins, us, vs, np.arange(q))
    pmin = np.minimum(origins, origins + us + vs) - 1e-4
    pmax = np.maximum(origins, origins + us + vs) + 1e-4
    bvh = build_bvh(pmin, pmax)

    b = 64
    ro = rng.uniform(-5, 15, (b, 3)).astype(np.float32)
    ro[:, 2] = 20.0
    rd = np.zeros((b, 3), np.float32)
    rd[:, 2] = -1.0

    def prim_fn(pid, o, d, t_best):
        vox = jnp.zeros_like(o)
        ok, t, uu, vv = quad_hit(quads, pid, o, d, vox, t_best)
        return ok, t, pid

    hit, t, payload = bvh_intersect(bvh, jnp.asarray(ro), jnp.asarray(rd), prim_fn)

    # brute force
    for i in range(b):
        best_t, best_q = np.inf, -1
        for qid in range(q):
            ok, tq, _, _ = quad_hit(
                quads,
                jnp.full(1, qid, jnp.int32),
                jnp.asarray(ro[i : i + 1]),
                jnp.asarray(rd[i : i + 1]),
                jnp.zeros((1, 3)),
                jnp.full(1, jnp.inf),
            )
            if bool(ok[0]) and float(tq[0]) < best_t:
                best_t, best_q = float(tq[0]), qid
        assert bool(hit[i]) == (best_q >= 0), i
        if best_q >= 0:
            np.testing.assert_allclose(float(t[i]), best_t, rtol=1e-5)
            assert int(payload[i]) == best_q, (i, int(payload[i]), best_q)
