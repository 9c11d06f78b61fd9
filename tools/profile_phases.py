#!/usr/bin/env python
"""Per-phase decomposition of the drained headline bench (VERDICT r4 weak #1).

Replays the drain integrator bounce by bounce with each phase jitted
SEPARATELY — compaction sort, drained traversal, tiled shade — timing every
phase at its true per-bounce inputs (the state produced by the previous
phases), plus the fwd-vs-fwd+bwd difference for the backward share.  The
sum of phases should land near the fused fwd number (they fuse less well
apart, so expect a few ms of overhead); the RATIOS are the deliverable:
they name the binding cost.

Run on the real TPU (idle host):  timeout 1800 python tools/profile_phases.py
Env: PROF_DEPTH (9), PROF_RES (256), PROF_SCENE (chunk|cutout).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, trials=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def main():
    depth = int(os.environ.get("PROF_DEPTH", 9))
    res = int(os.environ.get("PROF_RES", 256))
    which = os.environ.get("PROF_SCENE", "chunk")

    import dataclasses as dc

    from octree_pathtracing_tpu.models import (
        cutout_chunk_scene,
        minecraft_chunk_scene,
    )
    from octree_pathtracing_tpu.models.camera import pixel_grid_rays
    from octree_pathtracing_tpu.models.sun import SunSampling
    from octree_pathtracing_tpu.parallel.shard import apply_params
    from octree_pathtracing_tpu.render import draw_uniforms, trace_paths
    import octree_pathtracing_tpu.render.pathtracer as pt

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
    )
    if which == "cutout":
        scene, cam = cutout_chunk_scene(depth=depth, cache_dir=cache)
        scene = dc.replace(scene, sun_sampling=SunSampling.high_quality())
    else:
        scene, cam = minecraft_chunk_scene(depth=depth, cache_dir=cache)
    origins, dirs = pixel_grid_rays(cam, res, res)
    b = origins.shape[0]
    t = pt._auto_tiles(b)
    bt = b // t
    u_full = draw_uniforms(jax.random.PRNGKey(0), b)
    n_bounces = u_full.shape[1]
    print(f"# scene={which} depth={depth} lanes={b} tiles={t}", flush=True)

    sg = jax.lax.stop_gradient
    extent = float(1 << scene.octree.depth)

    from octree_pathtracing_tpu.render.hit import make_accept_fn

    @jax.jit
    def sort_fn(st):
        return pt._sort_state_by_active(st, extent=extent)

    def _trav_impl(scene_, st, first):
        scene_sg = jax.tree.map(sg, scene_)
        return pt._traverse_drain(
            scene_sg,
            sg(st["origin"]),
            sg(st["dir"]),
            None if first else sg(st["active"]),
            t,
            accept_builder=None
            if scene_.opaque_only
            else (lambda o, d: make_accept_fn(scene_sg, o, d)),
        )

    trav_jits = {
        f: jax.jit(lambda s, st, f=f: _trav_impl(s, st, f))
        for f in (True, False)
    }
    trav_fn = lambda s, st, first: trav_jits[first](s, st)

    def shade_impl(scene_, st, u_b, res, first, may):
        idx = st.pop("idx")
        st_tiles = jax.tree.map(lambda x: x.reshape((t, bt) + x.shape[1:]), st)
        u_tiles = u_b.reshape(t, bt, -1)
        res = res._replace(steps=jnp.broadcast_to(res.steps, (t,)))
        res_tiles = jax.tree.map(
            lambda x: x.reshape((t, bt) + x.shape[1:])
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] == b
            else x,
            res,
        )

        def shade_one(xs, first=first, m=may):
            st_t, u_t, res_t = xs
            if first:
                return pt._shade(scene_, st_t, u_t, res_t, first, m)
            return jax.lax.cond(
                jnp.any(st_t["active"]),
                lambda a: pt._shade(scene_, a[0], a[1], a[2], first, m),
                lambda a: a[0],
                (st_t, u_t, res_t),
            )

        out = jax.tree.map(
            lambda x: x.reshape((b,) + x.shape[2:]),
            jax.lax.map(shade_one, (st_tiles, u_tiles, res_tiles)),
        )
        out["idx"] = idx
        st["idx"] = idx
        return out

    shade_jits = {
        (first, may): jax.jit(
            lambda s, st, u_b, r, first=first, may=may: shade_impl(
                s, st, u_b, r, first, may
            )
        )
        for first in (True, False)
        for may in (True, False)
    }

    # replay bounce by bounce, timing each phase at its true inputs
    st = pt._init_state(origins, dirs)
    st["idx"] = jnp.arange(b, dtype=jnp.int32)
    rows = []
    tot = dict(sort=0.0, trav=0.0, shade=0.0)
    for bounce in range(n_bounces):
        first = bounce == 0
        may = bounce + 1 < n_bounces
        row = dict(bounce=bounce)
        if not first:
            row["sort_ms"] = timeit(sort_fn, st)
            st = jax.block_until_ready(sort_fn(st))
            u_b = jnp.take(u_full[:, bounce, :], st["idx"], axis=0)
            tot["sort"] += row["sort_ms"]
        else:
            u_b = u_full[:, 0, :]
        row["trav_ms"] = timeit(trav_fn, scene, st, first)
        res = jax.block_until_ready(trav_fn(scene, st, first))
        tot["trav"] += row["trav_ms"]
        shade = shade_jits[(first, may)]
        row["shade_ms"] = timeit(shade, scene, st, u_b, res)
        st = jax.block_until_ready(shade(scene, st, u_b, res))
        tot["shade"] += row["shade_ms"]
        row["live"] = int(np.asarray(st["active"]).sum())
        rows.append(row)
        print(row, flush=True)

    # fused references
    fwd = jax.jit(lambda s, o, d, uu: trace_paths(s, o, d, uu))
    params = {"atlas": scene.atlas, "emittance": scene.materials.emittance}

    def loss_fn(p, s, o, d, uu):
        return jnp.mean(trace_paths(apply_params(s, p), o, d, uu))

    fwdbwd = jax.jit(jax.grad(loss_fn))
    fwd_ms = timeit(fwd, scene, origins, dirs, u_full, iters=10)
    fb_ms = timeit(fwdbwd, params, scene, origins, dirs, u_full, iters=10)
    print(
        f"# phase sums: sort {tot['sort']:.1f} trav {tot['trav']:.1f} "
        f"shade {tot['shade']:.1f} = {sum(tot.values()):.1f} ms "
        f"(unfused replay)",
        flush=True,
    )
    print(
        f"# fused fwd {fwd_ms:.1f} ms, fwd+bwd {fb_ms:.1f} ms "
        f"(backward share {fb_ms - fwd_ms:.1f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
