#!/usr/bin/env python
"""Per-bounce, per-tile lockstep-iteration census (VERDICT r3 #3).

The wavefront integrator's cost is gather ITERATIONS (tools/PERF_NOTES.md):
each tile's ``while_loop`` runs until its slowest live lane finishes, so the
census shows where lockstep iterations exceed useful active steps — and
whether a compaction sort key (active / octant / morton) shrinks the total.

Mirrors ``_trace_paths_compacted``'s exact tiling/sort behavior but returns
(live lanes, loop iterations) per (bounce, tile).  Diagnostic only — the
production path stays lean.

Run on the idle chip: ``python tools/profile_itercensus.py``.
Env: BENCH_DEPTH/BENCH_RES (terrain scene), CENSUS_KEYS=active,morton.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from octree_pathtracing_tpu.render.pathtracer import (
    _auto_tiles,
    _init_state,
    _shade,
    _sort_state_by_active,
    _trace,
)


def iter_census(scene, origins, dirs, uniforms, t: int, sort_key: str):
    """-> (live (n_bounces, t), steps (n_bounces, t)) int32 arrays."""
    b = origins.shape[0]
    bt = b // t
    n_bounces = uniforms.shape[1]
    st = _init_state(origins, dirs)
    st["idx"] = jnp.arange(b, dtype=jnp.int32)
    extent = float(1 << scene.octree.depth)

    lives, steps = [], []
    for bounce in range(n_bounces):
        if bounce > 0:
            st = _sort_state_by_active(st, key=sort_key, extent=extent)
            u_b = jnp.take(uniforms[:, bounce, :], st["idx"], axis=0)
        else:
            u_b = uniforms[:, 0, :]
        is_first = bounce == 0
        may = bounce + 1 < n_bounces
        idx = st.pop("idx")

        def tile_fn(xs, first=is_first, m=may):
            st_t, u_t = xs
            res = _trace(
                scene, st_t["origin"], st_t["dir"],
                None if first else st_t["active"],
            )
            st2 = _shade(scene, st_t, u_t, res, first, m)
            return st2, (
                jnp.sum(st_t["active"].astype(jnp.int32)),
                res.steps,
            )

        st_tiles = jax.tree.map(lambda x: x.reshape((t, bt) + x.shape[1:]), st)
        u_tiles = u_b.reshape(t, bt, -1)
        st, (live_t, steps_t) = jax.lax.map(tile_fn, (st_tiles, u_tiles))
        st = jax.tree.map(lambda x: x.reshape((b,) + x.shape[2:]), st)
        st["idx"] = idx
        lives.append(live_t)
        steps.append(steps_t)
    return jnp.stack(lives), jnp.stack(steps)


def main():
    from octree_pathtracing_tpu.models import minecraft_chunk_scene
    from octree_pathtracing_tpu.models.camera import pixel_grid_rays
    from octree_pathtracing_tpu.render import draw_uniforms

    depth = int(os.environ.get("BENCH_DEPTH", 9))
    res = int(os.environ.get("BENCH_RES", 256))
    scene, cam = minecraft_chunk_scene(
        depth=depth,
        cache_dir=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".bench_cache",
        ),
    )
    origins, dirs = pixel_grid_rays(cam, res, res)
    u = draw_uniforms(jax.random.PRNGKey(0), origins.shape[0])
    t = _auto_tiles(origins.shape[0])

    keys = os.environ.get("CENSUS_KEYS", "active,morton").split(",")
    for key in keys:
        fn = jax.jit(lambda s, o, d, uu, k=key: iter_census(s, o, d, uu, t, k))
        live, stp = jax.block_until_ready(fn(scene, origins, dirs, u))
        live, stp = np.asarray(live), np.asarray(stp)
        print(
            json.dumps(
                dict(
                    sort_key=key,
                    tiles=t,
                    total_iters=int(stp.sum()),
                    per_bounce_iters=[int(x) for x in stp.sum(1)],
                    per_bounce_max_tile=[int(x) for x in stp.max(1)],
                    per_bounce_live=[int(x) for x in live.sum(1)],
                )
            )
        )


if __name__ == "__main__":
    main()
