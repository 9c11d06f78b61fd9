#!/usr/bin/env python
"""Decompose the drained forward bench: traversal vs shade vs sort shares.

Run on the real TPU (idle host).  Times, min-of-trials steady state:
  - the drained traversal alone on the primary wavefront (all lanes live);
  - trace_paths(drain) truncated to k bounces (k = 1..5) — the increments
    isolate per-bounce (traversal + shade + sort) cost at the census's live
    fractions;
  - the compaction stable-partition alone (two packed row-gathers).

The split tells which lever matters next: fewer lockstep iterations
(traversal), fewer fixed-cost gathers (shade), or cheaper permutations.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, trials=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    depth = int(os.environ.get("PROF_DEPTH", 9))
    res = int(os.environ.get("PROF_RES", 256))

    from octree_pathtracing_tpu.models import minecraft_chunk_scene
    from octree_pathtracing_tpu.models.camera import pixel_grid_rays
    from octree_pathtracing_tpu.render import draw_uniforms
    from octree_pathtracing_tpu.render.pathtracer import (
        _auto_tiles,
        _init_state,
        _sort_state_by_active,
        _traverse_drain,
        trace_paths,
    )

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache"
    )
    scene, cam = minecraft_chunk_scene(depth=depth, cache_dir=cache)
    origins, dirs = pixel_grid_rays(cam, res, res)
    lanes = origins.shape[0]
    t = _auto_tiles(lanes)
    u_full = draw_uniforms(jax.random.PRNGKey(0), lanes)
    print(f"# depth={depth} lanes={lanes} tiles={t}", flush=True)

    sg = jax.lax.stop_gradient

    def trav0(s, o, d):
        s_sg = jax.tree.map(sg, s)
        return _traverse_drain(s_sg, o, d, None, t).t

    ms = timeit(jax.jit(trav0), scene, origins, dirs) * 1e3
    print(f"primary drained traversal alone: {ms:.1f} ms", flush=True)

    def sort_only(s_state):
        return _sort_state_by_active(s_state)["origin"]

    st = _init_state(origins, dirs)
    st["idx"] = jnp.arange(lanes, dtype=jnp.int32)
    ms = timeit(jax.jit(sort_only), st) * 1e3
    print(f"one compaction stable-partition: {ms:.2f} ms", flush=True)

    prev = 0.0
    for k in range(1, u_full.shape[1] + 1):
        u_k = u_full[:, :k, :]
        f = jax.jit(lambda s, o, d, uu: trace_paths(s, o, d, uu))
        ms = timeit(f, scene, origins, dirs, u_k) * 1e3
        print(
            f"trace_paths drain, {k} bounce(s): {ms:.1f} ms"
            f"  (+{ms - prev:.1f})",
            flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()
