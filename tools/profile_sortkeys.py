#!/usr/bin/env python
"""A/B the between-bounce compaction sort key on the real chip.

VERDICT r2 #2a: extend the compaction key from liveness to
(liveness, direction octant) so bounce tiles see directionally coherent rays.
Candidates:

- ``active``  — round-2 default: stable partition, live lanes keep pixel order
- ``octant``  — live lanes grouped by direction octant (argsort, stable
  within a group so positional coherence survives)
- ``morton``  — r4 (VERDICT r3 #3): live lanes grouped by the coarse Morton
  code of their bounce origin (hit-voxel position key) so tiles traverse
  spatially clustered wavefronts

Workload = the bench scene (depth-9 terrain, 256^2 primaries, 5 bounces).
Run on an idle chip; prints one JSON line per variant.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=10, trials=3):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from octree_pathtracing_tpu.models import minecraft_chunk_scene
    from octree_pathtracing_tpu.models.camera import pixel_grid_rays
    from octree_pathtracing_tpu.render import draw_uniforms
    from octree_pathtracing_tpu.render.pathtracer import trace_paths

    depth = int(os.environ.get("BENCH_DEPTH", 9))
    res = int(os.environ.get("BENCH_RES", 256))
    scene, cam = minecraft_chunk_scene(
        depth=depth,
        cache_dir=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache"
        ),
    )
    origins, dirs = pixel_grid_rays(cam, res, res)
    u = draw_uniforms(jax.random.PRNGKey(0), origins.shape[0])

    ref = None
    for key in ("active", "octant", "morton"):
        fn = jax.jit(lambda s, o, d, uu, k=key: trace_paths(s, o, d, uu, sort_key=k))
        t = bench(fn, scene, origins, dirs, u)
        out = np.asarray(fn(scene, origins, dirs, u))
        if ref is None:
            ref = out
        exact = bool(np.array_equal(out, ref))
        print(json.dumps(dict(sort_key=key, ms=round(t * 1e3, 2),
                              bit_exact_vs_active=exact)))


if __name__ == "__main__":
    main()
