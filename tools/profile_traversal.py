#!/usr/bin/env python
"""Decompose the traversal while-loop's per-iteration cost on real hardware.

Times per-iteration cost vs (a) batch size, (b) gather on/off, (c) stack rows,
by timing `traverse` and dividing by the executed step count.  Informs the
kernel strategy (SURVEY.md §7 hard parts a-c).

Usage: python tools/profile_traversal.py [depth]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    from octree_pathtracing_tpu.models import minecraft_chunk_scene
    from octree_pathtracing_tpu.models.camera import pixel_grid_rays
    from octree_pathtracing_tpu.ops.traversal import traverse

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")
    scene, cam = minecraft_chunk_scene(depth=depth, cache_dir=cache)
    tree = scene.octree
    print(f"nodes={int(tree.n_nodes)} depth={tree.depth}", file=sys.stderr)

    res = 512
    origins, dirs = pixel_grid_rays(cam, res, res)
    origins = np.asarray(origins)
    dirs = np.asarray(dirs)

    for b in (1024, 2048, 4096, 8192, 16384, 65536):
        idx = np.arange(b) * (origins.shape[0] // b)
        o = jnp.asarray(origins[idx])
        d = jnp.asarray(dirs[idx])

        fn = jax.jit(
            lambda o, d: traverse(
                tree.child_mask, tree.child_data, tree.root, tree.scale(),
                o, d, depth=tree.depth,
            )
        )
        dt, out = timeit(fn, o, d)
        steps = int(out.steps)
        print(
            f"B={b:6d} steps={steps:4d} total={dt*1e3:7.2f} ms "
            f"per_iter={dt/steps*1e6:7.2f} us per_iter_per_lane={dt/steps/b*1e9:6.2f} ns"
        )


if __name__ == "__main__":
    main()
