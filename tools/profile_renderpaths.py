#!/usr/bin/env python
"""On-chip A/B of the render-path variants (run on the real TPU).

Times, steady-state (min of trials of back-to-back dispatch):
  1. plain lockstep traversal (ops/traversal.traverse) — primary rays
  2. brick-leaf traversal (ops/brick_traversal.traverse_brick) — primary rays
  3. tiled bounce-loop integrator (render/pathtracer.trace_paths) at several
     tile sizes
  4. fused persistent-wavefront integrator (render/megakernel)

Writes findings to stdout; PERF_NOTES.md records the verdicts.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5, trials=3):
    out = fn(*args)  # compile
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
    from octree_pathtracing_tpu.octree.brick import brickify
    from octree_pathtracing_tpu.ops.brick_traversal import traverse_brick
    from octree_pathtracing_tpu.ops.traversal import traverse
    from octree_pathtracing_tpu.render import draw_uniforms
    from octree_pathtracing_tpu.render.megakernel import trace_paths_fused
    from octree_pathtracing_tpu.render.pathtracer import trace_paths

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")
    scene, cam = minecraft_chunk_scene(depth=depth, cache_dir=cache)
    tree = scene.octree
    origins, dirs = pixel_grid_rays(cam, res, res)
    lanes = origins.shape[0]
    u = draw_uniforms(jax.random.PRNGKey(0), lanes)
    print(f"# scene depth={depth} nodes={tree.n_nodes} lanes={lanes}", flush=True)

    # --- raw primary traversal: plain vs brick ---
    # NOTE: pass arrays as ARGUMENTS, never closures — closed-over pools are
    # inlined as constants, which constant-folds pack_nodes over 28 MB at
    # trace time (minutes) and measured ~2x slower executables.
    plain = jax.jit(
        lambda cm, cd, o, d: traverse(
            cm, cd, tree.root, tree.scale(), o, d, depth=tree.depth
        )
    )
    t_plain = timeit(plain, tree.child_mask, tree.child_data, origins, dirs)
    r = plain(tree.child_mask, tree.child_data, origins, dirs)
    print(f"plain primary traverse: {t_plain*1e3:.1f} ms  steps={int(r.steps)}  "
          f"({lanes/t_plain/1e6:.2f}M rays/s)", flush=True)

    if os.environ.get("PROF_BRICK", "1") != "0":
        bt = brickify(
            type(tree)(
                child_mask=jnp.asarray(tree.child_mask),
                child_data=jnp.asarray(tree.child_data),
                root=tree.root,
                depth=tree.depth,
            )
            if not hasattr(tree, "bricks")
            else tree
        )
        brick = jax.jit(lambda bt_, o, d: traverse_brick(bt_, o, d))
        t_brick = timeit(brick, bt, origins, dirs)
        rb = brick(bt, origins, dirs)
        print(
            f"brick primary traverse: {t_brick*1e3:.1f} ms  steps={int(rb.steps)}  "
            f"({lanes/t_brick/1e6:.2f}M rays/s)  [{t_brick/t_plain:.2f}x plain]",
            flush=True,
        )

    # --- integrators ---
    for tiles in (1, 2, 4, 8, 16):
        if lanes % tiles:
            continue
        f = jax.jit(lambda sc, o, d, uu, t=tiles: trace_paths(sc, o, d, uu, tiles=t))
        dt = timeit(f, scene, origins, dirs, u)
        n_b = u.shape[1]
        print(
            f"trace_paths tiles={tiles:3d} (tile={lanes//tiles}): {dt*1e3:.1f} ms  "
            f"({lanes*n_b/dt/1e6:.2f}M rays/s)",
            flush=True,
        )

    fused = jax.jit(lambda sc, o, d, uu: trace_paths_fused(sc, o, d, uu))
    dt = timeit(fused, scene, origins, dirs, u)
    print(
        f"trace_paths_fused:      {dt*1e3:.1f} ms  ({lanes*u.shape[1]/dt/1e6:.2f}M rays/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
