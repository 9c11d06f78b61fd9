#!/usr/bin/env python
"""Headline benchmark: rays/s/chip forward+backward at a 512^3 octree.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md): the baseline value below is
this framework's own round-1 measurement on one TPU v5e chip; vs_baseline
tracks progress across rounds.

Env knobs: BENCH_DEPTH (default 9 -> 512^3), BENCH_RES (default 512),
BENCH_ITERS (default 5).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    depth = int(os.environ.get("BENCH_DEPTH", 9 if on_tpu else 5))
    res = int(os.environ.get("BENCH_RES", 256 if on_tpu else 64))
    iters = int(os.environ.get("BENCH_ITERS", 10 if on_tpu else 3))
    trials = int(os.environ.get("BENCH_TRIALS", 3))

    from octree_pathtracing_tpu.models import minecraft_chunk_scene
    from octree_pathtracing_tpu.models.camera import pixel_grid_rays
    from octree_pathtracing_tpu.parallel.shard import apply_params
    from octree_pathtracing_tpu.render import draw_uniforms, trace_paths
    from octree_pathtracing_tpu.render.pathtracer import MAX_BOUNCES

    t0 = time.time()
    scene, cam = minecraft_chunk_scene(
        depth=depth, cache_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    )
    build_s = time.time() - t0

    origins, dirs = pixel_grid_rays(cam, res, res)
    lanes = origins.shape[0]
    u = draw_uniforms(jax.random.PRNGKey(0), lanes)

    fwd = jax.jit(trace_paths)

    params = {"atlas": scene.atlas, "emittance": scene.materials.emittance}

    def loss_fn(p, o, d, uu):
        rad = trace_paths(apply_params(scene, p), o, d, uu)
        return jnp.mean(rad)

    fwdbwd = jax.jit(jax.grad(loss_fn))

    # warmup / compile
    t0 = time.time()
    jax.block_until_ready(fwd(scene, origins, dirs, u))
    fwd_compile_s = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(fwdbwd(params, origins, dirs, u))
    bwd_compile_s = time.time() - t0

    def steady_state(fn, *args):
        """Min-of-trials mean iteration time: back-to-back async dispatch
        (no host work in the loop), one block at the end; min over trials
        rejects host-contention outliers (tools/PERF_NOTES.md — the captured
        round-1 number was 4x low purely from a busy host)."""
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, (time.time() - t0) / iters)
        return best

    fwd_s = steady_state(fwd, scene, origins, dirs, u)
    fb_s = steady_state(fwdbwd, params, origins, dirs, u)

    # a "ray" = one traversal launch of one lane (primary or bounce),
    # the unit the reference's MAX_STEPS/bounce-cap envelope bounds.
    rays = lanes * MAX_BOUNCES
    fwd_rays_s = rays / fwd_s
    fb_rays_s = rays / fb_s

    # Round-1 self-baseline (BASELINE.md): fwd+bwd rays/s on 1 TPU v5e chip.
    baseline = float(os.environ.get("BENCH_BASELINE", 1.23e7)) if on_tpu else fb_rays_s

    diag = dict(
        backend=backend,
        depth=depth,
        res=res,
        n_nodes=int(scene.octree.n_nodes),
        n_bricks=int(scene.octree.bricks.shape[0])
        if hasattr(scene.octree, "bricks")
        else 0,
        octree_build_s=round(build_s, 2),
        fwd_compile_s=round(fwd_compile_s, 1),
        bwd_compile_s=round(bwd_compile_s, 1),
        fwd_rays_per_s=round(fwd_rays_s),
        fwd_ms=round(fwd_s * 1e3, 1),
        fwdbwd_ms=round(fb_s * 1e3, 1),
    )
    print("# " + json.dumps(diag), file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": f"rays/s/chip fwd+bwd, {1 << depth}^3 octree, {res}x{res}",
                "value": round(fb_rays_s),
                "unit": "rays/s",
                "vs_baseline": round(fb_rays_s / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
