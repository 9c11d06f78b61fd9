#!/usr/bin/env python
"""BASELINE config 5 at its ACTUAL shape, single chip (VERDICT r4 #2).

The gate row reads "512^3 octree, 8-bounce, 1024^2, multi-host ray-sharded";
every recorded number before r5 was a 256^2 x 5-bounce proxy.  This runs the
single-chip portion at the gate's own shape — 1,048,576 primary lanes,
8-bounce uniform block, depth-9 terrain — and reports fwd / fwd+bwd wall
time, rays/s, and device memory, so the row has a measurement at scale (the
multi-host axis remains certified by the virtual-mesh dryrun + scaling
curve; this host has one chip).

Run on the real TPU (idle host):  timeout 3600 python tools/config5_shape.py
Env: C5_RES (default 1024), C5_BOUNCES (8), C5_DEPTH (9), C5_ITERS (5).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    res = int(os.environ.get("C5_RES", 1024))
    n_bounces = int(os.environ.get("C5_BOUNCES", 8))
    depth = int(os.environ.get("C5_DEPTH", 9))
    iters = int(os.environ.get("C5_ITERS", 5))
    trials = int(os.environ.get("C5_TRIALS", 3))

    from octree_pathtracing_tpu.models import minecraft_chunk_scene
    from octree_pathtracing_tpu.models.camera import pixel_grid_rays
    from octree_pathtracing_tpu.parallel.shard import apply_params
    from octree_pathtracing_tpu.render import draw_uniforms, trace_paths

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
    )
    t0 = time.time()
    scene, cam = minecraft_chunk_scene(depth=depth, cache_dir=cache)
    build_s = time.time() - t0

    origins, dirs = pixel_grid_rays(cam, res, res)
    lanes = origins.shape[0]
    u = draw_uniforms(jax.random.PRNGKey(0), lanes, n_bounces=n_bounces)
    rays = lanes * n_bounces
    print(
        f"# lanes={lanes} bounces={n_bounces} depth={depth} "
        f"uniforms={u.nbytes / 1e6:.0f} MB",
        flush=True,
    )

    fwd = jax.jit(lambda s, o, d, uu: trace_paths(s, o, d, uu, skip_dead=True))
    params = {"atlas": scene.atlas, "emittance": scene.materials.emittance}

    def loss_fn(p, scene_, o, d, uu):
        rad = trace_paths(apply_params(scene_, p), o, d, uu)
        return jnp.mean(rad)

    fwdbwd = jax.jit(jax.grad(loss_fn))

    def mem_mb():
        try:
            st = jax.local_devices()[0].memory_stats()
            return round(st.get("bytes_in_use", 0) / 1e6)
        except Exception:
            return -1

    t0 = time.time()
    jax.block_until_ready(fwd(scene, origins, dirs, u))
    fwd_compile = time.time() - t0
    fwd_mem = mem_mb()
    t0 = time.time()
    jax.block_until_ready(fwdbwd(params, scene, origins, dirs, u))
    bwd_compile = time.time() - t0
    bwd_mem = mem_mb()

    def steady(fn, *args):
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, (time.time() - t0) / iters)
        return best

    fwd_s = steady(fwd, scene, origins, dirs, u)
    fb_s = steady(fwdbwd, params, scene, origins, dirs, u)

    print(
        json.dumps(
            dict(
                config="BASELINE-5 single-chip shape",
                res=res,
                bounces=n_bounces,
                depth=depth,
                lanes=lanes,
                rays_nominal=rays,
                octree_build_s=round(build_s, 1),
                fwd_compile_s=round(fwd_compile, 1),
                bwd_compile_s=round(bwd_compile, 1),
                fwd_ms=round(fwd_s * 1e3, 1),
                fwdbwd_ms=round(fb_s * 1e3, 1),
                fwd_rays_per_s=round(rays / fwd_s),
                fwdbwd_rays_per_s=round(rays / fb_s),
                hbm_in_use_mb_fwd=fwd_mem,
                hbm_in_use_mb_bwd=bwd_mem,
            )
        )
    )


if __name__ == "__main__":
    main()
