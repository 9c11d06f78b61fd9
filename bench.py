#!/usr/bin/env python
"""Headline benchmark: rays/s/chip forward+backward at a 512^3 octree.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md): the baseline value below is
this framework's own round-2 driver-recorded measurement on one TPU v5e chip
(BENCH_r02.json; derivation in BASELINE.md "Throughput baseline derivation");
vs_baseline tracks progress across rounds.

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
    from octree_pathtracing_tpu.render.pathtracer import MAX_BOUNCES, trace_paths_census

    t0 = time.time()
    scene, cam = minecraft_chunk_scene(
        depth=depth, cache_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    )
    build_s = time.time() - t0

    origins, dirs = pixel_grid_rays(cam, res, res)
    lanes = origins.shape[0]
    u = draw_uniforms(jax.random.PRNGKey(0), lanes)

    # skip_dead (whole-tile dead skip) pays in forward-only rendering (9% —
    # the Renderer's progressive loop default).  In fwd+bwd it CANNOT pay:
    # XLA's saved-residual backward is ~12 ms, while any custom-vjp variant
    # must remat at least the shading (measured: naive cond AD 114.7 ms,
    # full remat 173.5 ms, shade-only remat 110.5 ms vs 69.1 plain —
    # tools/PERF_NOTES round 3), so the differentiated path leaves it off.
    fwd = jax.jit(lambda s, o, d, uu: trace_paths(s, o, d, uu, skip_dead=True))

    params = {"atlas": scene.atlas, "emittance": scene.materials.emittance}

    # scene rides as a jit ARGUMENT, never a closure: closed-over pools
    # become inlined constants in the compile request (the 257 MB supernode
    # table overflows the axon remote-compile body limit, HTTP 413) and
    # constant-fold at trace time (tools/PERF_NOTES.md round 2)
    def loss_fn(p, scene_, o, d, uu):
        rad = trace_paths(apply_params(scene_, p), o, d, uu)
        return jnp.mean(rad)

    fwdbwd = jax.jit(jax.grad(loss_fn))

    # warmup / compile
    t0 = time.time()
    jax.block_until_ready(fwd(scene, origins, dirs, u))
    fwd_compile_s = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(fwdbwd(params, scene, origins, dirs, u))
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
    fb_s = steady_state(fwdbwd, params, scene, origins, dirs, u)

    # NEE diag line (VERDICT r3 #4): same terrain, HIGH_QUALITY sun strategy
    # — the stateful shadow walk (a second traversal per diffuse bounce,
    # path_tracer.rs:225-291, the reference's default-quality mode) gets its
    # own tracked numbers so regressions/wins there are visible round over
    # round.  Not the headline (protocol continuity with the r2/r3 floors).
    import dataclasses as _dc

    from octree_pathtracing_tpu.models.sun import SunSampling

    scene_nee = _dc.replace(scene, sun_sampling=SunSampling.high_quality())
    # NEE fwd uses the drain (not skip_dead): with per-bounce shadow walks
    # the straggler drain wins big (r4: 293 ms fwd+bwd vs 378 ms fwd under
    # skip_dead on this line — shadow-heavy scenes are drain's best case)
    fwd_nee = jax.jit(lambda s, o, d, uu: trace_paths(s, o, d, uu))
    fwdbwd_nee = jax.jit(jax.grad(loss_fn))
    jax.block_until_ready(fwd_nee(scene_nee, origins, dirs, u))
    jax.block_until_ready(fwdbwd_nee(params, scene_nee, origins, dirs, u))
    nee_fwd_s = steady_state(fwd_nee, scene_nee, origins, dirs, u)
    nee_fb_s = steady_state(fwdbwd_nee, params, scene_nee, origins, dirs, u)
    _, live_nee = jax.jit(trace_paths_census)(scene_nee, origins, dirs, u)
    live_nee = int(np.asarray(jax.block_until_ready(live_nee)).sum())

    # Stateful-walk diag line (VERDICT r4 #1): cutout/translucent terrain
    # (leaf canopies with alpha holes + translucent water) forces
    # shadow_binary=False AND opaque_only=False — the general 4-surface
    # alpha walk per diffuse bounce plus accept-callback traversal, the
    # configuration resource-pack worlds (leaves, glass) are in.  The r4
    # NEE line above measures only the all-opaque binary specialization.
    from octree_pathtracing_tpu.models import cutout_chunk_scene

    scene_cut, cam_cut = cutout_chunk_scene(
        depth=depth,
        cache_dir=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".bench_cache"
        ),
    )
    scene_cut = _dc.replace(scene_cut, sun_sampling=SunSampling.high_quality())
    o_cut, d_cut = pixel_grid_rays(cam_cut, res, res)
    params_cut = {
        "atlas": scene_cut.atlas,
        "emittance": scene_cut.materials.emittance,
    }
    fwd_cut = jax.jit(lambda s, o, d, uu: trace_paths(s, o, d, uu))
    fwdbwd_cut = jax.jit(jax.grad(loss_fn))
    jax.block_until_ready(fwd_cut(scene_cut, o_cut, d_cut, u))
    jax.block_until_ready(fwdbwd_cut(params_cut, scene_cut, o_cut, d_cut, u))
    cut_fwd_s = steady_state(fwd_cut, scene_cut, o_cut, d_cut, u)
    cut_fb_s = steady_state(fwdbwd_cut, params_cut, scene_cut, o_cut, d_cut, u)
    _, live_cut = jax.jit(trace_paths_census)(scene_cut, o_cut, d_cut, u)
    live_cut = int(np.asarray(jax.block_until_ready(live_cut)).sum())

    # a "ray" = one traversal launch of one lane (primary or bounce),
    # the unit the reference's MAX_STEPS/bounce-cap envelope bounds.  The
    # NOMINAL convention counts lanes*bounces; the LIVE census counts only
    # lanes that actually enter a bounce active (compaction's whole point is
    # that terminated lanes don't traverse — VERDICT r2 #8: report both so
    # early-exit changes can't silently inflate the headline).
    rays = lanes * MAX_BOUNCES
    _, live = jax.jit(trace_paths_census)(scene, origins, dirs, u)
    live = np.asarray(jax.block_until_ready(live))
    live_rays = int(live.sum())
    fwd_rays_s = rays / fwd_s
    fb_rays_s = rays / fb_s

    # Self-baseline (BASELINE.md "Throughput baseline derivation"): each
    # round's driver artifact is the next round's floor — r5 ratchets to the
    # BENCH_r04.json value 5.31e6 (r4: 5.06e6; r3: 4.75e6; the round-1
    # constant 1.23e7 was never reproducible at the recorded protocol and is
    # retired, VERDICT r2 weak #2).
    baseline = float(os.environ.get("BENCH_BASELINE", 5.31e6)) if on_tpu else fb_rays_s

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
        rays_nominal=rays,
        rays_live=live_rays,
        live_fracs=[round(float(x) / lanes, 3) for x in live],
        live_rays_per_s_fwdbwd=round(live_rays / fb_s),
    )
    print("# " + json.dumps(diag), file=sys.stderr)
    nee_diag = dict(
        scene="terrain+NEE(high_quality)",
        nee_fwd_ms=round(nee_fwd_s * 1e3, 1),
        nee_fwdbwd_ms=round(nee_fb_s * 1e3, 1),
        nee_rays_per_s_fwdbwd=round(rays / nee_fb_s),
        rays_live=live_nee,
        live_rays_per_s_fwdbwd=round(live_nee / nee_fb_s),
    )
    print("# " + json.dumps(nee_diag), file=sys.stderr)
    cut_diag = dict(
        scene="cutout-terrain+NEE(high_quality) [stateful walk]",
        cut_fwd_ms=round(cut_fwd_s * 1e3, 1),
        cut_fwdbwd_ms=round(cut_fb_s * 1e3, 1),
        cut_rays_per_s_fwdbwd=round(rays / cut_fb_s),
        rays_live=live_cut,
        live_rays_per_s_fwdbwd=round(live_cut / cut_fb_s),
        n_nodes=int(scene_cut.octree.n_nodes),
    )
    print("# " + json.dumps(cut_diag), file=sys.stderr)
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
