#!/usr/bin/env python
"""Virtual-device scaling-efficiency curve for the sharded renderer.

BASELINE gate: >=85% rays/s efficiency from 1 chip -> 1 host -> >=2 hosts.
No multi-chip hardware is reachable from this build machine, so this measures
the *sharding mechanics* on the XLA CPU backend with N virtual devices: weak
scaling (fixed lanes per device), mesh (dp=k), k = 1,2,4,8.

Interpretation caveat (recorded with the numbers in BASELINE.md): virtual CPU
devices share the host's physical cores — on an M-core host, k>M devices
time-slice, so wall-clock efficiency is bounded by M/k regardless of the
framework. The quantity this curve CAN certify is the sharding overhead:
per-device work is embarrassingly parallel (scene replicated, no collective
until the final pmean over 3xB floats), so any efficiency loss beyond the
core bound is framework overhead.  Efficiency is therefore reported both raw
(T1/Tk) and core-normalized (T1/Tk * k/min(k, M)).

Usage: python tools/scaling_curve.py   (sets its own CPU/8-device env)
"""

import json
import os
import sys
import time

if "XLA_FLAGS" not in os.environ or "device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
        + " --xla_llvm_disable_expensive_passes=true"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from octree_pathtracing_tpu.models import sphere_scene
from octree_pathtracing_tpu.models.camera import pixel_grid_rays
from octree_pathtracing_tpu.ops.shading import N_UNIFORMS
from octree_pathtracing_tpu.parallel import sharded_render
from octree_pathtracing_tpu.parallel.mesh import DP_AXIS, SP_AXIS
from octree_pathtracing_tpu.parallel.shard import sharded_train_step
from octree_pathtracing_tpu.render import draw_uniforms
from octree_pathtracing_tpu.render.pathtracer import MAX_BOUNCES


def _steady(fn, *args, iters=3, trials=3):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _batch(cam, scene, k, sp, lanes_per_dev, n_bounces):
    """(origins, dirs, uniforms, target) shaped (S, B, ...) for a (dp, sp)
    mesh: B a multiple of dp, S == sp (weak scaling: fixed lanes/device =
    lanes_per_dev on the dp axis x one sample slice per sp rank)."""
    dp = k // sp
    b_want = lanes_per_dev * dp
    side = int(np.sqrt(b_want))
    origins, dirs = pixel_grid_rays(cam, side, b_want // side)
    b = (origins.shape[0] // dp) * dp
    origins, dirs = origins[:b], dirs[:b]
    o = jnp.broadcast_to(origins[None], (sp,) + origins.shape)
    d = jnp.broadcast_to(dirs[None], (sp,) + dirs.shape)
    u = draw_uniforms(jax.random.PRNGKey(0), sp * b, n_bounces=n_bounces).reshape(
        sp, b, n_bounces, N_UNIFORMS
    )
    tgt = jnp.zeros((sp, b, 3), jnp.float32)
    return o, d, u, tgt


def main():
    ncores = os.cpu_count() or 1
    lanes_per_dev = int(os.environ.get("SCALE_LANES", 4096))
    iters = int(os.environ.get("SCALE_ITERS", 3))
    # 2 bounces: weak-scaling efficiency is a ratio over identical per-device
    # work, so the bounce count only scales the numerator; 2-bounce programs
    # compile ~2.5x faster on the CPU backend (the 4 mesh shapes each need a
    # full XLA:CPU compile — depth-5/5-bounce took >1 h on this 2-core host)
    n_bounces = int(os.environ.get("SCALE_BOUNCES", 2))
    scene, cam = sphere_scene(depth=int(os.environ.get("SCALE_DEPTH", 4)))

    ks = tuple(
        int(x) for x in os.environ.get("SCALE_KS", "1,2,4,8").split(",")
    )
    # "render" (fwd only, the pre-r5 curve), "train" (sharded_train_step —
    # the gradient-allreduce weak scaling VERDICT r4 #7 asked for), or both.
    mode = os.environ.get("SCALE_MODE", "both")
    results = []
    t1 = None
    t1_train = None
    params = {
        "atlas": scene.atlas,
        "emittance": scene.materials.emittance,
    }
    for k in ks:
        devs = np.asarray(jax.devices()[:k]).reshape(k, 1)
        mesh = Mesh(devs, (DP_AXIS, SP_AXIS))
        b = lanes_per_dev * k  # weak scaling: fixed lanes/device
        side = int(np.sqrt(b))
        origins, dirs = pixel_grid_rays(cam, side, b // side)
        # the pixel grid may not hit lanes_per_dev*k exactly (e.g. k=8:
        # side=181 -> 32761 lanes); trim to a multiple of k so the lane axis
        # shards evenly over dp (ADVICE r2)
        b = (origins.shape[0] // k) * k
        origins, dirs = origins[:b], dirs[:b]
        o, d = origins[None], dirs[None]
        u = draw_uniforms(jax.random.PRNGKey(0), b, n_bounces=n_bounces).reshape(
            1, b, n_bounces, N_UNIFORMS
        )

        row = dict(devices=k, lanes=b)
        if mode in ("render", "both"):
            best = _steady(
                lambda: sharded_render(mesh, scene, o, d, u), iters=iters
            )
            if k == 1:
                t1 = best
            if t1 is None:  # partial sweep without k=1 (SCALE_KS=2,4,8):
                # seed the reference time from env (a prior k=1 measurement
                # at the same SCALE_LANES), else from the first measured k
                t1 = float(os.environ.get("SCALE_T1_MS", best * 1e3)) / 1e3
            raw_eff = t1 / best
            row.update(
                ms=round(best * 1e3, 1),
                rays_per_s=round(b * n_bounces / best),
                weak_eff_raw=round(raw_eff, 3),
                weak_eff_core_normalized=round(
                    min(raw_eff * k / min(k, ncores), 9.99), 3
                ),
            )
        if mode in ("train", "both"):
            o_t, d_t, u_t, tgt = _batch(cam, scene, k, 1, lanes_per_dev,
                                        n_bounces)
            best_t = _steady(
                lambda: sharded_train_step(
                    mesh, scene, params, o_t, d_t, u_t, tgt
                ),
                iters=iters,
            )
            if k == 1:
                t1_train = best_t
            if t1_train is None:
                t1_train = float(
                    os.environ.get("SCALE_TRAIN_T1_MS", best_t * 1e3)
                ) / 1e3
            raw_t = t1_train / best_t
            row.update(
                train_ms=round(best_t * 1e3, 1),
                train_eff_raw=round(raw_t, 3),
                train_eff_core_normalized=round(
                    min(raw_t * k / min(k, ncores), 9.99), 3
                ),
            )
        results.append(row)
        print(json.dumps(row), file=sys.stderr)

    # One 2-axis (dp, sp) mesh point (VERDICT r4 #7): same device count as
    # the largest k, lanes split over dp and samples over sp, so BOTH mesh
    # axes and both pmean reductions (sample mean over sp, grad allreduce
    # over dp x sp) are exercised in one measured configuration.
    mesh2 = os.environ.get("SCALE_MESH2", "4x2")
    row2 = None
    if mode in ("train", "both") and mesh2:
        dp, sp = (int(x) for x in mesh2.split("x"))
        k2 = dp * sp
        if k2 <= len(jax.devices()):
            devs = np.asarray(jax.devices()[:k2]).reshape(dp, sp)
            mesh = Mesh(devs, (DP_AXIS, SP_AXIS))
            o_t, d_t, u_t, tgt = _batch(cam, scene, k2, sp, lanes_per_dev,
                                        n_bounces)
            best2 = _steady(
                lambda: sharded_train_step(
                    mesh, scene, params, o_t, d_t, u_t, tgt
                ),
                iters=iters,
            )
            row2 = dict(
                mesh=f"dp={dp},sp={sp}",
                devices=k2,
                lanes=int(o_t.shape[0] * o_t.shape[1]),
                train_ms=round(best2 * 1e3, 1),
            )
            print(json.dumps(row2), file=sys.stderr)

    print(
        json.dumps(
            {"host_cores": ncores, "curve": results, "mesh2_train": row2}
        )
    )


if __name__ == "__main__":
    main()
