"""CLI entry — render / preview / bench / train / info commands.

The reference's UI shell (window + settings widgets + world-loading dialog,
SURVEY.md §2 rows L1) maps to a headless CLI: scenes come from procedural
builders or Minecraft region files, frames go to image files, progress goes
to JSON-line metrics on stderr.

Usage:
  python -m octree_pathtracing_tpu.cli render --scene cornell --spp 64 -o out.png
  python -m octree_pathtracing_tpu.cli preview --scene sphere -o preview.png
  python -m octree_pathtracing_tpu.cli render --world path/to/region.mca -o w.png
  python -m octree_pathtracing_tpu.cli train --scene sphere --steps 50 -o params.npz
  python -m octree_pathtracing_tpu.cli bench
"""

from __future__ import annotations

import argparse
import sys
import time


def _build_scene(args):
    from .models import (
        analytic_sphere_scene,
        cornell_scene,
        cutout_chunk_scene,
        emissive_room_scene,
        minecraft_chunk_scene,
        plant_scene,
        scattered_lights_scene,
        sphere_scene,
    )

    if args.world:
        from .models.blockpalette import minecraft_scene_from_region

        return minecraft_scene_from_region(
            args.world, depth=args.depth, pack_dir=getattr(args, "pack", "") or None
        )
    builders = {
        "sphere": sphere_scene,
        "analytic": analytic_sphere_scene,
        "cornell": cornell_scene,
        "room": emissive_room_scene,
        "chunk": minecraft_chunk_scene,
        "cutout": cutout_chunk_scene,
        "scattered": scattered_lights_scene,
        "plant": plant_scene,
    }
    return builders[args.scene](depth=args.depth if args.depth else 6)


def cmd_render(args):
    from .config import sun_sampling_from_name
    from .io.image import save_image
    from .render.renderer import Renderer
    from .utils.metrics import METRICS

    import dataclasses

    scene, camera = _build_scene(args)
    scene = dataclasses.replace(scene, sun_sampling=sun_sampling_from_name(args.sun))
    es = getattr(args, "emitter_sampling", "scene")
    if es in ("one", "one_block", "all"):
        from .models.emitters import build_emitter_table

        em = scene.emitters
        if em is None:
            em = build_emitter_table(
                scene.octree, scene.leaf_material, scene.materials, scene.models
            )
        # strategy names ARE the EmitterSampling values (models/scene.py)
        scene = dataclasses.replace(scene, emitter_sampling=es, emitters=em)
    elif es == "none":
        from .models.scene import EmitterSampling

        scene = dataclasses.replace(
            scene, emitter_sampling=EmitterSampling.NONE
        )
    r = Renderer(
        scene=scene,
        camera=camera,
        width=args.width,
        height=args.height,
        target_spp=args.spp,
        branch_count=args.branch_count,
        seed=args.seed,
        n_bounces=args.bounces,
    )
    if args.resume:
        from .io.checkpoint import load_render_checkpoint

        load_render_checkpoint(args.resume, r)
    while True:
        t0 = time.time()
        spp_before = r.spp
        if not r.step():
            break
        import jax

        jax.block_until_ready(r.framebuffer)
        METRICS.render_pass(
            spp_added=r.spp - spp_before,
            total_spp=r.spp,
            lanes=args.width * args.height,
            wall_s=time.time() - t0,
        )
    if args.checkpoint:
        from .io.checkpoint import save_render_checkpoint

        save_render_checkpoint(args.checkpoint, r)
    save_image(args.output, r.framebuffer)
    print(f"wrote {args.output} at {r.spp} spp")


def cmd_preview(args):
    from .io.image import save_image
    from .render.preview import preview_image

    scene, camera = _build_scene(args)
    img = preview_image(scene, camera, args.width, args.height)
    save_image(args.output, img)
    print(f"wrote {args.output}")


def cmd_train(args):
    import jax

    from .diff import inverse_render, render_views
    from .io.checkpoint import save_arrays
    from .models import Camera

    scene, camera = _build_scene(args)
    import numpy as np

    s = 1 << scene.octree.depth
    cams = []
    for i in range(args.views):
        ang = 2 * np.pi * i / args.views
        eye = (s * (0.5 + 0.9 * np.cos(ang)), s * 0.75, s * (0.5 + 0.9 * np.sin(ang)))
        cams.append(Camera.look_at(eye=eye, center=(s * 0.5, s * 0.3, s * 0.5)))
    key = jax.random.PRNGKey(args.seed)
    targets = render_views(scene, cams, args.width, args.height, key)
    res = inverse_render(
        scene, cams, targets, args.width, args.height, steps=args.steps, lr=args.lr, key=key
    )
    save_arrays(args.output, res.params)
    print(
        f"loss {res.losses[0]:.5f} -> {res.losses[-1]:.5f} over {args.steps} steps; wrote {args.output}"
    )


def cmd_bench(args):
    import runpy
    import os

    os.environ.setdefault("BENCH_DEPTH", str(args.depth or 9))
    runpy.run_path(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
        run_name="__main__",
    )


def cmd_info(args):
    scene, camera = _build_scene(args)
    t = scene.octree
    print(f"octree: depth={t.depth} nodes={t.n_nodes} scale={t.scale()}")
    print(f"materials: {scene.materials.count}; atlas: {tuple(scene.atlas.shape)}")
    print(f"opaque_only={scene.opaque_only} quad_models={scene.has_quad_models}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="octree_pathtracing_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--scene", default="cornell", choices=["sphere", "analytic", "cornell", "room", "chunk", "cutout", "scattered", "plant"])
        sp.add_argument("--world", default="", help="Minecraft region file / world dir")
        sp.add_argument("--pack", default="", help="resource pack dir (block models + textures) for --world")
        sp.add_argument("--depth", type=int, default=0, help="octree depth (2..12)")
        sp.add_argument("--width", type=int, default=512)
        sp.add_argument("--height", type=int, default=512)
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("-o", "--output", default="out.png")

    r = sub.add_parser("render")
    common(r)
    r.add_argument("--spp", type=int, default=64)
    r.add_argument("--branch-count", type=int, default=10)
    r.add_argument("--bounces", type=int, default=5, help="path depth cap (path_tracer.rs:56; config 5 uses 8)")
    r.add_argument("--sun", default="importance")
    r.add_argument(
        "--emitter-sampling",
        default="scene",
        choices=["scene", "none", "one", "one_block", "all"],
        help="block-light NEE strategy (scene/mod.rs:39-57): 'one' samples one "
        "face of one emissive leaf per diffuse bounce, 'one_block' sums all "
        "faces of one leaf, 'all' sums all faces of every leaf "
        "(models/emitters.py), 'none' disables it, 'scene' keeps the "
        "scene's own default",
    )
    r.add_argument("--checkpoint", default="")
    r.add_argument("--resume", default="")
    r.set_defaults(fn=cmd_render)

    v = sub.add_parser("preview")
    common(v)
    v.set_defaults(fn=cmd_preview)

    t = sub.add_parser("train")
    common(t)
    t.add_argument("--steps", type=int, default=50)
    t.add_argument("--views", type=int, default=8)
    t.add_argument("--lr", type=float, default=5e-2)
    t.set_defaults(fn=cmd_train)

    b = sub.add_parser("bench")
    b.add_argument("--depth", type=int, default=0)
    b.set_defaults(fn=cmd_bench)

    i = sub.add_parser("info")
    common(i)
    i.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
