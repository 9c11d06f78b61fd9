#!/usr/bin/env python
"""Full-region ingestion artifact (VERDICT r4 #6).

The reference's ``construct_all`` builds a real 1024-chunk region end-to-end
with phase timing printouts (``/root/reference/src/octree/new_octree.rs:288-
434``); until r5 our world tests loaded tiny synthesized fixtures.  This
tool synthesizes a FULL 32x32-chunk region — heightfield terrain over two
sections per chunk, varied per-chunk palettes, multipart fence blockstates,
cross-plant quads, glowstone, and two biomes split across the region — then
drives the whole ingestion stack at scale and reports wall times per phase:

  synth        region fixture bytes (host numpy + NBT writer)
  parse        native C++ parser (protocol v2 incl. biome tails)
  build        palette remap + biome variants + Morton octree build
  pack         resource-pack model compile (blockstate JSONs -> quads,
               colormap tints)
  preview      flat-shaded render on the device
  render       4-bounce path-traced frame on the device

Usage (repo root, real TPU): timeout 3600 python tools/region_ingest.py
Env: RI_RES (default 256 preview / render resolution), RI_OUT (png prefix).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _write_json(root, rel, obj):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        json.dump(obj, f)


def _write_png(root, rel, rgba, size=16, noise=0):
    from PIL import Image

    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    img = np.zeros((size, size, 4), np.uint8)
    img[...] = rgba
    if noise:
        rng = np.random.default_rng(hash(rel) % 2**32)
        jitter = rng.integers(-noise, noise + 1, (size, size, 3))
        img[..., :3] = np.clip(img[..., :3].astype(int) + jitter, 0, 255)
    Image.fromarray(img, "RGBA").save(p)


def build_pack(root: str) -> str:
    """Synthesize the resource pack: cube chain, tinted grass, cross plant,
    multipart fence, glowstone."""
    faces = ("down", "up", "north", "south", "west", "east")
    _write_json(
        root,
        "assets/minecraft/models/block/cube.json",
        {
            "elements": [
                {
                    "from": [0, 0, 0],
                    "to": [16, 16, 16],
                    "faces": {f: {"texture": "#" + f} for f in faces},
                }
            ]
        },
    )
    _write_json(
        root,
        "assets/minecraft/models/block/cube_all.json",
        {"parent": "block/cube", "textures": {f: "#all" for f in faces}},
    )
    for name, color in (
        ("stone", (128, 128, 128, 255)),
        ("dirt", (134, 96, 67, 255)),
        ("glowstone", (255, 220, 120, 255)),
    ):
        _write_json(
            root,
            f"assets/minecraft/models/block/{name}.json",
            {"parent": "block/cube_all", "textures": {"all": f"block/{name}"}},
        )
        _write_json(
            root,
            f"assets/minecraft/blockstates/{name}.json",
            {"variants": {"": {"model": f"block/{name}"}}},
        )
        _write_png(root, f"assets/minecraft/textures/block/{name}.png", color,
                   noise=10)
    # grass_block: tinted top over a white texture + climate colormap
    _write_json(
        root,
        "assets/minecraft/models/block/grass_block.json",
        {
            "elements": [
                {
                    "from": [0, 0, 0],
                    "to": [16, 16, 16],
                    "faces": {
                        f: {
                            "texture": "#top" if f == "up" else "#side",
                            **({"tintindex": 0} if f == "up" else {}),
                        }
                        for f in faces
                    },
                }
            ],
            "textures": {"top": "block/grass_top", "side": "block/dirt"},
        },
    )
    _write_json(
        root,
        "assets/minecraft/blockstates/grass_block.json",
        {"variants": {"": {"model": "block/grass_block"}}},
    )
    _write_png(root, "assets/minecraft/textures/block/grass_top.png",
               (255, 255, 255, 255))
    from PIL import Image

    cm = np.zeros((256, 256, 4), np.uint8)
    cm[..., 0] = np.arange(256, dtype=np.uint8)[None, :] // 2
    cm[..., 1] = (200 - np.arange(256) // 2)[:, None].astype(np.uint8)
    cm[..., 2] = 40
    cm[..., 3] = 255
    p = os.path.join(root, "assets/minecraft/textures/colormap/grass.png")
    os.makedirs(os.path.dirname(p), exist_ok=True)
    Image.fromarray(cm, "RGBA").save(p)
    # cross plant
    _write_json(
        root,
        "assets/minecraft/models/block/short_grass.json",
        {
            "textures": {"cross": "block/short_grass"},
            "elements": [
                {
                    "from": [0.8, 0, 8],
                    "to": [15.2, 16, 8],
                    "rotation": {"origin": [8, 8, 8], "axis": "y",
                                 "angle": a, "rescale": True},
                    "faces": {
                        "north": {"texture": "#cross"},
                        "south": {"texture": "#cross"},
                    },
                }
                for a in (45, -45)
            ],
        },
    )
    _write_json(
        root,
        "assets/minecraft/blockstates/short_grass.json",
        {"variants": {"": {"model": "block/short_grass"}}},
    )
    grass_tex = np.zeros((16, 16, 4), np.uint8)
    rng = np.random.default_rng(2)
    grass_tex[..., 1] = 180
    grass_tex[..., 3] = np.where(rng.random((16, 16)) < 0.5, 255, 0)
    Image.fromarray(grass_tex, "RGBA").save(
        os.path.join(root, "assets/minecraft/textures/block/short_grass.png")
    )
    # multipart fence: post always; east arm when east=true
    _write_json(
        root,
        "assets/minecraft/models/block/fence_post.json",
        {
            "elements": [
                {
                    "from": [6, 0, 6],
                    "to": [10, 16, 10],
                    "faces": {f: {"texture": "#wood"} for f in faces},
                }
            ],
            "textures": {"wood": "block/stone"},
        },
    )
    _write_json(
        root,
        "assets/minecraft/models/block/fence_side.json",
        {
            "elements": [
                {
                    "from": [10, 6, 7],
                    "to": [16, 12, 9],
                    "faces": {f: {"texture": "#wood"} for f in faces},
                }
            ],
            "textures": {"wood": "block/stone"},
        },
    )
    _write_json(
        root,
        "assets/minecraft/blockstates/oak_fence.json",
        {
            "multipart": [
                {"apply": {"model": "block/fence_post"}},
                {
                    "when": {"east": "true"},
                    "apply": {"model": "block/fence_side"},
                },
            ]
        },
    )
    return root


def build_region(path: str) -> dict:
    """Synthesize the full 32x32-chunk region; returns stats."""
    from octree_pathtracing_tpu.models.mca import make_region_fixture

    rng = np.random.default_rng(0)
    chunks = {}
    n_sections = 0
    n_blocks = 0
    # palette variants so chunk palettes differ across the region
    for cx in range(32):
        for cz in range(32):
            secs = {}
            # per-chunk heightfield in [8, 28): spans sections y=0 and y=1
            hx = np.sin(cx * 0.7 + np.arange(16) * 0.21)
            hz = np.cos(cz * 0.5 + np.arange(16) * 0.17)
            h = (16 + 6 * hx[:, None] + 4 * hz[None, :]).astype(int).clip(8, 27)
            pal = ["minecraft:air", "minecraft:stone", "minecraft:dirt",
                   "minecraft:grass_block"]
            use_plants = (cx + cz) % 3 == 0
            use_fence = (cx * cz) % 7 == 0
            use_glow = (cx + 2 * cz) % 5 == 0
            if use_plants:
                pal.append("minecraft:short_grass")
            if use_fence:
                pal.append("minecraft:oak_fence#east=true")
            if use_glow:
                pal.append("minecraft:glowstone")
            biome = "minecraft:plains" if cx < 16 else "minecraft:badlands"
            for sy in range(2):
                y0 = sy * 16
                ly, lz, lx = np.meshgrid(
                    np.arange(16), np.arange(16), np.arange(16), indexing="ij"
                )
                yy = y0 + ly
                hcol = h[lx, lz]
                vals = np.zeros((16, 16, 16), np.uint16)
                vals[yy < hcol - 2] = 1  # stone
                vals[(yy >= hcol - 2) & (yy < hcol)] = 2  # dirt
                vals[yy == hcol] = 3  # grass
                # decorations one above the surface
                deco = yy == hcol + 1
                if use_plants:
                    mask = deco & (rng.random((16, 16, 16)) < 0.08)
                    vals[mask] = pal.index("minecraft:short_grass")
                if use_fence:
                    mask = deco & (lx % 8 == 0) & (lz % 8 == 0)
                    vals[mask] = pal.index("minecraft:oak_fence#east=true")
                if use_glow:
                    mask = deco & (lx % 11 == 3) & (lz % 9 == 4)
                    vals[mask] = pal.index("minecraft:glowstone")
                idx = vals.reshape(-1)  # YZX order matches meshgrid (y,z,x)
                n_blocks += int((idx != 0).sum())
                secs[sy] = (pal, idx.astype(np.uint16), biome)
                n_sections += 1
            chunks[(cx, cz)] = secs
    buf = make_region_fixture(chunks)
    with open(path, "wb") as f:
        f.write(buf)
    return dict(
        chunks=len(chunks),
        sections=n_sections,
        solid_blocks=n_blocks,
        mca_bytes=len(buf),
    )


def main():
    import jax

    res = int(os.environ.get("RI_RES", 256))
    out_prefix = os.environ.get("RI_OUT", "/tmp/region_ingest")
    work = os.environ.get("RI_WORK", "/tmp/region_ingest_work")
    os.makedirs(work, exist_ok=True)
    t = {}

    t0 = time.time()
    pack = build_pack(os.path.join(work, "pack"))
    wp = os.path.join(work, "r.0.0.mca")
    stats = build_region(wp)
    t["synth_s"] = round(time.time() - t0, 1)

    # parse alone (native path)
    from octree_pathtracing_tpu.models.native import parse_region_native

    buf = open(wp, "rb").read()
    t0 = time.time()
    sections = parse_region_native(buf)
    t["parse_native_s"] = round(time.time() - t0, 2)
    stats["sections_parsed"] = len(sections)

    # full scene build: parse + remap + octree + pack compile
    from octree_pathtracing_tpu.models.blockpalette import (
        minecraft_scene_from_region,
    )

    t0 = time.time()
    scene, cam = minecraft_scene_from_region(wp, depth=9, pack_dir=pack)
    t["scene_build_s"] = round(time.time() - t0, 1)
    stats["octree_nodes"] = int(scene.octree.n_nodes)
    stats["materials"] = int(scene.materials.count)
    stats["has_quad_models"] = bool(scene.has_quad_models)

    from octree_pathtracing_tpu.models.camera import pixel_grid_rays
    from octree_pathtracing_tpu.render import draw_uniforms, trace_paths
    from octree_pathtracing_tpu.render.preview import preview_render_rays
    from octree_pathtracing_tpu.ops.texture import float_to_u8

    origins, dirs = pixel_grid_rays(cam, res, res)
    pv = jax.jit(preview_render_rays)
    t0 = time.time()
    img = jax.block_until_ready(pv(scene, origins, dirs))
    t["preview_compile_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    img = jax.block_until_ready(pv(scene, origins, dirs))
    t["preview_warm_s"] = round(time.time() - t0, 2)

    u = draw_uniforms(jax.random.PRNGKey(0), origins.shape[0], n_bounces=4)
    f = jax.jit(lambda s, o, d, uu: trace_paths(s, o, d, uu))
    t0 = time.time()
    rad = jax.block_until_ready(f(scene, origins, dirs, u))
    t["render_compile_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    rad = jax.block_until_ready(f(scene, origins, dirs, u))
    t["render_warm_s"] = round(time.time() - t0, 2)

    from PIL import Image

    Image.fromarray(
        float_to_u8(np.asarray(img).reshape(res, res, 3))
    ).save(out_prefix + "_preview.png")
    Image.fromarray(
        float_to_u8(np.asarray(rad).reshape(res, res, 3))
    ).save(out_prefix + "_render.png")

    print(json.dumps(dict(stats=stats, timings=t, backend=jax.default_backend())))


if __name__ == "__main__":
    main()
