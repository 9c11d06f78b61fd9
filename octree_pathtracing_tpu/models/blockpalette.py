"""Blockstate -> renderable material compiler (phase-1 resource manager).

The reference's ``ModelBuilder`` resolves full block-model JSONs with parent
chains, texture variables, rotations and uvlock
(``/root/reference/src/scene/resource_manager.rs``).  This phase-1 compiler
covers the dominant path — full-cube blocks — by mapping each blockstate to a
material with a per-block texture (built-in palette of vanilla colors +
deterministic hash colors for unknown blocks), including emissive and
translucent blocks.  Non-cube block models (quad/cuboid geometry) plug into
the model table as they land (see ``ops/geometry.py``).
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..ops.texture import build_atlas
from .materials import FLAG_OPAQUE, FLAG_REFRACTIVE, FLAG_SOLID, air, make_material_table

# name -> (rgb, dict of material overrides)
VANILLA_COLORS = {
    "minecraft:stone": ((125, 125, 125), {}),
    "minecraft:cobblestone": ((110, 110, 110), {}),
    "minecraft:granite": ((154, 108, 90), {}),
    "minecraft:diorite": ((188, 188, 190), {}),
    "minecraft:andesite": ((132, 135, 132), {}),
    "minecraft:deepslate": ((80, 80, 85), {}),
    "minecraft:bedrock": ((60, 60, 60), {}),
    "minecraft:dirt": ((134, 96, 67), {}),
    "minecraft:grass_block": ((95, 159, 53), {}),
    "minecraft:sand": ((219, 207, 163), {}),
    "minecraft:gravel": ((136, 126, 126), {}),
    "minecraft:oak_log": ((109, 85, 50), {}),
    "minecraft:oak_planks": ((162, 130, 78), {}),
    "minecraft:oak_leaves": ((60, 143, 40), {"alpha": 0.8}),
    "minecraft:spruce_log": ((58, 37, 16), {}),
    "minecraft:spruce_leaves": ((44, 96, 44), {"alpha": 0.8}),
    "minecraft:birch_log": ((216, 215, 210), {}),
    "minecraft:water": ((48, 90, 220), {"alpha": 0.35, "ior": 1.33, "refractive": True}),
    "minecraft:lava": ((230, 110, 20), {"emittance": 4.0}),
    "minecraft:glowstone": ((255, 220, 120), {"emittance": 6.0}),
    "minecraft:sea_lantern": ((210, 235, 230), {"emittance": 5.0}),
    "minecraft:torch": ((255, 200, 100), {"emittance": 5.0}),
    "minecraft:glass": ((235, 245, 250), {"alpha": 0.1, "ior": 1.52, "refractive": True}),
    "minecraft:ice": ((160, 190, 255), {"alpha": 0.6, "ior": 1.31, "refractive": True}),
    "minecraft:snow": ((250, 250, 250), {}),
    "minecraft:snow_block": ((245, 245, 245), {}),
    "minecraft:iron_block": ((220, 220, 220), {"metalness": 0.9, "roughness": 0.15}),
    "minecraft:gold_block": ((250, 215, 60), {"metalness": 0.9, "roughness": 0.1}),
    "minecraft:diamond_block": ((110, 230, 220), {"specular": 0.4, "roughness": 0.05}),
    "minecraft:obsidian": ((20, 16, 30), {"specular": 0.2, "roughness": 0.05}),
    "minecraft:netherrack": ((110, 55, 55), {}),
    "minecraft:coal_ore": ((105, 105, 105), {}),
    "minecraft:iron_ore": ((135, 125, 115), {}),
}


def _hash_color(name: str):
    h = hashlib.sha1(name.encode()).digest()
    return (96 + h[0] % 128, 96 + h[1] % 128, 96 + h[2] % 128)


def compile_block_palette(blockstate_map: dict[str, int]):
    """Build (materials, atlas, leaf_material) from a blockstate-id map.

    leaf values in the octree are global blockstate ids; ``leaf_material``
    maps them to material ids (the reference's model indirection collapsed to
    one hop for cube blocks).
    """
    n_states = max(blockstate_map.values()) + 1 if blockstate_map else 1
    leaf_material = np.zeros(n_states, np.int32)

    materials = [air()]
    textures = [np.full((16, 16, 4), (255, 0, 255, 255), np.uint8)]  # default magenta

    for name, state_id in sorted(blockstate_map.items(), key=lambda kv: kv[1]):
        if state_id == 0:
            continue
        base = name.split("#", 1)[0]
        rgb, props = VANILLA_COLORS.get(base, (_hash_color(base), {}))
        alpha = props.get("alpha", 1.0)
        tex = np.zeros((16, 16, 4), np.uint8)
        # subtle per-texel noise so blocks read as textured, not flat
        rng = np.random.default_rng(abs(hash(base)) % (2**32))
        noise = rng.integers(-12, 12, (16, 16, 1))
        tex[..., :3] = np.clip(np.asarray(rgb)[None, None] + noise, 0, 255)
        tex[..., 3] = int(alpha * 255)
        textures.append(tex)
        mat = dict(
            texture_index=len(textures) - 1,
            emittance=props.get("emittance", 0.0),
            specular=props.get("specular", 0.0),
            roughness=props.get("roughness", 0.0),
            metalness=props.get("metalness", 0.0),
            ior=props.get("ior", 1.000293),
            flags=(FLAG_OPAQUE | FLAG_SOLID)
            | (FLAG_REFRACTIVE if props.get("refractive") else 0),
        )
        materials.append(mat)
        leaf_material[state_id] = len(materials) - 1

    return make_material_table(materials), build_atlas(textures), leaf_material


def minecraft_scene_from_region(path: str, depth: int = 9):
    """Load a region file/world dir into a renderable Scene + default camera."""
    from .camera import Camera
    from .mca import load_world
    from .scene import make_scene

    tree, blockstate_map = load_world(path, depth=depth)
    if tree is None:
        raise ValueError(f"region at {path} contains no blocks")
    materials, atlas, leaf_material = compile_block_palette(blockstate_map)
    scene = make_scene(tree, materials, atlas, leaf_material=leaf_material)
    s = 1 << depth
    camera = Camera.look_at(
        eye=(-s * 0.18, s * 0.55, -s * 0.18), center=(s * 0.5, s * 0.22, s * 0.5)
    )
    return scene, camera
