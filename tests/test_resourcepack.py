"""Resource-pack block-model compiler: parent chains, texture vars, variants,
rotations — against a synthesized mini pack."""

import json
import os

import numpy as np
import pytest

from octree_pathtracing_tpu.models.resourcepack import (
    ResourcePack,
    compile_blockstate,
    model_to_quads,
)


@pytest.fixture
def mini_pack(tmp_path):
    root = tmp_path / "pack"

    def write(rel, obj):
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(obj))

    # abstract cube parent with per-face texture variables
    write(
        "assets/minecraft/models/block/cube.json",
        {
            "elements": [
                {
                    "from": [0, 0, 0],
                    "to": [16, 16, 16],
                    "faces": {
                        "down": {"texture": "#down"},
                        "up": {"texture": "#up"},
                        "north": {"texture": "#north"},
                        "south": {"texture": "#south"},
                        "west": {"texture": "#west"},
                        "east": {"texture": "#east"},
                    },
                }
            ]
        },
    )
    write(
        "assets/minecraft/models/block/cube_all.json",
        {
            "parent": "block/cube",
            "textures": {
                "down": "#all", "up": "#all", "north": "#all",
                "south": "#all", "west": "#all", "east": "#all",
            },
        },
    )
    write(
        "assets/minecraft/models/block/stone.json",
        {"parent": "block/cube_all", "textures": {"all": "block/stone"}},
    )
    write(
        "assets/minecraft/blockstates/stone.json",
        {"variants": {"": {"model": "block/stone"}}},
    )
    # half slab with a rotated variant
    write(
        "assets/minecraft/models/block/slab.json",
        {
            "textures": {"side": "block/planks"},
            "elements": [
                {
                    "from": [0, 0, 0],
                    "to": [16, 8, 16],
                    "faces": {
                        "up": {"texture": "#side", "uv": [0, 0, 16, 8]},
                        "down": {"texture": "#side"},
                        "north": {"texture": "#side"},
                        "south": {"texture": "#side"},
                        "west": {"texture": "#side"},
                        "east": {"texture": "#side"},
                    },
                }
            ],
        },
    )
    write(
        "assets/minecraft/blockstates/slab.json",
        {
            "variants": {
                "type=bottom": {"model": "block/slab"},
                "type=top": {"model": "block/slab", "x": 180},
            }
        },
    )
    return ResourcePack(str(root))


def _mat_table():
    mats = {}

    def material_of_texture(tex):
        return mats.setdefault(tex, len(mats))

    return mats, material_of_texture


def test_parent_chain_and_texture_vars(mini_pack):
    mats, fn = _mat_table()
    quads = model_to_quads(mini_pack, "block/stone", fn)
    assert len(quads) == 6
    assert list(mats) == ["block/stone"]  # all faces resolved through #all
    # faces span the unit cube
    allpts = []
    for q in quads:
        o = np.array(q["origin"])
        allpts += [o, o + q["u"], o + q["v"], o + np.array(q["u"]) + q["v"]]
    allpts = np.array(allpts)
    assert allpts.min() == 0.0 and allpts.max() == 1.0


def test_blockstate_variant_selection(mini_pack):
    _, fn = _mat_table()
    quads = compile_blockstate(mini_pack, "minecraft:stone", fn)
    assert quads and len(quads) == 6
    missing = compile_blockstate(mini_pack, "minecraft:unknown_block", fn)
    assert missing is None


def test_slab_heights_and_rotation(mini_pack):
    _, fn = _mat_table()
    bottom = compile_blockstate(mini_pack, "minecraft:slab#type=bottom", fn)
    ys = [q["origin"][1] for q in bottom] + [
        (np.array(q["origin"]) + q["u"] + q["v"])[1] for q in bottom
    ]
    assert max(ys) == 0.5  # half height
    top = compile_blockstate(mini_pack, "minecraft:slab#type=top", fn)
    ys_top = [q["origin"][1] for q in top] + [
        (np.array(q["origin"]) + q["u"] + q["v"])[1] for q in top
    ]
    assert min(ys_top) >= 0.5 - 1e-9  # x=180 flips the slab to the top half
    assert max(ys_top) == 1.0


def test_uv_ranges(mini_pack):
    _, fn = _mat_table()
    quads = compile_blockstate(mini_pack, "minecraft:slab#type=bottom", fn)
    up = [q for q in quads if q["uv_range"] == ((0.0, 1.0), (0.0, 0.5))]
    assert up  # the up face carried uv [0,0,16,8] -> u(0,1) v(0,0.5)


def test_quads_feed_model_builder(mini_pack):
    from octree_pathtracing_tpu.models.blockmodels import ModelBuilder

    _, fn = _mat_table()
    quads = compile_blockstate(mini_pack, "minecraft:slab#type=bottom", fn)
    mb = ModelBuilder()
    mb.add_simple(0)
    mid = mb.add_quad_model(quads[:8])
    models = mb.build([0, mid])
    assert int(models.quad_count[mid]) == min(len(quads), 8)
