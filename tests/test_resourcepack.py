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


def _texel_of(q, p):
    """World point p on quad q -> (u, v) texel (orthogonal u/v edges)."""
    o = np.asarray(q["origin"], float)
    u = np.asarray(q["u"], float)
    v = np.asarray(q["v"], float)
    a = np.dot(p - o, u) / np.dot(u, u)
    b = np.dot(p - o, v) / np.dot(v, v)
    (u0, u1), (v0, v1) = q["uv_range"]
    return np.array([u0 + a * (u1 - u0), v0 + b * (v1 - v0)])


def _face_of(quads, normal):
    n = np.asarray(normal, float)
    for q in quads:
        qn = np.cross(q["u"], q["v"])
        qn = qn / np.linalg.norm(qn)
        if np.allclose(qn, n, atol=1e-6):
            yield q


def test_uvlock_keeps_up_down_textures_world_aligned(mini_pack):
    """uvlock (resource_manager.rs:331-426): after a y-rotation, an uvlocked
    up/down face must map every world point to the SAME texel as the
    unrotated model."""
    _, fn = _mat_table()
    base = model_to_quads(mini_pack, "block/stone", fn)
    for qy in (90, 180, 270):
        rot = model_to_quads(mini_pack, "block/stone", fn, rot_y=qy, uvlock=True)
        for normal in ([0, 1, 0], [0, -1, 0]):
            (q0,) = list(_face_of(base, normal))
            (q1,) = list(_face_of(rot, normal))
            for p2 in [(0.25, 0.75), (0.8, 0.1), (0.5, 0.5)]:
                y = q0["origin"][1]
                p = np.array([p2[0], y, p2[1]])
                np.testing.assert_allclose(
                    _texel_of(q0, p), _texel_of(q1, p), atol=1e-6,
                    err_msg=f"qy={qy} normal={normal}",
                )


def test_uvlock_noop_without_rotation(mini_pack):
    _, fn = _mat_table()
    a = model_to_quads(mini_pack, "block/stone", fn)
    b = model_to_quads(mini_pack, "block/stone", fn, uvlock=True)
    for qa, qb in zip(a, b):
        np.testing.assert_allclose(qa["origin"], qb["origin"])
        np.testing.assert_allclose(qa["u"], qb["u"])


def test_element_rotation_about_pivot(tmp_path):
    """Element rotation (resource_manager.rs:830-872): 45° about y with
    rescale spans the full block diagonal (the cross-plant/rail geometry)."""
    root = tmp_path / "pack"

    def write(rel, obj):
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        import json

        p.write_text(json.dumps(obj))

    write(
        "assets/minecraft/models/block/diag.json",
        {
            "textures": {"t": "block/t"},
            "elements": [
                {
                    "from": [0, 0, 8],
                    "to": [16, 16, 8],
                    "rotation": {
                        "origin": [8, 8, 8],
                        "axis": "y",
                        "angle": 45,
                        "rescale": True,
                    },
                    "faces": {"north": {"texture": "#t"}},
                }
            ],
        },
    )
    pack = ResourcePack(str(root))
    _, fn = _mat_table()
    (q,) = model_to_quads(pack, "block/diag", fn)
    # rescaled 45°: the rotated plane's corners land on the block corners
    corners = [
        np.asarray(q["origin"]),
        np.asarray(q["origin"]) + q["u"],
        np.asarray(q["origin"]) + q["v"],
        np.asarray(q["origin"]) + np.asarray(q["u"]) + q["v"],
    ]
    xz = np.array([[c[0], c[2]] for c in corners])
    got = {tuple(np.round(p, 6)) for p in xz}
    # exactly two distinct xz points, both block corners, on a full diagonal
    assert len(got) == 2 and all(c in (0.0, 1.0) for p in got for c in p), got
    (p0, p1) = sorted(got)
    assert p0[0] != p1[0] and p0[1] != p1[1], got
    # 22.5° without rescale keeps the span strictly inside the block
    write(
        "assets/minecraft/models/block/tilt.json",
        {
            "textures": {"t": "block/t"},
            "elements": [
                {
                    "from": [0, 0, 8],
                    "to": [16, 16, 8],
                    "rotation": {"origin": [8, 8, 8], "axis": "x", "angle": 22.5},
                    "faces": {"north": {"texture": "#t"}},
                }
            ],
        },
    )
    pack2 = ResourcePack(str(root))
    (q2,) = model_to_quads(pack2, "block/tilt", fn)
    n = np.cross(q2["u"], q2["v"])
    n = n / np.linalg.norm(n)
    # plane normal tilted by exactly 22.5° from -z about x
    ang = np.rad2deg(np.arccos(abs(n[2])))
    assert abs(ang - 22.5) < 1e-4


def test_multipart_merge(tmp_path):
    """Multipart parts are ADDITIVE (fence post + each matching side), not
    first-match (round-1 gap vs resource_manager.rs)."""
    import json

    root = tmp_path / "pack"

    def write(rel, obj):
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(obj))

    write(
        "assets/minecraft/models/block/post.json",
        {
            "textures": {"t": "block/planks"},
            "elements": [
                {"from": [6, 0, 6], "to": [10, 16, 10], "faces": {"up": {"texture": "#t"}}}
            ],
        },
    )
    write(
        "assets/minecraft/models/block/side.json",
        {
            "textures": {"t": "block/planks"},
            "elements": [
                {"from": [7, 6, 0], "to": [9, 15, 6], "faces": {"up": {"texture": "#t"}}}
            ],
        },
    )
    write(
        "assets/minecraft/blockstates/fence.json",
        {
            "multipart": [
                {"apply": {"model": "block/post"}},
                {"when": {"north": "true"}, "apply": {"model": "block/side"}},
                {
                    "when": {"east": "true"},
                    "apply": {"model": "block/side", "y": 90, "uvlock": True},
                },
                {
                    "when": {"OR": [{"west": "true"}, {"up": "false"}]},
                    "apply": {"model": "block/side", "y": 270},
                },
            ]
        },
    )
    pack = ResourcePack(str(root))
    _, fn = _mat_table()
    # post only
    q0 = compile_blockstate(pack, "minecraft:fence#north=false,east=false,west=false,up=true", fn)
    assert len(q0) == 1
    # post + north + east
    q2 = compile_blockstate(pack, "minecraft:fence#north=true,east=true,west=false,up=true", fn)
    assert len(q2) == 3
    # OR condition: west=true OR up=false
    q3 = compile_blockstate(pack, "minecraft:fence#north=false,east=false,west=true,up=true", fn)
    assert len(q3) == 2


def test_tint_index_reaches_materials(tmp_path):
    import json

    root = tmp_path / "pack"

    def write(rel, obj):
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(obj))

    write(
        "assets/minecraft/models/block/grassy.json",
        {
            "textures": {"top": "block/grass_top", "side": "block/dirt"},
            "elements": [
                {
                    "from": [0, 0, 0],
                    "to": [16, 16, 16],
                    "faces": {
                        "up": {"texture": "#top", "tintindex": 0},
                        "north": {"texture": "#side"},
                    },
                }
            ],
        },
    )
    pack = ResourcePack(str(root))
    seen = {}

    def fn(tex, tint=-1):
        return seen.setdefault((tex, tint), len(seen))

    quads = model_to_quads(pack, "block/grassy", fn)
    assert ("block/grass_top", 0) in seen  # tinted face
    assert ("block/dirt", -1) in seen  # untinted face
    tints = {q["tint"] for q in quads}
    assert tints == {0, -1}


def test_quads_feed_model_builder(mini_pack):
    from octree_pathtracing_tpu.models.blockmodels import ModelBuilder

    _, fn = _mat_table()
    quads = compile_blockstate(mini_pack, "minecraft:slab#type=bottom", fn)
    mb = ModelBuilder()
    mb.add_simple(0)
    mid = mb.add_quad_model(quads[:8])
    models = mb.build([0, mid])
    assert int(models.quad_count[mid]) == min(len(quads), 8)
