"""Minecraft resource-pack asset compiler: blockstate/model JSONs -> tables.

The TPU-native equivalent of the reference's ``ModelBuilder``
(``/root/reference/src/scene/resource_manager.rs``):

- blockstate JSON resolution: variants (including property-key matching) ->
  model reference + x/y rotation (``resource_manager.rs:331-426``),
- block-model parent-chain resolution with ``#texture_variable``
  indirection (``:444-486, 893-912``),
- elements (from/to boxes, per-face uv + texture + cullface) -> quads in
  block-local [0,1]^3 coordinates (``:772-786, 830-872``),
- face rotations about the block center for variant x/y rotations
  (``:587-703`` rotation permutations, as quad transforms),
- global dedup of materials and textures (``:126-318``).

Outputs feed :class:`~.blockmodels.ModelBuilder` + the texture atlas, giving
real block geometry (slabs, stairs, cross-plants, torches) and real textures
when a resource pack directory (``assets/minecraft/models``,
``.../textures``, ``.../blockstates``) is available; the color-table
compiler in ``blockpalette.py`` remains the no-assets fallback.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

# face name -> (origin, u, v) in block-local units, per the reference's
# commented face table (src/geometry/quad.rs:26-84) scaled by /16
_FACE_BASIS = {
    "down": (lambda f, t: ([f[0], f[1], f[2]], [t[0] - f[0], 0, 0], [0, 0, t[2] - f[2]])),
    "up": (lambda f, t: ([t[0], t[1], f[2]], [f[0] - t[0], 0, 0], [0, 0, t[2] - f[2]])),
    "north": (lambda f, t: ([t[0], f[1], f[2]], [f[0] - t[0], 0, 0], [0, t[1] - f[1], 0])),
    "south": (lambda f, t: ([f[0], f[1], t[2]], [t[0] - f[0], 0, 0], [0, t[1] - f[1], 0])),
    "west": (lambda f, t: ([f[0], f[1], f[2]], [0, 0, t[2] - f[2]], [0, t[1] - f[1], 0])),
    "east": (lambda f, t: ([t[0], f[1], t[2]], [0, 0, f[2] - t[2]], [0, t[1] - f[1], 0])),
}

_FACE_TO_ID = {"west": 0, "east": 1, "down": 2, "up": 3, "north": 4, "south": 5}


class ResourcePack:
    """Reads model/blockstate/texture JSONs from a pack directory tree."""

    def __init__(self, root: str):
        self.root = root
        self._model_cache: dict[str, dict] = {}

    def _path(self, kind: str, name: str, ext: str) -> str:
        ns, _, rest = name.partition(":")
        if not rest:
            ns, rest = "minecraft", ns
        return os.path.join(self.root, "assets", ns, kind, rest + ext)

    def load_json(self, kind: str, name: str) -> Optional[dict]:
        p = self._path(kind, name, ".json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def texture_path(self, name: str) -> Optional[str]:
        p = self._path("textures", name, ".png")
        return p if os.path.exists(p) else None

    # ---- model resolution (parent chain + texture variables) ----

    def resolve_model(self, name: str) -> dict:
        """Flatten the parent chain: merged elements + texture variable map
        (``resource_manager.rs:444-486``)."""
        if name in self._model_cache:
            return self._model_cache[name]
        chain = []
        cur = name
        for _ in range(16):  # parent chains are short; guard cycles
            m = self.load_json("models", cur)
            if m is None:
                break
            chain.append(m)
            cur = m.get("parent", "")
            if not cur or cur.startswith("builtin/"):
                break
        textures: dict[str, str] = {}
        elements = None
        for m in reversed(chain):  # parents first, children override
            textures.update(m.get("textures", {}))
            if "elements" in m:
                elements = m["elements"]
        resolved = {"textures": textures, "elements": elements or []}
        self._model_cache[name] = resolved
        return resolved

    def resolve_texture_var(self, textures: dict, ref: str, depth: int = 8) -> Optional[str]:
        """Follow '#var' indirection chains (``resource_manager.rs:893-912``)."""
        while ref.startswith("#") and depth > 0:
            ref = textures.get(ref[1:], "")
            depth -= 1
        return ref or None


def _rotate_point_y(p, quarters):
    x, y, z = p
    for _ in range(quarters % 4):
        x, z = z, 1.0 - x
    return [x, y, z]


def _rotate_vec_y(v, quarters):
    x, y, z = v
    for _ in range(quarters % 4):
        x, z = z, -x
    return [x, y, z]


def _rotate_point_x(p, quarters):
    x, y, z = p
    for _ in range(quarters % 4):
        y, z = 1.0 - z, y
    return [x, y, z]


def _rotate_vec_x(v, quarters):
    x, y, z = v
    for _ in range(quarters % 4):
        y, z = -z, y
    return [x, y, z]


def model_to_quads(
    pack: ResourcePack,
    model_name: str,
    material_of_texture,
    rot_x: int = 0,
    rot_y: int = 0,
) -> list[dict]:
    """Resolve one model into quad dicts for ModelBuilder.add_quad_model.

    ``material_of_texture(texture_name) -> material id`` performs the global
    texture/material dedup (``resource_manager.rs:126-318``).
    Variant rotations are quarter-turn point/vector rotations about the
    block center (the SimpleAABB face permutations of ``:587-703``
    generalized to quads).
    """
    resolved = pack.resolve_model(model_name)
    quads = []
    for el in resolved["elements"]:
        f = [c / 16.0 for c in el.get("from", [0, 0, 0])]
        t = [c / 16.0 for c in el.get("to", [16, 16, 16])]
        for face_name, face in el.get("faces", {}).items():
            if face_name not in _FACE_BASIS:
                continue
            o, u, v = _FACE_BASIS[face_name](f, t)
            tex_ref = face.get("texture", "")
            tex = pack.resolve_texture_var(resolved["textures"], tex_ref)
            if tex is None:
                continue
            mat = material_of_texture(tex)
            uv = face.get("uv")
            if uv:
                ur = (uv[0] / 16.0, uv[2] / 16.0)
                vr = (uv[1] / 16.0, uv[3] / 16.0)
            else:
                ur, vr = (0.0, 1.0), (0.0, 1.0)
            # variant rotations: x then y (resource_manager.rs:331-426)
            qx = (rot_x // 90) % 4
            qy = (rot_y // 90) % 4
            if qx:
                o = _rotate_point_x(o, qx)
                u = _rotate_vec_x(u, qx)
                v = _rotate_vec_x(v, qx)
            if qy:
                o = _rotate_point_y(o, qy)
                u = _rotate_vec_y(u, qy)
                v = _rotate_vec_y(v, qy)
            quads.append(dict(origin=o, u=u, v=v, material=mat, uv_range=(ur, vr)))
    return quads


def pick_variant(blockstate_json: dict, properties: dict) -> Optional[dict]:
    """Select a variant entry for a property set (``resource_manager.rs``
    variant matching).  Multipart is applied additively."""
    variants = blockstate_json.get("variants")
    if variants is not None:
        prop_str = ",".join(f"{k}={v}" for k, v in sorted(properties.items()))
        for key in (prop_str, ""):
            if key in variants:
                v = variants[key]
                return v[0] if isinstance(v, list) else v
        # partial matches: every key=val in the variant key must hold
        for key, v in variants.items():
            if not key:
                continue
            pairs = dict(kv.split("=") for kv in key.split(","))
            if all(properties.get(k) == val for k, val in pairs.items()):
                return v[0] if isinstance(v, list) else v
        return None
    # multipart: merge all matching parts' first models
    parts = blockstate_json.get("multipart", [])
    for part in parts:
        when = part.get("when")
        ok = True
        if when:
            ok = all(
                str(properties.get(k)) in str(v).split("|") for k, v in when.items()
                if k != "OR"
            )
        if ok:
            apply = part.get("apply")
            return apply[0] if isinstance(apply, list) else apply
    return None


def compile_blockstate(
    pack: ResourcePack, blockstate_key: str, material_of_texture
) -> Optional[list[dict]]:
    """Blockstate string ('ns:name#k=v,...') -> quad list, or None if the
    pack lacks assets for it."""
    base, _, props_str = blockstate_key.partition("#")
    props = dict(kv.split("=") for kv in props_str.split(",")) if props_str else {}
    bs = pack.load_json("blockstates", base)
    if bs is None:
        return None
    variant = pick_variant(bs, props)
    if variant is None:
        return None
    model = variant.get("model", "")
    if model.startswith("minecraft:"):
        model = model.split(":", 1)[1]
    if not model.startswith("block/"):
        model = model
    return model_to_quads(
        pack,
        model,
        material_of_texture,
        rot_x=int(variant.get("x", 0)),
        rot_y=int(variant.get("y", 0)),
    )
