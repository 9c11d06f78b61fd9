"""Procedural test scenes matching BASELINE.json's config list.

Configs (``/root/repo/BASELINE.json``):
1. sphere + textured ground (earthmap-style checker fallback when no asset)
2. Cornell box voxelized to a depth-6 octree
3. Minecraft-style chunk with emissive blocks
"""

from __future__ import annotations

import numpy as np

from ..octree.build import build_from_dense
from ..ops.texture import build_atlas
from .camera import Camera
from .materials import (
    FLAG_OPAQUE,
    FLAG_SOLID,
    air,
    make_material_table,
)
from .scene import Scene, make_scene
from .sun import make_sun


def _checker_texture(size=16, c0=(200, 60, 60), c1=(240, 230, 210)):
    img = np.zeros((size, size, 4), np.uint8)
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    m = ((yy // 4) + (xx // 4)) % 2 == 0
    img[m] = (*c0, 255)
    img[~m] = (*c1, 255)
    return img


def _solid_texture(rgb, size=16):
    img = np.zeros((size, size, 4), np.uint8)
    img[..., :3] = rgb
    img[..., 3] = 255
    return img


def _earthmap_like(size=16):
    """Blue/green blobby texture standing in for earthmap.jpg when the asset
    is unavailable (upstream test assets are gitignored, SURVEY.md §4)."""
    rng = np.random.default_rng(0)
    img = np.zeros((size, size, 4), np.uint8)
    base = rng.random((size, size))
    land = base > 0.55
    img[..., 2] = np.where(land, 40, 180)
    img[..., 1] = np.where(land, 160, 80)
    img[..., 0] = np.where(land, 60, 30)
    img[..., 3] = 255
    return img


def sphere_scene(depth: int = 6, earthmap: np.ndarray | None = None):
    """Config 1: voxelized sphere above a textured ground slab."""
    s = 1 << depth
    grid = np.zeros((s, s, s), np.uint32)
    # ground slab: material 1
    grid[:, 0 : max(1, s // 16), :] = 1
    # sphere: material 2, radius s/4 centered mid-air
    c = np.array([s / 2, s / 2.5, s / 2])
    r = s / 4.5
    xs, ys, zs = np.meshgrid(np.arange(s), np.arange(s), np.arange(s), indexing="ij")
    inside = (xs + 0.5 - c[0]) ** 2 + (ys + 0.5 - c[1]) ** 2 + (zs + 0.5 - c[2]) ** 2 < r * r
    grid[inside] = 2
    tree = build_from_dense(grid)

    textures = [
        _solid_texture((255, 0, 255)),  # 0: default magenta (texture.rs:49)
        _earthmap_like() if earthmap is None else earthmap,  # ground
        _checker_texture(),  # sphere
    ]
    materials = [
        air(),
        dict(texture_index=1),
        dict(texture_index=2, specular=0.0),
    ]
    # a supplied earthmap keeps its native resolution (rtw_image.rs accepts
    # any size); the synthetic fallback stays at the 16x16 block size
    atlas = build_atlas(textures, size=16 if earthmap is None else None)
    scene = make_scene(tree, make_material_table(materials), atlas)
    camera = Camera.look_at(
        eye=(s * 0.5, s * 0.55, -s * 0.9), center=(s * 0.5, s * 0.35, s * 0.5)
    )
    return scene, camera


def analytic_sphere_scene(depth: int = 5, earthmap: np.ndarray | None = None):
    """Config 1, analytic form: a true (non-voxelized) sphere primitive above
    the textured voxel ground slab, plus a free-standing quad — exercising the
    reference's Scene-held quads/spheres (``scene/mod.rs:146-156``,
    ``sphere.rs``) through the primitive path (``models/prims.py``)."""
    from .prims import make_primitives

    s = 1 << depth
    grid = np.zeros((s, s, s), np.uint32)
    grid[:, 0 : max(1, s // 16), :] = 1
    tree = build_from_dense(grid)

    textures = [
        _solid_texture((255, 0, 255)),
        _earthmap_like() if earthmap is None else earthmap,
        _checker_texture(),
        _solid_texture((220, 200, 80)),
    ]
    materials = [
        air(),
        dict(texture_index=1),
        dict(texture_index=2, specular=0.0),
        dict(texture_index=3),
    ]
    prims = make_primitives(
        spheres=[((s * 0.5, s * 0.45, s * 0.5), s / 4.5, 2)],
        quads=(
            # u x v = -z: faces the camera (backface cull, quad.rs:176-179)
            np.array([[s * 0.1, s * 0.1, s * 0.75]], np.float32),  # origin
            np.array([[0.0, s * 0.3, 0.0]], np.float32),  # u edge (up)
            np.array([[s * 0.25, 0.0, 0.0]], np.float32),  # v edge (right)
            np.array([3], np.int32),
        ),
    )
    atlas = build_atlas(textures, size=16 if earthmap is None else None)
    scene = make_scene(tree, make_material_table(materials), atlas, prims=prims)
    camera = Camera.look_at(
        eye=(s * 0.51, s * 0.55, -s * 0.9), center=(s * 0.5, s * 0.35, s * 0.5)
    )
    return scene, camera


def cornell_scene(depth: int = 6):
    """Config 2: Cornell box — white floor/ceiling/back, red/green walls,
    emissive ceiling patch, two boxes."""
    s = 1 << depth
    grid = np.zeros((s, s, s), np.uint32)
    W, R, G, L, B1, B2 = 1, 2, 3, 4, 5, 6
    grid[:, 0, :] = W  # floor
    grid[:, s - 1, :] = W  # ceiling
    grid[:, :, s - 1] = W  # back wall
    grid[0, :, :] = R  # left red
    grid[s - 1, :, :] = G  # right green
    q = s // 4
    grid[s // 2 - q // 2 : s // 2 + q // 2, s - 1, s // 2 - q // 2 : s // 2 + q // 2] = L
    # tall box
    grid[q : 2 * q, 1 : s // 2, s // 2 : s // 2 + q] = B1
    # short box
    grid[s - 2 * q : s - q, 1 : s // 4, q : 2 * q] = B2
    tree = build_from_dense(grid)

    textures = [
        _solid_texture((255, 0, 255)),
        _solid_texture((230, 230, 230)),  # white
        _solid_texture((200, 40, 40)),  # red
        _solid_texture((40, 200, 40)),  # green
        _solid_texture((255, 255, 255)),  # light
        _solid_texture((180, 180, 200)),
        _solid_texture((200, 180, 160)),
    ]
    materials = [
        air(),
        dict(texture_index=1),
        dict(texture_index=2),
        dict(texture_index=3),
        dict(texture_index=4, emittance=8.0),
        dict(texture_index=5),
        dict(texture_index=6),
    ]
    # sun off-ish: interior box lit by the emissive patch
    sun = make_sun(altitude=-np.pi / 3)
    scene = make_scene(tree, make_material_table(materials), build_atlas(textures), sun=sun)
    # eye slightly off the voxel-center axes: an exactly-centered camera sends
    # many rays along voxel boundary planes (degenerate traversal knife-edges)
    camera = Camera.look_at(
        eye=(s * 0.513, s * 0.492, -s * 1.2), center=(s * 0.507, s * 0.496, s * 0.5)
    )
    return scene, camera


def terrain_grid(depth: int, seed: int = 0) -> np.ndarray:
    """Vectorized Minecraft-ish heightfield terrain (any depth up to 9+):
    stone/dirt/grass columns, emissive glowstone, a water pool."""
    rng = np.random.default_rng(seed)
    s = 1 << depth
    GRASS, DIRT, STONE, GLOW, WATER = 1, 2, 3, 4, 5
    hx = np.linspace(0, 3.0 * max(1, s // 32), s)
    hz = np.linspace(0, 2.0 * max(1, s // 32), s)
    height = (
        s // 3
        + np.sin(hx)[:, None] * (s / 10)
        + np.cos(hz)[None, :] * (s / 16)
        + rng.normal(0, max(0.5, s / 64), (s, s))
    ).astype(np.int64).clip(2, s - 3)
    # slab-by-slab assembly: small cache-resident temporaries instead of
    # whole-volume broadcast chains (hosts here are memory-bandwidth-poor)
    grid = np.zeros((s, s, s), np.uint32)
    h16 = height.astype(np.int16)
    for y in range(s):
        slab = (
            (y < h16 - 2) * np.uint32(STONE)
            + ((y >= h16 - 2) & (y < h16)) * np.uint32(DIRT)
            + (y == h16) * np.uint32(GRASS)
        )
        grid[:, y, :] = slab
    # glowstone scattered above ground
    n_glow = max(2, s // 4)
    gx = rng.integers(0, s, n_glow)
    gz = rng.integers(0, s, n_glow)
    grid[gx, (height[gx, gz] + 2).clip(0, s - 1), gz] = GLOW
    # water pool
    grid[s // 4 : s // 2, s // 3 - 1 : s // 3 + 1, s // 4 : s // 2] = WATER
    return grid


def minecraft_chunk_scene(depth: int = 5, seed: int = 0, cache_dir: str | None = None):
    """Config 3: Minecraft-ish terrain chunk — grass/dirt/stone heightfield,
    scattered emissive glowstone, a water pool.

    ``cache_dir``: optional directory to cache the built node pool (large
    depths take minutes of host time on bandwidth-poor machines).
    """
    import os

    s = 1 << depth
    tree = None
    cache_path = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        cache_path = os.path.join(cache_dir, f"terrain_d{depth}_s{seed}.npz")
        if os.path.exists(cache_path):
            from ..octree.node_pool import Octree

            z = np.load(cache_path)
            tree = Octree(z["mask"], z["data"], int(z["root"]), int(z["depth"]))
    if tree is None:
        tree = build_from_dense(terrain_grid(depth, seed))
        if cache_path:
            np.savez_compressed(
                cache_path,
                mask=np.asarray(tree.child_mask),
                data=np.asarray(tree.child_data),
                root=tree.root,
                depth=tree.depth,
            )

    textures = [
        _solid_texture((255, 0, 255)),
        _solid_texture((60, 180, 60)),
        _solid_texture((134, 96, 67)),
        _solid_texture((130, 130, 130)),
        _solid_texture((255, 220, 120)),
        _solid_texture((50, 90, 220)),
    ]
    materials = [
        air(),
        dict(texture_index=1),
        dict(texture_index=2),
        dict(texture_index=3),
        dict(texture_index=4, emittance=6.0),
        dict(texture_index=5, ior=1.33, specular=0.1, flags=FLAG_OPAQUE | FLAG_SOLID),
    ]
    scene = make_scene(tree, make_material_table(materials), build_atlas(textures))
    camera = Camera.look_at(
        eye=(-s * 0.4, s * 0.8, -s * 0.4), center=(s * 0.5, s * 0.3, s * 0.5)
    )
    return scene, camera


def _cutout_leaf_texture(size=16, seed=3):
    """Leaf-style cutout texture: alpha is exactly {0, 255} (Minecraft leaf
    blocks), so surfaces are binary but the accept callback must alpha-test
    every candidate and the shadow walk cannot take the all-opaque fast path."""
    rng = np.random.default_rng(seed)
    img = np.zeros((size, size, 4), np.uint8)
    img[..., 1] = rng.integers(120, 200, (size, size))
    img[..., 0] = 30
    img[..., 2] = 30
    img[..., 3] = np.where(rng.random((size, size)) < 0.72, 255, 0)
    return img


def cutout_terrain_grid(depth: int, seed: int = 0) -> np.ndarray:
    """``terrain_grid`` plus trees: opaque trunks and cutout leaf canopies.

    The canopy blocks use an alpha-holed texture and the water pool is made
    translucent, so scenes built from this grid have ``opaque_only=False``
    AND ``shadow_binary=False`` — every traversal needs the accept callback
    and every sun/emitter shadow ray takes the general stateful multi-surface
    walk (``path_tracer.rs:458-483``), the configuration real resource-pack
    worlds (leaves, glass) are in.
    """
    rng = np.random.default_rng(seed + 1000)
    s = 1 << depth
    TRUNK, LEAF = 6, 7
    grid = terrain_grid(depth, seed)
    # column heights recomputed the same way terrain_grid derives them:
    # find the grass surface per column from the grid itself (material 1)
    grass_y = np.argmax(grid[:, ::-1, :] == 1, axis=1)
    surface = (s - 1 - grass_y).astype(np.int64)  # y of grass; s-1 if none
    n_trees = max(2, s // 8)
    tx = rng.integers(2, s - 3, n_trees)
    tz = rng.integers(2, s - 3, n_trees)
    th = rng.integers(3, max(4, s // 12) + 3, n_trees)
    for x, z, h in zip(tx, tz, th):
        y0 = surface[x, z] + 1
        if y0 + h + 2 >= s:
            continue
        grid[x, y0 : y0 + h, z] = TRUNK
        # canopy: a 3-5 wide leafy blob around the trunk top
        r = int(rng.integers(1, 3))
        xs = slice(max(0, x - r), min(s, x + r + 1))
        zs = slice(max(0, z - r), min(s, z + r + 1))
        ys = slice(y0 + h - 1, min(s, y0 + h + 2))
        canopy = grid[xs, ys, zs]
        canopy[canopy == 0] = LEAF
        grid[xs, ys, zs] = canopy
    return grid


def cutout_chunk_scene(depth: int = 5, seed: int = 0, cache_dir: str | None = None):
    """Cutout/translucent terrain: the bench scene for the STATEFUL shadow
    walk (VERDICT r4 #1).  Same heightfield as ``minecraft_chunk_scene`` plus
    trees with alpha-cutout leaf canopies and translucent water, so
    ``shadow_binary`` / ``opaque_only`` are both False and the integrator runs
    the configuration pack worlds take: accept-callback traversal + the
    general multi-surface shadow walk."""
    import os

    s = 1 << depth
    tree = None
    cache_path = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        cache_path = os.path.join(cache_dir, f"cutout_d{depth}_s{seed}.npz")
        if os.path.exists(cache_path):
            from ..octree.node_pool import Octree

            z = np.load(cache_path)
            tree = Octree(z["mask"], z["data"], int(z["root"]), int(z["depth"]))
    if tree is None:
        tree = build_from_dense(cutout_terrain_grid(depth, seed))
        if cache_path:
            np.savez_compressed(
                cache_path,
                mask=np.asarray(tree.child_mask),
                data=np.asarray(tree.child_data),
                root=tree.root,
                depth=tree.depth,
            )

    water = _solid_texture((50, 90, 220))
    water[..., 3] = 150  # translucent: the shadow walk marches through it
    textures = [
        _solid_texture((255, 0, 255)),
        _solid_texture((60, 180, 60)),  # grass
        _solid_texture((134, 96, 67)),  # dirt
        _solid_texture((130, 130, 130)),  # stone
        _solid_texture((255, 220, 120)),  # glowstone
        water,
        _solid_texture((90, 60, 30)),  # trunk
        _cutout_leaf_texture(),  # leaves (alpha {0,255})
    ]
    materials = [
        air(),
        dict(texture_index=1),
        dict(texture_index=2),
        dict(texture_index=3),
        dict(texture_index=4, emittance=6.0),
        dict(texture_index=5, ior=1.33, specular=0.1, flags=FLAG_OPAQUE | FLAG_SOLID),
        dict(texture_index=6),
        dict(texture_index=7),
    ]
    scene = make_scene(tree, make_material_table(materials), build_atlas(textures))
    assert not scene.opaque_only and not scene.shadow_binary
    camera = Camera.look_at(
        eye=(-s * 0.4, s * 0.8, -s * 0.4), center=(s * 0.5, s * 0.3, s * 0.5)
    )
    return scene, camera


def emissive_room_scene(depth: int = 3):
    """Closed diffuse room lit ONLY by its emissive ceiling — the
    ``EmitterSampling.ONE`` validation scene (VERDICT r3 #6 done-criterion:
    the reference declares the strategy but never implements it,
    ``scene/mod.rs:39-57``).  No ray can escape, so all light is emitter
    transport: NONE at high spp and ONE at low spp must converge to the same
    mean image.
    """
    s = 1 << depth
    grid = np.zeros((s, s, s), np.uint32)
    W, L = 1, 2
    grid[0, :, :] = W
    grid[s - 1, :, :] = W
    grid[:, 0, :] = W
    grid[:, :, 0] = W
    grid[:, :, s - 1] = W
    grid[:, s - 1, :] = L  # whole ceiling emits

    tree = build_from_dense(grid)
    textures = [
        _solid_texture((255, 0, 255)),
        _solid_texture((210, 210, 210)),
        _solid_texture((255, 240, 220)),
    ]
    materials = [
        air(),
        dict(texture_index=1),
        dict(texture_index=2, emittance=4.0),
    ]
    scene = make_scene(
        tree,
        make_material_table(materials),
        build_atlas(textures),
        sun=make_sun(altitude=-np.pi / 2),
        emitter_sampling="one",
    )
    camera = Camera.look_at(
        eye=(s * 0.52, s * 0.43, s * 0.55), center=(s * 0.21, s * 0.35, s * 0.2)
    )
    return scene, camera


def scattered_lights_scene(depth: int = 5, n_lights: int = 150, seed: int = 1):
    """Closed dark room with ``n_lights`` small emissive blocks scattered over
    the floor — the emitter-NEE *scale* scene (VERDICT r4 #4).  The camera
    sits near one corner: the integrand is dominated by nearby lights, so a
    uniform pick over the table wastes most samples on far lights while the
    spatial mixture pick (``models/emitters.build_spatial_grid``) spends them
    nearby.  Used by the variance test and the scattered-emitter bench."""
    rng = np.random.default_rng(seed)
    s = 1 << depth
    grid = np.zeros((s, s, s), np.uint32)
    W, L = 1, 2
    grid[0, :, :] = W
    grid[s - 1, :, :] = W
    grid[:, 0, :] = W
    grid[:, s - 1, :] = W
    grid[:, :, 0] = W
    grid[:, :, s - 1] = W
    lx = rng.integers(1, s - 1, n_lights)
    lz = rng.integers(1, s - 1, n_lights)
    grid[lx, 1, lz] = L  # lights sit ON the floor (y=1)

    tree = build_from_dense(grid)
    textures = [
        _solid_texture((255, 0, 255)),
        _solid_texture((140, 140, 140)),
        _solid_texture((255, 230, 180)),
    ]
    materials = [
        air(),
        dict(texture_index=1),
        dict(texture_index=2, emittance=12.0),
    ]
    scene = make_scene(
        tree,
        make_material_table(materials),
        build_atlas(textures),
        sun=make_sun(altitude=-np.pi / 2),
        emitter_sampling="one",
    )
    camera = Camera.look_at(
        eye=(s * 0.12, s * 0.3, s * 0.12), center=(s * 0.45, s * 0.1, s * 0.45)
    )
    return scene, camera


def plant_scene(depth: int = 3):
    """Quad-model + sun-NEE scene for sharding dry runs and integration tests:
    stone floor, a row of cross-plant quad models (non-simple block models),
    and the HIGH_QUALITY sun strategy (NEE shadow walk enabled —
    ``scene/mod.rs:78-127``)."""
    from .blockmodels import ModelBuilder, cross_plant_quads
    from .sun import SunSampling

    s = 1 << depth
    grid = np.zeros((s, s, s), np.uint32)
    grid[:, 0, :] = 1  # stone floor
    grid[1 : s - 1 : 2, 1, 1 : s - 1 : 2] = 2  # plants

    tree = build_from_dense(grid)
    textures = [
        _solid_texture((255, 0, 255)),
        _solid_texture((128, 128, 128)),
        _solid_texture((40, 200, 40)),
    ]
    materials = [air(), dict(texture_index=1), dict(texture_index=2)]

    mb = ModelBuilder()
    m_air = mb.add_simple(0)
    m_stone = mb.add_simple(1)
    m_plant = mb.add_quad_model(cross_plant_quads(material=2))
    models = mb.build([m_air, m_stone, m_plant])

    scene = make_scene(
        tree,
        make_material_table(materials),
        build_atlas(textures),
        models=models,
        sun_sampling=SunSampling.high_quality(),
    )
    camera = Camera.look_at(
        eye=(s * 0.51, s * 0.61, -s * 0.9), center=(s * 0.5, s * 0.25, s * 0.5)
    )
    return scene, camera
