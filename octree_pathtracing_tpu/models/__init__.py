from .camera import (
    Camera,
    get_rays,
    get_rays_dof,
    move_camera,
    normalize_pixel_coords,
    pixel_grid_rays,
    rotate_camera,
)
from .materials import MaterialTable, make_material_table, air
from .scene import Scene, make_scene, face_normals, MAX_DIST, EmitterSampling
from .sun import Sun, SunSampling, make_sun, sky_color
from .procedural import (
    analytic_sphere_scene,
    cornell_scene,
    cutout_chunk_scene,
    cutout_terrain_grid,
    emissive_room_scene,
    minecraft_chunk_scene,
    plant_scene,
    scattered_lights_scene,
    sphere_scene,
    terrain_grid,
)
from .prims import Primitives, make_primitives
from .blockmodels import BlockModels, ModelBuilder, cross_plant_quads, slab_quads
from .mca import load_world, build_region_octree
from .blockpalette import compile_block_palette, minecraft_scene_from_region

__all__ = [
    "Camera",
    "get_rays",
    "pixel_grid_rays",
    "normalize_pixel_coords",
    "MaterialTable",
    "make_material_table",
    "air",
    "Scene",
    "make_scene",
    "face_normals",
    "MAX_DIST",
    "EmitterSampling",
    "Sun",
    "SunSampling",
    "make_sun",
    "sky_color",
    "sphere_scene",
    "analytic_sphere_scene",
    "Primitives",
    "make_primitives",
    "cornell_scene",
    "emissive_room_scene",
    "minecraft_chunk_scene",
    "cutout_chunk_scene",
    "scattered_lights_scene",
    "cutout_terrain_grid",
    "plant_scene",
]
