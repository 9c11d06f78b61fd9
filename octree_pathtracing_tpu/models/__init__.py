from .camera import Camera, get_rays, pixel_grid_rays, normalize_pixel_coords
from .materials import MaterialTable, make_material_table, air
from .scene import Scene, make_scene, face_normals, MAX_DIST, EmitterSampling
from .sun import Sun, SunSampling, make_sun, sky_color
from .procedural import sphere_scene, cornell_scene, minecraft_chunk_scene

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
    "cornell_scene",
    "minecraft_chunk_scene",
]
