"""Config dataclasses + CLI flags.

The reference has no config system — settings live in UI widgets and
compile-time constants (SURVEY.md §5 "Config / flag system").  This module
centralizes them with the reference's values as defaults:

- target spp / branch count (``tile_renderer.rs:92-108``),
- bounce cap 5 (``path_tracer.rs:56``),
- max ray distance 1024 (``scene/mod.rs:181``),
- octree depth window 2..=12 for world loads (``world_loading.rs:27-29``),
- sun defaults (``scene/mod.rs:294-320``),
- traversal constants (``octree_traversal.rs:13-15``).
"""

from __future__ import annotations

import dataclasses
import json


@dataclasses.dataclass
class CameraConfig:
    eye: tuple = (0.0, 0.0, 10.0)
    look_at: tuple = (0.0, 0.0, 0.0)
    up: tuple = (0.0, 1.0, 0.0)
    fov_degrees: float = 70.0  # camera.rs:32
    aperture: float = 0.0
    focal_distance: float = 0.0


@dataclasses.dataclass
class SunConfig:
    azimuth: float = 1.2566370614359172  # pi/2.5
    altitude: float = 1.0471975511965976  # pi/3
    radius: float = 0.03
    luminosity: float = 100.0
    draw_texture: bool = True


@dataclasses.dataclass
class SamplingConfig:
    sun_strategy: str = "importance"  # off|non_luminous|fast|importance|high_quality
    emitter_strategy: str = "none"  # none|one|one_block|all
    emitters_enabled: bool = True
    f_sub_surface: float = 0.3


@dataclasses.dataclass
class RenderConfig:
    width: int = 1280  # main.rs window size
    height: int = 720
    target_spp: int = 64
    branch_count: int = 10  # tile_renderer.rs:104
    max_bounces: int = 5  # path_tracer.rs:56
    max_distance: float = 1024.0  # scene/mod.rs:181
    seed: int = 0
    mode: str = "pathtraced"  # pathtraced|preview


@dataclasses.dataclass
class WorldConfig:
    path: str = ""
    depth: int = 9  # region build depth (new_octree.rs:444); UI range 2..=12
    origin: tuple = (0.0, 0.0, 0.0)


@dataclasses.dataclass
class ShardingConfig:
    n_devices: int = 0  # 0 = all
    sample_axis: int = 0  # 0 = auto


@dataclasses.dataclass
class Config:
    render: RenderConfig = dataclasses.field(default_factory=RenderConfig)
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    sun: SunConfig = dataclasses.field(default_factory=SunConfig)
    sampling: SamplingConfig = dataclasses.field(default_factory=SamplingConfig)
    world: WorldConfig = dataclasses.field(default_factory=WorldConfig)
    sharding: ShardingConfig = dataclasses.field(default_factory=ShardingConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(text: str) -> "Config":
        raw = json.loads(text)

        def load(cls, d):
            return cls(**{k: tuple(v) if isinstance(v, list) else v for k, v in d.items()})

        return Config(
            render=load(RenderConfig, raw.get("render", {})),
            camera=load(CameraConfig, raw.get("camera", {})),
            sun=load(SunConfig, raw.get("sun", {})),
            sampling=load(SamplingConfig, raw.get("sampling", {})),
            world=load(WorldConfig, raw.get("world", {})),
            sharding=load(ShardingConfig, raw.get("sharding", {})),
        )


def sun_sampling_from_name(name: str):
    from .models.sun import SunSampling

    return {
        "off": SunSampling.off,
        "non_luminous": SunSampling.non_luminous,
        "fast": SunSampling.fast,
        "importance": SunSampling.importance,
        "high_quality": SunSampling.high_quality,
    }[name]()
