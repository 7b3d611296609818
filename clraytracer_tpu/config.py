"""Runtime configuration.

The reference has no config system — everything is a compile-time constant
(pool sizes ResourceManager.cpp:32-40, ``MaxNumInstances=401`` Renderer.hpp:16,
camera defaults Camera.hpp:15-26, window 1249x720 Window.cpp:15) plus
preprocessor switches. Here all of those become dataclass fields consumed by
the renderer, CLI, and bench harness.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """FPS camera parameters (reference Math/Camera.hpp:15-34)."""

    position: Tuple[float, float, float] = (0.0, 4.0, 15.0)
    yaw_deg: float = -90.0
    pitch_deg: float = 0.0
    vertical_fov_deg: float = 65.0
    near_clip: float = 0.01
    far_clip: float = 500.0


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Frame/render parameters.

    ``bounces=2`` mirrors the reference's primary + one reflection loop
    (kernel_main.cl:187); ``sun_angle`` is the editor-driven light direction
    default (Engine.cpp:18: ``SunAngle = -1.96f``).
    """

    width: int = 1249
    height: int = 720
    bounces: int = 2
    sun_angle: float = -1.96
    # Post chain (kernel_main.cl:342-359). FXAA exists in the reference but
    # the call is commented out (kernel_main.cl:349) — here it is a toggle.
    enable_post: bool = True
    enable_fxaa: bool = False
    # Sub-pixel supersampling (beyond the reference, whose only AA is the
    # FXAA it ships disabled): N jittered frames averaged before post.
    samples: int = 1
    # Sun shadow rays on primary hits. The reference declares the shadow
    # factor but never implements it (kernel_main.cl:258, README.md:11
    # "TODO shadows"); off by default for reference parity.
    enable_shadows: bool = False
    # Snell refraction through materials with transmission > 0 (also on the
    # reference's TODO list, README.md:12 "refraction"); off by default for
    # reference parity. Refracting lanes continue through the surface
    # instead of reflecting (total internal reflection falls back).
    enable_refraction: bool = False
    refraction_ior: float = 1.45
    # Reproduce the reference kernel's hard-coded shading constants
    # (kernel_main.cl:248-250 override material specular/roughness/shininess).
    reference_parity_shading: bool = True
    # Bit-faithful integer color modulate (non-differentiable); the float
    # path is used for gradient work.
    integer_colors: bool = True
    # Frame-time watchdog in ms (the reference kills the app when a frame
    # exceeds 80 ms after warmup, Renderer.cpp:370-371 "GPU Bottleneck!").
    # None disables; set e.g. 80.0 for reference-parity behavior — the
    # Engine raises FrameWatchdogError instead of exit(0).
    frame_watchdog_ms: float | None = None
    # Monte-Carlo diffuse global illumination (beyond the reference, which
    # ships its hemisphere sampler unused — MathAndSTL.cl:208-215 is never
    # called from Trace): secondary bounces continue in a uniformly sampled
    # hemisphere direction (the reference's sampler, pdf 1/2pi) with
    # albedo * 2*cosTheta throughput instead of the mirror reflection. Combine with ``samples`` (one decorrelated stream per
    # sample) to integrate; off by default for reference parity.
    enable_gi: bool = False
    gi_seed: int = 0

    @property
    def resolution(self) -> Tuple[int, int]:
        return (self.width, self.height)

    @property
    def num_pixels(self) -> int:
        return self.width * self.height


@dataclasses.dataclass(frozen=True)
class PoolConfig:
    """Capacity plan for preallocated scene pools.

    Mirrors the reference's arena sizes (ResourceManager.cpp:32-40,
    Renderer.hpp:16). On TPU these bound padded device-array shapes so
    re-imports never trigger recompilation.
    """

    max_triangles: int = 2_400_000
    max_bvh_nodes: int = 2_400_000
    max_textures: int = 32
    max_texel_bytes: int = 100 * 1024 * 1024
    max_materials: int = 256
    max_meshes: int = 128
    max_instances: int = 401


@dataclasses.dataclass(frozen=True)
class ShardingConfig:
    """Device-mesh layout for multi-chip / multi-host rendering (new design
    territory — the reference is single-GPU, SURVEY.md §2)."""

    # Mesh axis names: rays/tiles are sharded over 'devices'.
    data_axis: str = "devices"
    # Tile size (rows of pixels per shard unit) used when padding H to a
    # multiple of the device count.
    row_align: int = 8
