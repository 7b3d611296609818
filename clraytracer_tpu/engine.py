"""Engine: the frame-loop / scene-script layer.

TPU-native re-design of the reference's Engine (Engine.cpp, Engine.hpp):

* ``Engine`` owns a SceneBuilder, a Camera, and per-frame state; ``start``
  builds the device scene (Engine_Start, Engine.cpp:56-80), ``tick`` applies
  input-driven animation and instance-transform updates (Engine_Tick,
  Engine.cpp:82-128), ``render`` produces the frame, and ``end_frame`` drains
  the deferred-event queue (Engine_EndFrame, Engine.cpp:130-134).
* **End-of-frame events** (Engine_AddEndOfFrameEvent, Engine.cpp:13-20):
  callbacks deferred until after the in-flight frame — the reference uses
  them for render-target resizes; here they cover scene/resolution edits
  that must not interleave with a dispatched frame.
* **Exit events** (Engine_AddOnExitEvent, Engine.cpp:22-28) run on ``close``.
* **Instance updates**: ``set_instance_transform`` marks the instance table
  dirty; the next frame rebuilds the small instance arrays + packed rows —
  the analogue of the dirty-range ``clEnqueueWriteBuffer`` upload
  (Renderer.cpp:312-320).
* **Profiler stats** flow through utils.timer.profiler_stats
  (Engine_UpdateProfilerStats, Engine.cpp:36-51).

Headless by design: the reference's Window/ImGui display layer is
display-side (SURVEY.md §7); drive this from a script, notebook, or viewer.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import numpy as np

import jax

from clraytracer_tpu.camera import Camera
from clraytracer_tpu.config import CameraConfig, RenderConfig
from clraytracer_tpu.render import (
    TRACERS,
    frame_inputs_from_camera,
    render_frame_jit,
)
from clraytracer_tpu.scene.builder import SceneBuilder
from clraytracer_tpu.scene.types import Scene
from clraytracer_tpu.utils.timer import ScopeTimer, profiler_stats


class FrameWatchdogError(RuntimeError):
    """Raised when a steady-state frame exceeds
    RenderConfig.frame_watchdog_ms (reference Renderer.cpp:370-371)."""


class Engine:
    """Frame-loop orchestration over a built scene."""

    def __init__(
        self,
        builder: SceneBuilder | None = None,
        config: RenderConfig = RenderConfig(),
        camera_config: CameraConfig | None = None,
        tracer: str = "best",
        scene: Scene | None = None,
    ) -> None:
        """Provide either a ``builder`` (call ``start()`` to build+upload)
        or an already-built ``scene`` (viewer/tools path)."""
        assert builder is not None or scene is not None
        self.builder = builder
        self.config = config
        self.tracer = tracer
        self.camera = Camera.create(
            camera_config or CameraConfig(), config.width, config.height
        )
        self.scene: Scene | None = scene
        self.sun_angle = float(config.sun_angle)
        self.frame_index = 0
        self._end_of_frame: list[Callable[[], None]] = []
        self._on_exit: list[Callable[[], None]] = []
        self._instances_dirty = False

    # -- events (Engine.cpp:13-28) -----------------------------------------

    def add_end_of_frame_event(self, fn: Callable[[], None]) -> None:
        self._end_of_frame.append(fn)

    def add_on_exit_event(self, fn: Callable[[], None]) -> None:
        self._on_exit.append(fn)

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> Scene:
        """Build + upload the scene (Engine_Start → PushMeshesToGPU)."""
        with ScopeTimer("engine.start"):
            self.scene = jax.device_put(self.builder.build())
        return self.scene

    def set_instance_transform(self, handle: int, transform: np.ndarray) -> None:
        """SetMeshMatrix equivalent — takes effect next frame."""
        self.builder.set_instance_transform(handle, transform)
        self._instances_dirty = True

    def update_camera(self, **kwargs) -> None:
        self.camera = self.camera.updated(**kwargs)

    def tick(self, dt: float = 1.0 / 60.0) -> None:
        """Per-frame update: refresh dirty instance state (the dirty-range
        upload analogue). Animation scripts call set_instance_transform /
        update_camera before or inside tick."""
        if self._instances_dirty and self.scene is not None:
            instances = self.builder.instance_arrays()
            scene = dataclasses.replace(self.scene, instances=instances)
            # packed instance rows must track the canonical table
            from clraytracer_tpu.ops.shade import refresh_packed

            self.scene = refresh_packed(scene)
            self._instances_dirty = False

    def render(self) -> np.ndarray:
        """Render the current frame (Renderer::Render equivalent).

        With ``config.frame_watchdog_ms`` set, a steady-state frame (past
        the first two, which include compiles) exceeding the budget raises
        :class:`FrameWatchdogError` — the reference's 80 ms "GPU
        Bottleneck!" watchdog (Renderer.cpp:370-371), raising instead of
        ``exit(0)``."""
        assert self.scene is not None, "call start() first"
        frame = frame_inputs_from_camera(self.camera, self.sun_angle)
        budget = self.config.frame_watchdog_ms
        t0 = time.perf_counter()
        with ScopeTimer("engine.render", log=False):
            img = render_frame_jit(
                self.scene, frame, self.config, tracer_name=self.tracer
            )
            if budget is not None:
                # sync only when the watchdog is armed (keeps async
                # dispatch otherwise). NOTE: over the tunneled-TPU backend
                # block_until_ready can return early, so the watchdog is
                # exact on CPU/local devices and approximate there.
                img = jax.block_until_ready(img)
        dt_ms = (time.perf_counter() - t0) * 1e3
        if budget is not None and self.frame_index >= 2 and dt_ms > budget:
            raise FrameWatchdogError(
                f"frame {self.frame_index} took {dt_ms:.1f} ms "
                f"(watchdog {budget:.1f} ms)"
            )
        self.frame_index += 1
        return img

    def end_frame(self) -> None:
        """Drain deferred events (Engine_EndFrame, Engine.cpp:130-134)."""
        events, self._end_of_frame = self._end_of_frame, []
        for fn in events:
            fn()

    def close(self) -> None:
        """Run exit events (Engine_Exit, Engine.cpp:136-140)."""
        events, self._on_exit = self._on_exit, []
        for fn in events:
            fn()

    @property
    def stats(self) -> dict[str, float]:
        return dict(profiler_stats)
