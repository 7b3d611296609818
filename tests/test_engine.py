"""Engine frame-loop tests (reference Engine.cpp semantics)."""

import numpy as np

from clraytracer_tpu import math3d
from clraytracer_tpu.config import CameraConfig, RenderConfig
from clraytracer_tpu.engine import Engine
from clraytracer_tpu.scene import SceneBuilder
from clraytracer_tpu.scene.procedural import uv_sphere
from clraytracer_tpu.scene.textures import gradient_sky


def _engine(tracer="wavefront"):
    b = SceneBuilder()
    b.import_texture(gradient_sky(32, 16))
    mat = b.create_material(albedo=(0.8, 0.3, 0.2))
    mesh = b.add_mesh(uv_sphere(1.5, n_lat=7, n_lon=14), materials_start=mat)
    b.add_instance(mesh)
    eng = Engine(
        b,
        RenderConfig(width=24, height=16),
        CameraConfig(position=(0.0, 0.0, 8.0)),
        tracer=tracer,
    )
    return eng


def test_frame_loop_and_events():
    eng = _engine()
    eng.start()
    fired = []
    eng.add_end_of_frame_event(lambda: fired.append("eof"))
    eng.add_on_exit_event(lambda: fired.append("exit"))

    img = np.asarray(eng.render())
    assert img.shape == (16, 24, 3) and np.isfinite(img).all()
    assert eng.frame_index == 1
    assert fired == []  # deferred until end_frame
    eng.end_frame()
    assert fired == ["eof"]
    eng.end_frame()  # queue drained — no double fire
    assert fired == ["eof"]
    eng.close()
    assert fired == ["eof", "exit"]
    assert "engine.render" in eng.stats


def test_instance_animation_changes_image():
    eng = _engine()
    eng.start()
    img0 = np.asarray(eng.render())
    # rotate + move the instance (Engine_Tick's bmw animation analogue)
    eng.set_instance_transform(
        0, math3d.rotation_y(0.8) @ math3d.translation(1.2, 0.0, 0.0)
    )
    eng.tick()
    img1 = np.asarray(eng.render())
    assert np.abs(img1 - img0).max() > 0.05  # the sphere visibly moved
    # packed tables tracked the canonical instance table
    from clraytracer_tpu.ops.shade import build_shading_tables

    tabs = build_shading_tables(eng.scene)
    np.testing.assert_array_equal(
        np.asarray(eng.scene.packed.inst_rows), np.asarray(tabs.inst_rows)
    )


def test_camera_update_changes_image():
    eng = _engine()
    eng.start()
    img0 = np.asarray(eng.render())
    eng.update_camera(mouse_delta=(40.0, 10.0), move=(0.5, 0.0, 0.0))
    img1 = np.asarray(eng.render())
    assert np.abs(img1 - img0).max() > 0.01


def test_frame_watchdog(sphere_scene):
    """RenderConfig.frame_watchdog_ms: the reference's 80 ms fatal frame
    watchdog (Renderer.cpp:370-371), raising instead of exit(0). Warmup
    frames (compiles) are exempt; a steady-state frame over budget raises."""
    import pytest

    from clraytracer_tpu.config import RenderConfig
    from clraytracer_tpu.engine import Engine, FrameWatchdogError

    eng = Engine(
        scene=sphere_scene,
        config=RenderConfig(width=16, height=12, frame_watchdog_ms=1e9),
        tracer="bvh",
    )
    eng.render(); eng.render(); eng.render()  # generous budget: no raise

    eng2 = Engine(
        scene=sphere_scene,
        config=RenderConfig(width=16, height=12, frame_watchdog_ms=1e-6),
        tracer="bvh",
    )
    eng2.render(); eng2.render()  # warmup frames exempt
    with pytest.raises(FrameWatchdogError):
        eng2.render()
