"""Sun shadow rays (the reference's declared-but-unimplemented shadow
factor, kernel_main.cl:258 / README.md:11): primary hits cast one occlusion
ray toward the sun; blocked points lose the direct terms but keep ambient."""

from __future__ import annotations

import pytest

import numpy as np

import jax

from clraytracer_tpu.camera import Camera
from clraytracer_tpu.config import CameraConfig
from clraytracer_tpu.ops.trace_ref import trace_bvh
from clraytracer_tpu.ops.trace_wavefront import trace_wavefront
from clraytracer_tpu.render import frame_inputs_from_camera, trace_image
from clraytracer_tpu.scene import SceneBuilder
from clraytracer_tpu.scene import procedural_tex as ptex
from clraytracer_tpu.scene.procedural import quad, uv_sphere


def _scene():
    from clraytracer_tpu import math3d

    b = SceneBuilder()
    b.import_procedural(ptex.sky_gradient(32, 16))
    ground = b.create_material(albedo=(0.8, 0.8, 0.8))
    red = b.create_material(albedo=(0.9, 0.2, 0.2))
    b.add_instance(b.add_mesh(quad(8.0, y=0.0), materials_start=ground))
    b.add_instance(
        b.add_mesh(uv_sphere(1.0, n_lat=10, n_lon=20), materials_start=red),
        math3d.translation(0.0, 1.6, 0.0),
    )
    return b.build()


def _frame(w, h):
    # camera above and to the side, looking down at the ground plane
    cam = Camera.create(
        CameraConfig(position=(0.3, 4.0, 7.0), pitch_deg=-28.0), w, h
    )
    # sun straight overhead: light_dir = (0, sin a, cos a) = (0, -1, 0)
    return frame_inputs_from_camera(cam, sun_angle=-np.pi / 2)


def test_shadows_darken_occluded_ground():
    scene = _scene()
    w, h = 64, 48
    frame = _frame(w, h)
    lit = np.asarray(
        trace_image(scene, frame, w, h, tracer=trace_wavefront)
    )
    shadowed = np.asarray(
        trace_image(scene, frame, w, h, tracer=trace_wavefront,
                    enable_shadows=True)
    )
    diff = lit - shadowed
    # shadows only remove light
    assert diff.min() >= -1e-5
    # a meaningful patch of ground under the sphere got darker
    darkened = (diff.max(axis=-1) > 0.05).mean()
    assert 0.005 < darkened < 0.5, darkened
    # most of the frame (sky, unoccluded ground) is unchanged
    assert (np.abs(diff).max(axis=-1) < 1e-6).mean() > 0.5


def test_shadow_mask_consistent_across_tracers():
    scene = _scene()
    w, h = 40, 30
    frame = _frame(w, h)
    a = np.asarray(trace_image(scene, frame, w, h, tracer=trace_wavefront,
                               enable_shadows=True))
    b = np.asarray(trace_image(scene, frame, w, h, tracer=trace_bvh,
                               enable_shadows=True))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow
def test_fused_kernel_shadows_match_wavefront():
    """The fused Pallas megakernel's in-kernel shadow pass (second
    traversal from the offset hit point toward the sun) must agree with
    the two-phase XLA shadow path."""
    from clraytracer_tpu import math3d
    from clraytracer_tpu.ops import render_pallas as rp
    from clraytracer_tpu.ops.trace_pallas import trace_pallas

    b = SceneBuilder()
    b.import_procedural(ptex.sky_gradient(32, 16))
    checker = b.import_procedural(ptex.checker(16, 4))
    ground = b.create_material(albedo=(0.85, 0.85, 0.85), albedo_tex=checker)
    red = b.create_material(albedo=(0.9, 0.2, 0.2))
    b.add_instance(b.add_mesh(quad(8.0, y=0.0), materials_start=ground))
    b.add_instance(
        b.add_mesh(uv_sphere(1.0, n_lat=8, n_lon=14), materials_start=red),
        math3d.translation(0.0, 1.6, 0.0),
    )
    scene = b.build()
    assert rp.fused_path_available(scene, True, True)

    w, h = 48, 32
    frame = _frame(w, h)
    ref = np.asarray(trace_image(scene, frame, w, h, tracer=trace_wavefront,
                                 enable_shadows=True))
    fused = np.asarray(trace_image(scene, frame, w, h, tracer=trace_pallas,
                                   enable_shadows=True))
    close = np.isclose(ref, fused, atol=1e-3).all(axis=-1)
    assert close.mean() > 0.99, close.mean()
    # and the shadow actually fires in the fused image too
    lit = np.asarray(trace_image(scene, frame, w, h, tracer=trace_pallas))
    assert ((lit - fused).max(axis=-1) > 0.05).mean() > 0.005
