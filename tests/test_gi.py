"""Monte-Carlo diffuse GI mode (RenderConfig.enable_gi).

The reference ships its cosine-hemisphere sampler unused
(MathAndSTL.cl:208-215 — never called from Trace); the GI mode puts it to
work: secondary bounces continue in a sampled hemisphere direction with
albedo throughput instead of the mirror reflection.
"""

import numpy as np
import pytest

from clraytracer_tpu.camera import Camera
from clraytracer_tpu.config import CameraConfig, RenderConfig
from clraytracer_tpu.render import frame_inputs_from_camera, render_frame
from clraytracer_tpu.scene import SceneBuilder
from clraytracer_tpu.scene import procedural_tex as ptex
from clraytracer_tpu.scene.procedural import uv_sphere

W, H = 48, 32


@pytest.fixture(scope="module")
def gi_scene():
    b = SceneBuilder()
    b.import_procedural(ptex.sky_gradient(32, 16))
    checker = b.import_procedural(ptex.checker(16, 4))
    mat = b.create_material(albedo=(0.9, 0.6, 0.3), albedo_tex=checker)
    mesh = b.add_mesh(uv_sphere(2.0, n_lat=8, n_lon=16), materials_start=mat)
    b.add_instance(mesh)
    return b.build()


def _frame(gi_scene, **cfg):
    camera = Camera.create(CameraConfig(position=(0.1, 0.2, 8.0)), W, H)
    frame = frame_inputs_from_camera(camera, sun_angle=-1.96)
    config = RenderConfig(width=W, height=H, enable_post=False, **cfg)
    return np.asarray(render_frame(gi_scene, frame, config))


def test_gi_finite_and_differs_from_mirror(gi_scene):
    mirror = _frame(gi_scene)
    gi = _frame(gi_scene, enable_gi=True)
    assert np.isfinite(gi).all()
    assert (gi >= 0.0).all()
    # the continuation direction changed on every hit lane: bounce-2
    # lighting differs somewhere
    assert np.abs(gi - mirror).max() > 1e-3
    # primary direct lighting is shared, so the images stay comparable
    assert abs(float(gi.mean()) - float(mirror.mean())) < 0.25


def test_gi_seed_decorrelates_and_is_deterministic(gi_scene):
    a = _frame(gi_scene, enable_gi=True, gi_seed=0)
    a2 = _frame(gi_scene, enable_gi=True, gi_seed=0)
    b = _frame(gi_scene, enable_gi=True, gi_seed=1)
    np.testing.assert_array_equal(a, a2)  # same seed = same estimate
    assert np.abs(a - b).max() > 1e-4  # different stream


def test_gi_fused_kernel_matches_two_phase(gi_scene):
    """All-procedural scenes run GI IN the fused Pallas kernel with
    bit-identical RNG streams to the XLA path (i32 wrap arithmetic ==
    uint32); only trig/rsqrt rounding and traversal tie-breaks may
    differ, so the images agree at float tolerance almost everywhere."""
    from clraytracer_tpu.ops.trace_pallas import trace_pallas
    from clraytracer_tpu.ops.trace_wavefront import trace_wavefront

    camera = Camera.create(CameraConfig(position=(0.1, 0.2, 8.0)), W, H)
    frame = frame_inputs_from_camera(camera, sun_angle=-1.96)
    config = RenderConfig(width=W, height=H, enable_post=False,
                          enable_gi=True)
    img_f = np.asarray(render_frame(gi_scene, frame, config,
                                    tracer=trace_pallas))
    img_w = np.asarray(render_frame(gi_scene, frame, config,
                                    tracer=trace_wavefront))
    close = np.isclose(img_f, img_w, atol=1e-3).all(axis=-1)
    assert close.mean() > 0.98, close.mean()


@pytest.fixture(scope="module")
def gi_atlas_scene():
    """Same scene with IMPORTED (non-procedural) textures: GI must run in
    the fused kernel's deferred-texel atlas mode."""
    from clraytracer_tpu.scene.textures import checkerboard, gradient_sky

    b = SceneBuilder()
    b.import_texture(gradient_sky(32, 16))
    checker = b.import_texture(checkerboard(16, 4))
    mat = b.create_material(albedo=(0.9, 0.6, 0.3), albedo_tex=checker)
    mesh = b.add_mesh(uv_sphere(2.0, n_lat=8, n_lon=16), materials_start=mat)
    b.add_instance(mesh)
    return b.build()


def test_gi_atlas_fused_matches_two_phase(gi_atlas_scene, monkeypatch):
    """Atlas-texture GI in the fused kernel (VERDICT r3 item 5): the
    texel-dependent throughput is deferred — the kernel carries only the
    2*cosTheta weights and _finish_frame folds the per-bounce color
    product back in. Must match the two-phase XLA path."""
    from clraytracer_tpu.ops import render_pallas as rp
    from clraytracer_tpu.ops.trace_pallas import trace_pallas

    assert rp.fused_path_available(gi_atlas_scene, True, True)
    camera = Camera.create(CameraConfig(position=(0.1, 0.2, 8.0)), W, H)
    frame = frame_inputs_from_camera(camera, sun_angle=-1.96)
    config = RenderConfig(width=W, height=H, enable_post=False,
                          enable_gi=True)
    img_f = np.asarray(render_frame(gi_atlas_scene, frame, config,
                                    tracer=trace_pallas))
    monkeypatch.setattr(rp, "fused_path_available", lambda *a: False)
    img_2 = np.asarray(render_frame(gi_atlas_scene, frame, config,
                                    tracer=trace_pallas))
    assert np.isfinite(img_f).all()
    np.testing.assert_allclose(img_f, img_2, atol=1e-4)


def test_gi_atlas_three_bounce(gi_atlas_scene, monkeypatch):
    """The color-product recursion must hold past two bounces."""
    from clraytracer_tpu.ops import render_pallas as rp
    from clraytracer_tpu.ops.trace_pallas import trace_pallas

    camera = Camera.create(CameraConfig(position=(0.1, 0.2, 8.0)), W, H)
    frame = frame_inputs_from_camera(camera, sun_angle=-1.96)
    config = RenderConfig(width=W, height=H, enable_post=False,
                          enable_gi=True, bounces=3)
    img_f = np.asarray(render_frame(gi_atlas_scene, frame, config,
                                    tracer=trace_pallas))
    monkeypatch.setattr(rp, "fused_path_available", lambda *a: False)
    img_2 = np.asarray(render_frame(gi_atlas_scene, frame, config,
                                    tracer=trace_pallas))
    np.testing.assert_allclose(img_f, img_2, atol=1e-4)


def test_gi_spp_averages_decorrelated_samples(gi_scene):
    """samples=N must average N DIFFERENT GI streams: the variance of the
    4-spp estimate against an independent 4-spp estimate is below the
    1-spp-vs-1-spp variance."""
    a1 = _frame(gi_scene, enable_gi=True, gi_seed=0)
    b1 = _frame(gi_scene, enable_gi=True, gi_seed=100)
    a4 = _frame(gi_scene, enable_gi=True, gi_seed=0, samples=4)
    b4 = _frame(gi_scene, enable_gi=True, gi_seed=100, samples=4)
    v1 = float(np.mean((a1 - b1) ** 2))
    v4 = float(np.mean((a4 - b4) ** 2))
    assert v4 < v1 * 0.6, (v1, v4)
