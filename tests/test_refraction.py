"""Refraction (NEW beyond the reference — on its TODO list, README.md:12).

Whitted-style single-continuation Snell refraction through materials with
``transmission > 0``, gated by RenderConfig.enable_refraction (off =>
bit-exact reference behavior).
"""

import numpy as np

import jax.numpy as jnp

from clraytracer_tpu import math3d
from clraytracer_tpu.camera import Camera
from clraytracer_tpu.config import CameraConfig, RenderConfig
from clraytracer_tpu.ops.shade import initial_bounce_state, shade_hits
from clraytracer_tpu.ops.trace_ref import trace_bvh
from clraytracer_tpu.render import frame_inputs_from_camera, render_frame, trace_image
from clraytracer_tpu.scene import SceneBuilder
from clraytracer_tpu.scene.procedural import cube, uv_sphere
from clraytracer_tpu.scene.textures import gradient_sky

IOR = 1.45


def _glass_cube_scene(transmission=0.9):
    b = SceneBuilder()
    b.import_texture(gradient_sky(64, 32))
    m = b.create_material(albedo=(1.0, 1.0, 1.0), transmission=transmission)
    b.add_instance(b.add_mesh(cube(2.0), materials_start=m))
    return b.build()


def _shade_one(scene, o3, d3, enable_refraction=True):
    """Trace one ray and run one shade bounce; returns the BounceState."""
    o = jnp.asarray(o3, jnp.float32).reshape(3, 1)
    d = jnp.asarray(d3, jnp.float32)
    d = (d / np.linalg.norm(d)).reshape(3, 1)
    hit = trace_bvh(scene, o, d)
    assert bool(hit.hit[0]), "test ray must hit the cube"
    state = initial_bounce_state(o, d, jnp.float32(-1.96))
    return shade_hits(
        scene, state, t=hit.t, u=hit.u, v=hit.v, tri_idx=hit.tri,
        instance_idx=hit.instance, hit=hit.hit,
        enable_refraction=enable_refraction, refraction_ior=IOR,
    ), np.asarray(d).reshape(3)


def test_refraction_direction_matches_snell():
    """Entering a flat +z face: continuation direction must be the analytic
    Snell refraction of the incoming ray."""
    scene = _glass_cube_scene()
    st, d = _shade_one(scene, (0.3, 0.2, 5.0), (0.25, -0.1, -1.0))
    n = np.array([0.0, 0.0, 1.0])
    ci = -float(d @ n)
    assert ci > 0.0
    eta = 1.0 / IOR
    k = 1.0 - eta * eta * (1.0 - ci * ci)
    refr = eta * d + n * (eta * ci - np.sqrt(k))
    refr /= np.linalg.norm(refr)
    got = np.asarray(st.direction).reshape(3)
    np.testing.assert_allclose(got, refr, atol=1e-6)
    # refracted continuation starts just BEHIND the surface (the cube's
    # +z face is at z = 2; the reflected origin would sit at z = 2.01)
    assert float(np.asarray(st.origin).reshape(3)[2]) < 2.0
    # energy carry equals the transmission factor
    np.testing.assert_allclose(
        np.asarray(st.energy).reshape(3), 0.9, atol=1e-6
    )


def test_refraction_off_reflects():
    """Same ray with the flag off must produce the mirror reflection and the
    reference energy carry (unchanged behavior)."""
    scene = _glass_cube_scene()
    st, d = _shade_one(scene, (0.3, 0.2, 5.0), (0.25, -0.1, -1.0),
                       enable_refraction=False)
    n = np.array([0.0, 0.0, 1.0])
    refl = d - 2.0 * float(d @ n) * n
    got = np.asarray(st.direction).reshape(3)
    np.testing.assert_allclose(got, refl, atol=1e-6)


def test_opaque_material_unaffected_by_flag():
    """transmission == 0 lanes reflect even with refraction enabled."""
    scene = _glass_cube_scene(transmission=0.0)
    st_on, d = _shade_one(scene, (0.3, 0.2, 5.0), (0.25, -0.1, -1.0), True)
    st_off, _ = _shade_one(scene, (0.3, 0.2, 5.0), (0.25, -0.1, -1.0), False)
    np.testing.assert_array_equal(
        np.asarray(st_on.direction), np.asarray(st_off.direction)
    )
    np.testing.assert_array_equal(
        np.asarray(st_on.result), np.asarray(st_off.result)
    )


def test_refraction_frame_tracers_agree():
    """Full 2-bounce refracted frame: pallas (two-phase; the fused kernel is
    bypassed under refraction) vs the golden bvh tracer."""
    from clraytracer_tpu.ops.trace_pallas import trace_pallas

    b = SceneBuilder()
    b.import_texture(gradient_sky(64, 32))
    m_glass = b.create_material(albedo=(0.95, 0.98, 1.0), transmission=0.85)
    m_back = b.create_material(albedo=(0.9, 0.5, 0.3))
    b.add_instance(
        b.add_mesh(uv_sphere(1.5, 10, 16), materials_start=m_glass),
        math3d.translation(0.0, 0.5, 2.5),
    )
    b.add_instance(
        b.add_mesh(uv_sphere(2.5, 10, 16), materials_start=m_back),
        math3d.translation(0.0, 0.5, -3.0),
    )
    scene = b.build()
    cam = Camera.create(CameraConfig(position=(0.0, 0.5, 9.0)), 48, 36)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)
    kw = dict(bounces=2, enable_refraction=True, refraction_ior=IOR)
    img_g = np.asarray(trace_image(scene, frame, 48, 36, tracer=trace_bvh, **kw))
    img_p = np.asarray(trace_image(scene, frame, 48, 36, tracer=trace_pallas, **kw))
    close = np.isclose(img_g, img_p, atol=1e-3).all(axis=-1)
    # refracted continuations through a coarse two-sided sphere are very
    # tie-sensitive at facet seams (1-ULP t differences pick different
    # facets, then diverge through Snell) — allow more seam pixels than
    # the reflective comparisons do
    assert close.mean() > 0.95
    # and the refracted frame really differs from the reflected one
    img_off = np.asarray(trace_image(scene, frame, 48, 36, tracer=trace_bvh,
                                     bounces=2))
    assert np.abs(img_g - img_off).max() > 0.05


def test_render_frame_refraction_config():
    """RenderConfig plumbing end-to-end (post chain on)."""
    scene = _glass_cube_scene()
    cam = Camera.create(CameraConfig(position=(0.0, 0.0, 6.0)), 32, 24)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)
    cfg = RenderConfig(width=32, height=24, enable_refraction=True)
    img = np.asarray(render_frame(scene, frame, cfg, tracer=trace_bvh))
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all()
