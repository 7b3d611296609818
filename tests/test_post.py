"""Post-chain math tests (kernel_main.cl:342-359, MathAndSTL.cl:130-169)."""

import numpy as np
import jax.numpy as jnp

from clraytracer_tpu.ops.post import (
    fxaa,
    gamma_correct,
    post_process,
    reinhard,
    saturation,
    vignette_mask,
)


def test_saturation_identity_at_change_one():
    rgb = jnp.asarray([[[0.3, 0.5, 0.7]]])
    np.testing.assert_allclose(saturation(rgb, 1.0), rgb, atol=1e-6)


def test_saturation_grays_at_change_zero():
    rgb = jnp.asarray([[[0.8, 0.1, 0.4]]])
    out = np.asarray(saturation(rgb, 0.0))[0, 0]
    assert np.allclose(out, out[0])  # fully desaturated → gray


def test_reinhard_matches_scalar_reference():
    x = np.array([0.5, 0.25, 0.125], np.float32)
    l_old = 0.2126 * x[0] + 0.7152 * x[1] + 0.0722 * x[2]
    numerator = l_old * (1.0 + l_old / (0.8 * 0.8))
    l_new = numerator / (1.0 + l_old)
    expect = (x * (l_new / l_old)) ** (1 / 1.55)
    got = np.asarray(reinhard(jnp.asarray(x[None, None])))[0, 0]
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_gamma():
    np.testing.assert_allclose(
        np.asarray(gamma_correct(jnp.asarray([0.5]))), [0.5 ** (1 / 1.2)], rtol=1e-6
    )


def test_vignette_darkens_corners():
    m = np.asarray(vignette_mask(64, 64))
    assert m[32, 32] > m[1, 1]
    assert m[32, 32] > 0.9
    assert (m >= 0).all() and (m <= 1.2).all()


def test_fxaa_preserves_flat_regions():
    img = jnp.full((16, 16, 3), 0.5)
    out = np.asarray(fxaa(img))
    np.testing.assert_allclose(out, 0.5, atol=1e-5)


def test_fxaa_smooths_diagonal_edges():
    # FXAA blurs along the detected edge direction, so a staircase diagonal
    # changes while flat regions stay put
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    img = ((xx + yy) >= 16).astype(np.float32)[..., None] * np.ones(3)
    out = np.asarray(fxaa(jnp.asarray(img.astype(np.float32))))
    diff = np.abs(out - img).max()
    assert diff > 0.05  # some smoothing happened
    assert np.isfinite(out).all()


def test_post_process_pipeline_shapes():
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 2, (12, 16, 3)), jnp.float32)
    out = np.asarray(post_process(img, enable_fxaa=True))
    assert out.shape == (12, 16, 3)
    assert np.isfinite(out).all()


def test_tiled_post_matches_untiled_frame():
    """render_frame's tile-layout post chain must reproduce
    trace_image → post_process exactly (same per-pixel expression tree,
    only the layout differs)."""
    import jax
    from clraytracer_tpu.camera import Camera
    from clraytracer_tpu.config import CameraConfig, RenderConfig
    from clraytracer_tpu.render import (
        frame_inputs_from_camera,
        render_frame,
        trace_image,
    )
    from clraytracer_tpu.ops.trace_ref import trace_bvh
    from clraytracer_tpu.scene import SceneBuilder
    from clraytracer_tpu.scene.procedural import uv_sphere
    from clraytracer_tpu.scene import procedural_tex as ptex

    b = SceneBuilder()
    b.import_procedural(ptex.sky_gradient(64, 32))
    checker = b.import_procedural(ptex.checker(32, 4))
    mat = b.create_material(albedo=(0.9, 0.6, 0.3), albedo_tex=checker)
    mesh = b.add_mesh(uv_sphere(2.0, n_lat=6, n_lon=8), materials_start=mat)
    b.add_instance(mesh)
    scene = b.build()
    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), 40, 24)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)
    cfg = RenderConfig(width=40, height=24)

    fast = np.asarray(render_frame(scene, frame, cfg, tracer=trace_bvh))
    ref = np.asarray(
        post_process(
            trace_image(scene, frame, 40, 24, tracer=trace_bvh)
        )
    )
    np.testing.assert_allclose(fast, ref, atol=1e-6)


def test_supersampling_average_and_jitter():
    """spp=N averages N sub-pixel-jittered frames; the jittered projection
    must act exactly like shifting NDC coordinates."""
    import jax.numpy as jnp

    from clraytracer_tpu.camera import Camera
    from clraytracer_tpu.config import CameraConfig, RenderConfig
    from clraytracer_tpu.render import (
        _sample_offsets,
        frame_inputs_from_camera,
        jitter_projection,
        render_frame,
        trace_image,
    )
    from clraytracer_tpu.ops.post import post_process
    from clraytracer_tpu.scene import SceneBuilder
    from clraytracer_tpu.scene import procedural_tex as ptex
    from clraytracer_tpu.scene.procedural import uv_sphere

    b = SceneBuilder()
    b.import_procedural(ptex.sky_gradient(32, 16))
    m = b.create_material(albedo=(0.9, 0.4, 0.2))
    b.add_instance(b.add_mesh(uv_sphere(1.5, 8, 14), materials_start=m))
    scene = b.build()

    w, h = 40, 30
    cam = Camera.create(CameraConfig(position=(0.1, 0.2, 7.0)), w, h)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.9)

    # jitter_projection == shifting cx/cy (row-vector algebra check)
    ip = frame.inverse_projection
    v = jnp.asarray([0.3, -0.2, 1.0, 1.0])
    lhs = v @ jitter_projection(ip, 0.01, -0.02)
    rhs = jnp.asarray([0.31, -0.22, 1.0, 1.0]) @ ip
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)

    cfg = RenderConfig(width=w, height=h, samples=4)
    img4 = np.asarray(render_frame(scene, frame, cfg))

    # equals the mean of the four manually jittered frames + one post pass
    acc = None
    for jx, jy in _sample_offsets(4):
        fj = frame._replace(inverse_projection=jitter_projection(
            ip, jx * 2.0 / w, jy * 2.0 / h))
        im = trace_image(scene, fj, w, h)
        acc = im if acc is None else acc + im
    manual = np.asarray(post_process(acc * 0.25))
    np.testing.assert_allclose(img4, manual, atol=1e-6)

    # differs from the single-sample frame (edges moved sub-pixel)
    img1 = np.asarray(render_frame(
        scene, frame, RenderConfig(width=w, height=h)))
    assert not np.allclose(img1, img4)
