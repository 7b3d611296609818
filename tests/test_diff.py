"""Gradient tests: finite-difference checks of pixel gradients w.r.t.
material color, texture texels, vertex positions, and instance transforms
(BASELINE config 3)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clraytracer_tpu.camera import Camera
from clraytracer_tpu.config import CameraConfig
from clraytracer_tpu.diff import image_loss_and_grads, render_image_diff
from clraytracer_tpu.render import frame_inputs_from_camera
from clraytracer_tpu.scene import SceneBuilder
from clraytracer_tpu.scene.procedural import uv_sphere
from clraytracer_tpu.scene.textures import checkerboard, gradient_sky

W, H = 16, 12


@pytest.fixture(scope="module")
def diff_scene():
    b = SceneBuilder()
    b.import_texture(gradient_sky(64, 32))
    checker = b.import_texture(checkerboard(8, 2, (255, 200, 150), (90, 110, 130)))
    mat = b.create_material(albedo=(0.8, 0.55, 0.3), albedo_tex=checker,
                            shininess=1.0, roughness=0.4)
    mesh = b.add_mesh(uv_sphere(2.0, n_lat=6, n_lon=8), materials_start=mat)
    b.add_instance(mesh)
    return b.build()


@pytest.fixture(scope="module")
def frame():
    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), W, H)
    return frame_inputs_from_camera(cam, -1.96)


def _loss(scene, frame, weights):
    img = render_image_diff(scene, frame, W, H)
    return float(jnp.sum(img * weights))


@pytest.fixture(scope="module")
def weights(rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    return jnp.asarray(rng.uniform(0.0, 1.0, (H, W, 3)).astype(np.float32))


def _grads(scene, frame, weights):
    _, g = image_loss_and_grads(
        scene, frame, W, H, loss_fn=lambda img: jnp.sum(img * weights)
    )
    return g


def test_gradients_exist_and_finite(diff_scene, frame, weights):
    g = _grads(diff_scene, frame, weights)
    ga = np.asarray(g.materials.albedo)
    assert np.isfinite(ga).all()
    assert np.abs(ga).max() > 0.0
    gt = np.asarray(g.atlas.texels)
    assert np.isfinite(gt).all()
    assert np.abs(gt).max() > 0.0
    gv = np.asarray(g.tris.v0, np.float32)
    assert np.isfinite(gv).all()
    assert np.abs(gv).max() > 0.0
    gi = np.asarray(g.instances.inverse_transform)
    assert np.isfinite(gi).all()
    assert np.abs(gi).max() > 0.0


def test_albedo_gradient_matches_finite_difference(diff_scene, frame, weights):
    g = _grads(diff_scene, frame, weights)
    ga = np.asarray(g.materials.albedo)
    mat_id, chan = np.unravel_index(np.abs(ga).argmax(), ga.shape)
    eps = 1e-3

    def perturbed(sign):
        alb = np.asarray(diff_scene.materials.albedo).copy()
        alb[mat_id, chan] += sign * eps
        mats = diff_scene.materials.replace(albedo=jnp.asarray(alb))
        return dataclasses.replace(diff_scene, materials=mats)

    fd = (_loss(perturbed(+1), frame, weights) - _loss(perturbed(-1), frame, weights)) / (
        2 * eps
    )
    np.testing.assert_allclose(fd, ga[mat_id, chan], rtol=5e-2, atol=1e-4)


def test_texel_gradient_matches_finite_difference(diff_scene, frame, weights):
    g = _grads(diff_scene, frame, weights)
    gt = np.asarray(g.atlas.texels)
    tex_id, chan = np.unravel_index(np.abs(gt).argmax(), gt.shape)
    eps = 1e-3

    def perturbed(sign):
        tx = np.asarray(diff_scene.atlas.texels).copy()
        tx[tex_id, chan] += sign * eps
        atlas = diff_scene.atlas.replace(texels=jnp.asarray(tx))
        return dataclasses.replace(diff_scene, atlas=atlas)

    fd = (_loss(perturbed(+1), frame, weights) - _loss(perturbed(-1), frame, weights)) / (
        2 * eps
    )
    np.testing.assert_allclose(fd, gt[tex_id, chan], rtol=5e-2, atol=1e-4)


def test_vertex_gradient_matches_finite_difference(frame, weights):
    # white (constant) texture so point-sampling's zero-gradient plateaus
    # don't pollute the finite difference
    b = SceneBuilder()
    b.import_texture(gradient_sky(64, 32))
    mat = b.create_material(albedo=(0.8, 0.55, 0.3))
    mesh = b.add_mesh(uv_sphere(2.0, n_lat=6, n_lon=8), materials_start=mat)
    b.add_instance(mesh)
    scene = b.build()

    g = _grads(scene, frame, weights)
    gv = np.asarray(g.tris.v0, np.float32)
    tri_id, axis = np.unravel_index(np.abs(gv).argmax(), gv.shape)
    eps = 2e-3

    def perturbed(sign):
        v = np.asarray(scene.tris.v0).copy()
        v[tri_id, axis] += sign * eps
        tris = scene.tris.replace(v0=jnp.asarray(v))
        return dataclasses.replace(scene, tris=tris)

    fd = (_loss(perturbed(+1), frame, weights) - _loss(perturbed(-1), frame, weights)) / (
        2 * eps
    )
    np.testing.assert_allclose(fd, gv[tri_id, axis], rtol=8e-2, atol=5e-4)


def test_fit_cli_recovers_albedo(tmp_path, capsys):
    """End-to-end inverse rendering loop: the fit command's Adam descent on
    material albedo must collapse the image loss by orders of magnitude."""
    import json
    import sys

    from clraytracer_tpu.cli import main

    argv = sys.argv
    try:
        sys.argv = [
            "clrt", "fit", "--scene", "two", "--width", "32", "--height",
            "24", "--steps", "40", "--lr", "0.08",
        ]
        assert main() == 0
    finally:
        sys.argv = argv
    report = json.loads(capsys.readouterr().out)
    assert report["loss_last"] < report["loss_first"] * 0.1
    assert report["param_mae_final"] < report["param_mae_init"]


def test_deferred_texel_path_matches_direct(sphere_scene, monkeypatch):
    """The float path's combined-gather texel deferral (render.bounce_loop
    + ops/shade.py `deferred`) must reproduce the per-bounce-gather path
    to float precision — including GI, whose energy carry routes through
    the deferred color product P."""
    import clraytracer_tpu.render as render_mod
    from clraytracer_tpu.camera import Camera
    from clraytracer_tpu.config import CameraConfig
    from clraytracer_tpu.diff import render_image_diff
    from clraytracer_tpu.render import frame_inputs_from_camera, trace_planar
    from clraytracer_tpu.ops.trace_wavefront import trace_wavefront

    W, H = 48, 32
    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), W, H)
    frame = frame_inputs_from_camera(cam, -1.96)

    img_d = np.asarray(render_image_diff(sphere_scene, frame, W, H))
    monkeypatch.setattr(render_mod, "_DEFER_TEXELS", False)
    img_0 = np.asarray(render_image_diff(sphere_scene, frame, W, H))
    np.testing.assert_allclose(img_d, img_0, rtol=1e-5, atol=1e-5)

    # GI float path (P-product deferral), via trace_planar directly
    import jax.numpy as jnp

    dirs = _dirs(frame, W, H)
    origin = jnp.broadcast_to(frame.camera_position[:, None, None], dirs.shape)

    def gi_img():
        return np.asarray(
            trace_planar(
                sphere_scene, origin, dirs, frame.sun_angle, 2,
                trace_wavefront, reference_parity=True,
                integer_colors=False, enable_gi=True, gi_seed=3,
            )
        )

    monkeypatch.setattr(render_mod, "_DEFER_TEXELS", True)
    gi_d = gi_img()
    monkeypatch.setattr(render_mod, "_DEFER_TEXELS", False)
    gi_0 = gi_img()
    np.testing.assert_allclose(gi_d, gi_0, rtol=1e-5, atol=1e-5)


def _dirs(frame, W, H):
    from clraytracer_tpu.camera import ray_directions_planar

    return ray_directions_planar(
        frame.inverse_view, frame.inverse_projection, W, H
    )
