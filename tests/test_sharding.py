"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4 (d)):
sharded render equals single-device render; sharded train step runs and
reduces loss; gradients agree with the unsharded path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clraytracer_tpu.camera import Camera
from clraytracer_tpu.config import CameraConfig, RenderConfig
from clraytracer_tpu.parallel.sharding import (
    make_device_mesh,
    render_sharded,
    replicate_scene,
    train_step_sharded,
)
from clraytracer_tpu.render import frame_inputs_from_camera, render_frame


W, H = 32, 24


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    return make_device_mesh()


def _frame():
    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), W, H)
    return frame_inputs_from_camera(cam, -1.96)


def test_sharded_render_matches_single_device(sphere_scene, mesh):
    frame = _frame()
    cfg = RenderConfig(width=W, height=H)
    img_single = np.asarray(render_frame(sphere_scene, frame, cfg))
    scene_rep = replicate_scene(sphere_scene, mesh)
    img_shard = np.asarray(render_sharded(scene_rep, frame, cfg, mesh))
    assert img_shard.shape == img_single.shape
    close = np.isclose(img_single, img_shard, atol=1e-4).all(axis=-1)
    assert close.mean() > 0.999


def test_sharded_render_uneven_rows(sphere_scene, mesh):
    cfg = RenderConfig(width=16, height=10)  # 10 rows over 8 devices → pad 16
    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), 16, 10)
    frame = frame_inputs_from_camera(cam, -1.96)
    img = np.asarray(render_sharded(sphere_scene, frame, cfg, mesh))
    assert img.shape == (10, 16, 3)
    assert np.isfinite(img).all()


@pytest.mark.slow
def test_sharded_pallas_fused_matches_single_device(procedural_scene, mesh):
    """The PRODUCTION path under shard_map (VERDICT r3 item 1): the fused
    Pallas render kernel (all-procedural scene) sharded by rows over 8
    devices must be bit-identical to the same ray-mode fused path on a
    1-device mesh (sharding is the only variable), and float-close to the
    single-device ``render_frame`` (whose in-kernel-raygen camera mode
    differs only by FMA contraction). Interpret mode on CPU."""
    import jax as _jax

    from clraytracer_tpu.parallel.sharding import make_device_mesh
    from clraytracer_tpu.render import TRACERS

    frame = _frame()
    cfg = RenderConfig(width=W, height=H)
    scene_rep = replicate_scene(procedural_scene, mesh)
    img_shard = np.asarray(
        render_sharded(scene_rep, frame, cfg, mesh, tracer=TRACERS["pallas"])
    )
    mesh1 = make_device_mesh(_jax.devices()[:1])
    img_one = np.asarray(
        render_sharded(
            procedural_scene, frame, cfg, mesh1, tracer=TRACERS["pallas"]
        )
    )
    np.testing.assert_array_equal(img_shard, img_one)
    img_frame = np.asarray(
        render_frame(procedural_scene, frame, cfg, tracer=TRACERS["pallas"])
    )
    np.testing.assert_allclose(img_shard, img_frame, atol=1e-5)


@pytest.mark.slow
def test_sharded_pallas_atlas_matches_single_device(sphere_scene, mesh):
    """Atlas-texture scene through the Pallas path under shard_map equals
    the 1-device-mesh frame exactly (deferred-texel fused mode)."""
    import jax as _jax

    from clraytracer_tpu.parallel.sharding import make_device_mesh
    from clraytracer_tpu.render import TRACERS

    frame = _frame()
    cfg = RenderConfig(width=W, height=H)
    scene_rep = replicate_scene(sphere_scene, mesh)
    img_shard = np.asarray(
        render_sharded(scene_rep, frame, cfg, mesh, tracer=TRACERS["pallas"])
    )
    mesh1 = make_device_mesh(_jax.devices()[:1])
    img_one = np.asarray(
        render_sharded(
            sphere_scene, frame, cfg, mesh1, tracer=TRACERS["pallas"]
        )
    )
    np.testing.assert_array_equal(img_shard, img_one)


@pytest.mark.slow
def test_train_step_reduces_loss(sphere_scene, mesh):
    frame = _frame()
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    scene = replicate_scene(sphere_scene, mesh)
    loss0, scene1 = train_step_sharded(scene, frame, target, mesh, lr=50.0)
    loss1, _ = train_step_sharded(scene1, frame, target, mesh, lr=50.0)
    assert np.isfinite(float(loss0))
    assert float(loss1) < float(loss0)


@pytest.mark.slow
def test_sharded_grads_match_unsharded(sphere_scene, mesh):
    from clraytracer_tpu.diff import image_loss_and_grads

    frame = _frame()
    target = jnp.zeros((H, W, 3), jnp.float32)
    # unsharded gradient of mean L2
    _, g_ref = image_loss_and_grads(
        sphere_scene, frame, W, H, target=target
    )
    ga_ref = np.asarray(g_ref.materials.albedo)

    # sharded step with lr encoding: grads = (scene - new_scene) / (lr*denom)
    lr = 1.0
    scene = replicate_scene(sphere_scene, mesh)
    _, new_scene = train_step_sharded(scene, frame, target, mesh, lr=lr)
    ga_shard = (
        np.asarray(scene.materials.albedo) - np.asarray(new_scene.materials.albedo)
    ) / (lr / (H * W * 3))
    # image_loss_and_grads default target-loss is mean over pixels*channels
    np.testing.assert_allclose(ga_shard, ga_ref * (H * W * 3), rtol=2e-2, atol=1e-5)


@pytest.mark.slow
def test_sharded_grads_match_unsharded_five_devices(sphere_scene):
    """VERDICT r4 item 8: the explicit-psum gradient contract at a
    NON-power-of-2 device count (5 of the 8 virtual devices)."""
    from clraytracer_tpu.diff import image_loss_and_grads

    W5, H5 = 32, 20  # 20 rows over 5 devices -> 4 rows each
    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), W5, H5)
    frame = frame_inputs_from_camera(cam, -1.96)
    target = jnp.zeros((H5, W5, 3), jnp.float32)
    _, g_ref = image_loss_and_grads(sphere_scene, frame, W5, H5, target=target)
    ga_ref = np.asarray(g_ref.materials.albedo)

    mesh5 = make_device_mesh(jax.devices()[:5])
    lr = 1.0
    scene = replicate_scene(sphere_scene, mesh5)
    _, new_scene = train_step_sharded(scene, frame, target, mesh5, lr=lr)
    ga_shard = (
        np.asarray(scene.materials.albedo)
        - np.asarray(new_scene.materials.albedo)
    ) / (lr / (H5 * W5 * 3))
    np.testing.assert_allclose(
        ga_shard, ga_ref * (H5 * W5 * 3), rtol=2e-2, atol=1e-5
    )
