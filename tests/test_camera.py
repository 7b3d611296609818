"""Camera & ray-generation tests (reference RayGen kernel semantics)."""

import numpy as np
import jax.numpy as jnp

from clraytracer_tpu.camera import Camera, ray_directions, screen_point_to_ray
from clraytracer_tpu.config import CameraConfig


def _default_camera(w=64, h=48):
    return Camera.create(CameraConfig(), w, h)


def test_center_ray_points_forward():
    cam = _default_camera()
    dirs = np.asarray(
        ray_directions(
            jnp.asarray(cam.inverse_view),
            jnp.asarray(cam.inverse_projection),
            cam.width,
            cam.height,
        )
    )
    center = dirs[cam.height // 2, cam.width // 2]
    # default yaw -90 → front = (0, 0, -1)
    assert center @ cam.front > 0.99


def test_rays_are_normalized():
    cam = _default_camera()
    dirs = np.asarray(
        ray_directions(
            jnp.asarray(cam.inverse_view),
            jnp.asarray(cam.inverse_projection),
            cam.width,
            cam.height,
        )
    )
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)


def test_fov_coverage():
    cam = _default_camera(64, 64)
    dirs = np.asarray(
        ray_directions(
            jnp.asarray(cam.inverse_view),
            jnp.asarray(cam.inverse_projection),
            64,
            64,
        )
    )
    top = dirs[0, 32]
    bottom = dirs[-1, 32]
    angle = np.degrees(np.arccos(np.clip(top @ bottom, -1, 1)))
    # vertical fov 65° (pixel centers fall slightly inside)
    assert 55.0 < angle < 66.0


def test_picking_matches_raygen_with_y_flip():
    """ScreenPointToRay flips y (Camera.hpp:112); RayGen does not. Picking at
    (x, H-1-y) must give (approximately) the RayGen direction at row y."""
    cam = _default_camera(32, 24)
    dirs = np.asarray(
        ray_directions(
            jnp.asarray(cam.inverse_view),
            jnp.asarray(cam.inverse_projection),
            32,
            24,
        )
    )
    x, y = 10, 7
    origin, d = screen_point_to_ray(cam, float(x), float(24 - y))
    np.testing.assert_allclose(origin, cam.position, atol=1e-6)
    np.testing.assert_allclose(d, dirs[y, x], atol=1e-5)


def test_camera_update_moves_and_clamps():
    cam = _default_camera()
    moved = cam.updated(move=(0.0, 0.0, 1.0), dt=0.5)
    assert moved.position[2] < cam.position[2]  # forward is -z
    pitched = cam.updated(mouse_delta=(0.0, 1e5), dt=1.0)
    assert pitched.pitch_deg == -89.0


def test_ray_directions_linear_matches_planar():
    from clraytracer_tpu.camera import ray_directions_linear, ray_directions_planar

    cam = _default_camera(w=64, h=48)
    iv = jnp.asarray(cam.inverse_view)
    ip = jnp.asarray(cam.inverse_projection)
    planar = np.asarray(ray_directions_planar(iv, ip, 64, 48))  # [3, 48, 64]
    n = 64 * 48
    rows = -(-n // 128) + 8  # deliberately over-padded
    linear = np.asarray(ray_directions_linear(iv, ip, 64, 48, rows))
    flat = linear.reshape(3, -1)[:, :n].reshape(3, 48, 64)
    np.testing.assert_array_equal(flat, planar)
    # pad lanes are finite & normalized (safe to trace)
    tail = linear.reshape(3, -1)[:, n:]
    assert np.all(np.isfinite(tail))
    np.testing.assert_allclose(np.sum(tail * tail, axis=0), 1.0, atol=1e-5)
