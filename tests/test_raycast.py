"""Picking / single-ray raycast tests (reference CPU_RayCast semantics)."""

import numpy as np
import jax.numpy as jnp

from clraytracer_tpu.camera import Camera
from clraytracer_tpu.config import CameraConfig
from clraytracer_tpu.raycast import MISS, pick, raycast


def _camera(scene_wh=(64, 48)):
    return Camera.create(
        CameraConfig(position=(0.13, 0.21, 10.0)), scene_wh[0], scene_wh[1]
    )


def test_center_pick_hits_sphere(sphere_scene):
    cam = _camera()
    rec = pick(sphere_scene, cam, 32.0, 24.0)
    assert bool(rec.hit)
    assert rec.distance < MISS
    # camera at z=10 looking at a radius-2 sphere at origin → t ≈ 8
    assert 7.0 < float(rec.distance) < 9.0
    # normal points back toward the camera, unit length
    n = np.asarray(rec.normal)
    np.testing.assert_allclose(np.linalg.norm(n), 1.0, atol=1e-5)
    assert n[2] > 0.5
    assert np.all((np.asarray(rec.color) >= 0) & (np.asarray(rec.color) <= 1))


def test_corner_pick_misses(sphere_scene):
    cam = _camera()
    rec = pick(sphere_scene, cam, 1.0, 1.0)
    assert not bool(rec.hit)
    assert rec.distance == MISS


def test_raycast_batch_matches_single(sphere_scene):
    o = jnp.asarray([[0.0, 0.0, 10.0], [0.0, 0.0, 10.0], [50.0, 50.0, 50.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.05, 0.03, -1.0], [0.0, 0.0, -1.0]])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rec = raycast(sphere_scene, o, d)
    assert rec.distance.shape == (3,)
    assert bool(rec.hit[0]) and bool(rec.hit[1]) and not bool(rec.hit[2])
    np.testing.assert_allclose(float(rec.distance[0]), 8.0, atol=0.05)
    # distances consistent across the batch vs one-at-a-time
    solo = raycast(sphere_scene, o[1:2], d[1:2])
    np.testing.assert_array_equal(
        np.asarray(rec.distance[1]), np.asarray(solo.distance[0])
    )
