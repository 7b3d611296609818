"""Sharded gradients at realistic scale (VERDICT r3 item 6): a 2-device
shard_map fwd+bwd over the museum scene — reference .clm imports, HBM-
STREAMED cluster tables, Pallas hit-finding (TPU-interpret mode on CPU) —
must match the unsharded gradient. Catches shard_map x streaming
interactions before hardware does."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REF = Path("/root/reference/CLRayTracer/Assets")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference assets not present"
)

W, H = 32, 4  # tiny: 2 rows per device on a 2-device mesh


@pytest.fixture(scope="module")
def museum_scene():
    from clraytracer_tpu.cli import build_scene
    from clraytracer_tpu.ops.trace_pallas import VMEM_TABLE_BUDGET, _table_bytes

    scene = build_scene("museum")
    # the point of this test is the STREAMED kernel under shard_map
    assert _table_bytes(scene.clusters) > VMEM_TABLE_BUDGET
    assert scene.clusters.geo_stream is not None
    return scene


def test_sharded_museum_grads_match_unsharded(museum_scene):
    from clraytracer_tpu.diff import image_loss_and_grads
    from clraytracer_tpu.parallel.sharding import (
        make_device_mesh,
        replicate_scene,
        train_step_sharded,
    )
    from clraytracer_tpu.render import frame_inputs_from_camera
    from clraytracer_tpu.camera import Camera
    from clraytracer_tpu.config import CameraConfig

    cam = Camera.create(
        CameraConfig(position=(-11.0, 5.0, 0.0), yaw_deg=0.0), W, H
    )
    frame = frame_inputs_from_camera(cam, -1.96)
    target = jnp.zeros((H, W, 3), jnp.float32)

    # unsharded gradient (Pallas streamed hits + differentiable recompute)
    _, g_ref = image_loss_and_grads(
        museum_scene, frame, W, H, target=target, bounces=1
    )
    ga_ref = np.asarray(g_ref.materials.albedo)
    assert np.isfinite(ga_ref).all()
    assert np.abs(ga_ref).max() > 0.0, "camera sees no geometry"

    mesh = make_device_mesh(jax.devices()[:2])
    scene = replicate_scene(museum_scene, mesh)
    lr = 1.0
    _, new_scene = train_step_sharded(
        scene, frame, target, mesh, lr=lr, bounces=1
    )
    ga_shard = (
        np.asarray(scene.materials.albedo)
        - np.asarray(new_scene.materials.albedo)
    ) / (lr / (H * W * 3))
    # image_loss_and_grads's target loss is MEAN over pixels*channels;
    # train_step's is sum * denom with the same normalization
    np.testing.assert_allclose(
        ga_shard, ga_ref * (H * W * 3), rtol=2e-2, atol=1e-5
    )
