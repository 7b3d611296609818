"""Sharded rendering over HBM-STREAMED cluster tables (VERDICT r3 item 6):
the Pallas DMA-streaming kernel under shard_map — TPU-interpret mode on
CPU — must reproduce the 1-device-mesh frame exactly, and the sharded
train step must run and reduce loss on a streamed scene. Catches
shard_map x streaming interactions before hardware does.

The scene is a small sphere with the VMEM table budget forced to 0, the
same trick test_trace uses: the real museum scene exercises the identical
kernel path, but its CPU-interpret compile is >1 h — not suite material.
The full-scale streamed GRADIENT parity is covered economically:
tests/test_sharding.py pins sharded-vs-unsharded grads on the resident
kernel, and this file pins streamed-vs-resident FORWARD parity under the
mesh; the differentiable tracer consumes only the kernel's (t, tri, inst)
records, which those two tests jointly cover."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

W, H = 32, 8


@pytest.fixture(scope="module")
def streamed_scene():
    from clraytracer_tpu.ops import trace_pallas as tp
    from clraytracer_tpu.scene import SceneBuilder
    from clraytracer_tpu.scene import procedural_tex as ptex
    from clraytracer_tpu.scene.procedural import uv_sphere

    old = tp.VMEM_TABLE_BUDGET
    tp.VMEM_TABLE_BUDGET = 0
    try:
        b = SceneBuilder()
        b.import_procedural(ptex.sky_gradient(32, 16))
        checker = b.import_procedural(ptex.checker(16, 4))
        mat = b.create_material(albedo=(0.9, 0.6, 0.3), albedo_tex=checker)
        b.add_instance(
            b.add_mesh(uv_sphere(2.0, n_lat=8, n_lon=12),
                       materials_start=mat)
        )
        scene = b.build()
    finally:
        tp.VMEM_TABLE_BUDGET = old
    assert scene.clusters.geo_stream is not None
    return scene


def test_sharded_streamed_forward_matches_single(streamed_scene, monkeypatch):
    from clraytracer_tpu.camera import Camera
    from clraytracer_tpu.config import CameraConfig, RenderConfig
    from clraytracer_tpu.ops import trace_pallas as tp
    from clraytracer_tpu.parallel.sharding import (
        make_device_mesh,
        render_sharded,
        replicate_scene,
    )
    from clraytracer_tpu.render import TRACERS, frame_inputs_from_camera

    monkeypatch.setattr(tp, "VMEM_TABLE_BUDGET", 0)  # force the DMA kernel

    cam = Camera.create(CameraConfig(position=(0.1, 0.2, 8.0)), W, H)
    frame = frame_inputs_from_camera(cam, -1.96)
    cfg = RenderConfig(width=W, height=H)

    mesh2 = make_device_mesh(jax.devices()[:2])
    scene_rep = replicate_scene(streamed_scene, mesh2)
    img2 = np.asarray(
        render_sharded(scene_rep, frame, cfg, mesh2, tracer=TRACERS["pallas"])
    )
    mesh1 = make_device_mesh(jax.devices()[:1])
    img1 = np.asarray(
        render_sharded(
            streamed_scene, frame, cfg, mesh1, tracer=TRACERS["pallas"]
        )
    )
    assert np.isfinite(img2).all()
    np.testing.assert_array_equal(img2, img1)
