"""Geometry (instance) sharding: per-device instance blocks + hit combine.

The single-device wavefront render is the oracle: the 2-D mesh path must
produce the exact same hit records and images (the combine's min-t +
lowest-owner tie break reproduces the sequential instance-merge order).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
import pytest

from clraytracer_tpu.camera import Camera
from clraytracer_tpu.config import CameraConfig, RenderConfig
from clraytracer_tpu.ops.trace_wavefront import trace_wavefront
from clraytracer_tpu.parallel.geometry import (
    GEO_AXIS,
    make_geo_sharded_tracer,
    make_mesh_2d,
    render_sharded_2d,
)
from clraytracer_tpu.render import frame_inputs_from_camera, render_frame
from clraytracer_tpu.scene import SceneBuilder
from clraytracer_tpu.scene import procedural_tex as ptex
from clraytracer_tpu import math3d
from clraytracer_tpu.scene.procedural import cube, uv_sphere


@pytest.fixture(scope="module")
def multi_instance_scene():
    b = SceneBuilder()
    b.import_procedural(ptex.sky_gradient(32, 16))
    checker = b.import_procedural(ptex.checker(16, 4))
    m0 = b.create_material(albedo=(0.9, 0.3, 0.2), albedo_tex=checker)
    m1 = b.create_material(albedo=(0.2, 0.8, 0.3), shininess=1.5)
    sphere = b.add_mesh(uv_sphere(1.0, n_lat=6, n_lon=10), materials_start=m0)
    cube_m = b.add_mesh(cube(0.9), materials_start=m1)
    # 5 instances (not divisible by 4 geo shards): overlapping so closest-hit
    # winners span instances, incl. equal-t tie candidates at seams
    b.add_instance(sphere)
    b.add_instance(cube_m, math3d.translation(1.2, 0.1, -0.5))
    b.add_instance(cube_m, math3d.translation(-1.4, -0.2, 0.6))
    b.add_instance(sphere, math3d.translation(0.6, 0.9, -1.0))
    b.add_instance(cube_m, math3d.translation(-0.3, -1.0, -0.2))
    return b.build()


def _rays(w, h):
    cam = Camera.create(
        CameraConfig(position=(0.17, 0.23, 7.0), yaw_deg=-90.0), w, h
    )
    from clraytracer_tpu.camera import ray_directions_planar

    d = ray_directions_planar(
        jnp.asarray(cam.inverse_view), jnp.asarray(cam.inverse_projection),
        w, h,
    )
    o = jnp.broadcast_to(jnp.asarray(cam.position)[:, None, None], d.shape)
    return cam, o, d


def test_geo_sharded_tracer_matches_wavefront(multi_instance_scene):
    scene = multi_instance_scene
    _, o, d = _rays(40, 24)
    ref = trace_wavefront(scene, o, d)

    n_geo = 4
    mesh = Mesh(np.asarray(jax.devices()[:n_geo]), (GEO_AXIS,))
    tracer = make_geo_sharded_tracer(n_geo)

    import functools

    from jax.sharding import PartitionSpec as P

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(), P(), P()), out_specs=P()
    )
    def run(scene_rep, o_rep, d_rep):
        hit = tracer(scene_rep, o_rep, d_rep)
        return (hit.t, hit.u, hit.v, hit.tri, hit.instance, hit.hit)

    t, u, v, tri, inst, hit = run(scene, o, d)
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(t))
    np.testing.assert_array_equal(np.asarray(ref.u), np.asarray(u))
    np.testing.assert_array_equal(np.asarray(ref.v), np.asarray(v))
    np.testing.assert_array_equal(np.asarray(ref.tri), np.asarray(tri))
    np.testing.assert_array_equal(np.asarray(ref.instance), np.asarray(inst))
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(hit))


@pytest.mark.slow
def test_render_2d_mesh_matches_single_device(multi_instance_scene):
    scene = multi_instance_scene
    w, h = 48, 32
    cam = Camera.create(
        CameraConfig(position=(0.17, 0.23, 7.0), yaw_deg=-90.0), w, h
    )
    frame = frame_inputs_from_camera(cam, sun_angle=-1.8)
    config = RenderConfig(width=w, height=h)

    ref = np.asarray(
        render_frame(scene, frame, config, tracer=trace_wavefront)
    )
    mesh = make_mesh_2d(2, 4)
    img = np.asarray(render_sharded_2d(scene, frame, config, mesh))
    np.testing.assert_array_equal(ref, img)


def test_geo_shards_exceed_instances(multi_instance_scene):
    """More geo shards than instances: idle shards must not corrupt hits."""
    b = SceneBuilder()
    b.import_procedural(ptex.sky_gradient(32, 16))
    m = b.create_material(albedo=(0.8, 0.5, 0.2))
    b.add_instance(b.add_mesh(uv_sphere(1.5, n_lat=6, n_lon=10),
                              materials_start=m))
    scene = b.build()

    _, o, d = _rays(32, 16)
    ref = trace_wavefront(scene, o, d)

    mesh = Mesh(np.asarray(jax.devices()[:8]), (GEO_AXIS,))
    tracer = make_geo_sharded_tracer(8)

    import functools

    from jax.sharding import PartitionSpec as P

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(), P(), P()), out_specs=P()
    )
    def run(scene_rep, o_rep, d_rep):
        hit = tracer(scene_rep, o_rep, d_rep)
        return (hit.t, hit.tri, hit.hit)

    t, tri, hit = run(scene, o, d)
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(t))
    np.testing.assert_array_equal(np.asarray(ref.tri), np.asarray(tri))
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(hit))


@pytest.mark.slow
def test_train_step_2d_grads_match_unsharded(multi_instance_scene):
    """VERDICT r4 item 8: gradient parity THROUGH the 2-D (devices x geo)
    mesh — pins the check_vma=False explicit-psum contract (ray-axis psum
    only; geo-replicated grads must not be double-counted)."""
    from clraytracer_tpu.diff import image_loss_and_grads
    from clraytracer_tpu.parallel.geometry import train_step_sharded_2d
    from clraytracer_tpu.parallel.sharding import replicate_scene
    from clraytracer_tpu.render import frame_inputs_from_camera

    W, H = 32, 24
    scene = multi_instance_scene
    cam = Camera.create(
        CameraConfig(position=(0.17, 0.23, 7.0), yaw_deg=-90.0), W, H
    )
    frame = frame_inputs_from_camera(cam, -1.96)
    target = jnp.zeros((H, W, 3), jnp.float32)

    # oracle with the WAVEFRONT hit-finder: the geo-sharded tracer is its
    # exact twin (same tie semantics); the default Pallas tracer picks
    # different equal-t winners on instance-overlap seams, which shifts
    # a-few-percent of the albedo gradient on this deliberately-overlapping
    # scene — that's tracer choice, not a sharding error
    _, g_ref = image_loss_and_grads(
        scene, frame, W, H, target=target, base_tracer=trace_wavefront
    )
    ga_ref = np.asarray(g_ref.materials.albedo)

    mesh2 = make_mesh_2d(4, 2)
    scene_rep = replicate_scene(scene, mesh2)
    lr = 1.0
    loss, new_scene = train_step_sharded_2d(
        scene_rep, frame, target, mesh2, lr=lr
    )
    assert np.isfinite(float(loss))
    ga_2d = (
        np.asarray(scene.materials.albedo)
        - np.asarray(new_scene.materials.albedo)
    ) / (lr / (H * W * 3))
    # image_loss_and_grads's target loss is MEAN over pixels*channels
    np.testing.assert_allclose(
        ga_2d, ga_ref * (H * W * 3), rtol=2e-2, atol=1e-5
    )


@pytest.mark.slow
def test_train_step_2d_reduces_loss(multi_instance_scene):
    from clraytracer_tpu.parallel.geometry import train_step_sharded_2d
    from clraytracer_tpu.parallel.sharding import replicate_scene
    from clraytracer_tpu.render import frame_inputs_from_camera

    W, H = 16, 8
    cam = Camera.create(
        CameraConfig(position=(0.17, 0.23, 7.0), yaw_deg=-90.0), W, H
    )
    frame = frame_inputs_from_camera(cam, -1.96)
    rng = np.random.default_rng(3)
    target = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    mesh2 = make_mesh_2d(2, 2)
    scene = replicate_scene(multi_instance_scene, mesh2)
    # lr=50 (the 1-D test's value) overshoots on this tiny 16x8 target —
    # gradient CORRECTNESS is pinned by the parity test above; this only
    # checks the step descends
    loss0, scene1 = train_step_sharded_2d(scene, frame, target, mesh2, lr=5.0)
    loss1, _ = train_step_sharded_2d(scene1, frame, target, mesh2, lr=5.0)
    assert float(loss1) < float(loss0)
