"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

Must run before jax initializes (SURVEY.md §4: multi-host tests without a
cluster via xla_force_host_platform_device_count).
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the tunneled TPU); tests
# must run on local CPU — eager dispatch over the tunnel is ~ms per op.
# sitecustomize imports jax before this file runs, so setting the env var is
# not enough: update the live config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the expensive compiles here are the 8-device
# shard_map fwd+bwd graphs (minutes each on CPU); caching them makes suite
# re-runs fast. Safe to delete the directory at any time.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def sphere_scene():
    """Single-instance UV-sphere scene with checker texture + gradient sky —
    the hermetic stand-in for BASELINE config 1's bundled sphere.obj scene."""
    from clraytracer_tpu.scene import SceneBuilder
    from clraytracer_tpu.scene.procedural import uv_sphere
    from clraytracer_tpu.scene.textures import checkerboard, gradient_sky

    b = SceneBuilder()
    sky = b.import_texture(gradient_sky(128, 64))
    checker = b.import_texture(checkerboard(32, 4))
    assert sky == 2 and checker == 3
    mat = b.create_material(
        albedo=(0.9, 0.6, 0.3), albedo_tex=checker, shininess=1.0, roughness=0.4
    )
    mesh = b.add_mesh(uv_sphere(2.0, n_lat=8, n_lon=12, material=0), materials_start=mat)
    b.add_instance(mesh)
    return b.build()


@pytest.fixture(scope="session")
def two_instance_scene():
    """Sphere + cube with transforms, exercising the instance loop."""
    from clraytracer_tpu import math3d
    from clraytracer_tpu.scene import SceneBuilder
    from clraytracer_tpu.scene.procedural import cube, uv_sphere
    from clraytracer_tpu.scene.textures import checkerboard, gradient_sky

    b = SceneBuilder()
    b.import_texture(gradient_sky(128, 64))
    checker = b.import_texture(checkerboard(32, 4))
    m1 = b.create_material(albedo=(0.9, 0.2, 0.2), albedo_tex=checker)
    m2 = b.create_material(albedo=(0.2, 0.9, 0.2))
    sphere = b.add_mesh(uv_sphere(1.5, 8, 12), materials_start=m1)
    box = b.add_mesh(cube(1.0), materials_start=m2)
    b.add_instance(sphere, math3d.translation(-2.0, 1.0, 0.0))
    b.add_instance(box, math3d.rotation_y(0.7) @ math3d.translation(2.5, 0.5, -1.0))
    return b.build()


@pytest.fixture(scope="session")
def procedural_scene():
    """Two-instance scene whose textures are all procedural descriptors —
    qualifies for the fused render megakernel (ops/render_pallas.py)."""
    from clraytracer_tpu import math3d
    from clraytracer_tpu.scene import SceneBuilder
    from clraytracer_tpu.scene.procedural import cube, uv_sphere
    from clraytracer_tpu.scene import procedural_tex as ptex

    b = SceneBuilder()
    b.import_procedural(ptex.sky_gradient(256, 128))
    checker = b.import_procedural(ptex.checker(64, 8))
    m1 = b.create_material(albedo=(0.9, 0.2, 0.2), albedo_tex=checker)
    m2 = b.create_material(albedo=(0.2, 0.9, 0.2))
    s1 = b.add_mesh(uv_sphere(1.5, 8, 12), materials_start=m1)
    s2 = b.add_mesh(cube(1.0), materials_start=m2)
    b.add_instance(s1, math3d.translation(-2.0, 1.0, 0.0))
    b.add_instance(s2, math3d.rotation_y(0.7) @ math3d.translation(2.5, 0.5, -1.0))
    return b.build()


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
