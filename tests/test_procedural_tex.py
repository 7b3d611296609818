"""Procedural textures: bake/eval bit-parity and inline-vs-gather shading
parity (scene/procedural_tex.py, ops/shade.py inline path)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from clraytracer_tpu.camera import Camera
from clraytracer_tpu.config import CameraConfig, RenderConfig
from clraytracer_tpu.render import TRACERS, frame_inputs_from_camera, render_frame
from clraytracer_tpu.scene import SceneBuilder
from clraytracer_tpu.scene import procedural_tex as ptex
from clraytracer_tpu.scene.procedural import uv_sphere


def _grid_eval(desc):
    jj, ii = np.meshgrid(
        np.arange(desc.height, dtype=np.float32),
        np.arange(desc.width, dtype=np.float32),
        indexing="ij",
    )
    out = np.asarray(ptex.eval_texel(desc, jnp.asarray(ii), jnp.asarray(jj)))
    return np.moveaxis(out, 0, -1)


def test_bake_eval_bit_parity():
    """eval_texel must reproduce the baked image byte-for-byte on the full
    texel grid, for every descriptor family."""
    descs = [
        ptex.constant((12, 200, 7)),
        ptex.checker(64, 8),
        ptex.checker(8, 2, (255, 200, 150), (90, 110, 130)),
        ptex.sky_gradient(256, 128),
        ptex.sky_gradient(64, 32),
    ]
    for desc in descs:
        baked = ptex.bake(desc).astype(np.float32)
        evald = _grid_eval(desc)
        np.testing.assert_array_equal(evald, baked, err_msg=str(desc))


def test_checker_requires_power_of_two():
    import pytest

    with pytest.raises(ValueError):
        ptex.checker(100, 8)
    with pytest.raises(ValueError):
        ptex.sky_gradient(64, 100)


def _procedural_scene():
    b = SceneBuilder()
    b.import_procedural(ptex.sky_gradient(64, 32))
    checker = b.import_procedural(
        ptex.checker(8, 2, (255, 200, 150), (90, 110, 130))
    )
    mat = b.create_material(
        albedo=(0.8, 0.55, 0.3), albedo_tex=checker, shininess=1.0,
        roughness=0.4,
    )
    mesh = b.add_mesh(uv_sphere(2.0, n_lat=6, n_lon=8), materials_start=mat)
    b.add_instance(mesh)
    return b.build()


def test_inline_shading_matches_pool_gather(monkeypatch):
    """The all-procedural inline path must render the IDENTICAL image to the
    pool-gather path over the same baked atlas (the strongest possible
    parity statement: same scene, only the static registry stripped).

    Pinned to the two-phase pipeline: the fused megakernel (only eligible
    for the all-procedural side) is a separate compilation whose FMA
    contraction may differ at the ulp level; its parity is covered by
    tests/test_trace.py::test_fused_render_matches_two_phase."""
    from clraytracer_tpu.ops import render_pallas as rp

    monkeypatch.setattr(rp, "fused_path_available", lambda *a: False)
    scene = _procedural_scene()
    assert scene.procedural_tex, "builder did not register descriptors"
    stripped = dataclasses.replace(scene, procedural_tex=())

    W, H = 48, 32
    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), W, H)
    frame = frame_inputs_from_camera(cam, -1.96)
    config = RenderConfig(width=W, height=H)

    for tracer_name in ("wavefront", "pallas"):
        tracer = TRACERS[tracer_name]
        img_inline = np.asarray(render_frame(scene, frame, config, tracer))
        img_gather = np.asarray(render_frame(stripped, frame, config, tracer))
        np.testing.assert_array_equal(
            img_inline, img_gather, err_msg=tracer_name
        )
        assert np.isfinite(img_inline).all()
        assert img_inline.std() > 0.01  # non-degenerate render


def test_legacy_generators_match_descriptors():
    from clraytracer_tpu.scene.textures import checkerboard, gradient_sky

    np.testing.assert_array_equal(
        checkerboard(64, 8), ptex.bake(ptex.checker(64, 8))
    )
    np.testing.assert_array_equal(
        gradient_sky(256, 128), ptex.bake(ptex.sky_gradient(256, 128))
    )
