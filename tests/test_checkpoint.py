"""Scene checkpoint round-trip: bit-identical restore, live edits included."""

from __future__ import annotations

import numpy as np

import jax

from clraytracer_tpu.camera import Camera
from clraytracer_tpu.config import CameraConfig, RenderConfig
from clraytracer_tpu.render import frame_inputs_from_camera, render_frame
from clraytracer_tpu.scene import SceneBuilder
from clraytracer_tpu.scene import procedural_tex as ptex
from clraytracer_tpu.scene.checkpoint import load_scene, save_scene
from clraytracer_tpu.scene.procedural import cube, uv_sphere


def _build():
    b = SceneBuilder()
    b.import_procedural(ptex.sky_gradient(32, 16))
    checker = b.import_procedural(ptex.checker(16, 4))
    m0 = b.create_material(albedo=(0.9, 0.3, 0.2), albedo_tex=checker,
                           shininess=1.2, roughness=0.3)
    m1 = b.create_material(albedo=(0.2, 0.8, 0.3))
    b.add_instance(b.add_mesh(uv_sphere(1.2, n_lat=6, n_lon=10),
                              materials_start=m0))
    from clraytracer_tpu import math3d

    b.add_instance(b.add_mesh(cube(0.8), materials_start=m1),
                   math3d.translation(1.5, 0.2, -0.5))
    return b, b.build()


def test_roundtrip_bitexact(tmp_path):
    builder, scene = _build()
    # live material edit after build — checkpoints must capture runtime
    # state, not just imported assets
    builder.edit_material(1, albedo=(0.1, 0.2, 0.9))
    scene = builder.build()

    path = save_scene(scene, tmp_path / "scene.clsnap.npz",
                      extras={"sun_angle": -1.8, "step": 7})
    restored, extras = load_scene(path)
    assert extras == {"sun_angle": -1.8, "step": 7}

    # every array leaf bit-identical, every static equal
    ref_leaves, ref_def = jax.tree_util.tree_flatten(scene)
    new_leaves, new_def = jax.tree_util.tree_flatten(restored)
    assert ref_def == new_def  # statics (mesh ranges, ptex, roots) match
    assert len(ref_leaves) == len(new_leaves)
    for a, b in zip(ref_leaves, new_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.dtype == b.dtype


def test_restored_scene_renders_identically(tmp_path):
    _, scene = _build()
    w, h = 40, 32
    cam = Camera.create(CameraConfig(position=(0.1, 0.3, 7.0)), w, h)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.9)
    config = RenderConfig(width=w, height=h)
    ref = np.asarray(render_frame(scene, frame, config))

    path = save_scene(scene, tmp_path / "s.clsnap.npz")
    restored, _ = load_scene(path)
    img = np.asarray(render_frame(restored, frame, config))
    np.testing.assert_array_equal(ref, img)


def test_version_mismatch_raises(tmp_path):
    import json

    import pytest

    _, scene = _build()
    path = save_scene(scene, tmp_path / "s.clsnap.npz")
    # corrupt the version field
    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    meta = json.loads(bytes(data["__meta__"]).decode())
    meta["version"] = 999
    data["__meta__"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    np.savez_compressed(path, **data)
    with pytest.raises(ValueError, match="checkpoint version"):
        load_scene(path)
