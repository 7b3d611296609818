"""Scene/asset layer tests: atlas packing, OBJ import, cache, builder."""

import numpy as np
import pytest

from clraytracer_tpu.scene.cache import import_mesh, load_mesh_cache, save_mesh_cache
from clraytracer_tpu.scene.obj import load_obj, parse_mtl
from clraytracer_tpu.scene.textures import AtlasBuilder, checkerboard
from clraytracer_tpu.scene.types import scene_summary

OBJ_FIXTURE = """
# tiny two-triangle fixture
mtllib fixture.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
usemtl red
f 1/1/1 2/2/1 3/3/1
usemtl blue
f 1/1/1 3/3/1 4/4/1
"""

MTL_FIXTURE = """
newmtl red
Ns 75
d 0.5
Kd 1 0 0
Ks 0.5 0.5 0.5
map_Kd red.png
newmtl blue
Kd 0 0 1
"""


def test_atlas_default_textures_and_offsets():
    a = AtlasBuilder()
    assert a.num_textures == 2  # white, black
    t = a.add_image(checkerboard(4, 2))
    assert t == 2
    texels, w, h, off = a.build()
    # white at 0, black at 1, first real texture at offset 2 — the skybox
    # "+2" invariant (MathAndSTL.cl:253-258)
    assert off.tolist() == [0, 1, 2]
    assert texels[0].tolist() == [255, 255, 255]
    assert texels[1].tolist() == [0, 0, 0]
    assert w.tolist() == [1, 1, 4]


def test_atlas_overflow_guard():
    a = AtlasBuilder(max_texels=10)
    with pytest.raises(MemoryError):
        a.add_image(checkerboard(16, 2))


def test_mtl_parse_reference_semantics():
    mats = parse_mtl(MTL_FIXTURE)
    assert [m.name for m in mats] == ["red", "blue"]
    red = mats[0]
    assert red.shininess == pytest.approx(75 / 50.0)  # Ns clamp 0-100 then /50
    assert red.roughness == pytest.approx(0.5)
    np.testing.assert_allclose(red.diffuse, [1, 0, 0])
    assert red.diffuse_map == "red.png"
    blue = mats[1]
    assert blue.shininess == pytest.approx(2.2)  # defaults
    assert blue.roughness == pytest.approx(0.6)


def test_obj_import(tmp_path):
    (tmp_path / "fixture.obj").write_text(OBJ_FIXTURE)
    (tmp_path / "fixture.mtl").write_text(MTL_FIXTURE)
    obj = load_obj(tmp_path / "fixture.obj")
    m = obj.mesh
    assert m.count == 2
    np.testing.assert_allclose(m.v0[0], [0, 0, 0])
    np.testing.assert_allclose(m.v2[1], [0, 1, 0])
    # uv v-flip on import
    np.testing.assert_allclose(m.uv0[0], [0, 1])
    np.testing.assert_allclose(m.uv1[0], [1, 1])
    assert m.mat_idx.tolist() == [0, 1]


def test_obj_quad_fan_and_missing_attrs(tmp_path):
    (tmp_path / "q.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n"
    )
    obj = load_obj(tmp_path / "q.obj")
    assert obj.mesh.count == 2  # fan triangulated
    # generated face normals
    np.testing.assert_allclose(np.abs(obj.mesh.n0), [[0, 0, 1]] * 2, atol=1e-6)


def test_mesh_cache_roundtrip(tmp_path):
    (tmp_path / "fixture.obj").write_text(OBJ_FIXTURE)
    (tmp_path / "fixture.mtl").write_text(MTL_FIXTURE)
    obj = load_obj(tmp_path / "fixture.obj")
    save_mesh_cache(tmp_path / "fixture.obj", obj)
    cached = load_mesh_cache(tmp_path / "fixture.clmz")
    assert cached is not None
    np.testing.assert_array_equal(cached.mesh.v0, obj.mesh.v0)
    assert cached.materials[0].name == "red"
    # import_mesh prefers the cache
    again = import_mesh(tmp_path / "fixture.obj")
    assert again.mesh.count == 2


def test_scene_builder_summary(sphere_scene):
    s = scene_summary(sphere_scene)
    assert s["instances"] == 1
    assert s["textures"] == 4  # white, black, sky, checker
    assert s["triangles"] > 100
    assert s["bvh_nodes"] > 3


def test_builder_imports_obj_scene(tmp_path):
    from clraytracer_tpu.scene import SceneBuilder

    (tmp_path / "fixture.obj").write_text(OBJ_FIXTURE)
    (tmp_path / "fixture.mtl").write_text(MTL_FIXTURE)
    b = SceneBuilder()
    mesh = b.import_mesh(tmp_path / "fixture.obj")
    b.add_instance(mesh)
    scene = b.build()
    # default material 0 + red + blue
    assert scene.materials.count == 3
    assert int(scene.instances.material_start[0]) == 1  # DEFAULT → mesh block


def test_flat_u32_texel_gather_matches_row_gather(sphere_scene):
    """shade_hits' large-pool flat packed-RGB8 gather is bit-identical to
    the [P, 4] row gather (the big-pool branch never runs on CPU-test-size
    pools, so force texels_u32 onto a small scene and compare frames)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from clraytracer_tpu.camera import Camera
    from clraytracer_tpu.config import CameraConfig, RenderConfig
    from clraytracer_tpu.render import frame_inputs_from_camera, render_frame

    scene = sphere_scene
    W, H = 48, 32
    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), W, H)
    frame = frame_inputs_from_camera(cam, -1.96)
    cfg = RenderConfig(width=W, height=H)

    tex = np.asarray(scene.atlas.texels)
    b = np.round(np.clip(tex, 0.0, 1.0) * 255.0).astype(np.uint32)
    w32 = (b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)).astype(np.int32)
    forced = dataclasses.replace(
        scene, packed=dataclasses.replace(scene.packed, texels_u32=jnp.asarray(w32))
    )
    from clraytracer_tpu.render import TRACERS

    # wavefront drives shade_hits' branch; 'best' drives the fused
    # kernel's _finish_frame branch
    for name in ("wavefront", "best"):
        ref = np.asarray(render_frame(scene, frame, cfg, tracer=TRACERS[name]))
        got = np.asarray(render_frame(forced, frame, cfg, tracer=TRACERS[name]))
        np.testing.assert_array_equal(ref, got, err_msg=name)
