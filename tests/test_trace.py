"""Tracing tests: intersection semantics, brute-vs-BVH agreement (the
framework's CPU/GPU-twin cross-check, SURVEY.md §3.4), and full renders."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from clraytracer_tpu.camera import Camera, ray_directions
from clraytracer_tpu.config import CameraConfig, RenderConfig
from clraytracer_tpu.ops.intersect import intersect_aabb, moller_trumbore
from clraytracer_tpu.ops.trace_ref import trace_brute, trace_bvh
from clraytracer_tpu.render import frame_inputs_from_camera, render_frame, trace_image
from clraytracer_tpu.scene.types import MISS_DISTANCE


def test_moller_trumbore_basic():
    v0 = jnp.asarray([0.0, 0.0, -5.0])
    v1 = jnp.asarray([1.0, 0.0, -5.0])
    v2 = jnp.asarray([0.0, 1.0, -5.0])
    o = jnp.asarray([0.2, 0.2, 0.0])
    d = jnp.asarray([0.0, 0.0, -1.0])
    t, u, v, ok = moller_trumbore(o, d, v0, v1, v2, jnp.asarray(MISS_DISTANCE))
    assert bool(ok)
    np.testing.assert_allclose(float(t), 5.0, rtol=1e-6)
    np.testing.assert_allclose([float(u), float(v)], [0.2, 0.2], rtol=1e-5)
    # behind the ray → reject
    t, u, v, ok = moller_trumbore(o, -d, v0, v1, v2, jnp.asarray(MISS_DISTANCE))
    assert not bool(ok)
    # best_t closer than hit → reject (reference t < o->t gate)
    t, u, v, ok = moller_trumbore(o, d, v0, v1, v2, jnp.asarray(4.0))
    assert not bool(ok)


def test_aabb_reference_semantics():
    o = jnp.asarray([0.0, 0.0, 0.0])
    inv = 1.0 / jnp.asarray([0.0, 0.0, -1.0])
    bmin = jnp.asarray([-1.0, -1.0, -10.0])
    bmax = jnp.asarray([1.0, 1.0, -5.0])
    t = intersect_aabb(o, inv, bmin, bmax, jnp.asarray(MISS_DISTANCE))
    np.testing.assert_allclose(float(t), 5.0, rtol=1e-6)
    # ray starting inside the box counts as a miss (tnear < 0) — the
    # reference's exact behaviour (kernel_main.cl:115)
    t = intersect_aabb(
        o, inv, jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0]),
        jnp.asarray(MISS_DISTANCE),
    )
    assert float(t) >= 1e29  # miss sentinel (float32 rounding of 1e30)


def _camera_rays(w, h, position=(0.13, 0.21, 10.0), yaw=-90.0):
    # slightly off-axis camera: an exactly centred view sends many rays
    # through shared triangle edges (measure-zero ties).
    # Returns PLANAR [3, h, w] rays (the Tracer protocol).
    cam = Camera.create(
        CameraConfig(position=position, yaw_deg=yaw), w, h
    )
    from clraytracer_tpu.camera import ray_directions_planar

    dirs = ray_directions_planar(
        jnp.asarray(cam.inverse_view), jnp.asarray(cam.inverse_projection), w, h
    )
    o = jnp.broadcast_to(jnp.asarray(cam.position)[:, None, None], dirs.shape)
    return cam, o, dirs


def test_brute_hits_sphere(sphere_scene):
    _, o, d = _camera_rays(24, 18)
    hit = trace_brute(sphere_scene, o, d)
    assert bool(hit.hit[9, 12])  # center ray hits the sphere
    assert not bool(hit.hit[0, 0])  # corner ray misses
    t = float(hit.t[9, 12])
    assert 7.0 < t < 9.0  # sphere radius 2 at origin, camera at z=10


def assert_hits_match(hb, hv, max_mismatch_frac=0.01):
    """Golden-hit comparison tolerating boundary/seam ties: rays hitting a
    shared triangle edge can resolve to either neighbour depending on float
    evaluation order (brute is broadcast-vectorized, traversal is gathered —
    XLA fuses them differently)."""
    hit_b = np.asarray(hb.hit)
    hit_v = np.asarray(hv.hit)
    n = hit_b.size
    hit_mismatch = (hit_b != hit_v).sum()
    assert hit_mismatch <= max(1, max_mismatch_frac * n), hit_mismatch
    both = hit_b & hit_v
    tb, tv = np.asarray(hb.t)[both], np.asarray(hv.t)[both]
    close = np.isclose(tb, tv, rtol=1e-4, atol=1e-5)
    assert close.mean() > 0.99, f"{(~close).sum()} of {close.size} t values differ"
    trib, triv = np.asarray(hb.tri)[both], np.asarray(hv.tri)[both]
    assert (trib == triv).mean() > 0.98


def test_bvh_matches_brute_sphere(sphere_scene):
    _, o, d = _camera_rays(32, 24)
    hb = trace_brute(sphere_scene, o, d)
    hv = trace_bvh(sphere_scene, o, d)
    assert_hits_match(hb, hv)
    assert np.asarray(hb.hit).sum() > 30


def test_bvh_matches_brute_two_instances(two_instance_scene):
    _, o, d = _camera_rays(32, 24, position=(0.0, 1.0, 8.0))
    hb = trace_brute(two_instance_scene, o, d)
    hv = trace_bvh(two_instance_scene, o, d)
    assert np.asarray(hb.hit).sum() > 20  # both instances visible
    assert_hits_match(hb, hv)
    both = np.asarray(hb.hit) & np.asarray(hv.hit)
    same_tri = np.asarray(hb.tri) == np.asarray(hv.tri)
    inst_match = (
        np.asarray(hb.instance)[both & same_tri]
        == np.asarray(hv.instance)[both & same_tri]
    )
    assert inst_match.all()


def test_trace_image_brute_vs_bvh(sphere_scene):
    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), 32, 24)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)
    img_b = np.asarray(trace_image(sphere_scene, frame, 32, 24, tracer=trace_brute))
    img_v = np.asarray(trace_image(sphere_scene, frame, 32, 24, tracer=trace_bvh))
    close = np.isclose(img_b, img_v, atol=1e-3).all(axis=-1)
    assert close.mean() > 0.99  # seam-tie pixels may shade differently
    # skybox visible in corners, sphere shading in center
    assert img_b.std() > 0.01


def test_render_frame_jits(sphere_scene):
    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), 32, 24)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)
    cfg = RenderConfig(width=32, height=24)
    fn = jax.jit(lambda s, f: render_frame(s, f, cfg))
    img = np.asarray(fn(sphere_scene, frame))
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0


def test_miss_samples_skybox(sphere_scene):
    cam = Camera.create(CameraConfig(position=(0.0, 0.0, 10.0)), 8, 8)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)
    img = np.asarray(trace_image(sphere_scene, frame, 8, 8, tracer=trace_brute))
    # corner pixels are pure skybox: nonzero and not NaN
    assert np.isfinite(img).all()
    assert img[0, 0].max() > 0.01


def test_wavefront_matches_brute_sphere(sphere_scene):
    from clraytracer_tpu.ops.trace_wavefront import trace_wavefront

    _, o, d = _camera_rays(32, 24)
    hb = trace_brute(sphere_scene, o, d)
    hw = trace_wavefront(sphere_scene, o, d)
    assert_hits_match(hb, hw)


def test_wavefront_matches_brute_two_instances(two_instance_scene):
    from clraytracer_tpu.ops.trace_wavefront import trace_wavefront

    _, o, d = _camera_rays(32, 24, position=(0.07, 1.11, 8.0))
    hb = trace_brute(two_instance_scene, o, d)
    hw = trace_wavefront(two_instance_scene, o, d)
    assert np.asarray(hb.hit).sum() > 20
    assert_hits_match(hb, hw)


def test_wavefront_jits_and_matches_image(sphere_scene):
    from clraytracer_tpu.ops.trace_wavefront import trace_wavefront

    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), 32, 24)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)
    img_b = np.asarray(trace_image(sphere_scene, frame, 32, 24, tracer=trace_brute))
    fn = jax.jit(lambda s, f: trace_image(s, f, 32, 24, tracer=trace_wavefront))
    img_w = np.asarray(fn(sphere_scene, frame))
    close = np.isclose(img_b, img_w, atol=1e-3).all(axis=-1)
    assert close.mean() > 0.99


def test_pallas_matches_brute_sphere(sphere_scene):
    from clraytracer_tpu.ops.trace_pallas import trace_pallas

    _, o, d = _camera_rays(32, 24)
    hb = trace_brute(sphere_scene, o, d)
    hp = trace_pallas(sphere_scene, o, d)
    assert_hits_match(hb, hp)


def test_pallas_matches_brute_two_instances(two_instance_scene):
    from clraytracer_tpu.ops.trace_pallas import trace_pallas

    _, o, d = _camera_rays(32, 24, position=(0.07, 1.11, 8.0))
    hb = trace_brute(two_instance_scene, o, d)
    hp = trace_pallas(two_instance_scene, o, d)
    assert np.asarray(hb.hit).sum() > 20
    assert_hits_match(hb, hp)


def test_pallas_hyper_level_matches_direct(sphere_scene, monkeypatch):
    """Phase A0 (hypercluster culling) must be invisible in results: the
    same hits as direct supercluster culling. Exercised by lowering the
    size threshold so the small test scene takes the hyper path — this
    also pins the pad-super masking (inverted-empty padding boxes PASS
    the conservative slab test and must be masked by count, or they
    overflow the survivor scratch)."""
    from clraytracer_tpu.ops import trace_pallas as tp

    assert sphere_scene.clusters.hyper_aabb is not None
    _, o, d = _camera_rays(32, 24)
    hd = tp.trace_pallas(sphere_scene, o, d)
    monkeypatch.setattr(tp, "HYPER_MIN_SUPERS", 0)
    tp._trace_tiles._clear_cache()
    hh = tp.trace_pallas(sphere_scene, o, d)
    tp._trace_tiles._clear_cache()
    assert_hits_match(hd, hh)


def test_pallas_inline_attrs_match_gather(sphere_scene):
    """The kernel's in-VMEM attribute interpolation must equal the XLA
    gather path: w0*a0 + u*a1 + v*a2 over the tri_attr table rows."""
    from clraytracer_tpu.ops.shade import _shading_tables
    from clraytracer_tpu.ops.trace_pallas import trace_pallas

    _, o, d = _camera_rays(32, 24)
    hp = trace_pallas(sphere_scene, o, d)
    assert hp.attr_normal is not None
    tabs = _shading_tables(sphere_scene, prefer_packed=True)
    attr = np.asarray(tabs.tri_attr)[np.asarray(hp.tri)]  # [H, W, 16]
    u = np.asarray(hp.u)[..., None]
    v = np.asarray(hp.v)[..., None]
    w0 = 1.0 - u - v
    expect = attr[..., 0:3] * w0 + attr[..., 3:6] * u + attr[..., 6:9] * v
    hit = np.asarray(hp.hit)
    got_n = np.moveaxis(np.asarray(hp.attr_normal), 0, -1)
    np.testing.assert_allclose(got_n[hit], expect[hit], rtol=1e-5, atol=1e-6)
    exp_uu = (attr[..., 9] * w0[..., 0] + attr[..., 11] * u[..., 0]
              + attr[..., 13] * v[..., 0])
    exp_vv = (attr[..., 10] * w0[..., 0] + attr[..., 12] * u[..., 0]
              + attr[..., 14] * v[..., 0])
    np.testing.assert_allclose(
        np.asarray(hp.attr_uu)[hit], exp_uu[hit], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(hp.attr_vv)[hit], exp_vv[hit], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(hp.attr_mat)[hit].astype(np.int32),
        attr[..., 15][hit].astype(np.int32),
    )


def test_pallas_render_image_matches_brute(sphere_scene):
    """Full shaded image through the pallas tracer (kernel attrs feed
    shade_hits) vs the brute tracer (gather path)."""
    from clraytracer_tpu.ops.trace_pallas import trace_pallas

    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), 32, 24)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)
    img_b = np.asarray(trace_image(sphere_scene, frame, 32, 24, tracer=trace_brute))
    img_p = np.asarray(trace_image(sphere_scene, frame, 32, 24, tracer=trace_pallas))
    close = np.isclose(img_b, img_p, atol=1e-3).all(axis=-1)
    assert close.mean() > 0.99  # seam-tie pixels may shade differently


def test_pallas_large_scene_falls_back_to_wavefront(sphere_scene, monkeypatch):
    """Scenes whose cluster tables exceed the VMEM budget must route to the
    wavefront tracer instead of failing Mosaic VMEM allocation."""
    from clraytracer_tpu.ops import trace_pallas as tp
    from clraytracer_tpu.ops.trace_wavefront import trace_wavefront

    assert tp._table_bytes(sphere_scene.clusters) < tp.VMEM_TABLE_BUDGET
    monkeypatch.setattr(tp, "VMEM_TABLE_BUDGET", 0)
    _, o, d = _camera_rays(32, 24)
    hp = tp.trace_pallas(sphere_scene, o, d)
    assert hp.attr_normal is None  # wavefront path: no kernel attrs
    hw = trace_wavefront(sphere_scene, o, d)
    assert_hits_match(hw, hp)


def test_fused_render_matches_two_phase(procedural_scene, monkeypatch):
    """The fused megakernel (trace+shade+bounce in one Pallas kernel) must
    reproduce the two-phase pallas frame to float precision (same expression
    trees; only compiler FMA-contraction choices may differ)."""
    from clraytracer_tpu.ops import render_pallas as rp
    from clraytracer_tpu.ops.trace_pallas import trace_pallas

    assert rp.fused_path_available(procedural_scene, True, True)
    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), 64, 48)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)
    img_f = np.asarray(
        trace_image(procedural_scene, frame, 64, 48, tracer=trace_pallas)
    )
    monkeypatch.setattr(rp, "fused_path_available", lambda *a: False)
    img_2 = np.asarray(
        trace_image(procedural_scene, frame, 64, 48, tracer=trace_pallas)
    )
    np.testing.assert_allclose(img_f, img_2, atol=1e-5)


@pytest.mark.slow
def test_fused_atlas_render_matches_two_phase(two_instance_scene, monkeypatch):
    """Scenes with IMPORTED (non-procedural) textures now run the fused
    megakernel too, in deferred-texel mode: the kernel computes pool
    indices + contribution coefficients (radiance is linear in the texel
    under reference-parity shading) and XLA performs one combined texel
    gather. Must match the two-phase pallas frame to float precision."""
    from clraytracer_tpu.ops import render_pallas as rp
    from clraytracer_tpu.ops.shade import _all_procedural
    from clraytracer_tpu.ops.trace_pallas import trace_pallas

    assert not _all_procedural(two_instance_scene)
    assert rp.fused_path_available(two_instance_scene, True, True)
    cam = Camera.create(CameraConfig(position=(0.0, 1.0, 8.0)), 64, 48)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)
    img_f = np.asarray(
        trace_image(two_instance_scene, frame, 64, 48, tracer=trace_pallas)
    )
    # atlas_mode=2 (deferred material, the any-material-count fallback):
    # forcing the in-kernel-select bound to 0 routes mode 1 -> 2
    monkeypatch.setattr(rp, "MAX_FUSED_MATERIALS", 0)
    img_m2 = np.asarray(
        trace_image(two_instance_scene, frame, 64, 48, tracer=trace_pallas)
    )
    monkeypatch.setattr(rp, "fused_path_available", lambda *a: False)
    img_2 = np.asarray(
        trace_image(two_instance_scene, frame, 64, 48, tracer=trace_pallas)
    )
    np.testing.assert_allclose(img_f, img_2, atol=1e-5)
    np.testing.assert_allclose(img_m2, img_2, atol=1e-5)


def test_flat_texel_gather_matches_row_gather(monkeypatch):
    """Large texel pools gather through the packed-RGB8 i32 word array
    (PackedTables.texels_u32, ~3.5x faster on v5e); values must be
    bit-identical to the [P, 4] f32 row gather."""
    from clraytracer_tpu.ops.trace_pallas import trace_pallas
    from clraytracer_tpu.scene import SceneBuilder, builder as builder_mod
    from clraytracer_tpu.scene.procedural import uv_sphere
    from clraytracer_tpu.scene.textures import checkerboard, gradient_sky

    def build():
        b = SceneBuilder()
        b.import_texture(gradient_sky(128, 64))
        checker = b.import_texture(checkerboard(32, 4))
        mat = b.create_material(albedo=(0.9, 0.6, 0.3), albedo_tex=checker)
        b.add_instance(
            b.add_mesh(uv_sphere(2.0, n_lat=8, n_lon=12), materials_start=mat)
        )
        return b.build()

    scene_row = build()
    assert scene_row.packed.texels_u32 is None
    monkeypatch.setattr(builder_mod, "FLAT_TEXEL_MIN", 0)
    scene_flat = build()
    assert scene_flat.packed.texels_u32 is not None

    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), 64, 48)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)
    img_r = np.asarray(
        trace_image(scene_row, frame, 64, 48, tracer=trace_pallas)
    )
    img_f = np.asarray(
        trace_image(scene_flat, frame, 64, 48, tracer=trace_pallas)
    )
    np.testing.assert_array_equal(img_r, img_f)


def test_fused_render_matches_brute(procedural_scene):
    """Fused frame vs the golden brute-force tracer + gather shading."""
    from clraytracer_tpu.ops.trace_pallas import trace_pallas

    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), 48, 32)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)
    img_b = np.asarray(
        trace_image(procedural_scene, frame, 48, 32, tracer=trace_brute)
    )
    img_f = np.asarray(
        trace_image(procedural_scene, frame, 48, 32, tracer=trace_pallas)
    )
    close = np.isclose(img_b, img_f, atol=1e-3).all(axis=-1)
    assert close.mean() > 0.99  # seam-tie pixels may shade differently


def test_streamed_hyper_matches_resident_direct(monkeypatch):
    """The 1M-tri production configuration — HBM-streamed geometry AND the
    hypercluster culling level together — must agree with the resident
    direct path (hits, attrs, and the fused frame)."""
    from clraytracer_tpu.ops import render_pallas as rp
    from clraytracer_tpu.ops import trace_pallas as tp
    from clraytracer_tpu.scene import SceneBuilder
    from clraytracer_tpu.scene.procedural import uv_sphere
    from clraytracer_tpu.scene import procedural_tex as ptex

    def build():
        b = SceneBuilder()
        b.import_procedural(ptex.sky_gradient(64, 32))
        checker = b.import_procedural(ptex.checker(32, 4))
        mat = b.create_material(albedo=(0.9, 0.6, 0.3), albedo_tex=checker)
        b.add_instance(
            b.add_mesh(uv_sphere(2.0, n_lat=10, n_lon=16),
                       materials_start=mat)
        )
        return b.build()

    scene_r = build()
    _, o, d = _camera_rays(48, 32)
    hr = tp.trace_pallas(scene_r, o, d)

    monkeypatch.setattr(tp, "VMEM_TABLE_BUDGET", 0)
    monkeypatch.setattr(tp, "HYPER_MIN_SUPERS", 0)
    monkeypatch.setattr(tp, "HYPER_SORT_MIN_SUPERS", 0)  # hyper-sort too
    tp._trace_tiles._clear_cache()
    scene_s = build()
    assert scene_s.clusters.geo_stream is not None
    assert scene_s.clusters.hyper_aabb is not None
    hs = tp.trace_pallas(scene_s, o, d)
    tp._trace_tiles._clear_cache()
    np.testing.assert_array_equal(np.asarray(hr.t), np.asarray(hs.t))
    np.testing.assert_array_equal(np.asarray(hr.tri), np.asarray(hs.tri))
    np.testing.assert_array_equal(
        np.asarray(hr.attr_uu), np.asarray(hs.attr_uu)
    )
    # the streamed kernel runs under InterpretParams on CPU (different
    # FMA contraction than plain interpret): float-level only
    np.testing.assert_allclose(
        np.asarray(hr.attr_normal), np.asarray(hs.attr_normal), atol=1e-6
    )


@pytest.mark.slow
def test_streamed_tables_match_resident(monkeypatch):
    """Scenes beyond the VMEM table budget now stay on the Pallas path by
    DMA-streaming cluster geometry from HBM (clusters.geo_stream). Hits and
    the fused frame must be identical to the VMEM-resident kernel."""
    from clraytracer_tpu.ops import render_pallas as rp
    from clraytracer_tpu.ops import trace_pallas as tp
    from clraytracer_tpu.scene import SceneBuilder
    from clraytracer_tpu.scene.procedural import uv_sphere
    from clraytracer_tpu.scene import procedural_tex as ptex

    def build():
        b = SceneBuilder()
        b.import_procedural(ptex.sky_gradient(64, 32))
        checker = b.import_procedural(ptex.checker(32, 4))
        mat = b.create_material(albedo=(0.9, 0.6, 0.3), albedo_tex=checker)
        b.add_instance(
            b.add_mesh(uv_sphere(2.0, n_lat=8, n_lon=12), materials_start=mat)
        )
        return b.build()

    scene_r = build()  # resident tables (normal budget)
    assert scene_r.clusters.geo_stream is None

    # same scene with the budget forced to 0: the builder adds geo_stream
    # and every pallas call takes the streamed path
    monkeypatch.setattr(tp, "VMEM_TABLE_BUDGET", 0)
    scene_s = build()
    assert scene_s.clusters.geo_stream is not None
    assert rp.fused_path_available(scene_s, True, True)

    _, o, d = _camera_rays(48, 32)
    monkeypatch.setattr(tp, "VMEM_TABLE_BUDGET", 12 << 20)
    hr = tp.trace_pallas(scene_r, o, d)
    monkeypatch.setattr(tp, "VMEM_TABLE_BUDGET", 0)
    hs = tp.trace_pallas(scene_s, o, d)
    assert hs.attr_normal is not None  # pallas path, not wavefront fallback
    np.testing.assert_array_equal(np.asarray(hr.t), np.asarray(hs.t))
    np.testing.assert_array_equal(np.asarray(hr.tri), np.asarray(hs.tri))
    np.testing.assert_array_equal(
        np.asarray(hr.attr_uu), np.asarray(hs.attr_uu)
    )

    # fused camera-mode frame: streamed vs resident kernel, same scene
    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), 48, 32)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)
    img_s = np.asarray(trace_image(scene_s, frame, 48, 32,
                                   tracer=tp.trace_pallas))
    monkeypatch.setattr(tp, "VMEM_TABLE_BUDGET", 12 << 20)
    img_r = np.asarray(trace_image(scene_r, frame, 48, 32,
                                   tracer=tp.trace_pallas))
    # not bit-equal on CPU: the streamed kernel runs under InterpretParams
    # (TPU-interpret, for its DMA semantics) while the resident kernel uses
    # the plain Pallas interpreter, and the two lowerings make different
    # FMA-contraction choices in the shading chain (measured: 1-2 px off by
    # 1 ULP at 48x32). On real TPU both compile natively.
    np.testing.assert_allclose(img_s, img_r, rtol=3e-6, atol=3e-7)


def test_wavefront_chunked_matches_unchunked(two_instance_scene, monkeypatch):
    """Ray chunking (lax.map over WAVEFRONT_CHUNK-ray batches — the
    unchunked 1080p state killed the TPU worker) must not change results."""
    from clraytracer_tpu.ops import trace_wavefront as tw

    _, o, d = _camera_rays(32, 24, position=(0.0, 1.0, 8.0))
    ref = tw.trace_wavefront(two_instance_scene, o, d)
    monkeypatch.setattr(tw, "WAVEFRONT_CHUNK", 128)  # force many chunks
    chunked = tw.trace_wavefront(two_instance_scene, o, d)
    # not bit-equal: lax.map changes XLA fusion boundaries, so t values can
    # differ by 1 ULP and flip shared-edge ties — the same class of seam
    # noise assert_hits_match tolerates between tracers
    assert_hits_match(ref, chunked)


def test_row_binned_secondary_matches_unbinned(sphere_scene, monkeypatch):
    """Secondary-bounce ray-row re-binning (render._trace_row_binned) is a
    pure permutation: per-ray results match the unbinned trace (t-tie
    flips aside — none at this size)."""
    import clraytracer_tpu.render as render_mod
    from clraytracer_tpu.ops.trace_pallas import trace_pallas

    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), 64, 48)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)
    img_b = np.asarray(
        trace_image(sphere_scene, frame, 64, 48, tracer=trace_pallas)
    )
    monkeypatch.setattr(render_mod, "_ROW_BINNING", False)
    img_0 = np.asarray(
        trace_image(sphere_scene, frame, 64, 48, tracer=trace_pallas)
    )
    np.testing.assert_array_equal(img_b, img_0)


@pytest.mark.slow
def test_fused_split_rebin_matches_unsplit(monkeypatch):
    """Bounce-boundary split of the fused camera-mode kernel (carry state
    out, re-bin ray rows, resume in a second invocation —
    render_pallas.render_fused_camera split_rebin) must reproduce the
    one-invocation kernel: the carried f32 state round-trips HBM exactly
    and tile regrouping only changes conservative culling, never the
    per-ray nearest hit."""
    from clraytracer_tpu.ops import render_pallas as rp
    from clraytracer_tpu.ops import trace_pallas as tp
    from clraytracer_tpu.scene import SceneBuilder
    from clraytracer_tpu.scene.procedural import uv_sphere
    from clraytracer_tpu.scene import procedural_tex as ptex

    monkeypatch.setattr(tp, "VMEM_TABLE_BUDGET", 0)  # the streamed class
    b = SceneBuilder()
    b.import_procedural(ptex.sky_gradient(64, 32))
    checker = b.import_procedural(ptex.checker(32, 4))
    mat = b.create_material(albedo=(0.9, 0.6, 0.3), albedo_tex=checker)
    b.add_instance(
        b.add_mesh(uv_sphere(2.0, n_lat=10, n_lon=16), materials_start=mat)
    )
    scene = b.build()
    assert scene.clusters.geo_stream is not None
    # the auto-gate is off (measured negative on the 1M sphere class —
    # see split_rebin_preferred); the mechanism stays exact regardless
    assert not rp.split_rebin_preferred(scene)

    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), 128, 64)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)
    img_split, layout_s = rp.render_fused_camera(
        scene, frame, 128, 64, bounces=2, split_rebin=True
    )
    img_one, layout_o = rp.render_fused_camera(
        scene, frame, 128, 64, bounces=2, split_rebin=False
    )
    assert layout_s == layout_o
    np.testing.assert_array_equal(
        np.asarray(img_split), np.asarray(img_one)
    )
