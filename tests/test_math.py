"""Math & color tests: matrix conventions, packing, reflection."""

import numpy as np
import jax.numpy as jnp

from clraytracer_tpu import math3d


def test_row_vector_convention():
    m = math3d.translation(1.0, 2.0, 3.0)
    p = jnp.asarray([0.0, 0.0, 0.0])
    out = math3d.transform_point(p, jnp.asarray(m))
    np.testing.assert_allclose(out, [1.0, 2.0, 3.0], atol=1e-6)
    # directions ignore translation
    d = math3d.transform_vector(jnp.asarray([0.0, 0.0, -1.0]), jnp.asarray(m))
    np.testing.assert_allclose(d, [0.0, 0.0, -1.0], atol=1e-6)


def test_perspective_matches_reference_layout():
    fov = np.deg2rad(65.0)
    m = math3d.perspective_fov_rh(fov, 1249.0, 720.0, 0.01, 500.0)
    h = np.cos(fov / 2) / np.sin(fov / 2)
    assert np.isclose(m[1, 1], h)
    assert np.isclose(m[0, 0], h * 720.0 / 1249.0)
    assert np.isclose(m[2, 3], -1.0)
    assert m[3, 3] == 0.0


def test_lookat_inverts_to_camera_position():
    eye = np.array([0.0, 4.0, 15.0], np.float32)
    front = np.array([0.0, 0.0, -1.0], np.float32)
    view = math3d.look_at_rh(eye, front, np.array([0.0, 1.0, 0.0], np.float32))
    # eye transforms to origin
    p = np.append(eye, 1.0) @ view
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)
    # a point straight ahead lands on -z (RH convention)
    q = np.array([0.0, 4.0, 10.0, 1.0], np.float32) @ view
    np.testing.assert_allclose(q[:3], [0.0, 0.0, -5.0], atol=1e-5)


def test_rotation_y():
    m = math3d.rotation_y(np.pi / 2)
    p = math3d.transform_point(jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray(m))
    # +x rotates toward -z for positive angle about +y (right-handed)
    np.testing.assert_allclose(np.asarray(p), [0.0, 0.0, -1.0], atol=1e-6)


def test_pack_unpack_roundtrip():
    rgb = np.array([[0.0, 0.5, 1.0], [0.25, 0.75, 0.1]], np.float32)
    u = math3d.pack_rgb_u32(rgb)
    back = np.asarray(math3d.unpack_rgb_u32(jnp.asarray(u)))
    np.testing.assert_allclose(back, rgb, atol=1.0 / 255.0)


def test_multiply_color_u32_matches_integer_reference():
    # ((a_channel * texel_byte) >> 8) / 255, per channel; pack rounds to
    # nearest (0.5 → 128, 0.25 → 64)
    texel = jnp.asarray([[200, 100, 50]], jnp.uint32)
    color = jnp.asarray([math3d.pack_rgb_u32(np.array([1.0, 0.5, 0.25]))])
    out = np.asarray(math3d.multiply_color_u32(texel, color))[0]
    expect = np.array(
        [(255 * 200) >> 8, (128 * 100) >> 8, (64 * 50) >> 8], np.float32
    ) / 255.0
    np.testing.assert_allclose(out, expect, atol=1e-7)


def test_modulate_bytes_matches_integer_path():
    from clraytracer_tpu.ops.shade import _modulate_bytes

    rng = np.random.default_rng(0)
    tex_u8 = rng.integers(0, 256, (3, 64)).astype(np.uint32)
    mat_u8 = rng.integers(0, 256, (3, 64)).astype(np.uint32)
    expect = ((mat_u8 * tex_u8) >> 8).astype(np.float32) / 255.0
    got = np.asarray(
        _modulate_bytes(
            jnp.asarray(tex_u8.astype(np.float32) / 255.0),
            jnp.asarray(mat_u8.astype(np.float32) / 255.0),
        )
    )
    np.testing.assert_allclose(got, expect, atol=1e-7)


def test_reflect():
    v = jnp.asarray([1.0, -1.0, 0.0])
    n = jnp.asarray([0.0, 1.0, 0.0])
    np.testing.assert_allclose(math3d.reflect(v, n), [1.0, 1.0, 0.0], atol=1e-7)


def test_half_roundtrip_quantizes():
    x = np.array([0.1, 1.0, 123.456], np.float32)
    h = math3d.to_half(x)
    assert h.dtype == np.float16
    np.testing.assert_allclose(math3d.half_to_float(h), x, rtol=1e-3)
