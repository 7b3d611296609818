"""Vector/matrix math and color packing.

Replaces the reference's SSE math library (Math/Matrix.hpp, Math/Vector4.hpp,
Math/Math.hpp) with jnp ops. Conventions follow the reference exactly so that
camera matrices and instance transforms produce identical rays:

* Matrices are ``[4,4]`` row-major with the **row-vector** convention:
  ``transform(v, M) == v @ M`` — the reference's ``MatMul(m, v)``
  (kernels/MathAndSTL.cl:100-102) and ``Vector4Transform``.
* ``perspective_fov_rh`` mirrors Matrix.hpp:237-252; ``look_at_rh`` mirrors
  Matrix.hpp:211-235 (which builds rows then transposes).
* Half-precision attribute storage uses IEEE float16 like the reference's
  software converters (Math/Math.hpp:156-227).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import Array

Vec3 = Array  # [..., 3]
Vec4 = Array  # [..., 4]
Mat4 = Array  # [4, 4]

# ---------------------------------------------------------------------------
# Vectors
# ---------------------------------------------------------------------------


def normalize(v: Array, axis: int = -1, eps: float = 0.0) -> Array:
    """L2-normalize. With eps=0 matches the reference's raw rsqrt normalize."""
    n = jnp.sum(v * v, axis=axis, keepdims=True)
    return v / jnp.sqrt(n + eps)


def dot(a: Array, b: Array, axis: int = -1, keepdims: bool = False) -> Array:
    return jnp.sum(a * b, axis=axis, keepdims=keepdims)


def cross(a: Vec3, b: Vec3) -> Vec3:
    return jnp.cross(a, b)


def reflect(v: Vec3, n: Vec3) -> Vec3:
    """Mirror reflection, reference MathAndSTL.cl:117-119."""
    return v - n * dot(n, v, keepdims=True) * 2.0


# ---------------------------------------------------------------------------
# Matrices (row-vector convention: p' = p @ M)
#
# All small-matrix transforms are written as explicit sums of broadcast
# products rather than ``@``: on TPU, f32 matmuls route through the MXU with
# bf16-rounded inputs by default, and view/projection matrices contain
# catastrophic cancellations (e.g. w = -49.999 + 50.001) that bf16 rounds to
# exactly zero. Elementwise VPU math keeps full f32 precision and is faster
# than the MXU for K=4 anyway.
# ---------------------------------------------------------------------------


def matvec(v: Array, m: Array) -> Array:
    """Row-vector transform ``v @ m`` for [..., K] x [..., K, N], exact f32."""
    return jnp.sum(v[..., :, None] * m, axis=-2)


def transform_point(p: Vec3, m: Mat4) -> Vec3:
    """Transform a position (w=1): reference MatMul(m, (p,1)).xyz."""
    return matvec(p, m[..., :3, :3]) + m[..., 3, :3]


def transform_vector(v: Vec3, m: Mat4) -> Vec3:
    """Transform a direction (w=0): reference MatMul(m, (v,0)).xyz."""
    return matvec(v, m[..., :3, :3])


def transform_h(v: Vec4, m: Mat4) -> Vec4:
    """Full homogeneous transform: v @ M."""
    return matvec(v, m)


def perspective_fov_rh(
    fov_rad: float, width: float, height: float, z_near: float, z_far: float
) -> np.ndarray:
    """Right-handed perspective projection (reference Matrix.hpp:237-252)."""
    h = np.cos(0.5 * fov_rad) / np.sin(0.5 * fov_rad)
    w = h * height / width
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = w
    m[1, 1] = h
    m[2, 2] = -(z_far + z_near) / (z_far - z_near)
    m[2, 3] = -1.0
    m[3, 2] = -(2.0 * z_far * z_near) / (z_far - z_near)
    return m


def look_at_rh(eye: np.ndarray, front: np.ndarray, up: np.ndarray) -> np.ndarray:
    """Right-handed view matrix (reference Matrix.hpp:211-235).

    ``front`` must be normalized (the reference passes camera Front and
    negates it internally into EyeDirection).
    """
    eye = np.asarray(eye, np.float32)
    eye_dir = -np.asarray(front, np.float32)
    r0 = np.cross(np.asarray(up, np.float32), eye_dir)
    r0 /= np.linalg.norm(r0)
    r1 = np.cross(eye_dir, r0)
    r1 /= np.linalg.norm(r1)
    m_pre = np.zeros((4, 4), np.float32)
    m_pre[0, :3] = r0
    m_pre[0, 3] = np.dot(r0, -eye)
    m_pre[1, :3] = r1
    m_pre[1, 3] = np.dot(r1, -eye)
    m_pre[2, :3] = eye_dir
    m_pre[2, 3] = np.dot(eye_dir, -eye)
    m_pre[3, 3] = 1.0
    return m_pre.T.copy()


def inverse(m: Array) -> Array:
    """General 4x4 inverse (reference Matrix.hpp:292-431 SSE path)."""
    return jnp.linalg.inv(m)


def translation(x: float, y: float, z: float) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[3, :3] = (x, y, z)  # row-vector convention: translation in last row
    return m


def scale_matrix(sx: float, sy: float, sz: float) -> np.ndarray:
    return np.diag(np.array([sx, sy, sz, 1.0], np.float32))


def rotation_y(angle_rad: float) -> np.ndarray:
    """Rotation about +Y for the row-vector convention."""
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 2] = c, -s
    m[2, 0], m[2, 2] = s, c
    return m


def euler_to_matrix(ex: float, ey: float, ez: float) -> np.ndarray:
    """Euler XYZ rotation composed for row-vector convention
    (reference Math/Quaternion.hpp euler→matrix path)."""
    cx, sx = np.cos(ex), np.sin(ex)
    cy, sy = np.cos(ey), np.sin(ey)
    cz, sz = np.cos(ez), np.sin(ez)
    rx = np.array(
        [[1, 0, 0, 0], [0, cx, sx, 0], [0, -sx, cx, 0], [0, 0, 0, 1]], np.float32
    )
    ry = np.array(
        [[cy, 0, -sy, 0], [0, 1, 0, 0], [sy, 0, cy, 0], [0, 0, 0, 1]], np.float32
    )
    rz = np.array(
        [[cz, sz, 0, 0], [-sz, cz, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32
    )
    return rx @ ry @ rz


def compose_trs(
    position: np.ndarray, rotation: np.ndarray | None = None, scale: float = 1.0
) -> np.ndarray:
    """Transform.GetMatrix equivalent (reference Math/Transform.hpp:45-63)."""
    m = np.eye(4, dtype=np.float32) * np.array([scale, scale, scale, 1.0], np.float32)[:, None]
    if rotation is not None:
        m = m @ rotation
    m[3, :3] = np.asarray(position, np.float32)
    return m


# ---------------------------------------------------------------------------
# Half-precision attribute storage (reference Math/Math.hpp:156-227)
# ---------------------------------------------------------------------------


def to_half(x: np.ndarray) -> np.ndarray:
    """Quantize to IEEE float16 (attribute storage dtype of the reference)."""
    return np.asarray(x, np.float32).astype(np.float16)


def half_to_float(x: np.ndarray) -> np.ndarray:
    return np.asarray(x, np.float16).astype(np.float32)


# ---------------------------------------------------------------------------
# Packed color (reference Math/Math.hpp:233-259, MathAndSTL.cl:238-251)
# ---------------------------------------------------------------------------

_U8_TO_F32 = np.float32(1.0 / 255.0)


def pack_rgb_u32(rgb: np.ndarray) -> np.ndarray:
    """Pack float RGB in [0,1] into u32 0x00BBGGRR (reference PackColorRGBU32).

    Rounds to nearest (the reference truncates; round keeps the packed view
    consistent with the float-canonical material colors under f32 rounding)."""
    rgb = np.clip(np.asarray(rgb, np.float32), 0.0, 1.0)
    b = (rgb * 255.0 + 0.5).astype(np.uint32)
    return b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16)


def unpack_rgb_u32(u: Array) -> Array:
    """Unpack u32 0x00BBGGRR to float3 (reference UnpackRGB8u)."""
    u = u.astype(jnp.uint32)
    return (
        jnp.stack(
            [u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF],
            axis=-1,
        ).astype(jnp.float32)
        * _U8_TO_F32
    )


def multiply_color_u32(texel_rgb8: Array, color_u32: Array) -> Array:
    """(material_u32_channel * texel_byte) >> 8, then /255 — the reference's
    integer color modulate (MathAndSTL.cl:243-249, CPURayTrace.cpp:148-155).

    ``texel_rgb8``: [...,3] uint8/int32 texel bytes. ``color_u32``: packed
    material color. Returns float3 in [0,1].
    """
    c = color_u32.astype(jnp.uint32)
    mat = jnp.stack([c & 0xFF, (c >> 8) & 0xFF, (c >> 16) & 0xFF], axis=-1)
    prod = (mat * texel_rgb8.astype(jnp.uint32)) >> 8
    return prod.astype(jnp.float32) * _U8_TO_F32
