"""Single-ray scene raycast + picking — the reference's CPU ray-trace path.

TPU-native twin of ``CPU_RayCast(RaySSE) -> HitRecord`` (CPURayTrace.cpp:186,
CPURayTrace.hpp:5-18), which the reference drives from mouse clicks for
object picking (Engine.cpp:112-126). The reference maintains a whole second
SSE implementation of traversal + shading-attribute reconstruction over host
mirrors of the GPU arrays; here the *same* jitted tracer/shading tables serve
both the image pipeline and picking, so there is nothing to keep in sync.

``HitRecord`` carries what the reference's does: interpolated world normal,
uv, distance, the texture-modulated surface color (u32-parity math), and the
triangle index — plus the instance index, which the reference derives
implicitly from its instance loop.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array

from clraytracer_tpu.camera import Camera, screen_point_to_ray
from clraytracer_tpu.ops import gather, planar
from clraytracer_tpu.ops.shade import (
    _modulate_bytes,
    _shading_tables,
    sample_pool_planar,
)
from clraytracer_tpu.ops.trace_ref import trace_bvh
from clraytracer_tpu.render import Tracer
from clraytracer_tpu.scene.types import MISS_DISTANCE, Scene

#: Reference RayacastMissDistance (CPURayTrace.hpp:14).
MISS = float(MISS_DISTANCE)


class HitRecord(NamedTuple):
    """Reference HitRecord (CPURayTrace.hpp:5-12) + instance index."""

    normal: Array  # [..., 3] world-space interpolated normal
    uv: Array  # [..., 2]
    distance: Array  # [...] (object-space t; MISS on miss)
    color: Array  # [..., 3] texture-modulated surface color (float RGB)
    index: Array  # [...] i32 triangle index
    instance: Array  # [...] i32
    hit: Array  # [...] bool


def raycast(
    scene: Scene,
    origin: Array,  # [..., 3]
    direction: Array,  # [..., 3]
    tracer: Tracer = trace_bvh,
) -> HitRecord:
    """Closest-hit raycast with full shading-attribute reconstruction
    (CPURayTrace.cpp:186-249). Works for any batch shape, including a
    single ray."""
    o_p = planar.from_last(origin)
    d_p = planar.from_last(direction)
    hit = tracer(scene, o_p, d_p)
    tables = _shading_tables(scene, prefer_packed=scene.packed is not None)

    attr = gather.take_rows(tables.tri_attr, hit.tri)  # [16, ...]
    inst = gather.take_rows(tables.inst_rows, hit.instance)  # [17, ...]

    w0 = 1.0 - hit.u - hit.v
    n_obj = jnp.stack(
        [attr[c] * w0 + attr[3 + c] * hit.u + attr[6 + c] * hit.v for c in range(3)]
    )
    normal = planar.normalize(
        jnp.stack(
            [
                n_obj[0] * inst[0] + n_obj[1] * inst[4] + n_obj[2] * inst[8],
                n_obj[0] * inst[1] + n_obj[1] * inst[5] + n_obj[2] * inst[9],
                n_obj[0] * inst[2] + n_obj[1] * inst[6] + n_obj[2] * inst[10],
            ]
        )
    )
    uu = attr[9] * w0 + attr[11] * hit.u + attr[13] * hit.v
    vv = attr[10] * w0 + attr[12] * hit.u + attr[14] * hit.v

    mat_id = inst[16].astype(jnp.int32) + attr[15].astype(jnp.int32)
    mat = gather.take_rows(tables.mat_rows, mat_id)
    from clraytracer_tpu.ops.shade import _OFF_SHIFT

    aw, ah = mat[8], mat[9]
    aoff = mat[10].astype(jnp.int32) * (1 << _OFF_SHIFT) + mat[11].astype(jnp.int32)
    texel = sample_pool_planar(scene.atlas, aw, ah, aoff, uu, vv)
    color = _modulate_bytes(texel, mat[0:3])  # u32-parity modulate

    shape = hit.t.shape
    return HitRecord(
        normal=planar.to_last(normal, shape),
        uv=jnp.stack([uu, vv], axis=-1),
        distance=jnp.where(hit.hit, hit.t, MISS),
        color=planar.to_last(color, shape),
        index=hit.tri,
        instance=hit.instance,
        hit=hit.hit,
    )


def pick(
    scene: Scene, camera: Camera, x: float, y: float, tracer: Tracer = trace_bvh
) -> HitRecord:
    """Mouse picking: unproject a screen point (Camera::ScreenPointToRaySSE,
    Math/Camera.hpp:121) and raycast it — the reference's LMB flow
    (Engine.cpp:112-126). Returns a single-ray HitRecord (host-friendly)."""
    o, d = screen_point_to_ray(camera, x, y)
    rec = raycast(
        scene, jnp.asarray(o)[None, :], jnp.asarray(d)[None, :], tracer
    )
    return jax.tree_util.tree_map(lambda a: np.asarray(a)[0], rec)
