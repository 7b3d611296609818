"""Ray-triangle and ray-AABB intersection (branchless, batched).

Semantics match the reference's OpenCL/SSE twins exactly:

* Möller–Trumbore with **no** parallel-ray epsilon (the ``fabs(a) < eps``
  reject is commented out in the reference, kernel_main.cl:90,
  CPURayTrace.cpp:48) and the accept mask
  ``t > 0 && t < best_t && u in [0,1] && v >= 0 && u+v <= 1``
  (kernel_main.cl:99-104).
* Slab AABB test returning ``tnear`` or MISS with
  ``tnear < tfar && tnear > 0 && tnear < best_t`` (kernel_main.cl:108-117)
  — note the reference counts a ray starting *inside* a box as a miss
  (tnear <= 0); we reproduce that for image parity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from clraytracer_tpu.scene.types import MISS_DISTANCE


class TriHit(NamedTuple):
    """Closest-hit record over a triangle batch (reference Triout,
    kernel_main.cl:45-47)."""

    t: Array  # [...] f32 (MISS/best_t when no hit)
    u: Array  # [...] f32
    v: Array  # [...] f32
    tri: Array  # [...] i32 triangle index
    hit: Array  # [...] bool


def moller_trumbore(
    origin: Array,
    direction: Array,
    v0: Array,
    v1: Array,
    v2: Array,
    best_t: Array,
) -> tuple[Array, Array, Array, Array]:
    """Branchless Möller–Trumbore. All args broadcast; returns (t, u, v, ok).

    ``ok`` is the reference's ``passed`` mask; t/u/v are raw (caller selects).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    h = jnp.cross(direction, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = 1.0 / a  # may be inf for parallel rays, as in the reference
    s = origin - v0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(direction * q, axis=-1)
    t = f * jnp.sum(e2 * q, axis=-1)
    ok = (
        (t > 0.0)
        & (t < best_t)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
    )
    return t, u, v, ok


def intersect_tris(
    origin: Array,  # [..., 3]
    direction: Array,  # [..., 3]
    v0: Array,  # [T, 3]
    v1: Array,
    v2: Array,
    best_t: Array,  # [...]
    tri_offset: int | Array = 0,
) -> TriHit:
    """Closest hit of each ray against a triangle batch.

    Rays broadcast against the triangle axis: internally computes
    ``[..., T]`` candidates and min-reduces. ``tri_offset`` shifts the
    reported triangle index (for chunked sweeps).
    """
    o = origin[..., None, :]
    d = direction[..., None, :]
    t, u, v, ok = moller_trumbore(o, d, v0, v1, v2, best_t[..., None])
    t_masked = jnp.where(ok, t, MISS_DISTANCE)
    k = jnp.argmin(t_masked, axis=-1)
    take = lambda x: jnp.take_along_axis(x, k[..., None], axis=-1)[..., 0]
    hit = take(ok)
    return TriHit(
        t=jnp.where(hit, take(t), best_t),
        u=take(u),
        v=take(v),
        tri=(k + tri_offset).astype(jnp.int32),
        hit=hit,
    )


def intersect_aabb(
    origin: Array,  # [..., 3]
    inv_dir: Array,  # [..., 3]
    bmin: Array,  # [..., 3]
    bmax: Array,  # [..., 3]
    best_t: Array,  # [...]
) -> Array:
    """Slab test → tnear, or MISS_DISTANCE (reference kernel_main.cl:108-117)."""
    t0 = (bmin - origin) * inv_dir
    t1 = (bmax - origin) * inv_dir
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    ok = (tnear < tfar) & (tnear > 0.0) & (tnear < best_t)
    return jnp.where(ok, tnear, MISS_DISTANCE)
