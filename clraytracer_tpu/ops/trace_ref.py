"""Reference tracers: brute-force (golden) and stack-based BVH traversal.

These are the semantic anchors of the framework — the role the reference's
CPU path plays for its GPU kernels (CPURayTrace.cpp mirrors
kernel_main.cl over the same host arrays, SURVEY.md §3.4):

* :func:`trace_brute` — every ray against every triangle of each instanced
  mesh. Correct by construction; used to validate everything else.
* :func:`trace_bvh` — the reference's ordered near-child-first stack
  traversal (kernel_main.cl:124-160, CPURayTrace.cpp:91-128) expressed as a
  vmapped ``lax.while_loop`` with a fixed 32-entry stack and the same
  250-iteration protection cap. XLA batches the per-ray control flow into
  masked vector execution — the jit-portable mid-performance path.

Both loop over mesh instances exactly like the Trace kernel
(kernel_main.cl:198-217): the ray is moved into each instance's object space
via its cached inverse transform, and the closest accepted ``t`` is compared
across instances (object-space t, as in the reference).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array

from clraytracer_tpu import math3d
from clraytracer_tpu.ops.intersect import intersect_aabb, moller_trumbore
from clraytracer_tpu.scene.types import MISS_DISTANCE, Scene

_STACK_SIZE = 32
_PROTECTION = 250


class SceneHit(NamedTuple):
    """Closest hit across all instances.

    ``mesh_origin``/``mesh_direction`` (the object-space ray of the winning
    instance, kernel_main.cl:246-265) are filled by the tracers that compute
    them per instance anyway (brute/bvh/wavefront); shading does NOT read
    them — it reconstructs the object-space ray from its own instance gather
    (ops/shade.py), so gather-free tracers (Pallas) leave them None."""

    t: Array  # [...]
    u: Array  # [...]
    v: Array  # [...]
    tri: Array  # [...] i32 (global triangle index)
    instance: Array  # [...] i32
    hit: Array  # [...] bool
    mesh_origin: Array | None = None  # [..., 3]
    mesh_direction: Array | None = None  # [..., 3]
    #: Pre-interpolated shading attributes (Pallas tracer only — the
    #: triangle data is already in VMEM there, so interpolating in-kernel
    #: replaces a ~5 ms per-ray attribute gather). Object-space normal,
    #: wrapped later by the instance inverse in shading.
    attr_normal: Array | None = None  # [3, ...] object-space, unnormalized
    attr_uu: Array | None = None  # [...]
    attr_vv: Array | None = None  # [...]
    attr_mat: Array | None = None  # [...] f32 mesh-local material index


def _instance_tables(scene: Scene) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host-side (static) per-instance mesh ranges/roots."""
    mesh_idx = np.asarray(scene.instances.mesh_index, np.int64)
    starts = np.asarray(scene.bvh.mesh_tri_start, np.int64)[mesh_idx]
    counts = np.asarray(scene.bvh.mesh_tri_count, np.int64)[mesh_idx]
    roots = np.asarray(scene.bvh.roots, np.int64)[mesh_idx]
    return mesh_idx, starts, counts, roots


def _merge(best: SceneHit, cand: SceneHit) -> SceneHit:
    """Keep the closer accepted hit (strict <, as the reference's
    ``triout.t = besthit.distance`` chaining does)."""
    take = cand.hit & (cand.t < best.t)
    sel = lambda a, b: jnp.where(take, a, b)
    sel3 = lambda a, b: jnp.where(take[..., None], a, b)
    return SceneHit(
        t=sel(cand.t, best.t),
        u=sel(cand.u, best.u),
        v=sel(cand.v, best.v),
        tri=sel(cand.tri, best.tri),
        instance=sel(cand.instance, best.instance),
        hit=best.hit | take,
        mesh_origin=sel3(cand.mesh_origin, best.mesh_origin),
        mesh_direction=sel3(cand.mesh_direction, best.mesh_direction),
    )


def _empty_hit(shape: tuple[int, ...], origin: Array, direction: Array) -> SceneHit:
    # derive zeros from the ray arrays (not fresh constants) so that under
    # shard_map the state is device-varying from the start — while_loop
    # carries must keep a consistent varying type
    zero = (origin[..., 0] + direction[..., 0]) * 0.0
    zero_i = zero.astype(jnp.int32)
    return SceneHit(
        t=zero + MISS_DISTANCE,
        u=zero,
        v=zero,
        tri=zero_i,
        instance=zero_i,
        hit=zero_i > 0,
        mesh_origin=origin,
        mesh_direction=direction,
    )


def _object_space_ray(scene: Scene, inst: int, origin: Array, direction: Array):
    inv = scene.instances.inverse_transform[inst]
    o = math3d.transform_point(origin, inv)
    d = math3d.transform_vector(direction, inv)
    return o, d


# ---------------------------------------------------------------------------
# Brute force (golden)
# ---------------------------------------------------------------------------


def trace_brute(
    scene: Scene,
    origin: Array,  # [3, ...] planar
    direction: Array,  # [3, ...] planar
    chunk: int = 2048,
) -> SceneHit:
    """All rays x all triangles per instance, chunked over triangles."""
    origin = jnp.moveaxis(origin, 0, -1)
    direction = jnp.moveaxis(direction, 0, -1)
    shape = origin.shape[:-1]
    best = _empty_hit(shape, origin, direction)
    _, starts, counts, _ = _instance_tables(scene)

    for inst in range(int(scene.instances.count)):
        o, d = _object_space_ray(scene, inst, origin, direction)
        start, count = int(starts[inst]), int(counts[inst])
        for cs in range(start, start + count, chunk):
            ce = min(cs + chunk, start + count)
            v0 = scene.tris.v0[cs:ce]
            v1 = scene.tris.v1[cs:ce]
            v2 = scene.tris.v2[cs:ce]
            t, u, v, ok = moller_trumbore(
                o[..., None, :], d[..., None, :], v0, v1, v2, best.t[..., None]
            )
            t_m = jnp.where(ok, t, MISS_DISTANCE)
            k = jnp.argmin(t_m, axis=-1)
            tk = jnp.take_along_axis(t_m, k[..., None], axis=-1)[..., 0]
            cand = SceneHit(
                t=tk,
                u=jnp.take_along_axis(u, k[..., None], axis=-1)[..., 0],
                v=jnp.take_along_axis(v, k[..., None], axis=-1)[..., 0],
                tri=(k + cs).astype(jnp.int32),
                instance=jnp.full(shape, inst, jnp.int32),
                hit=tk < MISS_DISTANCE,
                mesh_origin=o,
                mesh_direction=d,
            )
            best = _merge(best, cand)
    return best


# ---------------------------------------------------------------------------
# Stack-based BVH traversal (vmapped while_loop)
# ---------------------------------------------------------------------------


def _traverse_one(
    scene: Scene,
    root: Array,
    o: Array,  # [3]
    d: Array,  # [3]
    t_init: Array,  # [] current best (reference: triout.t = besthit.distance)
) -> tuple[Array, Array, Array, Array, Array]:
    """Single-ray traversal; returns (t, u, v, tri, hit)."""
    bvh = scene.bvh
    tris = scene.tris
    inv_dir = 1.0 / d

    class Carry(NamedTuple):
        stack: Array  # [S] i32
        sp: Array  # [] i32
        t: Array
        u: Array
        v: Array
        tri: Array
        hit: Array
        steps: Array

    stack0 = jnp.zeros(_STACK_SIZE, jnp.int32).at[0].set(root)
    carry0 = Carry(
        stack=stack0,
        sp=jnp.asarray(1, jnp.int32),
        t=t_init,
        u=jnp.asarray(0.0, jnp.float32),
        v=jnp.asarray(0.0, jnp.float32),
        tri=jnp.asarray(0, jnp.int32),
        hit=jnp.asarray(False),
        steps=jnp.asarray(0, jnp.int32),
    )

    def cond(c: Carry) -> Array:
        return (c.sp > 0) & (c.steps < _PROTECTION)

    def leaf_body(c: Carry, node: Array) -> Carry:
        """Intersect the leaf's triangle range with a bounded scan."""
        first = bvh.left_first[node]
        count = bvh.tri_count[node]

        def tri_step(i: Array, cc: Carry) -> Carry:
            idx = first + i
            valid = i < count
            t, u, v, ok = moller_trumbore(
                o, d, tris.v0[idx], tris.v1[idx], tris.v2[idx], cc.t
            )
            ok = ok & valid
            return cc._replace(
                t=jnp.where(ok, t, cc.t),
                u=jnp.where(ok, u, cc.u),
                v=jnp.where(ok, v, cc.v),
                tri=jnp.where(ok, idx.astype(jnp.int32), cc.tri),
                hit=cc.hit | ok,
            )

        # max leaf size is data-dependent; scan to the node's count via
        # a while loop over triangles
        def tcond(s: tuple[Array, Carry]) -> Array:
            return s[0] < count

        def tbody(s: tuple[Array, Carry]) -> tuple[Array, Carry]:
            i, cc = s
            return i + 1, tri_step(i, cc)

        _, c2 = jax.lax.while_loop(tcond, tbody, (jnp.asarray(0, jnp.int32), c))
        return c2

    def inner_body(c: Carry, node: Array) -> Carry:
        left = bvh.left_first[node]
        right = left + 1
        d1 = intersect_aabb(o, inv_dir, bvh.node_min[left], bvh.node_max[left], c.t)
        d2 = intersect_aabb(o, inv_dir, bvh.node_min[right], bvh.node_max[right], c.t)
        near, far = (
            jnp.where(d1 <= d2, left, right),
            jnp.where(d1 <= d2, right, left),
        )
        dnear = jnp.minimum(d1, d2)
        dfar = jnp.maximum(d1, d2)
        # push far (if hit), then near — near is popped first
        # (reference pushes right and loops to left, kernel_main.cl:150-157)
        push_far = dfar < MISS_DISTANCE
        stack = jnp.where(
            push_far, c.stack.at[c.sp].set(far.astype(jnp.int32)), c.stack
        )
        sp = jnp.where(push_far, c.sp + 1, c.sp)
        push_near = dnear < MISS_DISTANCE
        stack = jnp.where(
            push_near, stack.at[sp].set(near.astype(jnp.int32)), stack
        )
        sp = jnp.where(push_near, sp + 1, sp)
        return c._replace(stack=stack, sp=sp)

    def body(c: Carry) -> Carry:
        sp = c.sp - 1
        node = c.stack[sp]
        c = c._replace(sp=sp, steps=c.steps + 1)
        is_leaf = bvh.tri_count[node] > 0
        return jax.lax.cond(is_leaf, leaf_body, inner_body, c, node)

    out = jax.lax.while_loop(cond, body, carry0)
    return out.t, out.u, out.v, out.tri, out.hit


def trace_bvh(scene: Scene, origin: Array, direction: Array) -> SceneHit:
    """BVH traversal over all instances (vmapped per-ray while loops).
    ``origin``/``direction``: planar [3, ...]."""
    shape = origin.shape[1:]
    flat_o = jnp.moveaxis(origin, 0, -1).reshape(-1, 3)
    flat_d = jnp.moveaxis(direction, 0, -1).reshape(-1, 3)
    best = _empty_hit((flat_o.shape[0],), flat_o, flat_d)

    _, _, _, roots = _instance_tables(scene)

    for inst in range(int(scene.instances.count)):
        o, d = _object_space_ray(scene, inst, flat_o, flat_d)
        root = jnp.asarray(int(roots[inst]), jnp.int32)
        trav = functools.partial(_traverse_one, scene, root)
        t, u, v, tri, hit = jax.vmap(trav)(o, d, best.t)
        cand = SceneHit(
            t=t,
            u=u,
            v=v,
            tri=tri,
            instance=jnp.full(t.shape, inst, jnp.int32),
            hit=hit,
            mesh_origin=o,
            mesh_direction=d,
        )
        best = _merge(best, cand)

    return SceneHit(
        *(x.reshape(shape + x.shape[1:]) if x is not None else None for x in best)
    )
