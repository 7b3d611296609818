"""Wavefront BVH traversal: explicitly batched, single while_loop, no
per-ray control flow.

The reference traverses with a per-thread stack and ``goto`` divergence
(kernel_main.cl:124-160) — fine on a SIMT GPU, hostile to a vector machine.
Here every ray advances in lock-step "rounds":

* State is SoA over all rays: stack [N, S], stack pointer [N], best hit [N].
* Each round every live ray pops one node; leaf-vs-inner is handled by
  masking (both paths computed, ``jnp.where`` selects) instead of branching.
* Leaves are intersected as a **fixed-size batch** of ``LEAF_SIZE`` triangle
  slots (the builder guarantees leaves ≤ LEAF_SIZE via forced/median splits),
  so the triangle test is a dense [N, LEAF_SIZE] computation.
* Node/triangle fetches are flat gathers (``jnp.take``) — the layout the SoA
  scene arrays were designed for.

This is the jit-portable performance path (CPU/TPU); the Pallas megakernel
specializes the same algorithm further (VMEM staging, tiling).

Traversal semantics match the reference exactly: ordered near-child-first
descent, strict-closer acceptance, the same slab/Möller-Trumbore accept rules,
and the 250-round protection cap (kernel_main.cl:126-131).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array

from clraytracer_tpu import math3d
from clraytracer_tpu.ops.intersect import moller_trumbore
from clraytracer_tpu.ops.trace_ref import SceneHit, _empty_hit, _instance_tables, _merge
from clraytracer_tpu.scene.types import MISS_DISTANCE, Scene

_STACK_SIZE = 48
_MAX_ROUNDS = 250  # reference protection cap


class _WaveState(NamedTuple):
    stack: Array  # [N, S] i32
    sp: Array  # [N] i32
    t: Array  # [N]
    u: Array  # [N]
    v: Array  # [N]
    tri: Array  # [N] i32
    hit: Array  # [N] bool
    rounds: Array  # [] i32


def _traverse_batch(
    scene: Scene,
    root: int,
    o: Array,  # [N, 3]
    d: Array,  # [N, 3]
    t_init: Array,  # [N]
) -> tuple[Array, Array, Array, Array, Array]:
    bvh = scene.bvh
    tris = scene.tris
    n = o.shape[0]
    inv_dir = 1.0 / d
    # static leaf batch width, guaranteed by the builder's max_leaf bound
    leaf_size = max(1, int(bvh.max_leaf_size))

    # init derived from the ray arrays so the carry is device-varying under
    # shard_map from the first iteration (see trace_ref._empty_hit)
    zero = (o[:, 0] + d[:, 0] + t_init) * 0.0
    zero_i = zero.astype(jnp.int32)
    state = _WaveState(
        stack=(jnp.zeros((n, _STACK_SIZE), jnp.int32) + zero_i[:, None])
        .at[:, 0]
        .set(root),
        sp=zero_i + 1,
        t=t_init,
        u=zero,
        v=zero,
        tri=zero_i,
        hit=zero_i > 0,
        rounds=jnp.asarray(0, jnp.int32),
    )

    def cond(s: _WaveState) -> Array:
        return jnp.any(s.sp > 0) & (s.rounds < _MAX_ROUNDS)

    def body(s: _WaveState) -> _WaveState:
        active = s.sp > 0
        sp = jnp.where(active, s.sp - 1, s.sp)
        node = jnp.take_along_axis(s.stack, sp[:, None], axis=1)[:, 0]
        node = jnp.where(active, node, 0)

        tri_count = jnp.take(bvh.tri_count, node, mode="clip")
        left_first = jnp.take(bvh.left_first, node, mode="clip")
        is_leaf = active & (tri_count > 0)
        is_inner = active & (tri_count == 0)

        # ---- leaf path: dense fixed-width triangle batch -------------------
        tri_idx = left_first[:, None] + jnp.arange(leaf_size, dtype=jnp.int32)
        tri_valid = (
            is_leaf[:, None]
            & (jnp.arange(leaf_size, dtype=jnp.int32) < tri_count[:, None])
        )
        safe_idx = jnp.where(tri_valid, tri_idx, 0)
        v0 = jnp.take(tris.v0, safe_idx, axis=0, mode="clip")  # [N, L, 3]
        v1 = jnp.take(tris.v1, safe_idx, axis=0, mode="clip")
        v2 = jnp.take(tris.v2, safe_idx, axis=0, mode="clip")
        tt, uu, vv, ok = moller_trumbore(
            o[:, None, :], d[:, None, :], v0, v1, v2, s.t[:, None]
        )
        ok = ok & tri_valid
        tt = jnp.where(ok, tt, MISS_DISTANCE)
        k = jnp.argmin(tt, axis=1)
        sel = lambda x: jnp.take_along_axis(x, k[:, None], axis=1)[:, 0]
        leaf_hit = sel(ok)
        new_t = jnp.where(leaf_hit, sel(tt), s.t)
        new_u = jnp.where(leaf_hit, sel(uu), s.u)
        new_v = jnp.where(leaf_hit, sel(vv), s.v)
        new_tri = jnp.where(leaf_hit, sel(safe_idx), s.tri)
        new_hit = s.hit | leaf_hit

        # ---- inner path: ordered children push ----------------------------
        left = left_first
        right = left + 1
        lmin = jnp.take(bvh.node_min, left, axis=0, mode="clip")
        lmax = jnp.take(bvh.node_max, left, axis=0, mode="clip")
        rmin = jnp.take(bvh.node_min, right, axis=0, mode="clip")
        rmax = jnp.take(bvh.node_max, right, axis=0, mode="clip")

        def slab(bmin: Array, bmax: Array) -> Array:
            t0 = (bmin - o) * inv_dir
            t1 = (bmax - o) * inv_dir
            tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
            tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
            hit_box = (tnear < tfar) & (tnear > 0.0) & (tnear < new_t)
            return jnp.where(hit_box, tnear, MISS_DISTANCE)

        d1 = slab(lmin, lmax)
        d2 = slab(rmin, rmax)
        near = jnp.where(d1 <= d2, left, right).astype(jnp.int32)
        far = jnp.where(d1 <= d2, right, left).astype(jnp.int32)
        dnear = jnp.minimum(d1, d2)
        dfar = jnp.maximum(d1, d2)

        # push far first (popped last), then near
        push_far = is_inner & (dfar < MISS_DISTANCE)
        stack = _scatter_push(s.stack, sp, far, push_far)
        sp2 = jnp.where(push_far, sp + 1, sp)
        push_near = is_inner & (dnear < MISS_DISTANCE)
        stack = _scatter_push(stack, sp2, near, push_near)
        sp3 = jnp.where(push_near, sp2 + 1, sp2)

        return _WaveState(
            stack=stack,
            sp=sp3,
            t=new_t,
            u=new_u,
            v=new_v,
            tri=new_tri,
            hit=new_hit,
            rounds=s.rounds + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    return out.t, out.u, out.v, out.tri, out.hit


def _scatter_push(stack: Array, sp: Array, value: Array, mask: Array) -> Array:
    """stack[i, sp[i]] = value[i] where mask — as a one-hot select (cheaper
    than scatter on TPU for small stacks)."""
    slot = jnp.arange(stack.shape[1], dtype=jnp.int32)[None, :] == sp[:, None]
    write = slot & mask[:, None]
    return jnp.where(write, value[:, None], stack)


#: rays per sequential chunk. The lock-step state is memory-hungry — the
#: [N, 48] stack, its double-buffered while-loop carry, and the one-hot
#: push masks are each ~N*192 B — so an unchunked 1080p frame (2.1M rays)
#: materializes >10 GB of temporaries and kills the TPU worker. 128k rays
#: keep the working set ~100 MB; chunks run serially via lax.map.
WAVEFRONT_CHUNK = 128 * 1024


def _trace_all_instances(scene: Scene, flat_o: Array, flat_d: Array) -> SceneHit:
    """Full instance loop over one flat ray batch → flat SceneHit."""
    best = _empty_hit((flat_o.shape[0],), flat_o, flat_d)
    _, _, _, roots = _instance_tables(scene)
    for inst in range(int(scene.instances.count)):
        inv = scene.instances.inverse_transform[inst]
        o = math3d.transform_point(flat_o, inv)
        d = math3d.transform_vector(flat_d, inv)
        t, u, v, tri, hit = _traverse_batch(scene, int(roots[inst]), o, d, best.t)
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
    return best


def trace_wavefront(scene: Scene, origin: Array, direction: Array) -> SceneHit:
    """Batched BVH trace over all instances; drop-in Tracer.
    ``origin``/``direction``: planar [3, ...]."""
    shape = origin.shape[1:]
    flat_o = jnp.moveaxis(origin, 0, -1).reshape(-1, 3)
    flat_d = jnp.moveaxis(direction, 0, -1).reshape(-1, 3)
    n = flat_o.shape[0]

    if n <= WAVEFRONT_CHUNK:
        best = _trace_all_instances(scene, flat_o, flat_d)
    else:
        pad = -n % WAVEFRONT_CHUNK
        if pad:
            flat_o = jnp.concatenate(
                [flat_o, jnp.zeros((pad, 3), flat_o.dtype)]
            )
            # non-zero pad directions so 1/d stays finite
            flat_d = jnp.concatenate(
                [flat_d, jnp.ones((pad, 3), flat_d.dtype)]
            )
        chunks = jax.lax.map(
            lambda od: _trace_all_instances(scene, od[0], od[1]),
            (
                flat_o.reshape(-1, WAVEFRONT_CHUNK, 3),
                flat_d.reshape(-1, WAVEFRONT_CHUNK, 3),
            ),
        )
        best = SceneHit(
            *(
                x.reshape((-1,) + x.shape[2:])[:n] if x is not None else None
                for x in chunks
            )
        )

    return SceneHit(
        *(x.reshape(shape + x.shape[1:]) if x is not None else None for x in best)
    )
