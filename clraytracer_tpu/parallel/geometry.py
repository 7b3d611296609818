"""Geometry (instance) sharding: the scene-parallel mesh axis.

The reference is strictly single-GPU; its only scaling axis is the pixel
grid (SURVEY.md §2 "Parallelism strategies"). ``parallel/sharding.py`` covers
that axis (rays/tiles data-parallel). This module adds the orthogonal one:
**split the scene's instances over a mesh axis**, so each device traverses
only ``ceil(I / n)`` instances' BVHs and the per-ray closest hits are
combined with one min-reduction over ICI. Compose both on a 2-D mesh
``('devices', 'geo')`` via :func:`render_sharded_2d` — rays shard over
``devices``, instances over ``geo``.

Combining hit RECORDS (11 scalars/ray) instead of all-gathering geometry is
the bandwidth-right choice: the collective cost is O(rays), independent of
scene size, and rides ICI as a handful of psums.

Tie semantics match the single-device tracer exactly: the sequential
instance loop keeps the FIRST instance at equal t (trace_ref._merge uses
strict <); instances are assigned to devices in ascending contiguous blocks,
so "lowest device index holding the min t" is the same winner.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, PartitionSpec as P

from clraytracer_tpu import math3d
from clraytracer_tpu.config import RenderConfig
from clraytracer_tpu.ops.trace_ref import (
    SceneHit,
    _empty_hit,
    _instance_tables,
    _merge,
)
from clraytracer_tpu.ops.trace_wavefront import _traverse_batch
from clraytracer_tpu.render import FrameInputs
from clraytracer_tpu.scene.types import MISS_DISTANCE, Scene

GEO_AXIS = "geo"
RAY_AXIS = "devices"  # same name as parallel.sharding.AXIS


def combine_hits(best: SceneHit, axis: str) -> SceneHit:
    """Reduce per-device closest hits to the global closest over ``axis``.

    min-t with ties broken to the lowest device index — the sequential
    instance-merge order when instances are dealt to devices in ascending
    blocks. All outputs are replicated over ``axis`` (psum/pmin products),
    so downstream shading runs replicated inside the same shard_map.

    Differentiation: the winner masks are discrete (stop-gradded); field
    values flow through ``psum(where(win, x, 0))`` whose transpose is the
    same masked psum — gradients w.r.t. scene params survive the combine.
    """
    idx = jax.lax.axis_index(axis)
    n = jax.lax.psum(1, axis)
    t = best.t
    t_min = jax.lax.pmin(jnp.where(best.hit, t, MISS_DISTANCE), axis)
    owner = jax.lax.pmin(
        jnp.where(best.hit & (t == t_min), idx, n), axis
    )
    hit_any = owner < n
    win = jax.lax.stop_gradient(hit_any & (idx == owner))

    def red(x: Array) -> Array:
        return jax.lax.psum(jnp.where(win, x, jnp.zeros_like(x)), axis)

    return SceneHit(
        t=jnp.where(hit_any, red(t), MISS_DISTANCE),
        u=red(best.u),
        v=red(best.v),
        tri=red(best.tri),
        instance=red(best.instance),
        hit=hit_any,
        # shading recomputes the object-space ray from its own instance
        # gather (ops/shade.py:446) — no consumer reads these, same as the
        # Pallas tracer (ops/trace_pallas.py:593)
        mesh_origin=None,
        mesh_direction=None,
    )


def make_geo_sharded_tracer(n_shards: int, axis: str = GEO_AXIS):
    """A drop-in ``Tracer`` for use INSIDE ``shard_map`` over ``axis``.

    Each device traverses the instance block
    ``[idx * ceil(I/n), (idx+1) * ceil(I/n))`` (dynamic roots/inverse
    transforms — one compiled program for all devices, SPMD), then
    :func:`combine_hits` reduces the records over ICI.
    """

    def tracer(scene: Scene, origin: Array, direction: Array) -> SceneHit:
        shape = origin.shape[1:]
        flat_o = jnp.moveaxis(origin, 0, -1).reshape(-1, 3)
        flat_d = jnp.moveaxis(direction, 0, -1).reshape(-1, 3)
        # the traversal's while_loop carry must be axis-varying from the
        # first iteration (the body mixes in the device-varying instance
        # block), so mark the rays varying before deriving the carry
        flat_o = jax.lax.pcast(flat_o, (axis,), to="varying")
        flat_d = jax.lax.pcast(flat_d, (axis,), to="varying")
        best = _empty_hit((flat_o.shape[0],), flat_o, flat_d)

        _, _, _, roots = _instance_tables(scene)
        roots = jnp.asarray(np.asarray(roots, np.int32))
        n_inst = int(scene.instances.count)
        per = -(-n_inst // n_shards)
        idx = jax.lax.axis_index(axis)

        for k in range(per):
            inst = idx * per + k  # traced: device-varying instance id
            valid = inst < n_inst
            inst_c = jnp.minimum(inst, n_inst - 1)
            inv = scene.instances.inverse_transform[inst_c]
            o = math3d.transform_point(flat_o, inv)
            d = math3d.transform_vector(flat_d, inv)
            t, u, v, tri, hit = _traverse_batch(
                scene, roots[inst_c], o, d, best.t
            )
            cand = SceneHit(
                t=t,
                u=u,
                v=v,
                tri=tri,
                instance=jnp.broadcast_to(inst_c, t.shape).astype(jnp.int32),
                hit=hit & valid,
                mesh_origin=o,
                mesh_direction=d,
            )
            best = _merge(best, cand)

        best = combine_hits(best, axis)
        return SceneHit(
            *(
                x.reshape(shape + x.shape[1:]) if x is not None else None
                for x in best
            )
        )

    return tracer


def make_mesh_2d(
    n_ray_shards: int, n_geo_shards: int, devices: list | None = None
) -> Mesh:
    """2-D mesh ('devices', 'geo'): rays × instance blocks."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_ray_shards * n_geo_shards
    grid = np.asarray(devices[: n_ray_shards * n_geo_shards]).reshape(
        n_ray_shards, n_geo_shards
    )
    return Mesh(grid, axis_names=(RAY_AXIS, GEO_AXIS))


def train_step_sharded_2d(
    scene: Scene,
    frame: FrameInputs,
    target: Array,  # [H, W, 3], H a multiple of the ray-axis size
    mesh: Mesh,
    lr: float = 1e-2,
    bounces: int = 2,
):
    """One inverse-rendering SGD step over the 2-D ('devices', 'geo') mesh.

    Rays shard over ``devices`` exactly like
    :func:`parallel.sharding.train_step_sharded`; each geo shard traverses
    only its instance block and :func:`combine_hits` reduces hit records
    over ``geo``. The differentiable recompute (diff.py) runs on the
    COMBINED records, so every differentiable quantity — and therefore the
    local gradient — is geo-REPLICATED: the explicit all-reduce sums over
    the ray axis only (a geo psum would overcount by the geo size). Returns
    (global loss, updated scene), both fully replicated.
    """
    from clraytracer_tpu.diff import make_differentiable_tracer
    from clraytracer_tpu.parallel.sharding import (
        _float_leaf_view,
        _shade_rows,
    )

    n_rows = mesh.shape[RAY_AXIS]
    n_geo = mesh.shape[GEO_AXIS]
    height, width = target.shape[0], target.shape[1]
    assert height % n_rows == 0, "pad target rows to a multiple of the ray axis"
    local_rows = height // n_rows
    tracer = make_differentiable_tracer(make_geo_sharded_tracer(n_geo))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS, None, None)),
        out_specs=(P(), P()),
        # vma tracking off: same contract as train_step_sharded — gradients
        # are explicit-psum'd below, pinned by
        # tests/test_geometry_sharding.py::test_train_step_2d_grads_match_unsharded
        check_vma=False,
    )
    def step(scene_rep: Scene, frame_rep: FrameInputs, target_local: Array):
        idx = jax.lax.axis_index(RAY_AXIS)
        row0 = idx * local_rows
        params, rebuild = _float_leaf_view(scene_rep)

        def local_loss(p) -> Array:
            img = _shade_rows(
                rebuild(p), frame_rep, width, height, row0, local_rows,
                bounces, tracer, reference_parity=True, integer_colors=False,
            )
            return jnp.sum((img - target_local) ** 2)

        loss, grads = jax.value_and_grad(local_loss)(params)
        # ray-axis all-reduce ONLY (see docstring: grads are geo-replicated)
        loss = jax.lax.psum(loss, RAY_AXIS)
        grads = jax.lax.psum(grads, RAY_AXIS)
        denom = 1.0 / (height * width * 3)
        new_params = [
            p - lr * g.astype(p.dtype) * denom for p, g in zip(params, grads)
        ]
        return loss * denom, rebuild(new_params)

    return step(scene, frame, target)


def render_sharded_2d(
    scene: Scene,
    frame: FrameInputs,
    config: RenderConfig,
    mesh: Mesh,
) -> Array:
    """Full frame over a 2-D mesh: image rows shard over ``devices``,
    instances over ``geo``. Returns the global [H, W, 3] image.

    The geo-axis collective is the hit-record combine (a few psums of
    O(local rays)); shading then runs geo-replicated on each row shard.
    """
    from clraytracer_tpu.ops.post import post_process
    from clraytracer_tpu.parallel.sharding import _shade_rows

    n_rows = mesh.shape[RAY_AXIS]
    n_geo = mesh.shape[GEO_AXIS]
    h_pad = (config.height + n_rows - 1) // n_rows * n_rows
    local_rows = h_pad // n_rows
    tracer = make_geo_sharded_tracer(n_geo)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(RAY_AXIS, None, None),
    )
    def shard_fn(scene_rep: Scene, frame_rep: FrameInputs) -> Array:
        idx = jax.lax.axis_index(RAY_AXIS)
        return _shade_rows(
            scene_rep,
            frame_rep,
            config.width,
            config.height,
            idx * local_rows,
            local_rows,
            config.bounces,
            tracer,
            config.reference_parity_shading,
            config.integer_colors,
        )

    img = shard_fn(scene, frame)[: config.height]
    if config.enable_post:
        img = post_process(img, enable_fxaa=config.enable_fxaa)
    return img
