"""Device-mesh sharding: ray-grid data parallelism with replicated scene.

The reference's only "communication backend" is one OpenCL command queue
(SURVEY.md §5); here rendering scales over a ``jax.sharding.Mesh``:

* **Forward**: image rows are sharded over the ``devices`` axis. Each device
  generates its own row window of primary rays (no host scatter), traverses
  the replicated BVH independently inside ``shard_map`` (no per-round
  cross-device sync — each shard runs its own traversal loop), and writes its
  image shard. The only collective is the implicit output layout.
* **Backward / training** (inverse rendering — the framework's "training
  step"): per-device gradients over local rays are ``psum``-reduced over ICI
  and applied to the replicated scene parameters — classic data-parallel
  all-reduce, overlapped by XLA's scheduler.

Multi-host: the same code runs under ``jax.distributed`` initialization —
the mesh spans all hosts' devices and DCN carries the psum across hosts.
"""

from __future__ import annotations

import functools
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clraytracer_tpu.camera import ray_directions_planar
from clraytracer_tpu.config import RenderConfig
from clraytracer_tpu.diff import make_differentiable_tracer
from clraytracer_tpu.ops.post import post_process
from clraytracer_tpu.render import FrameInputs, Tracer, trace_best
from clraytracer_tpu.scene.types import Scene

AXIS = "devices"


def make_device_mesh(devices: list | None = None) -> Mesh:
    """1-D mesh over all (or given) devices; the ray/tile grid shards over it."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=(AXIS,))


def _pad_rows(height: int, n: int) -> int:
    return (height + n - 1) // n * n


def _shade_rows(
    scene: Scene,
    frame: FrameInputs,
    width: int,
    height: int,
    row_start: Array,
    local_rows: int,
    bounces: int,
    tracer: Tracer,
    reference_parity: bool,
    integer_colors: bool,
) -> Array:
    """Render a row window [row_start, row_start+local_rows) of the frame."""
    from clraytracer_tpu.ops import planar
    from clraytracer_tpu.render import trace_planar

    dirs = ray_directions_planar(
        frame.inverse_view,
        frame.inverse_projection,
        width,
        height,
        row_start=row_start,
        num_rows=local_rows,
    )
    origin = jnp.broadcast_to(frame.camera_position[:, None, None], dirs.shape)
    result = trace_planar(
        scene, origin, dirs, frame.sun_angle, bounces, tracer,
        reference_parity, integer_colors,
    )
    return planar.to_last(result, (local_rows, width))


def render_sharded(
    scene: Scene,
    frame: FrameInputs,
    config: RenderConfig,
    mesh: Mesh | None = None,
    tracer: Tracer = trace_best,
) -> Array:
    """Full frame sharded by rows over the mesh. Returns [H, W, 3] (global).

    Scene/frame are replicated; each device traces its row block
    independently (embarrassingly parallel — SURVEY.md §5 long-context note).
    """
    mesh = mesh or make_device_mesh()
    n = mesh.devices.size
    h_pad = _pad_rows(config.height, n)
    local_rows = h_pad // n

    # the production configuration runs the CAMERA-MODE fused megakernel
    # per shard: in-kernel raygen of the shard's GLOBAL row window (the
    # kernel's cam row carries row0), zero per-ray input traffic, and the
    # same screen-tile order as the single-chip flagship path — the
    # ray-mode fallback below renders scanline-band tiles spanning the
    # whole image width, which the tile culling cannot prune (measured
    # ~4x slower at 1080p)
    from clraytracer_tpu.ops.render_pallas import (
        fused_path_available,
        fused_path_preferred,
    )
    from clraytracer_tpu.ops.trace_pallas import trace_pallas
    from clraytracer_tpu.render import resolve_tracer

    use_fused_cam = (
        resolve_tracer(tracer, scene) is trace_pallas
        and fused_path_available(
            scene, config.reference_parity_shading, config.integer_colors
        )
        and fused_path_preferred(scene)
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(AXIS, None, None),
        # the Pallas megakernel runs inside this shard_map; vma tracking is
        # off because interpret-mode pallas (CPU tests/dryrun) evaluates the
        # kernel body as jax ops whose interpreter-internal constants are
        # replicated — check_vma rejects mixing them with varying ray tiles.
        # Forward-only: no gradient-psum semantics depend on it here.
        check_vma=False,
    )
    def shard_fn(scene_rep: Scene, frame_rep: FrameInputs) -> Array:
        idx = jax.lax.axis_index(AXIS)
        if use_fused_cam:
            from clraytracer_tpu.ops import planar
            from clraytracer_tpu.ops import render_pallas as rp
            from clraytracer_tpu.render import _untile

            result, (trows, tiles_x, tiles_y) = rp.render_fused_camera(
                scene_rep,
                frame_rep,
                config.width,
                config.height,
                config.bounces,
                row0=idx * local_rows,
                local_height=local_rows,
            )
            img = _untile(
                result, ("strip", trows, tiles_x, tiles_y),
                local_rows, config.width,
            )
            return planar.to_last(img, (local_rows, config.width))
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


def replicate_scene(scene: Scene, mesh: Mesh) -> Scene:
    """Explicitly place every scene leaf replicated on the mesh (the
    'push to all chips' analogue of PushMeshesToGPU)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), scene
    )


def _is_float(x) -> bool:
    dtype = getattr(x, "dtype", None)
    return dtype is not None and jnp.issubdtype(dtype, jnp.floating)


def _float_leaf_view(tree):
    """Flatten a pytree and expose only its float leaves for differentiation
    (gradients w.r.t. integer leaves are meaningless, and shard_map tracers
    reject float0 cotangents). Returns (float_leaves, rebuild_fn)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    float_ix = [i for i, l in enumerate(leaves) if _is_float(l)]

    def rebuild(float_leaves):
        out = list(leaves)
        for i, v in zip(float_ix, float_leaves):
            out[i] = v
        return jax.tree_util.tree_unflatten(treedef, out)

    return [leaves[i] for i in float_ix], rebuild


def train_step_sharded(
    scene: Scene,
    frame: FrameInputs,
    target: Array,  # [H, W, 3] (H padded to a multiple of mesh size)
    mesh: Mesh | None = None,
    lr: float = 1e-2,
    width: int | None = None,
    height: int | None = None,
    bounces: int = 2,
    base_tracer: Tracer = trace_best,
) -> tuple[Array, Scene]:
    """One inverse-rendering SGD step, data-parallel over the mesh.

    Per-device: differentiable render of the local row shard, local L2 loss
    against the target shard, grads w.r.t. the replicated scene; then
    ``psum`` of loss and gradients over ICI, SGD update on float leaves.
    Returns (global loss, updated scene) — both replicated.
    """
    mesh = mesh or make_device_mesh()
    n = mesh.devices.size
    height = height or target.shape[0]
    width = width or target.shape[1]
    assert target.shape[0] % n == 0, "pad target rows to a multiple of mesh size"
    local_rows = target.shape[0] // n
    tracer = make_differentiable_tracer(base_tracer)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS, None, None)),
        out_specs=(P(), P()),
        # vma tracking off so the Pallas megakernel (the default hit-finder
        # of the differentiable tracer) can run inside — see render_sharded.
        # Consequence for autodiff: WITHOUT vma tracking shard_map does NOT
        # transpose the implicit replicated→varying broadcast of the params
        # into a psum, so the per-device gradients below are LOCAL partials
        # and the all-reduce is done explicitly (the explicit form also
        # matches how the reference-free design doc describes the step:
        # local grads → ICI psum → replicated update).
        check_vma=False,
    )
    def step(scene_rep: Scene, frame_rep: FrameInputs, target_local: Array):
        idx = jax.lax.axis_index(AXIS)
        row0 = idx * local_rows
        params, rebuild = _float_leaf_view(scene_rep)

        def local_loss(p) -> Array:
            img = _shade_rows(
                rebuild(p), frame_rep, width, height, row0, local_rows,
                bounces, tracer, reference_parity=True, integer_colors=False,
            )
            return jnp.sum((img - target_local) ** 2)

        loss, grads = jax.value_and_grad(local_loss)(params)
        # ---- ICI all-reduce -----------------------------------------------
        # loss and the local gradient partials reduce over the mesh axis
        # (one fused psum over the float-leaf pytree, overlapped by XLA)
        loss = jax.lax.psum(loss, AXIS)
        grads = jax.lax.psum(grads, AXIS)
        denom = 1.0 / (height * width * 3)
        new_params = [
            p - lr * g.astype(p.dtype) * denom for p, g in zip(params, grads)
        ]
        return loss * denom, rebuild(new_params)

    return step(scene, frame, target)
