"""Differentiable rendering.

New capability relative to the reference (which has none, SURVEY.md §7 step
7): pixel gradients w.r.t. vertices, instance transforms, material colors,
and texture texels.

Strategy — **stop-gradient traversal + differentiable recompute**:

1. Run any (non-differentiable) tracer to find the discrete hit structure:
   which triangle / instance each ray hits. ``lax.while_loop`` traversal is
   not reverse-differentiable, and the discrete choice carries no useful
   gradient anyway (it is piecewise constant).
2. Recompute (t, u, v) in closed form from the *hit triangle's* vertices and
   the object-space ray via Möller-Trumbore — a pure, differentiable
   function — then let autodiff flow through shading, texture gathers
   (gather VJP = scatter-add onto the texel pool), normals, and the
   reflection bounce.

This yields exact interior-pixel gradients (finite-difference-checkable,
BASELINE config 3). Silhouette/visibility discontinuities are intentionally
not differentiated — the standard a.e.-gradient convention.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import Array

from clraytracer_tpu.camera import ray_directions_planar
from clraytracer_tpu.ops import planar
from clraytracer_tpu.ops.post import post_process
from clraytracer_tpu.ops.shade import object_space_rays
from clraytracer_tpu.ops.trace_ref import SceneHit
from clraytracer_tpu.ops.trace_wavefront import trace_wavefront
from clraytracer_tpu.render import FrameInputs, Tracer
from clraytracer_tpu.scene.types import MISS_DISTANCE, Scene


def make_differentiable_tracer(base_tracer: Tracer = trace_wavefront) -> Tracer:
    """Wrap a tracer so its hit records are differentiable w.r.t. scene
    geometry and instance transforms."""

    def traced(
        scene: Scene, origin: Array, direction: Array, live: Array | None = None
    ) -> SceneHit:
        """``origin``/``direction``: planar [3, ...]. ``live`` is forwarded
        to tracers with in-kernel dead-lane culling (trace_pallas) so
        bounce >= 2 pays only its surviving rays' traversal."""
        # discrete structure: no gradients through the traversal itself
        import inspect

        from clraytracer_tpu.render import resolve_tracer

        tracer_fn = resolve_tracer(base_tracer, scene)
        params = inspect.signature(tracer_fn).parameters
        kw = {}
        if live is not None and "live" in params:
            kw["live"] = jax.lax.stop_gradient(live)
        if "variant" in params:
            # skip the kernel's deferred attribute resolve: its attrs are
            # non-differentiable and overwritten by the combined-table
            # recompute below (the resolve measured 16.9 ms of a 53 ms
            # r16 trace on the 1M-tri scene)
            kw["variant"] = "noattr"
        # consume the kernel's raw cluster-slot ids and index a slot-ordered
        # copy of the combined table instead: the slot -> original-tri remap
        # is a per-ray serialized s32 gather (14.8 ms/bounce at 1080p,
        # profiled); the table reorder below is a T-row gather once per step
        use_slots = "return_slots" in params and scene.clusters is not None
        if use_slots:
            kw["return_slots"] = True
        hit = jax.lax.stop_gradient(
            tracer_fn(
                jax.lax.stop_gradient(scene),
                jax.lax.stop_gradient(origin),
                jax.lax.stop_gradient(direction),
                **kw,
            )
        )
        # miss/dead lanes carry garbage triangle ids from the kernel; the
        # row gather below is coherence-bound (ops/gather.py), so pin them
        # to one hot row — their recomputed values are discarded via
        # ``keep`` and their cotangents are zero, so row 0's gradient is
        # untouched
        tri = jnp.where(hit.hit, hit.tri, 0)
        # differentiable recompute of the object-space ray for the winning
        # instance (gradients flow into instance inverse transforms); planar
        o, d = object_space_rays(scene, hit.instance, origin, direction)
        # differentiable planar Möller-Trumbore against the hit triangle.
        # Everything per-triangle — the three vertices AND the 16 shading
        # attributes — rides ONE wide row gather of an in-jit packed
        # [T, 25] table (ops/gather.py: a row gather costs the same as one
        # scalar gather; the nine scalar vertex takes alone, with their
        # nine scatter-add VJPs, measured ~95 ms of the 213 ms fwd+bwd
        # step at 540p). The concatenate's VJP is a split — gradients flow
        # to v0/v1/v2/normals/uvs intact. The interpolated attributes are
        # returned through SceneHit.attr_* (the same contract the Pallas
        # kernel uses), so shade_hits performs no triangle gather at all.
        # wide_rows_diff: at frame-scale ray counts the [T, 25] table
        # cotangent uses the sorted-permutation segment backward instead
        # of XLA's per-update-serialized 25-wide scatter (ops/gather.py)
        from clraytracer_tpu.ops.gather import wide_rows_diff as take_rows

        trs = scene.tris
        f32 = lambda a: a.astype(jnp.float32)
        vt = jnp.concatenate(
            [
                trs.v0, trs.v1, trs.v2,
                f32(trs.n0), f32(trs.n1), f32(trs.n2),
                f32(trs.uv0), f32(trs.uv1), f32(trs.uv2),
                f32(trs.mat_idx)[:, None],
            ],
            axis=1,
        )  # [T, 25]
        if use_slots:
            # slot-ordered view (differentiable: the VJP scatters the
            # [S, 25] cotangent back onto the T canonical rows — S rows,
            # not 2M rays). Slot ids are also MORE coherent than tri ids
            # (cluster-ordered), which tightens the MXU gather's chunk span.
            gid = jax.lax.stop_gradient(
                jnp.clip(scene.clusters.tri_gid, 0, vt.shape[0] - 1)
            )
            vt = jnp.take(vt, gid, axis=0)  # [S, 25]
        rows = take_rows(vt, tri)  # [25, ...] planar
        v0, v1, v2 = rows[0:3], rows[3:6], rows[6:9]
        e1 = v1 - v0
        e2 = v2 - v0
        h = planar.cross(d, e2)
        f = 1.0 / planar.dot(e1, h)
        s = o - v0
        u = f * planar.dot(s, h)
        q = planar.cross(s, e1)
        v = f * planar.dot(d, q)
        t = f * planar.dot(e2, q)

        # barycentric attribute interpolation — the same expression tree as
        # ops/shade.py's gather path (w0*a0 + u*a1 + v*a2 per component)
        w0 = 1.0 - u - v
        n_obj = jnp.stack(
            [rows[9 + c] * w0 + rows[12 + c] * u + rows[15 + c] * v
             for c in range(3)]
        )
        uu = rows[18] * w0 + rows[20] * u + rows[22] * v
        vv = rows[19] * w0 + rows[21] * u + rows[23] * v

        keep = hit.hit
        return SceneHit(
            t=jnp.where(keep, t, MISS_DISTANCE),
            u=jnp.where(keep, u, 0.0),
            v=jnp.where(keep, v, 0.0),
            tri=hit.tri,
            instance=hit.instance,
            hit=hit.hit,
            attr_normal=n_obj,
            attr_uu=uu,
            attr_vv=vv,
            attr_mat=rows[24],
        )

    import inspect

    # advertise dead-lane culling to render.bounce_loop when the base
    # tracer supports it (trace_best resolves per scene inside ``traced``;
    # advertising True is safe — ``traced`` drops the kwarg for tracers
    # that don't accept it)
    from clraytracer_tpu.render import trace_best

    traced.supports_live = base_tracer is trace_best or (
        "live" in inspect.signature(base_tracer).parameters
    )
    return traced


def render_image_diff(
    scene: Scene,
    frame: FrameInputs,
    width: int,
    height: int,
    bounces: int = 2,
    base_tracer: Tracer | None = None,
    reference_parity: bool = True,
    enable_post: bool = False,
) -> Array:
    """Differentiable [H, W, 3] render (float color path).

    ``base_tracer`` finds the discrete hit structure (its traversal is
    stop-gradiented); default is the Pallas tile tracer — the wavefront
    tracer measured 0.22 Mrays/s fwd+bwd at 540p on TPU (per-round
    gathers), ~50x slower than the same step on Pallas hits."""
    from clraytracer_tpu.ops.trace_pallas import trace_pallas
    from clraytracer_tpu.render import trace_planar

    if base_tracer is None:
        base_tracer = (
            trace_pallas if scene.clusters is not None else trace_wavefront
        )
    tracer = make_differentiable_tracer(base_tracer)
    dirs = ray_directions_planar(
        frame.inverse_view, frame.inverse_projection, width, height
    )  # [3, H, W]
    origin = jnp.broadcast_to(frame.camera_position[:, None, None], dirs.shape)
    result = trace_planar(
        scene, origin, dirs, frame.sun_angle, bounces, tracer,
        reference_parity, integer_colors=False,
    )
    img = planar.to_last(result, (height, width))
    if enable_post:
        img = post_process(img)
    return img


def image_loss_and_grads(
    scene: Scene,
    frame: FrameInputs,
    width: int,
    height: int,
    loss_fn: Callable[[Array], Array] | None = None,
    target: Array | None = None,
    **render_kwargs,
) -> tuple[Array, Scene]:
    """Gradient of a scalar image loss w.r.t. every scene leaf.

    Default loss: L2 against ``target`` (or mean radiance if no target).
    Returns (loss, grads-as-a-Scene-pytree); use e.g.
    ``grads.materials.albedo`` / ``grads.atlas.texels`` / ``grads.tris.v0``.
    """

    def compute(s: Scene) -> Array:
        img = render_image_diff(s, frame, width, height, **render_kwargs)
        if loss_fn is not None:
            return loss_fn(img)
        if target is not None:
            return jnp.mean((img - target) ** 2)
        return jnp.mean(img)

    # allow_int: integer leaves (indices, packed colors) get float0 tangents
    loss, grads = jax.value_and_grad(compute, allow_int=True)(scene)
    return loss, grads
