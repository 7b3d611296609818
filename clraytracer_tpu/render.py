"""The render pipeline: RayGen → Trace (N bounces) → PostProcess.

TPU-native equivalent of the reference's per-frame 3-kernel dispatch
(Renderer.cpp:337-367): instead of three event-chained OpenCL kernels over a
WxH grid, the whole frame is one jitted function over [H, W] ray arrays —
XLA fuses ray generation, shading, and the post chain; the traversal core is
pluggable (golden brute-force, XLA while-loop BVH, or the Pallas kernel).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array

from clraytracer_tpu.camera import (
    Camera,
    ray_directions,
    ray_directions_linear,
    ray_directions_planar,
    ray_directions_tiled,
)
from clraytracer_tpu.config import RenderConfig
from clraytracer_tpu.ops import planar
from clraytracer_tpu.ops.post import post_process
from clraytracer_tpu.ops.shade import (
    BounceState,
    initial_bounce_state,
    shade_hits,
)
from clraytracer_tpu.ops.trace_ref import SceneHit, trace_brute, trace_bvh
from clraytracer_tpu.ops.trace_pallas import trace_pallas
from clraytracer_tpu.ops.trace_wavefront import trace_wavefront
from clraytracer_tpu.scene.types import Scene

#: A tracer maps (scene, origins [3, ...], directions [3, ...]) → SceneHit
#: with [...]-shaped hit fields. Rays are PLANAR (channel-major) — for the
#: Pallas path the ray-tile layout is then a pure reshape, no relayout.
Tracer = Callable[[Scene, Array, Array], SceneHit]

def trace_best(scene: Scene, origin: Array, direction: Array, **kw) -> SceneHit:
    """Auto-select the fastest applicable tracer for this scene: the Pallas
    tile/cluster megakernel when the scene was built with cluster tables,
    else the portable XLA wavefront traversal. This is the default tracer
    everywhere (CLI, sharded paths) — a fresh ``clrt render`` measures the
    production path, with ``--tracer wavefront`` as the explicit fallback."""
    return resolve_tracer(trace_best, scene)(scene, origin, direction, **kw)


def resolve_tracer(tracer: Tracer, scene: Scene) -> Tracer:
    """Resolve the ``trace_best`` sentinel against a concrete scene (its
    cluster-table presence is a static pytree property, so this is a pure
    Python branch under jit)."""
    if tracer is trace_best:
        return trace_pallas if scene.clusters is not None else trace_wavefront
    return tracer


#: test hook — False forces the float path's per-bounce texel gathers
_DEFER_TEXELS = True

#: test hook — False disables secondary-bounce ray-row re-binning
_ROW_BINNING = True

TRACERS: dict[str, Tracer] = {
    "best": trace_best,  # auto: pallas when cluster tables exist, else wavefront
    "brute": trace_brute,
    "bvh": trace_bvh,  # per-ray vmapped twin of the reference (CPU golden)
    "wavefront": trace_wavefront,  # batched lock-step traversal (portable fallback)
    "pallas": trace_pallas,  # TPU tile/cluster megakernel (fast path)
}


def register_tracer(name: str, fn: Tracer) -> None:
    TRACERS[name] = fn


class FrameInputs(NamedTuple):
    """Per-frame dynamic inputs (the reference's TraceArgs + matrices,
    kernel_main.cl:9-14, Renderer.cpp:338-339)."""

    inverse_view: Array  # [4, 4]
    inverse_projection: Array  # [4, 4]
    camera_position: Array  # [3]
    sun_angle: Array  # []


def frame_inputs_from_camera(camera: Camera, sun_angle: float) -> FrameInputs:
    return FrameInputs(
        inverse_view=jnp.asarray(camera.inverse_view),
        inverse_projection=jnp.asarray(camera.inverse_projection),
        camera_position=jnp.asarray(camera.position),
        sun_angle=jnp.asarray(sun_angle, jnp.float32),
    )


def trace_planar(
    scene: Scene,
    origin: Array,  # [3, *spatial]
    direction: Array,  # [3, *spatial]
    sun_angle: Array,
    bounces: int,
    tracer: Tracer,
    reference_parity: bool,
    integer_colors: bool,
    enable_shadows: bool = False,
    enable_refraction: bool = False,
    refraction_ior: float = 1.45,
    enable_gi: bool = False,
    gi_seed: int = 0,
) -> Array:
    """N-bounce trace + shade over planar rays; returns [3, *spatial]
    radiance. Shading reconstructs the object-space ray of the winning
    instance itself from its instance gather (ops/shade.py).

    The whole bounce loop runs in a **ray-linear [R, 128] layout**: the
    Pallas tracer's tile I/O then is a pure reshape (no lane relayout), and
    the [H, W] image layout is materialized exactly once at the end.
    Converting every tracer output per bounce to [H, W] (lane dim 128→W)
    measured ~18 ms/bounce of pure relayout at 1080p."""
    from clraytracer_tpu.ops.trace_pallas import _tile_rows

    spatial = direction.shape[1:]
    n = int(np.prod(spatial)) if spatial else 1
    tile = _tile_rows(n) * 128
    n_pad = -(-n // tile) * tile
    rows = n_pad // 128

    def to_linear(x: Array, pad_value: float) -> Array:
        flat = x.reshape(3, -1)
        if n_pad != n:
            flat = jnp.concatenate(
                [flat, jnp.full((3, n_pad - n), pad_value, flat.dtype)],
                axis=1,
            )
        return flat.reshape(3, rows, 128)

    origin = to_linear(origin, 0.0)
    # non-zero pad so 1/d stays finite in pad lanes
    direction = to_linear(direction, 1.0)

    result = bounce_loop(
        scene, origin, direction, sun_angle, bounces, tracer,
        reference_parity, integer_colors, enable_shadows,
        enable_refraction, refraction_ior, enable_gi, gi_seed,
    )
    return result.reshape(3, -1)[:, :n].reshape((3,) + spatial)


def bounce_loop(
    scene: Scene,
    origin: Array,  # [3, rows, 128] ray-linear
    direction: Array,  # [3, rows, 128]
    sun_angle: Array,
    bounces: int,
    tracer: Tracer,
    reference_parity: bool,
    integer_colors: bool,
    enable_shadows: bool = False,
    enable_refraction: bool = False,
    refraction_ior: float = 1.45,
    enable_gi: bool = False,
    gi_seed: int = 0,
) -> Array:
    """The N-bounce trace+shade core over ray-linear rays (no relayouts).

    When the Pallas tracer is selected and the scene/config qualify
    (reference-parity + integer colors + all-procedural textures + VMEM-
    resident tables), the whole loop runs as ONE fused Pallas kernel —
    trace, shade, and reflect per bounce without leaving VMEM; only the
    deferred skybox add runs in XLA (ops/render_pallas.py). Matches the
    two-phase path below to float precision (1080p frame 20.0 -> 6.9 ms)."""
    tracer = resolve_tracer(tracer, scene)
    if tracer is trace_pallas and not enable_refraction:
        from clraytracer_tpu.ops.render_pallas import (
            fused_path_available,
            fused_path_preferred,
            render_fused,
        )
        # GI runs IN-KERNEL (bit-identical RNG streams to the XLA path);
        # atlas scenes defer the texel-dependent throughput factor to
        # _finish_frame's color-product pass (render_pallas.py)
        # (GI keeps the fused kernel even where two-phase wins plain
        # frames: chained two-phase GI trips the axon re-invocation bug,
        # bench.py)
        if fused_path_available(
            scene, reference_parity, integer_colors
        ) and (fused_path_preferred(scene) or enable_gi):
            return render_fused(scene, origin, direction, sun_angle, bounces,
                                enable_shadows=enable_shadows,
                                gi_seed=gi_seed if enable_gi else None)

    state = initial_bounce_state(origin, direction, sun_angle)

    # float-path texel deferral (the XLA twin of the fused kernel's atlas
    # modes; ops/shade.py `deferred`): every bounce's texel-pool rows ride
    # ONE combined gather after the loop — one sorted-scatter VJP per
    # differentiable frame instead of one per bounce (the per-frame
    # searchsorted/sort fixed costs were ~30 ms/bounce of the 1080p
    # fwd+bwd step). All-procedural scenes never reach the pool at all
    # (shade.py evaluates descriptors in-register in every color mode), so
    # the deferral list stays empty there; imported-texture scenes gather
    # the pool and keep texel gradients.
    # (_DEFER_TEXELS is a test hook: parity tests pin deferred == direct.)
    defer_list: list | None = (
        []
        if (
            _DEFER_TEXELS
            and not integer_colors
            and reference_parity
            and not enable_refraction
        )
        else None
    )

    def one_bounce(state: BounceState, b: int | None) -> BounceState:
        # bounces > 0 pass the alive mask into the Pallas kernel: lanes
        # whose rays terminated fail every slab/accept test there, so a
        # mostly-sky bounce costs only its surviving rays' geometry
        # (``b is None`` = scan body: bounce 0's all-True mask is passed
        # too, keeping one traced kernel for every bounce). Wrappers
        # (diff.make_differentiable_tracer) advertise via supports_live.
        live_ok = tracer is trace_pallas or getattr(
            tracer, "supports_live", False
        )
        if live_ok and b is not None and b > 0 and _ROW_BINNING:
            # secondary bounces: ray-row re-binning (divergent rays →
            # coherent kernel tiles; see _trace_row_binned)
            hit = _trace_row_binned(
                tracer, scene, state.origin, state.direction, state.alive
            )
        elif live_ok and (b is None or b > 0):
            hit = tracer(scene, state.origin, state.direction,
                         live=state.alive)
        else:
            hit = tracer(scene, state.origin, state.direction)
        attrs = None
        if hit.attr_normal is not None:
            attrs = (hit.attr_normal, hit.attr_uu, hit.attr_vv, hit.attr_mat)
        shadow_tracer = tracer if (enable_shadows and b == 0) else None
        if shadow_tracer is trace_pallas:
            # shadow rays cull their non-hit lanes in-kernel too
            shadow_tracer = trace_pallas_live_kw
        gi_state = None
        if enable_gi:
            # one decorrelated xorshift stream per ray per bounce (the
            # reference's WangHash(i * 9999 + t) idiom, MathAndSTL.cl:189)
            from clraytracer_tpu.ops import rng as _rng

            ridx = jnp.arange(
                origin.shape[1] * 128, dtype=jnp.uint32
            ).reshape(origin.shape[1], 128)
            gi_state = _rng.wang_hash(
                ridx * jnp.uint32(9999)
                + jnp.uint32(1 + gi_seed * 7919 + (b or 0) * 1237)
            )
        return shade_hits(
            scene,
            state,
            t=hit.t,
            u=hit.u,
            v=hit.v,
            tri_idx=hit.tri,
            instance_idx=hit.instance,
            hit=hit.hit,
            reference_parity=reference_parity,
            integer_colors=integer_colors,
            attrs=attrs,
            shadow_tracer=shadow_tracer,
            enable_refraction=enable_refraction,
            refraction_ior=refraction_ior,
            gi_state=gi_state,
            deferred=defer_list,
        )

    import os

    if os.environ.get("CLRT_REMAT_BOUNCES", "0") == "1":
        # experiment hook: rematerialize each bounce in the backward pass
        # instead of storing its intermediates (trades ~2x forward compute
        # for residual HBM traffic)
        one_bounce = jax.checkpoint(one_bounce, static_argnums=(1,))

    scan_ok = os.environ.get("CLRT_SCAN_BOUNCES", "0") == "1"
    if scan_ok and bounces > 1 and not enable_shadows and not enable_gi:
        defer_list = None  # the scan carry cannot hold per-bounce terms
        # compile-size escape hatch (OPT-IN): one traced bounce body emits
        # the traversal kernel ONCE into the program instead of once per
        # bounce — halves program size (very large streamed-scene programs
        # can exceed a remote-compile service's request limit) and compile
        # time, at a measured runtime cost (museum 60.4 -> 28.9 Mrays/s:
        # the scan carry round-trips ~150 MB of bounce state through HBM
        # per iteration and defeats cross-bounce fusion)
        state = jax.lax.scan(
            lambda s, _: (one_bounce(s, None), None), state, None,
            length=bounces,
        )[0]
    else:
        for b in range(bounces):
            state = one_bounce(state, b)
    if defer_list:
        # combined-gather assembly (mirrors render_pallas._finish_frame's
        # color-product pass, in the differentiable float domain):
        # radiance += texel_b * (F1_b * P_b + F2_b); P is the GI color
        # product (1 on the mirror path, where energy already carried the
        # texel-free specular factor)
        from clraytracer_tpu.ops import gather as _gather

        idx_all = jnp.stack([d[0] for d in defer_list])  # [B, rows, 128]
        tex_all = _gather.take_rgb(scene.atlas.texels, idx_all)
        res = state.result
        P = None
        for b, (_idx, F1, F2, albP, livem) in enumerate(defer_list):
            tx = tex_all[:, b]
            e = F1 if P is None else F1 * P
            res = res + tx * e + tx * F2
            if albP is not None:
                base = jnp.ones_like(tx) if P is None else P
                P = planar.where(livem, base * (tx * albP), base)
        return res
    return state.result



def _trace_row_binned(tracer, scene, origin, direction, live):
    """Trace secondary bounces with ray ROWS re-binned by direction octant
    + coarse origin cell. Secondary rays diverge (reflections off an
    interior point everywhere), so a screen-ordered tile's culling corridor
    covers most of the scene; neighboring rays in one 128-lane ROW stay
    correlated, though — so sorting whole rows groups compatible rays into
    the same kernel tile at a few row-gathers' cost (contiguous 512 B rows;
    measured museum two-phase 57.6 -> 37.9 ms at 1080p, bounce-2 trace cut
    ~2x). Per-ray results are order-independent (tie-breaks on exactly
    equal t aside), and the permutation is inverted on every hit field, so
    callers see original ray order.
    """
    from clraytracer_tpu.ops.trace_ref import SceneHit

    from clraytracer_tpu.ops.render_pallas import rebin_key

    dm = jnp.sign(direction).mean(axis=2)  # [3, rows]
    om = origin.mean(axis=2)
    perm = jnp.argsort(rebin_key(dm, om))
    inv = jnp.argsort(perm)
    hit = tracer(
        scene, origin[:, perm], direction[:, perm], live=live[perm]
    )

    def unsort(x):
        if x is None:
            return None
        return x[inv] if x.ndim == 2 else x[:, inv]

    return SceneHit(
        t=unsort(hit.t), u=unsort(hit.u), v=unsort(hit.v),
        tri=unsort(hit.tri), instance=unsort(hit.instance),
        hit=unsort(hit.hit), attr_normal=unsort(hit.attr_normal),
        attr_uu=unsort(hit.attr_uu), attr_vv=unsort(hit.attr_vv),
        attr_mat=unsort(hit.attr_mat),
    )

def trace_pallas_live_kw(scene, origin, direction, live=None):
    """trace_pallas with the shadow-path keyword contract (ops/shade.py
    passes ``live`` when the shadow tracer accepts it)."""
    return trace_pallas(scene, origin, direction, live=live)


def trace_image(
    scene: Scene,
    frame: FrameInputs,
    width: int,
    height: int,
    bounces: int = 2,
    tracer: Tracer = trace_wavefront,
    reference_parity: bool = True,
    integer_colors: bool = True,
    enable_shadows: bool = False,
    enable_refraction: bool = False,
    refraction_ior: float = 1.45,
    enable_gi: bool = False,
    gi_seed: int = 0,
) -> Array:
    """Linear [H, W, 3] radiance before post-processing — the Trace kernel's
    output image (kernel_main.cl:164-275).

    Rays are generated directly in **screen-tile order** in the bounce
    loop's [3, rows, 128] layout (camera.ray_directions_tiled): each Pallas
    tracer tile covers a compact ``tile_rows x 128`` pixel rectangle, so
    per-tile culling actually prunes (a scanline-band tile spans the whole
    image width and intersects most of the scene — one such bounce measured
    15.0 ms at 1080p, more than the 6.9 ms the WHOLE fused frame takes in
    screen-tile order). The whole trace+shade loop runs relayout-free;
    the [H, W] image is materialized exactly once at the end by a pure
    reshape/transpose."""
    result, layout = _trace_tiled(
        scene, frame, width, height, bounces, tracer,
        reference_parity, integer_colors, enable_shadows,
        enable_refraction, refraction_ior, enable_gi, gi_seed,
    )
    img = _untile(result, layout, height, width)
    return planar.to_last(img, (height, width))


def _trace_tiled(
    scene: Scene,
    frame: FrameInputs,
    width: int,
    height: int,
    bounces: int,
    tracer: Tracer,
    reference_parity: bool,
    integer_colors: bool,
    enable_shadows: bool = False,
    enable_refraction: bool = False,
    refraction_ior: float = 1.45,
    enable_gi: bool = False,
    gi_seed: int = 0,
) -> tuple[Array, tuple]:
    """Trace the frame in screen-tile order; returns the raw
    ``[3, rows, 128]`` radiance plus a tagged tile layout —
    ``("strip", trows, tiles_x, tiles_y)``: each trows-row group covers a
    trows x 128 pixel strip — needed to untile it (:func:`_untile`) and to
    index pixels inside it (post.vignette masks)."""
    from clraytracer_tpu.ops.trace_pallas import _tile_rows

    tracer = resolve_tracer(tracer, scene)
    if tracer is trace_pallas and not enable_refraction:
        from clraytracer_tpu.ops import render_pallas as rp

        if rp.fused_path_available(
            scene, reference_parity, integer_colors
        ) and (rp.fused_path_preferred(scene) or enable_gi):
            # in-kernel raygen: no per-ray inputs at all (render_pallas)
            result, (trows, tiles_x, tiles_y) = rp.render_fused_camera(
                scene, frame, width, height, bounces,
                enable_shadows=enable_shadows,
                gi_seed=gi_seed if enable_gi else None,
            )
            return result, ("strip", trows, tiles_x, tiles_y)
    trows = _tile_rows(width * height)
    tiles_x = -(-width // 128)
    tiles_y = -(-height // trows)
    dirs = ray_directions_tiled(
        frame.inverse_view, frame.inverse_projection, width, height, trows
    )  # [3, tiles_y * tiles_x * trows, 128]
    origin = jnp.broadcast_to(
        frame.camera_position[:, None, None], dirs.shape
    )
    result = bounce_loop(
        scene, origin, dirs, frame.sun_angle, bounces, tracer,
        reference_parity, integer_colors, enable_shadows,
        enable_refraction, refraction_ior, enable_gi, gi_seed,
    )
    return result, ("strip", trows, tiles_x, tiles_y)


def _untile(result: Array, layout: tuple, height: int, width: int) -> Array:
    """[3, rows, 128] screen-tile order → [3, H, W] planar image."""
    _kind, rows, nx, ny = layout
    return (
        result.reshape(3, ny, nx, rows, 128)
        .transpose(0, 1, 3, 2, 4)
        .reshape(3, ny * rows, nx * 128)[:, :height, :width]
    )


def _sample_offsets(n: int) -> list[tuple[float, float]]:
    """Sub-pixel sample offsets in [-0.5, 0.5): rotated-grid for 4 spp,
    centered Halton(2,3) otherwise."""
    if n == 4:
        return [(-0.125, -0.375), (0.375, -0.125),
                (-0.375, 0.125), (0.125, 0.375)]

    def halton(i: int, b: int) -> float:
        f, r = 1.0, 0.0
        while i > 0:
            f /= b
            r += f * (i % b)
            i //= b
        return r

    return [(halton(i + 1, 2) - 0.5, halton(i + 1, 3) - 0.5)
            for i in range(n)]


def jitter_projection(inverse_projection: Array, dx: float, dy: float) -> Array:
    """Shift the unprojection by an NDC offset (dx, dy).

    Every raygen path evaluates ``(cx, cy, 1, 1) @ invProj`` (row-vector,
    kernel_main.cl:282); adding ``dx*invProj[0] + dy*invProj[1]`` to the
    translation row is identical to shifting cx/cy — so one matrix edit
    jitters the pure-XLA raygen AND the fused kernel's in-kernel raygen."""
    return inverse_projection.at[3].add(
        dx * inverse_projection[0] + dy * inverse_projection[1]
    )


def render_frame(
    scene: Scene,
    frame: FrameInputs,
    config: RenderConfig,
    tracer: Tracer = trace_best,
) -> Array:
    """Full frame: trace + post chain. Returns [H, W, 3] display-ready."""
    if config.samples > 1:
        # supersampling (beyond the reference, whose only AA is the FXAA it
        # ships disabled): N sub-pixel-jittered frames averaged before post
        acc = None
        for si, (jx, jy) in enumerate(_sample_offsets(config.samples)):
            fj = frame._replace(
                inverse_projection=jitter_projection(
                    frame.inverse_projection,
                    jx * 2.0 / config.width,
                    jy * 2.0 / config.height,
                )
            )
            img = trace_image(
                scene, fj, config.width, config.height,
                bounces=config.bounces, tracer=tracer,
                reference_parity=config.reference_parity_shading,
                integer_colors=config.integer_colors,
                enable_shadows=config.enable_shadows,
                enable_refraction=config.enable_refraction,
                refraction_ior=config.refraction_ior,
                enable_gi=config.enable_gi,
                gi_seed=config.gi_seed + si,  # decorrelate per sample
            )
            acc = img if acc is None else acc + img
        img = acc * (1.0 / config.samples)
        if config.enable_post:
            img = post_process(img, enable_fxaa=config.enable_fxaa)
        return img

    if config.enable_post and not config.enable_fxaa:
        # post directly on the trace loop's tile layout — the elementwise
        # chain fuses with the deferred-skybox add, and the frame pays for
        # exactly ONE relayout (the final [H, W, 3] interleave) instead of
        # three (untile → interleave → [3, N] → interleave again)
        from clraytracer_tpu.ops.post import post_process_tiled

        result, layout = _trace_tiled(
            scene, frame, config.width, config.height, config.bounces,
            tracer, config.reference_parity_shading, config.integer_colors,
            config.enable_shadows, config.enable_refraction,
            config.refraction_ior, config.enable_gi, config.gi_seed,
        )
        result = post_process_tiled(
            result, config.width, config.height, layout
        )
        img = _untile(result, layout, config.height, config.width)
        return planar.to_last(img, (config.height, config.width))

    img = trace_image(
        scene,
        frame,
        config.width,
        config.height,
        bounces=config.bounces,
        tracer=tracer,
        reference_parity=config.reference_parity_shading,
        integer_colors=config.integer_colors,
        enable_shadows=config.enable_shadows,
        enable_refraction=config.enable_refraction,
        refraction_ior=config.refraction_ior,
        enable_gi=config.enable_gi,
        gi_seed=config.gi_seed,
    )
    if config.enable_post:
        img = post_process(img, enable_fxaa=config.enable_fxaa)
    return img


@functools.partial(jax.jit, static_argnames=("config", "tracer_name"))
def render_frame_jit(
    scene: Scene, frame: FrameInputs, config: RenderConfig, tracer_name: str = "best"
) -> Array:
    return render_frame(scene, frame, config, tracer=TRACERS[tracer_name])


def render(
    scene: Scene,
    camera: Camera,
    config: RenderConfig,
    tracer_name: str = "best",
) -> np.ndarray:
    """Convenience entry: returns an [H, W, 3] float numpy image."""
    frame = frame_inputs_from_camera(camera, config.sun_angle)
    img = render_frame_jit(scene, frame, config, tracer_name)
    return np.asarray(img)


def to_srgb_u8(img: np.ndarray) -> np.ndarray:
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, img: np.ndarray) -> None:
    """Write the frame as PNG, row-flipped for display.

    The frame buffer is bottom-up, exactly like the reference's: its RayGen
    maps row j=0 to NDC y=-1 (kernel_main.cl:280-281) and OpenGL's blit
    presents texture row 0 at the window bottom. PNG row 0 is the top, so
    export performs the flip the GL present did — picking coordinates
    (top-left mouse origin, camera.screen_point_to_ray's y flip,
    Camera.hpp:112) then agree with PNG pixel positions."""
    from PIL import Image

    Image.fromarray(to_srgb_u8(img)[::-1]).save(path)
