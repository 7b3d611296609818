"""Texture sampling, skybox, and the Whitted/Phong shading step.

Vectorized twins of the reference device functions:

* ``sample_texture`` — UV wrap + point sample into the flat texel pool
  (MathAndSTL.cl:260-266).
* ``sample_skybox`` — equirect mapping ``theta = atan2(x,-z)/pi * 0.5 * w``,
  ``phi = acos(y)/pi * h``, flat index ``phi*w + theta + offset``
  (MathAndSTL.cl:253-258).
* ``shade_hits`` — one bounce of the Trace megakernel's shading block
  (kernel_main.cl:226-271): barycentric normal/uv interpolation from half
  attributes, normals transformed by the instance's inverse 3x3, integer
  color modulate, sun-angle Phong with "atmospheric" ambient, and the
  specular energy carried into the next (reflection) bounce.

TPU data-path design (see ops/gather.py for measurements): per-ray table
lookups are the frame cost on TPU, so shading fetches *everything* with

* ONE wide row gather of the packed per-triangle attribute table,
* ONE one-hot MXU gather of the instance row (inverse transform +
  material_start) — also used to reconstruct the object-space ray, which
  the reference re-derives per instance in-kernel (kernel_main.cl:205-207),
* ONE one-hot MXU gather of the material row with **denormalized texture
  records** (width/height/offset baked in per material),
* one texel-pool row gather per texture sample.

All per-ray vectors/colors are planar ``[3, *spatial]`` (ops/planar.py).
The same code path is differentiable: with ``scene.packed is None`` (or
``integer_colors=False``) the tables are built in-jit from the canonical
float leaves, and every gather used has a scatter-add VJP.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from clraytracer_tpu.ops import gather, planar
from clraytracer_tpu.scene.types import Scene, TextureAtlas

# python float, NOT jnp: module-level device arrays become jit-captured
# constants that axon re-uploads per call (~300 ms each)
_U8 = 1.0 / 255.0

#: offsets into the texel pool can exceed 2^24 (f32 integer exactness), so
#: packed tables carry them split as (off >> _OFF_SHIFT, off & _OFF_MASK)
_OFF_SHIFT = 12
_OFF_MASK = (1 << _OFF_SHIFT) - 1


class ShadingTables(NamedTuple):
    """Gather-ready tables; prebuilt (Scene.packed) or built in-jit."""

    tri_attr: Array  # [T, 16] f32: n0 n1 n2 (9) | uv0 uv1 uv2 (6) | mat (1)
    inst_rows: Array  # [I, 17] f32: inverse transform (16) | material_start
    mat_rows: Array  # [M, 16] f32: albedo(3) specular(3) shin rough |
    #                  aw ah aoff_hi aoff_lo | sw sh soff_hi soff_lo


def build_shading_tables(scene: Scene) -> ShadingTables:
    """Build the packed tables in-jit from the canonical scene leaves.

    Differentiable w.r.t. normals/uvs (via tris), instance transforms, and
    material colors; table-scale concats are trivially cheap next to the
    per-ray gathers they feed.
    """
    tris = scene.tris
    f32 = lambda a: a.astype(jnp.float32)
    tri_attr = jnp.concatenate(
        [
            f32(tris.n0), f32(tris.n1), f32(tris.n2),
            f32(tris.uv0), f32(tris.uv1), f32(tris.uv2),
            f32(tris.mat_idx)[:, None],
        ],
        axis=1,
    )

    inst = scene.instances
    inst_rows = jnp.concatenate(
        [
            inst.inverse_transform.reshape(-1, 16),
            f32(inst.material_start)[:, None],
        ],
        axis=1,
    )

    mats = scene.materials
    atlas = scene.atlas

    def texrec(tex_idx: Array) -> Array:
        w = jnp.take(atlas.width, tex_idx, mode="clip")
        h = jnp.take(atlas.height, tex_idx, mode="clip")
        off = jnp.take(atlas.offset, tex_idx, mode="clip")
        return jnp.stack(
            [w, h, off >> _OFF_SHIFT, off & _OFF_MASK], axis=1
        ).astype(jnp.float32)

    mat_rows = jnp.concatenate(
        [
            mats.albedo,
            mats.specular,
            mats.shininess[:, None],
            mats.roughness[:, None],
            texrec(mats.albedo_tex),
            texrec(mats.specular_tex),
        ],
        axis=1,
    )
    return ShadingTables(tri_attr=tri_attr, inst_rows=inst_rows, mat_rows=mat_rows)


def refresh_packed(scene: Scene) -> Scene:
    """Recompute the packed gather tables from the (possibly edited)
    canonical leaves — the analogue of the reference's re-push after live
    material edits (ResourceManager.cpp:102-128). Pure & jittable; skybox
    statics are build-time constants and carry over."""
    import dataclasses

    if scene.packed is None:
        return scene
    tabs = build_shading_tables(scene)
    packed = dataclasses.replace(
        scene.packed,
        tri_attr=tabs.tri_attr,
        inst_rows=tabs.inst_rows,
        mat_rows=tabs.mat_rows,
    )
    return dataclasses.replace(scene, packed=packed)


def _shading_tables(scene: Scene, prefer_packed: bool) -> ShadingTables:
    pk = scene.packed
    if prefer_packed and pk is not None:
        return ShadingTables(
            tri_attr=pk.tri_attr, inst_rows=pk.inst_rows, mat_rows=pk.mat_rows
        )
    return build_shading_tables(scene)


# ---------------------------------------------------------------------------
# texture sampling
# ---------------------------------------------------------------------------


def _wrap_scale(u: Array, w) -> Array:
    """UV wrap + truncating scale (reference MathAndSTL.cl:262-264)."""
    uw = u - jnp.floor(u)
    return (uw * w).astype(jnp.int32)


def _as_i32(x) -> Array | int:
    return int(x) if isinstance(x, (int, float)) else x.astype(jnp.int32)


def _as_f32(x) -> Array | float:
    return float(x) if isinstance(x, (int, float)) else x.astype(jnp.float32)


def _pool_index(w, h, off, u: Array, v: Array) -> Array:
    """Flat texel index of a UV point sample. ``w/h/off`` may be per-ray
    arrays (gathered records) or static ints (skybox/constant textures)."""
    us = _wrap_scale(u, _as_f32(w))
    vs = _wrap_scale(v, _as_f32(h))
    return vs * _as_i32(w) + us + _as_i32(off)


def _skybox_index(w, h, off, d: Array) -> Array:
    """Flat texel index of an equirect skybox sample for planar directions
    (MathAndSTL.cl:253-258)."""
    theta = (
        jnp.arctan2(d[0], -d[2]) / jnp.pi * (0.5 * _as_f32(w))
    ).astype(jnp.int32)
    phi = (
        jnp.arccos(jnp.clip(d[1], -1.0, 1.0)) / jnp.pi * _as_f32(h)
    ).astype(jnp.int32)
    return phi * _as_i32(w) + theta + _as_i32(off)


def _all_procedural(scene: Scene) -> bool:
    """Static: does every texture in the scene have a procedural descriptor?
    (Then the fast path can skip the texel-pool gather entirely.)"""
    handles = {h for h, _, _ in scene.procedural_tex}
    return handles >= set(range(scene.atlas.num_textures))


def _eval_tex_inline(scene: Scene, off: Array, uu: Array, vv: Array) -> Array:
    """In-register texture fetch for all-procedural scenes → [3, *S] in
    [0, 1]. Selects each ray's texture by comparing its (gathered) texel
    offset against the static per-descriptor offsets; the per-descriptor
    wrap+truncate reproduces the pool-index math bit-exactly, so values
    equal a pool gather of the baked images."""
    from clraytracer_tpu.scene.procedural_tex import eval_texel

    out = None
    for _handle, t_off, desc in scene.procedural_tex:
        ui = _wrap_scale(uu, float(desc.width)).astype(jnp.float32)
        vi = _wrap_scale(vv, float(desc.height)).astype(jnp.float32)
        rgb = eval_texel(desc, ui, vi) * _U8
        out = rgb if out is None else planar.where(off == t_off, rgb, out)
    return out


def _eval_skybox_inline(
    scene: Scene, sky_flat: Array, skw: int, skoff: int
) -> Array:
    """In-register equirect skybox fetch → [3, *S] in [0, 1]. Reconstructs
    the 2D texel coords from the same flat index the pool gather uses
    (``phi * w + theta``, theta possibly negative — the flat form's implicit
    row wrap is reproduced by the floor-divmod)."""
    from clraytracer_tpu.scene.procedural_tex import eval_texel

    desc = next(
        d for h, _o, d in scene.procedural_tex if h == scene.skybox_tex
    )
    rel = sky_flat - skoff
    i = (rel % skw).astype(jnp.float32)
    j = jnp.clip(rel // skw, 0, desc.height - 1).astype(jnp.float32)
    return eval_texel(desc, i, j) * _U8


def sample_pool_planar(
    atlas: TextureAtlas, w: Array | int, h: Array | int, off: Array | int,
    u: Array, v: Array,
) -> Array:
    """Point-sample RGB from the texel pool → planar [3, *spatial].

    ``w/h/off`` may be per-ray arrays (gathered records) or static ints
    (skybox). One row gather of the [P, 3] pool.
    """
    return gather.take_rgb(atlas.texels, _pool_index(w, h, off, u, v))


def sample_skybox_static(
    atlas: TextureAtlas, w: int, h: int, off: int, d: Array
) -> Array:
    """Equirect skybox sample with a static texture record → [3, *spatial]
    (MathAndSTL.cl:253-258)."""
    return gather.take_rgb(atlas.texels, _skybox_index(w, h, off, d))


def sample_skybox_planar(atlas: TextureAtlas, tex_idx: Array, d: Array) -> Array:
    """Equirect skybox sample with per-ray texture index → [3, *spatial]."""
    w = jnp.take(atlas.width, tex_idx, mode="clip")
    h = jnp.take(atlas.height, tex_idx, mode="clip")
    off = jnp.take(atlas.offset, tex_idx, mode="clip")
    return gather.take_rgb(atlas.texels, _skybox_index(w, h, off, d))


# interleaved-API wrappers (tests, tooling)
def sample_texture(atlas: TextureAtlas, tex_idx: Array, uv: Array) -> Array:
    shape = uv.shape[:-1]
    w = jnp.take(atlas.width, tex_idx, mode="clip")
    h = jnp.take(atlas.height, tex_idx, mode="clip")
    off = jnp.take(atlas.offset, tex_idx, mode="clip")
    out = sample_pool_planar(atlas, w, h, off, uv[..., 0], uv[..., 1])
    return planar.to_last(out, shape)


def sample_texture_planar(
    atlas: TextureAtlas, tex_idx: Array, u: Array, v: Array
) -> Array:
    """Back-compat planar sampler with a per-ray texture index gather."""
    w = jnp.take(atlas.width, tex_idx, mode="clip")
    h = jnp.take(atlas.height, tex_idx, mode="clip")
    off = jnp.take(atlas.offset, tex_idx, mode="clip")
    return sample_pool_planar(atlas, w, h, off, u, v)


def sample_skybox(atlas: TextureAtlas, tex_idx: Array, direction: Array) -> Array:
    shape = direction.shape[:-1]
    idx = jnp.broadcast_to(tex_idx, shape)
    out = sample_skybox_planar(atlas, idx, planar.from_last(direction))
    return planar.to_last(out, shape)


# ---------------------------------------------------------------------------
# shading math
# ---------------------------------------------------------------------------


def _modulate_bytes(texel: Array, mat_rgb: Array) -> Array:
    """Reference integer color modulate ((mat_u8 * texel_u8) >> 8) / 255
    (MathAndSTL.cl:243-249) computed bit-exactly in float arithmetic —
    u8*u8 <= 65025 < 2^24 is exact in f32, and uint32 shifts/multiplies are
    slower than float FMAs on the TPU VPU.

    ``texel`` [3, *S] float from the u8 pool; ``mat_rgb`` [3, *S] canonical
    float color (packing truncates: byte = floor(clip(c)*255))."""
    mat_b = jnp.round(jnp.clip(mat_rgb, 0.0, 1.0) * 255.0)
    tex_b = jnp.round(texel * 255.0)
    return jnp.floor(mat_b * tex_b * (1.0 / 256.0)) * _U8


def _pow_fast(x: Array, e: Array) -> Array:
    """x**e for arrays of exponents via exp2/log2 — XLA's generic array-
    exponent pow lowering measured ~300x slower than the transcendental pair.
    Matches jnp.power for x > 0; returns 0 for x <= 0 (shading usage)."""
    safe = jnp.maximum(x, 1e-30)
    out = jnp.exp2(e * jnp.log2(safe))
    return jnp.where(x > 0.0, out, 0.0)


def object_space_rays(
    scene: Scene, instance_idx: Array, origin: Array, direction: Array
) -> tuple[Array, Array]:
    """Planar object-space rays of each ray's (gathered) instance: the
    per-ray analogue of the Trace kernel's MatMul with the cached inverse
    transform (kernel_main.cl:205-207)."""
    inst_rows = _shading_tables(scene, prefer_packed=False).inst_rows
    m = gather.small_rows_diff(inst_rows, instance_idx)
    return _transform_rays(m, origin, direction)


def _transform_rays(
    m: Array, origin: Array, direction: Array
) -> tuple[Array, Array]:
    """Row-vector transform by per-ray matrix entries ``m`` [17, *S]."""
    o = jnp.stack(
        [
            origin[0] * m[0] + origin[1] * m[4] + origin[2] * m[8] + m[12],
            origin[0] * m[1] + origin[1] * m[5] + origin[2] * m[9] + m[13],
            origin[0] * m[2] + origin[1] * m[6] + origin[2] * m[10] + m[14],
        ]
    )
    d = jnp.stack(
        [
            direction[0] * m[0] + direction[1] * m[4] + direction[2] * m[8],
            direction[0] * m[1] + direction[1] * m[5] + direction[2] * m[9],
            direction[0] * m[2] + direction[1] * m[6] + direction[2] * m[10],
        ]
    )
    return o, d


class BounceState(NamedTuple):
    """Per-ray accumulation state across the 2-bounce loop
    (kernel_main.cl:183-186). All vectors planar [3, *spatial]."""

    result: Array
    energy: Array
    atmospheric: Array
    light_dir: Array
    origin: Array
    direction: Array
    alive: Array  # [*spatial] bool


def initial_bounce_state(
    origin: Array, direction: Array, sun_angle: Array
) -> BounceState:
    """``origin``/``direction``: planar [3, *spatial]."""
    spatial = direction.shape[1:]
    zeros = jnp.zeros((3,) + spatial, jnp.float32)
    sun = jnp.stack(
        [jnp.zeros_like(sun_angle), jnp.sin(sun_angle), jnp.cos(sun_angle)]
    )
    expand = (...,) + (None,) * len(spatial)
    return BounceState(
        result=zeros,
        energy=jnp.ones((3,) + spatial, jnp.float32),
        atmospheric=jnp.broadcast_to(
            jnp.asarray([0.255, 0.25, 0.27], jnp.float32)[expand],
            (3,) + spatial,
        ),
        light_dir=jnp.broadcast_to(sun[expand], (3,) + spatial),
        origin=origin,
        direction=direction,
        alive=jnp.ones(spatial, bool),
    )


def shade_hits(
    scene: Scene,
    state: BounceState,
    t: Array,  # [*S] hit distance (object-space, as in the reference)
    u: Array,
    v: Array,
    tri_idx: Array,  # [*S] i32
    instance_idx: Array,  # [*S] i32
    hit: Array,  # [*S] bool
    reference_parity: bool = True,
    integer_colors: bool = True,
    attrs: tuple[Array, Array, Array, Array] | None = None,
    shadow_tracer=None,  # Tracer | None: sun-occlusion query (shadows)
    enable_refraction: bool = False,
    refraction_ior: float = 1.45,
    gi_state: Array | None = None,  # [*S] uint32 — per-ray RNG streams:
    #   Monte-Carlo diffuse GI continuation (uniform hemisphere about the
    #   shading normal, albedo * 2*cosTheta throughput) replaces the
    #   mirror reflection
    deferred: list | None = None,  # float-path texel deferral (the XLA
    #   twin of the fused kernel's atlas modes): when given — requires
    #   reference_parity, float colors, no refraction — the per-bounce
    #   texel-pool gather is SKIPPED; this list collects
    #   (pool idx, F1, F2, albP, live) terms and render.bounce_loop
    #   fetches every bounce's texels with ONE combined gather at the end
    #   (radiance = Σ_b texel_b * (F1_b * P_b + F2_b); P = the GI color
    #   product, 1 on the mirror path). One gather instead of one per
    #   bounce → ONE sorted-scatter VJP per frame instead of B
) -> BounceState:
    """Apply one bounce of shading + update throughput (planar).

    Misses sample the skybox and terminate (kernel_main.cl:219-224); hits run
    the Phong block (kernel_main.cl:226-271). ``reference_parity`` keeps the
    kernel's hard-coded specular(0.2)/roughness(0.5)/shininess(1.0) overrides
    (kernel_main.cl:248-250). ``integer_colors`` selects the bit-faithful u8
    modulate (non-differentiable) vs the float path used for gradients —
    the float path also builds its gather tables in-jit from the canonical
    (differentiable) scene leaves.

    ``attrs``: optional pre-interpolated (object-space normal [3, *S], uu,
    vv, mat_local) from the Pallas tracer's in-VMEM interpolation — skips
    the per-ray triangle-attribute gather entirely.
    """
    atlas = scene.atlas
    fast = integer_colors and scene.packed is not None
    tables = _shading_tables(scene, prefer_packed=fast)

    # ---- skybox index (miss lanes; kernel_main.cl:219-224) ----------------
    if fast:
        pk = scene.packed
        skw, skh, skoff = pk.skybox_w, pk.skybox_h, pk.skybox_off  # static
    else:
        kb = scene.skybox_tex  # static index → cheap slices
        skw, skh, skoff = atlas.width[kb], atlas.height[kb], atlas.offset[kb]
    sky_idx = _skybox_index(skw, skh, skoff, state.direction)

    miss_now = state.alive & ~hit
    live = state.alive & hit

    # ---- table fetches ------------------------------------------------------
    # fast: one-hot MXU gathers (~0.1 ms); diff: the same one-hot form with
    # a hand-written exact VJP (gather.onehot_rows_exact) — values AND
    # gradients to f32 accuracy, no TPU scatter loops — falling back to row
    # gathers (scatter-add VJP) only past the one-hot size bound
    small_rows = gather.onehot_rows if fast else gather.small_rows_diff
    # pre-interpolated attrs come from the Pallas kernel (integer-colors
    # fast path) or from the differentiable tracer's combined row gather
    # (diff.py) — both interpolate with shade's exact expression tree
    use_kernel_attrs = attrs is not None
    if use_kernel_attrs:
        attr = None
        mat_local = attrs[3].astype(jnp.int32)
    else:
        # miss/dead lanes carry garbage triangle ids; the row gather is
        # coherence-bound, so pin them to one hot row (their shading is
        # masked out downstream either way)
        attr = gather.take_rows(
            tables.tri_attr, jnp.where(hit, tri_idx, 0)
        )  # [16, *S]
        mat_local = attr[15].astype(jnp.int32)
    inst = small_rows(tables.inst_rows, instance_idx)  # [17, *S]
    mat_start = inst[16].astype(jnp.int32)
    mat_id = mat_start + mat_local
    mat = small_rows(tables.mat_rows, mat_id)  # [16, *S]

    alb_rgb = mat[0:3]
    spec_rgb = mat[3:6]
    rec = lambda base: (
        mat[base],
        mat[base + 1],
        mat[base + 2].astype(jnp.int32) * (1 << _OFF_SHIFT)
        + mat[base + 3].astype(jnp.int32),
    )

    # ---- object-space ray of the winning instance ------------------------
    # (the reference transforms per instance in-kernel, kernel_main.cl:205-207;
    # tracers return object-space t, and the reference reuses the object-space
    # hit point directly as the next world origin, kernel_main.cl:246-253)
    mesh_origin, mesh_direction = _transform_rays(
        inst, state.origin, state.direction
    )

    # ---- attribute interpolation -----------------------------------------
    if use_kernel_attrs:
        # already interpolated in the Pallas kernel (same expression tree)
        n_obj = attrs[0]
        uu, vv = attrs[1], attrs[2]
    else:
        w0 = 1.0 - u - v
        # lerp in object space, then one transform by the inverse 3x3 (the
        # two commute — the map is linear; one transform is 2x fewer FMAs)
        n_obj = jnp.stack(
            [
                attr[c] * w0 + attr[3 + c] * u + attr[6 + c] * v
                for c in range(3)
            ]
        )
        uu = attr[9] * w0 + attr[11] * u + attr[13] * v
        vv = attr[10] * w0 + attr[12] * u + attr[14] * v
    normal = planar.normalize(
        jnp.stack(
            [
                n_obj[0] * inst[0] + n_obj[1] * inst[4] + n_obj[2] * inst[8],
                n_obj[0] * inst[1] + n_obj[1] * inst[5] + n_obj[2] * inst[9],
                n_obj[0] * inst[2] + n_obj[1] * inst[6] + n_obj[2] * inst[10],
            ]
        )
    )

    # ---- texel fetch ------------------------------------------------------
    # All textures procedural (static fact): evaluate them in-register —
    # pure VPU math, no gather at all. Otherwise ONE fused row gather
    # serves albedo (hit lanes) and skybox (miss lanes): the per-ray pool
    # gather is XLA's serial scalar loop (~15-22 ms at 1080p), the
    # dominant frame cost, so gathers are never spent twice.
    aw, ah, aoff = rec(8)
    # inline holds in EVERY color mode: the baked atlas equals the
    # descriptor evaluation exactly (test_inline_shading_matches_pool_
    # gather), so the float/differentiable path skips the pool gather too —
    # its VJP was a 2M-update serialized pool scatter per bounce (~40 ms at
    # 1080p) for texels the production forward never reads; texel gradients
    # for all-procedural scenes are identically zero by design (imported-
    # texture scenes keep the pool path and its texel gradients)
    inline = _all_procedural(scene)
    if inline:
        sky = _eval_skybox_inline(scene, sky_idx, skw, skoff)
        texel = planar.where(
            hit, _eval_tex_inline(scene, aoff, uu, vv), sky
        )
    else:
        alb_idx = _pool_index(aw, ah, aoff, uu, vv)
        # dead lanes fetch texel 0: the TPU row gather is latency/coherence-
        # bound (ops/gather.py), so pinning lanes nobody consumes to one hot
        # row makes terminated-ray bounces cheap instead of random-access
        idx = jnp.where(hit, alb_idx, sky_idx)
        idx = jnp.where(state.alive, idx, 0)
        if deferred is None:
            pk_tex = getattr(scene.packed, "texels_u32", None) if fast else None
            if pk_tex is not None:
                # large pools (> FLAT_TEXEL_MIN texels, scene/builder.py):
                # flat packed-RGB8 gather + byte unpack — the [P, 4] row
                # gather falls off XLA's scoped-VMEM staging at this size
                # and reads HBM per row (the fused path measured 107 -> 30
                # ms on the museum frame with this same switch,
                # render_pallas._finish_frame). texel = byte * (1/255) is
                # the pool's own construction formula: bit-identical.
                word = jnp.take(pk_tex, idx, mode="clip")
                texel = jnp.stack(
                    [
                        (word & 0xFF).astype(jnp.float32) * _U8,
                        ((word >> 8) & 0xFF).astype(jnp.float32) * _U8,
                        ((word >> 16) & 0xFF).astype(jnp.float32) * _U8,
                    ]
                )
            else:
                texel = gather.take_rgb(atlas.texels, idx)
            sky = texel  # valid on miss lanes only (masked below)
        else:
            assert reference_parity and not integer_colors, (
                "texel deferral needs the reference-parity float path"
            )
            texel = sky = None
    use_defer = deferred is not None and not inline
    if use_defer:
        result = state.result  # sky rides the deferred combined gather
        color = None  # every consumer below is deferred or texel-free
    else:
        result = planar.where(
            miss_now, state.result + sky * state.energy, state.result
        )
        if integer_colors:
            color = _modulate_bytes(texel, alb_rgb)
        else:
            color = texel * alb_rgb

    if reference_parity:
        # kernel_main.cl:248-250 overrides material properties
        # (state.energy as the shape template: `color` is None in
        # deferred-texel mode)
        specular_color = jnp.full_like(state.energy, 0.2)
        roughness = jnp.full_like(t, 0.5)
        shininess = None  # constant 1.0 — the pow is skipped below
    else:
        sw, sh, soff = rec(12)
        if inline:
            spec_texel = _eval_tex_inline(scene, soff, uu, vv)
        else:
            spec_texel = sample_pool_planar(atlas, sw, sh, soff, uu, vv)
        if integer_colors:
            specular_color = _modulate_bytes(spec_texel, spec_rgb)
        else:
            specular_color = spec_texel * spec_rgb
        roughness = mat[7]
        shininess = mat[6]

    point = mesh_origin + planar.scale(mesh_direction, t)
    new_origin = point + normal * 0.01
    new_direction = planar.reflect(state.direction, normal)
    if gi_state is not None:
        # Monte-Carlo diffuse GI (NEW beyond the reference, which ships its
        # hemisphere sampler unused — MathAndSTL.cl:208-215 never called
        # from Trace): continue in a sampled hemisphere direction about the
        # shading normal; the throughput update below becomes the surface
        # albedo instead of the specular carry. Direct sun terms stay per
        # bounce, so averaging ``samples`` decorrelated frames integrates
        # one-bounce-deeper indirect light.
        from clraytracer_tpu.ops import rng as _rng

        gi_dir, _ = _rng.hemisphere_sample(gi_state, normal)
        # keep the sample on the visible side (the sampler is hemisphere-
        # exact already; this guards degenerate normals on miss lanes)
        gi_dot = planar.dot(gi_dir, normal)
        flip = gi_dot < 0.0
        new_direction = planar.where(flip, -gi_dir, gi_dir)
        # Lambertian estimator weight for the UNIFORM hemisphere sampler
        # (pdf 1/2pi — hemisphere_sample draws cosTheta ~ U[0,1), which is
        # uniform in solid angle): (albedo/pi) * cosTheta / pdf =
        # albedo * 2 * cosTheta. The albedo factor rides the throughput
        # update below; the 2*cosTheta is this weight.
        gi_weight = 2.0 * jnp.abs(gi_dot)

    # ---- refraction (NEW beyond the reference — on its TODO list,
    # README.md:12): Whitted-style single continuation. Lanes hitting a
    # material with transmission > 0 continue by Snell refraction through
    # the surface (shading normal, entering/exiting by the sign of d.n,
    # total internal reflection falls back to the mirror ray); their
    # specular energy carry is replaced by the transmission factor and the
    # direct surface terms are attenuated by (1 - transmission). Off by
    # default — exact reference behavior is untouched.
    use_refr = None
    if enable_refraction:
        trans = jnp.take(
            scene.materials.transmission, mat_id, mode="clip"
        )
        cos_i = -planar.dot(state.direction, normal)
        n_eff = jnp.where(cos_i[None] >= 0.0, normal, -normal)
        ci = jnp.abs(cos_i)
        eta = jnp.where(
            cos_i >= 0.0,
            jnp.float32(1.0 / refraction_ior),
            jnp.float32(refraction_ior),
        )
        kk = 1.0 - eta * eta * (1.0 - ci * ci)
        refr_dir = planar.normalize(
            planar.scale(state.direction, eta)
            + planar.scale(n_eff, eta * ci - jnp.sqrt(jnp.maximum(kk, 0.0)))
        )
        use_refr = hit & (trans > 0.0) & (kk >= 0.0)
        new_direction = planar.where(use_refr, refr_dir, new_direction)
        # continuation starts just BEHIND the surface for refracted rays
        new_origin = planar.where(use_refr, point - n_eff * 0.01, new_origin)

    # ---- Phong shade (kernel_main.cl:258-271) -----------------------------
    # ``shadow`` is the reference's declared-but-unimplemented sun-shadow
    # factor (kernel_main.cl:258, README.md:11 "TODO shadows"); with a
    # shadow_tracer we implement it: one occlusion trace from the epsilon-
    # offset hit point toward the sun kills the direct terms (diffuse,
    # specular highlight, and the specular energy carry) but not ambient.
    shadow = 1.0
    if shadow_tracer is not None:
        import inspect

        to_sun = -state.light_dir
        sh_origin = planar.where(hit, new_origin, jnp.zeros_like(new_origin))
        if "live" in inspect.signature(shadow_tracer).parameters:
            # tracers with in-kernel dead-lane culling (trace_pallas) skip
            # the shadow traversal's non-hit lanes entirely
            occ = shadow_tracer(scene, sh_origin, to_sun, live=live)
        else:
            occ = shadow_tracer(scene, sh_origin, to_sun)
        shadow = jnp.where(hit & occ.hit, 0.0, 1.0)
    ndl_raw = planar.dot(normal, -state.light_dir)
    amb_m = jnp.maximum(-ndl_raw, 0.1)
    if not use_defer:
        ambient = planar.scale(state.atmospheric * color, amb_m)
    ndl = jnp.maximum(ndl_raw, 0.0)
    specular = planar.scale(specular_color, (1.0 - roughness) * ndl * shadow * ndl)
    if gi_state is not None:
        # diffuse GI: the continuation carries albedo * 2*cosTheta (the
        # uniform-hemisphere Lambertian estimator weight, see the sampling
        # site above), not the specular term. Deferred mode carries the
        # weight only — the color factor joins via the P product below.
        if use_defer:
            specular = jnp.broadcast_to(
                gi_weight[None], state.energy.shape
            )
        else:
            specular = planar.scale(color, gi_weight)
    refl_light = planar.reflect(-state.light_dir, normal)
    rdm = jnp.maximum(planar.dot(refl_light, mesh_direction), 0.0)
    if shininess is None:
        # reference-parity shininess is the constant 1.0 override
        spec_pow = rdm
    else:
        spec_pow = _pow_fast(rdm, shininess)
    spec_light = ndl * spec_pow * 0.2 * shadow

    if use_defer:
        # emit the texel-blind deferred terms (render.bounce_loop's
        # combined-gather assembly): contribution = texel * (F1*P + F2),
        # F1 = energy*dif*alb (or plain energy on the miss lane — the sky
        # texel rides the same combined gather), F2 = ambient coefficient
        assert use_refr is None, "deferral excludes refraction"
        dif = ndl * shadow
        zero3 = jnp.zeros_like(state.energy)
        F1 = planar.where(
            live,
            planar.scale(state.energy * alb_rgb, dif),
            planar.where(miss_now, state.energy, zero3),
        )
        F2 = planar.where(
            live, planar.scale(state.atmospheric * alb_rgb, amb_m), zero3
        )
        deferred.append(
            (idx, F1, F2,
             alb_rgb if gi_state is not None else None, live)
        )
        result = planar.where(live, result + spec_light[None], result)
    else:
        contrib = (
            planar.scale(state.energy * color, ndl * shadow)
            + ambient
            + spec_light[None]
        )
        if use_refr is not None:
            # transparent surfaces pass (1 - transmission) of their direct
            # terms and carry `transmission` into the refracted continuation
            contrib = planar.where(
                use_refr, planar.scale(contrib, 1.0 - trans), contrib
            )
            specular = planar.where(
                use_refr,
                jnp.broadcast_to(trans[None], specular.shape),
                specular,
            )
        result = planar.where(live, result + contrib, result)

    return BounceState(
        result=result,
        energy=planar.where(live, state.energy * specular, state.energy),
        atmospheric=planar.where(
            live, state.atmospheric * 0.4, state.atmospheric
        ),
        light_dir=planar.where(live, new_direction, state.light_dir),
        origin=planar.where(live, new_origin, state.origin),
        direction=planar.where(live, new_direction, state.direction),
        alive=live,
    )
