"""Fused render megakernel: traverse + shade + bounce in ONE Pallas kernel.

The two-phase frame (Pallas traversal → XLA shading fusions, per bounce)
spends more time in the shading fusion soup than in traversal itself
(measured at 1080p/2 bounces: kernels 5.9 ms, XLA shading ~13.5 ms — dozens
of [rows, 128] elementwise passes through HBM). This kernel keeps the whole
bounce loop in VMEM/registers: per ray tile it traverses (ops/trace_pallas
phases A/B/C into a VMEM scratch), shades in registers, computes the
reflection ray, and repeats for the next bounce — writing only the final
RGB (plus two small miss records) to HBM.

It is the FAST PATH for the reference-parity frame
(kernel_main.cl:164-275): available when

* shading is reference-parity + integer-colors (the default frame config),
* every texture is procedural (scene/procedural_tex.py) — texels are then
  closed-form VPU math, no per-ray pool gather exists at all,
* the material table is small (static select loop), and
* the cluster tables fit VMEM (same bound as the tile tracer).

Everything else falls back to the two-phase path (render.bounce_loop).

Parity contract: every shading formula below replicates ops/shade.py's
expression tree operation-for-operation (same association order, same
constants chained in f32), so the fused frame matches the two-phase Pallas
frame to float precision (only compiler FMA-contraction choices may differ
between the two compilations — measured max 2.4e-7 absolute at 64x48;
tests/test_trace.py::test_fused_render_matches_two_phase pins it at 1e-5).
The ONE step evaluated outside the kernel is the
equirect skybox (jnp.arctan2/arccos — kept in XLA so the transcendental
implementations match the golden path exactly): the kernel records each
ray's throughput and direction at its first miss, and `render_fused` adds
``sky(miss_dir) * miss_energy`` afterwards — misses terminate rays
(kernel_main.cl:219-224), so one deferred add reproduces the in-loop sum.

Reference citations: Whitted 2-bounce loop kernel_main.cl:183-272; Phong
block kernel_main.cl:248-271 with the hard-coded specular/roughness
overrides; miss/sky kernel_main.cl:219-224.
"""

from __future__ import annotations

import functools
import types

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clraytracer_tpu.ops import trace_pallas as _tp
from clraytracer_tpu.ops.trace_pallas import (
    _BIG,
    _emit_traversal,
    _table_bytes,
    _tile_rows,
)
from clraytracer_tpu.ops.trace_ref import _instance_tables
from clraytracer_tpu.scene.types import Scene

#: static select loops over materials stay cheap only while M is small
MAX_FUSED_MATERIALS = 64

#: kernel tile height. The fused kernel carries ~30 live [ROWS, 128] f32
#: registers through shading; 32 rows beats the tracer's 64-row default
#: (measured 1080p: r8 17.2 / r16 9.4 / r32 5.3 / r64 5.9 ms) — less vreg
#: spill outweighs the halved scalar-work amortization.
FUSED_ROWS = 32

#: tile height for HBM-STREAMED scenes with moderate cluster counts: the
#: DMA pipeline + per-cluster scalar work amortize over more rays per tile
#: (museum/5.3k clusters at 1080p: r8 229 / r16 139 / r32 102 / r64 94 ms).
#: CLUSTER-DENSE streamed scenes invert hard (1M-tri sphere/33k clusters
#: after the hypercluster level + occlusion skip removed the per-tile
#: fixed costs: r8 90 / r16 77 / r32 96 ms — a smaller tile's tighter ray
#: frustum survives culling against far fewer clusters, and that survivor
#: work dominates), as do VMEM-resident scenes mildly (r32: less vreg
#: spill in shading). ``_fused_rows_default`` picks per scene.
FUSED_ROWS_STREAM = 64

#: streamed scenes with more clusters than this use the 16-row tile
FUSED_ROWS_STREAM_MAX_CLUSTERS = 8192
FUSED_ROWS_STREAM_DENSE = 16


def _fused_rows_default(clusters) -> int:
    if _table_bytes(clusters) > _tp.VMEM_TABLE_BUDGET:
        if clusters.tri_a.shape[0] <= FUSED_ROWS_STREAM_MAX_CLUSTERS:
            return FUSED_ROWS_STREAM
        return FUSED_ROWS_STREAM_DENSE
    return FUSED_ROWS

_U8 = 1.0 / 255.0

#: jnp front-end for procedural_tex._eval that returns a plain (r, g, b)
#: tuple instead of a stacked [3, ...] array (Mosaic works in 2-D registers)
_XP_TUPLE = types.SimpleNamespace(
    floor=jnp.floor,
    where=jnp.where,
    minimum=jnp.minimum,
    full_like=jnp.full_like,
    stack=lambda xs: tuple(xs),
)


def _make_render_kernel(
    instance_ranges: tuple[tuple[int, int, int, int], ...],
    rows: int,
    n_materials: int,
    tex_descs: tuple,  # ((off_hi, off_lo, ProceduralTexture), ...)
    bounces: int,
    cam: tuple[int, int, int, int] | None = None,
    stream: bool = False,
    shadows: bool = False,
    atlas_mode: int = 0,
    has_hyper: bool = False,
    gi_on: bool = False,
    carry_in: bool = False,
    carry_out: bool = False,
    start_bounce: int = 0,
):
    """``cam = (trows, tiles_x, width, height)`` selects in-kernel raygen:
    instead of six [ROWS, 128] ray inputs streamed from HBM, the kernel
    receives one SMEM row of camera state (invProj | invView | position) and
    reconstructs each lane's primary ray from its pixel coordinates (the
    RayGen unprojection, kernel_main.cl:277-287, same expression order as
    camera._unproject_grid) — zero per-ray input traffic for the frame.

    Tiles map to trows x 128 pixel strips (camera.ray_directions_tiled's
    order). A 64 x 2*ROWS square-block mapping was measured too: it cut the
    kernel ~4% (tighter tile frusta) but its untile transpose splits the
    128-lane dim (granule 64) and cost +0.5 ms at 1080p — net slower, so
    strips stay.

    ``stream`` swaps the VMEM cluster tables for the HBM ``geo_stream``
    array DMA'd per surviving cluster (ops/trace_pallas._emit_traversal) —
    the fused frame stays available past the VMEM table budget.

    ``atlas_mode`` keeps the fused frame available for scenes with
    IMPORTED (non-procedural) textures: in reference-parity shading the
    per-bounce radiance contribution is **linear in the albedo texel**
    (``contrib = coef * color(texel) + spec_light``), and neither the
    throughput update nor the next ray reads the texel — so the kernel
    runs the whole bounce loop texel-blind and ``_finish_frame`` fetches
    all bounces' texels with ONE combined XLA row gather. This replaces
    the two-phase path's per-bounce shading fusion soup (~dozens of
    HBM-bound elementwise passes) with the same single gather it already
    paid, and keeps the traversal fused. Two sub-modes:

    * ``atlas_mode=1`` (M <= MAX_FUSED_MATERIALS): the kernel selects the
      material row with the static in-kernel loop and emits per bounce
      the flat texel-pool index (i32, shade._pool_index expression), the
      material color bytes, and the coefficient ``energy*dif +
      atm*ambient`` (7 blocks).
    * ``atlas_mode=2`` (any M): the kernel reads no material data at all,
      emitting only the winning material id, (uu, vv), and the
      coefficient (6 blocks); _finish_frame fetches material rows with a
      one-hot MXU gather and computes the pool indices itself. The
      one-hot traffic (~7 ms at 1080p) makes this the large-M fallback
      only.

    Both emit -1/-2 sentinels for miss-now/dead lanes (sky rides the
    combined gather; dead lanes pin to row 0).

    ``carry_in``/``carry_out``/``start_bounce`` split the bounce loop at a
    bounce boundary so the host can re-bin divergent secondary rays into
    coherent tiles between invocations (render_fused_camera's
    ``split_rebin``): a ``carry_out`` invocation appends the continuation
    state after its last bounce — o(3) | d(3) | energy(3) | alive(1) — to
    the output block, and a ``carry_in`` invocation (ray mode) reads
    result(3) | men(3) | mdir(3) | energy(3) | alive(1) from one extra
    [13*ROWS, 128] input instead of starting fresh. ``light`` needs no
    carry: every lane alive after bounce b has light == its ray direction
    (the bounce epilogue sets both to the reflected ray), and dead lanes
    never contribute. Values round-trip HBM as exact f32, so split ==
    unsplit bit-for-bit (tile composition only affects conservative
    culling, never the per-ray nearest hit)."""
    from clraytracer_tpu.ops.shade import _OFF_SHIFT
    from clraytracer_tpu.scene.procedural_tex import _eval

    ROWS = rows
    n_instances = len(instance_ranges)

    def kernel(*refs):
        if cam is None:
            # [ROWS, 128] tile primary-ray origin xyz + direction xyz (world)
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref = refs[:6]
            rest = refs[6:]
        else:
            cam_ref = refs[0]  # SMEM [1, 36]: invProj(16) | invView(16) |
            #   pos(3) | row0 (first GLOBAL pixel row this call renders —
            #   0 for a full frame; a shard's row-window offset under
            #   shard_map, so each device raygens its own rows in-kernel)
            rest = refs[1:]
        if carry_in:
            carry_ref, rest = rest[0], rest[1:]  # [13*ROWS, 128]
        (
            inst_ref,  # [I, 17] inverse transform (row-major) | material_start
            mat_ref,  # [M, 16] packed material rows (ops/shade.ShadingTables)
            sun_ref,  # SMEM [1, 2]: (sin sun_angle, cos sun_angle)
        ) = rest[:3]
        rest = rest[3:]
        if gi_on:
            # SMEM [1, bounces] i32: per-bounce GI seed bases — TRACED, so
            # changing the seed (per supersample) reuses ONE compiled kernel
            gis_ref, rest = rest[0], rest[1:]
        else:
            gis_ref = None
        (
            scab_ref,  # [S, 8] supercluster AABBs
            clab_ref,  # [C, 8] cluster AABBs
        ) = rest[:2]
        rest = rest[2:]
        if has_hyper:
            hyab_ref, rest = rest[0], rest[1:]  # packed hypercluster AABBs
        else:
            hyab_ref = None
        if stream:
            geo_ref = rest[0]  # [8C, 128] ANY (HBM) — see Clusters.geo_stream
            (out_ref, sc_scratch, sk_scratch, cl_scratch, bits_scratch,
             bx_scratch, fmx_scratch, cnt_cell, hy_scratch, hk_scratch,
             hs_ref, buf_ref, sem_ref) = rest[1:]
            tables = (None,) * 7
            stream_refs = (geo_ref, buf_ref, sem_ref)
        else:
            (
                ta_ref,  # [C, 128] triangle geometry (ops/trace_pallas layout)
                tb_ref,
                tc_ref,
                aa_ref,  # [C, 128] shading attributes
                ab_ref,
                ac_ref,
                ad_ref,
                out_ref,  # [9*ROWS, 128]: result rgb | miss rgb | miss_dir rgb
                sc_scratch,  # SMEM [S_total] i32
                sk_scratch,  # SMEM [S_total] f32
                cl_scratch,  # SMEM [C_total] i32
                bits_scratch,  # VMEM [8, 128] i32 OR-tree staging
                bx_scratch,  # SMEM [32*6] f32 chunk box stash
                fmx_scratch,  # VMEM [8, 128] f32 max-tree staging
                cnt_cell,  # SMEM [2] i32 survivor-count + max-dirty
                hy_scratch,  # SMEM [H_max] i32 surviving-hyper list
                hk_scratch,  # SMEM [H_max] f32 hyper sort keys
                hs_ref,  # VMEM [11*ROWS, 128] per-bounce hit scratch
            ) = rest
            tables = (ta_ref, tb_ref, tc_ref, aa_ref, ab_ref, ac_ref, ad_ref)
            stream_refs = None
        zero = jnp.zeros((ROWS, 128), jnp.float32)
        one = jnp.ones((ROWS, 128), jnp.float32)
        if cam is None:
            o = [ox_ref[...], oy_ref[...], oz_ref[...]]
            d = [dx_ref[...], dy_ref[...], dz_ref[...]]
        else:
            # ---- in-kernel raygen: tile index → pixel rect → unproject ----
            trows, tiles_x, width, height = cam
            r = pl.program_id(0) * ROWS + jax.lax.broadcasted_iota(
                jnp.int32, (ROWS, 128), 0
            )
            lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
            tile = r // trows
            px = ((tile % tiles_x) * 128 + lane).astype(jnp.float32)
            py = (
                (tile // tiles_x) * trows + r % trows
            ).astype(jnp.float32) + cam_ref[0, 35]
            cx = (px / width) * 2.0 - 1.0
            cy = (py / height) * 2.0 - 1.0
            ip = [cam_ref[0, k] for k in range(16)]
            iv = [cam_ref[0, 16 + k] for k in range(16)]
            tx = cx * ip[0] + cy * ip[4] + ip[8] + ip[12]
            ty = cx * ip[1] + cy * ip[5] + ip[9] + ip[13]
            tz = cx * ip[2] + cy * ip[6] + ip[10] + ip[14]
            tw = cx * ip[3] + cy * ip[7] + ip[11] + ip[15]
            inv_w = 1.0 / tw
            tx, ty, tz = tx * inv_w, ty * inv_w, tz * inv_w
            wx = tx * iv[0] + ty * iv[4] + tz * iv[8] + iv[12]
            wy = tx * iv[1] + ty * iv[5] + tz * iv[9] + iv[13]
            wz = tx * iv[2] + ty * iv[6] + tz * iv[10] + iv[14]
            rn = 1.0 / jnp.sqrt(wx * wx + wy * wy + wz * wz)
            d = [wx * rn, wy * rn, wz * rn]
            o = [zero + cam_ref[0, 32 + c] for c in range(3)]
        if carry_in:
            # resume mid-loop from the carried state (split_rebin): layout
            # result(3) | men(3) | mdir(3) | energy(3) | alive(1)
            cr = lambda k: carry_ref[k * ROWS : (k + 1) * ROWS, :]
            result = [cr(0), cr(1), cr(2)]
            men = [cr(3), cr(4), cr(5)]
            mdir = [cr(6), cr(7), cr(8)]
            energy = [cr(9), cr(10), cr(11)]
            alive = cr(12) > 0.5
            # alive lanes left the previous bounce with light == direction
            light = [d[0], d[1], d[2]]
        else:
            # initial light = sun direction (shade.initial_bounce_state)
            light = [zero, zero + sun_ref[0, 0], zero + sun_ref[0, 1]]
            result = [zero, zero, zero]
            energy = [one, one, one]
            men = [zero, zero, zero]  # throughput at first miss
            mdir = [zero, zero, zero]  # direction at first miss
            alive = jnp.ones((ROWS, 128), jnp.bool_)
        defer_out = []  # atlas modes: per-bounce deferred-shading blocks
        # per-bounce atmospheric constants: the f32 chain 0.255 * 0.4^b,
        # replicated in numpy f32 so each bounce's value matches shade_hits'
        # in-graph f32 multiplies bit-for-bit (start_bounce steps the chain
        # by ITERATED f32 multiplies too — no f64 pow shortcut)
        atm = np.asarray([0.255, 0.25, 0.27], np.float32)
        for _ in range(start_bounce):
            atm = atm * np.float32(0.4)

        # camera mode: bounce 0's origin components enter traversal as
        # traced SCALARS — the plane-based intersector's o.N / o.U / o.V
        # dots and the slab test's (box - o) then run on the scalar unit,
        # cutting the per-triangle vector work by ~30% on the primary
        # bounce (every expression in _emit_traversal broadcasts unchanged)
        o_trav0 = (
            tuple(cam_ref[0, 32 + c] for c in range(3)) if cam is not None
            else None
        )

        for _b in range(bounces):
            gb = _b + start_bounce  # GLOBAL bounce index under split_rebin

            def traverse(o=o, d=d, live_mask=None, o_scalar=None):
                ot = o_scalar if o_scalar is not None else (o[0], o[1], o[2])
                _emit_traversal(
                    (ot[0], ot[1], ot[2], d[0], d[1], d[2]),
                    hs_ref,
                    ROWS,
                    instance_ranges,
                    "full",
                    inst_ref,
                    scab_ref,
                    clab_ref,
                    *tables,
                    sc_scratch,
                    sk_scratch,
                    cl_scratch,
                    bits_scratch,
                    bx_scratch,
                    live=live_mask,
                    stream=stream_refs,
                    fmx_scratch=fmx_scratch,
                    cnt_cell=cnt_cell,
                    hyab_ref=hyab_ref,
                    hy_scratch=hy_scratch,
                    hk_scratch=hk_scratch,
                )

            if gb == 0:
                traverse(o_scalar=o_trav0)
            else:
                # whole-tile early out: a tile whose rays all terminated
                # (e.g. pure-sky tiles after bounce 1) skips traversal
                # entirely; mark everything missed first so stale bounce-1
                # hits can't leak through the skip
                hs_ref[0:ROWS, :] = jnp.full((ROWS, 128), _BIG, jnp.float32)
                pl.when(jnp.any(alive))(
                    functools.partial(traverse, live_mask=alive)
                )
            t = hs_ref[0:ROWS, :]
            binst = jax.lax.bitcast_convert_type(
                hs_ref[4 * ROWS : 5 * ROWS, :], jnp.int32
            )
            n_obj = (
                hs_ref[5 * ROWS : 6 * ROWS, :],
                hs_ref[6 * ROWS : 7 * ROWS, :],
                hs_ref[7 * ROWS : 8 * ROWS, :],
            )
            uu = hs_ref[8 * ROWS : 9 * ROWS, :]
            vv = hs_ref[9 * ROWS : 10 * ROWS, :]
            matl = hs_ref[10 * ROWS : 11 * ROWS, :]

            hit = t < _BIG
            live = alive & hit
            miss_now = alive & jnp.logical_not(hit)
            for c in range(3):
                men[c] = jnp.where(miss_now, energy[c], men[c])
                mdir[c] = jnp.where(miss_now, d[c], mdir[c])

            # ---- winning instance: world normal + object-space ray --------
            # (shade_hits gathers the instance row per ray; here the static
            # instance loop selects — same multiplies, same rounding)
            nw = [zero, zero, zero]
            mo = [zero, zero, zero]
            md = [zero, zero, zero]
            mstart = zero
            for i in range(n_instances):
                m = [inst_ref[i, c] for c in range(16)]
                sel = binst == i
                cand = (
                    # normal by inverse 3x3 (kernel_main.cl:235-238)
                    n_obj[0] * m[0] + n_obj[1] * m[4] + n_obj[2] * m[8],
                    n_obj[0] * m[1] + n_obj[1] * m[5] + n_obj[2] * m[9],
                    n_obj[0] * m[2] + n_obj[1] * m[6] + n_obj[2] * m[10],
                    # object-space ray (kernel_main.cl:205-207)
                    o[0] * m[0] + o[1] * m[4] + o[2] * m[8] + m[12],
                    o[0] * m[1] + o[1] * m[5] + o[2] * m[9] + m[13],
                    o[0] * m[2] + o[1] * m[6] + o[2] * m[10] + m[14],
                    d[0] * m[0] + d[1] * m[4] + d[2] * m[8],
                    d[0] * m[1] + d[1] * m[5] + d[2] * m[9],
                    d[0] * m[2] + d[1] * m[6] + d[2] * m[10],
                )
                for c in range(3):
                    nw[c] = jnp.where(sel, cand[c], nw[c])
                    mo[c] = jnp.where(sel, cand[3 + c], mo[c])
                    md[c] = jnp.where(sel, cand[6 + c], md[c])
                mstart = jnp.where(sel, inst_ref[i, 16], mstart)

            # planar.normalize: v / sqrt(dot(v, v)) (NaN on dead lanes is
            # discarded by the live-masked selects below, as in shade_hits)
            s = jnp.sqrt(nw[0] * nw[0] + nw[1] * nw[1] + nw[2] * nw[2])
            n = [nw[0] / s, nw[1] / s, nw[2] / s]

            # ---- material row (static select; mat id is f32-exact) --------
            mat_idf = mstart + matl
            if atlas_mode == 2:
                # deferred-material mode: no material data is read in the
                # kernel at all (see the atlas_mode docstring) — only the
                # winning material id is emitted, so the O(M) select loop
                # below is skipped and any material count works
                color = None
            else:
                alb = [zero, zero, zero]
                ahi = zero
                alo = zero
                aw = zero
                ah = zero
                for mi in range(n_materials):
                    selm = mat_idf == float(mi)
                    for c in range(3):
                        alb[c] = jnp.where(selm, mat_ref[mi, c], alb[c])
                    ahi = jnp.where(selm, mat_ref[mi, 10], ahi)
                    alo = jnp.where(selm, mat_ref[mi, 11], alo)
                    if atlas_mode == 1:
                        aw = jnp.where(selm, mat_ref[mi, 8], aw)
                        ah = jnp.where(selm, mat_ref[mi, 9], ah)

            if atlas_mode == 1:
                # flat pool index of the albedo texel, the exact op sequence
                # of shade._pool_index — in i32 (pool offsets exceed f32's
                # 2^24 integer range on ~100 MB pools)
                uw = uu - jnp.floor(uu)
                vw = vv - jnp.floor(vv)
                ui = (uw * aw).astype(jnp.int32)
                vi = (vw * ah).astype(jnp.int32)
                off_i = ahi.astype(jnp.int32) * jnp.int32(
                    1 << _OFF_SHIFT
                ) + alo.astype(jnp.int32)
                tex_idx = vi * aw.astype(jnp.int32) + ui + off_i
                color = None
            if atlas_mode == 0:
                # ---- procedural texel (static per-descriptor select;
                # selection by hi/lo offset, exactly shade._eval_tex_inline)
                texel = [zero, zero, zero]  # byte values [0, 255]
                for off_hi, off_lo, desc in tex_descs:
                    uw = uu - jnp.floor(uu)
                    ui = jnp.floor(uw * float(desc.width))
                    vw = vv - jnp.floor(vv)
                    vi = jnp.floor(vw * float(desc.height))
                    rgb = _eval(desc, _XP_TUPLE, ui, vi)
                    selt = (ahi == float(off_hi)) & (alo == float(off_lo))
                    for c in range(3):
                        texel[c] = jnp.where(selt, rgb[c], texel[c])

                # ---- integer color modulate (shade._modulate_bytes; texel
                # is exact bytes, so round(texel*255*(1/255)) == texel) -----
                color = []
                for c in range(3):
                    mat_b = jnp.round(jnp.clip(alb[c], 0.0, 1.0) * 255.0)
                    color.append(
                        jnp.floor(mat_b * texel[c] * (1.0 / 256.0)) * _U8
                    )

            # ---- in-kernel sun shadows (bounce 0 only, ops/shade.py's
            # shadow_tracer semantics): one more traversal from the
            # epsilon-offset hit point toward the sun — hs_ref is reused
            # (every shading input is already in registers) -----------------
            if shadows and gb == 0:
                so = [(mo[c] + md[c] * t) + n[c] * 0.01 for c in range(3)]
                sd = [zero, zero - sun_ref[0, 0], zero - sun_ref[0, 1]]
                hs_ref[0:ROWS, :] = jnp.full((ROWS, 128), _BIG, jnp.float32)

                def sh_traverse(so=so, sd=sd, live_mask=live):
                    _emit_traversal(
                        (so[0], so[1], so[2], sd[0], sd[1], sd[2]),
                        hs_ref,
                        ROWS,
                        instance_ranges,
                        "geom",
                        inst_ref,
                        scab_ref,
                        clab_ref,
                        *tables,
                        sc_scratch,
                        sk_scratch,
                        cl_scratch,
                        bits_scratch,
                        bx_scratch,
                        live=live_mask,
                        stream=stream_refs,
                        fmx_scratch=fmx_scratch,
                        cnt_cell=cnt_cell,
                        hyab_ref=hyab_ref,
                        hy_scratch=hy_scratch,
                        hk_scratch=hk_scratch,
                    )

                pl.when(jnp.any(live))(sh_traverse)
                shadow = jnp.where(
                    live & (hs_ref[0:ROWS, :] < _BIG), 0.0, 1.0
                )
            else:
                shadow = None  # statically absent: compile unchanged

            # ---- Phong, reference-parity overrides (kernel_main.cl:248-271,
            # spec 0.2 / rough 0.5 / shininess 1) ---------------------------
            ndl_raw = (
                n[0] * (-light[0]) + n[1] * (-light[1]) + n[2] * (-light[2])
            )
            amb_m = jnp.maximum(-ndl_raw, 0.1)
            ndl = jnp.maximum(ndl_raw, 0.0)
            if shadow is None:
                spec_s = (0.5 * ndl) * ndl  # ((1-rough)*ndl)*shadow*ndl
            else:
                spec_s = (0.5 * ndl) * shadow * ndl
            # refl_light = reflect(-light, n); dot(n, -light) == ndl_raw
            rl = [(-light[c]) - n[c] * (2.0 * ndl_raw) for c in range(3)]
            rdm = jnp.maximum(
                rl[0] * md[0] + rl[1] * md[1] + rl[2] * md[2], 0.0
            )
            spec_light = (ndl * rdm) * 0.2  # shininess-1 parity: pow skipped
            if shadow is not None:
                spec_light = spec_light * shadow

            # next ray: origin = object-space hit point + n*0.01 (the
            # reference reuses the object-space point as the next world
            # origin); direction = reflect(d, n)
            ndd = n[0] * d[0] + n[1] * d[1] + n[2] * d[2]
            dif = ndl if shadow is None else ndl * shadow
            if gi_on:
                # ---- in-kernel Monte-Carlo GI continuation --------------
                # Bit-identical RNG streams to the XLA path (ops/rng.py):
                # i32 wrap arithmetic == uint32 bit patterns; logical
                # shifts via shift_right_logical (Mosaic has no u32->f32
                # cast, and shr(s, 8) is non-negative so the i32 cast is
                # exact). Only the trig/rsqrt rounding differs from XLA.
                shr = jax.lax.shift_right_logical
                row_g = pl.program_id(0) * ROWS + jax.lax.broadcasted_iota(
                    jnp.int32, (ROWS, 128), 0
                )
                lane_g = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
                # per-bounce seed base from SMEM (i32 wrap arithmetic ==
                # the XLA path's uint32 bit patterns)
                seed_c = gis_ref[0, _b]
                sg = (row_g * 128 + lane_g) * jnp.int32(9999) + seed_c
                sg = (sg ^ 61) ^ shr(sg, 16)
                sg = sg * jnp.int32(9)
                sg = sg ^ shr(sg, 4)
                sg = sg * jnp.int32(np.int32(np.uint32(0x27D4EB2D)))
                sg = sg ^ shr(sg, 15)
                sg = sg ^ (sg << 13); sg = sg ^ shr(sg, 17)
                sg = sg ^ (sg << 5)
                cos_t = shr(sg, 8).astype(jnp.float32) * (1.0 / 16777216.0)
                sg = sg ^ (sg << 13); sg = sg ^ shr(sg, 17)
                sg = sg ^ (sg << 5)
                u2 = shr(sg, 8).astype(jnp.float32) * (1.0 / 16777216.0)
                sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
                phi = (2.0 * np.pi) * u2
                px_, py_ = jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t
                # tangent frame (ops/rng.tangent_space): helper = +X, or +Z
                # when the normal is nearly +X
                nx_big = jnp.abs(n[0]) > 0.99
                hx = jnp.where(nx_big, 0.0, 1.0)
                hz = jnp.where(nx_big, 1.0, 0.0)
                tx_ = n[1] * hz
                ty_ = n[2] * hx - n[0] * hz
                tz_ = -n[1] * hx
                tn_ = 1.0 / jnp.sqrt(tx_ * tx_ + ty_ * ty_ + tz_ * tz_)
                tx_, ty_, tz_ = tx_ * tn_, ty_ * tn_, tz_ * tn_
                bx_ = n[1] * tz_ - n[2] * ty_
                by_ = n[2] * tx_ - n[0] * tz_
                bz_ = n[0] * ty_ - n[1] * tx_
                bn_ = 1.0 / jnp.sqrt(bx_ * bx_ + by_ * by_ + bz_ * bz_)
                bx_, by_, bz_ = bx_ * bn_, by_ * bn_, bz_ * bn_
                gi_dir = (
                    tx_ * px_ + bx_ * py_ + n[0] * cos_t,
                    ty_ * px_ + by_ * py_ + n[1] * cos_t,
                    tz_ * px_ + bz_ * py_ + n[2] * cos_t,
                )
                # same visible-side flip guard as the XLA path
                # (ops/shade.py: degenerate normals can land the sample
                # below the surface) + the uniform-hemisphere Lambertian
                # estimator weight 2*cosTheta (pdf 1/2pi)
                gi_dot = (
                    gi_dir[0] * n[0] + gi_dir[1] * n[1] + gi_dir[2] * n[2]
                )
                gi_flip = gi_dot < 0.0
                gi_dir = tuple(
                    jnp.where(gi_flip, -gi_dir[c], gi_dir[c])
                    for c in range(3)
                )
                gi_weight = 2.0 * jnp.abs(gi_dot)
            if atlas_mode:
                # texel-independent shading: accumulate spec_light now and
                # emit the deferred blocks for the XLA post-pass. Lanes
                # that miss AT THIS BOUNCE emit the -1 sentinel:
                # _finish_frame substitutes their skybox texel through the
                # SAME combined gather (a separate sky gather measured
                # ~28 ms/frame at 1080p). Dead lanes pin their pool index
                # to 0 / emit -2 (the row gather is coherence-bound);
                # their coefficient is zero either way.
                #
                # With GI the energy carry is texel-DEPENDENT (throughput
                # multiplies the modulated color), so the coefficient
                # splits: coefE = E*dif (x color_b x P_b in XLA, where
                # P_b = prod of the previous bounces' colors) and
                # coefA = atm*amb (x color_b only); the kernel's E carries
                # only the texel-free 2*cosTheta weights.
                if gi_on:
                    coefs = [
                        jnp.where(live, energy[c] * dif, 0.0)
                        for c in range(3)
                    ] + [
                        jnp.where(live, float(atm[c]) * amb_m, 0.0)
                        for c in range(3)
                    ]
                else:
                    coefs = [
                        jnp.where(
                            live,
                            energy[c] * dif + float(atm[c]) * amb_m,
                            0.0,
                        )
                        for c in range(3)
                    ]
                if atlas_mode == 1:
                    defer_out.append(
                        [
                            jax.lax.bitcast_convert_type(
                                jnp.where(
                                    live,
                                    tex_idx,
                                    jnp.where(miss_now, -1, 0),
                                ),
                                jnp.float32,
                            ),
                        ]
                        + [
                            jnp.round(jnp.clip(alb[c], 0.0, 1.0) * 255.0)
                            for c in range(3)
                        ]
                        + coefs
                    )
                else:
                    defer_out.append(
                        [
                            jnp.where(
                                live,
                                mat_idf,
                                jnp.where(miss_now, -1.0, -2.0),
                            ),
                            uu,
                            vv,
                        ]
                        + coefs
                    )
            for c in range(3):
                if atlas_mode:
                    contrib = spec_light
                else:
                    contrib = (
                        (energy[c] * color[c]) * dif
                        + (float(atm[c]) * color[c]) * amb_m
                    ) + spec_light
                result[c] = jnp.where(live, result[c] + contrib, result[c])
                if gi_on:
                    # diffuse GI throughput: albedo * 2*cosTheta (uniform-
                    # hemisphere estimator weight), not the specular carry.
                    # Atlas modes defer the color factor: E carries only
                    # the texel-free weight; _finish_frame multiplies the
                    # per-bounce color product P back in.
                    energy[c] = jnp.where(
                        live,
                        energy[c] * (gi_weight if atlas_mode
                                     else color[c] * gi_weight),
                        energy[c],
                    )
                else:
                    energy[c] = jnp.where(
                        live, energy[c] * (0.2 * spec_s), energy[c]
                    )
                new_o = (mo[c] + md[c] * t) + n[c] * 0.01
                new_d = (
                    gi_dir[c] if gi_on
                    else d[c] - n[c] * (2.0 * ndd)
                )
                o[c] = jnp.where(live, new_o, o[c])
                d[c] = jnp.where(live, new_d, d[c])
                light[c] = jnp.where(live, new_d, light[c])
            alive = live
            atm = atm * np.float32(0.4)

        for c in range(3):
            out_ref[c * ROWS : (c + 1) * ROWS, :] = result[c]
            out_ref[(3 + c) * ROWS : (4 + c) * ROWS, :] = men[c]
            out_ref[(6 + c) * ROWS : (7 + c) * ROWS, :] = mdir[c]
        if carry_out:
            # continuation state for the re-binned follow-up invocation
            assert not defer_out, "split_rebin is gated to atlas_mode == 0"
            for c in range(3):
                out_ref[(9 + c) * ROWS : (10 + c) * ROWS, :] = o[c]
                out_ref[(12 + c) * ROWS : (13 + c) * ROWS, :] = d[c]
                out_ref[(15 + c) * ROWS : (16 + c) * ROWS, :] = energy[c]
            out_ref[18 * ROWS : 19 * ROWS, :] = jnp.where(alive, 1.0, 0.0)
        # deferred blocks, written in emit order: mode 1 = idx | mat_b
        # rgb | coef rgb (7; +coefA rgb with GI = 10); mode 2 = mat id |
        # uu | vv | coef rgb (6; +coefA rgb with GI = 9)
        for b, blocks in enumerate(defer_out):
            base = 9 + len(blocks) * b
            for k, blk in enumerate(blocks):
                out_ref[(base + k) * ROWS : (base + k + 1) * ROWS, :] = blk

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "instance_ranges", "rows", "tex_descs", "bounces", "cam", "n_tiles",
        "stream", "shadows", "atlas_mode", "carry_out", "start_bounce",
    ),
)
def _render_tiles(
    rays6: tuple[Array, ...],  # 6 x [T, ROWS, 128]; () in camera mode
    cam_vec: Array | None,  # [1, 35] invProj|invView|pos; None in ray mode
    inst_rows: Array,  # [I, 17]
    mat_rows: Array,  # [M, 16]
    sun: Array,  # [1, 2] f32 (sin, cos)
    scab: Array,
    clab: Array,
    geo: tuple[Array, ...],  # resident: 7 x [C, 128]; streamed: 1 x [8C, 128]
    instance_ranges: tuple[tuple[int, int, int, int], ...],
    rows: int,
    tex_descs: tuple,
    bounces: int,
    cam: tuple[int, int, int] | None = None,
    n_tiles: int | None = None,
    stream: bool = False,
    shadows: bool = False,
    atlas_mode: int = 0,
    hyper: tuple[Array, ...] = (),  # 0 or 1 packed hypercluster AABB table
    gis: Array | None = None,  # [1, bounces] i32 per-bounce GI seed bases
    carry: Array | None = None,  # [T, 13*ROWS, 128] resumed bounce state
    carry_out: bool = False,
    start_bounce: int = 0,
):
    if cam is None:
        n_tiles = rays6[0].shape[0]
    ROWS = rows
    if atlas_mode == 2:
        # deferred-material mode reads NO material data in-kernel; a full
        # [M, 16] VMEM input would be lane-padded 128x (~512 B/material) —
        # the whole point of mode 2 is supporting large material counts
        mat_rows = mat_rows[:1]
    kernel = _make_render_kernel(
        instance_ranges, rows, mat_rows.shape[0], tex_descs, bounces, cam,
        stream, shadows, atlas_mode, has_hyper=len(hyper) == 1,
        gi_on=gis is not None, carry_in=carry is not None,
        carry_out=carry_out, start_bounce=start_bounce,
    )
    on_tpu = jax.default_backend() == "tpu"
    interpret = (
        False if on_tpu
        else (pltpu.InterpretParams() if stream else True)
    )
    n_blocks = (
        0 if not atlas_mode
        else (7, 6)[atlas_mode - 1] + (3 if gis is not None else 0)
    )
    n_out = 9 + n_blocks * bounces + (10 if carry_out else 0)
    tile_spec = pl.BlockSpec(
        (None, ROWS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    carry_t = () if carry is None else (carry,)
    carry_specs = [] if carry is None else [
        pl.BlockSpec(
            (None, 13 * ROWS, 128), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((None, n_out * ROWS, 128), lambda i: (i, 0, 0))
    ray_in = (rays6, [tile_spec] * 6) if cam is None else ((cam_vec,), [smem])
    geo_specs = (
        [pl.BlockSpec(memory_space=pl.ANY)] if stream else [full] * 7
    )
    # survivor-list capacities: TRUE supercluster/cluster totals (the
    # packed AABB tables hold 16 boxes per row, so their shapes undercount)
    s_total = max(max(r[0] + r[1] for r in instance_ranges), 2)
    c_total = max(max(r[2] + r[3] for r in instance_ranges), 2)
    h_total = max(max(-(-r[1] // 32) for r in instance_ranges), 2)
    scratch = [
        pltpu.SMEM((s_total,), jnp.int32),
        pltpu.SMEM((s_total,), jnp.float32),
        pltpu.SMEM((c_total,), jnp.int32),
        pltpu.VMEM((8, 128), jnp.int32),  # OR-tree staging (or_tree)
        pltpu.SMEM((32 * 6,), jnp.float32),  # chunk box stash
        pltpu.VMEM((8, 128), jnp.float32),  # max-tree staging (occl. skip)
        pltpu.SMEM((2,), jnp.int32),  # survivor-count + max-dirty cells
        pltpu.SMEM((h_total,), jnp.int32),  # surviving-hyper list (A0)
        pltpu.SMEM((h_total,), jnp.float32),  # hyper sort keys (A0)
        pltpu.VMEM((11 * ROWS, 128), jnp.float32),
    ]
    if stream:
        scratch += [
            # STREAM_PIPE-deep cluster staging (8 rows per slot)
            pltpu.VMEM((8 * _tp.STREAM_PIPE, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((_tp.STREAM_PIPE,)),
        ]
    gis_t = () if gis is None else (gis,)
    gis_specs = [] if gis is None else [smem]
    vma = _tp.out_vma(*ray_in[0], *carry_t, inst_rows, mat_rows, sun,
                      *gis_t, scab, clab, *hyper, *geo)
    inputs = _tp.align_vma(vma, *ray_in[0], *carry_t, inst_rows, mat_rows,
                           sun, *gis_t, scab, clab, *hyper, *geo)
    big = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, n_out * ROWS, 128), jnp.float32, vma=vma
        ),
        in_specs=ray_in[1] + carry_specs + [full, full, smem] + gis_specs
        + [full, full] + [full] * len(hyper) + geo_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
        interpret=interpret,
    )(
        *inputs,
    )
    fld3 = lambda k: big[:, k * ROWS : (k + 3) * ROWS, :]
    # result, miss_energy, miss_dir blocks (+ the raw deferred-texel blocks,
    # or the continuation-state blocks when carry_out)
    extra = big[:, 9 * ROWS :, :] if (atlas_mode or carry_out) else None
    return fld3(0), fld3(3), fld3(6), extra


def rebin_key(dm, om):
    """int32 row re-bin sort key: direction octant (bits 18-20) | wrapped
    coarse origin cell (18 low bits, 6 per axis). Built in integer space so
    large |origin| can neither cross octant strata nor lose exactness the
    way an f32 ``octant*65536 + cell`` key could past |o| ~ 4096; the
    64-cell/axis wrap only aliases distant cells within an octant, which
    merely reshuffles the permutation (results are order-independent)."""
    octant = (
        (dm[0] > 0) * 4 + (dm[1] > 0) * 2 + (dm[2] > 0)
    ).astype(jnp.int32)
    cell = jnp.zeros_like(octant)
    for c in range(3):
        cc = jnp.floor(om[c] * 0.25).astype(jnp.int32) & 63
        cell = (cell << 6) | cc
    return (octant << 18) | cell


def fused_path_preferred(scene: Scene) -> bool:
    """Perf CHOICE between the two correct paths (render.bounce_loop calls
    this after :func:`fused_path_available`). Measured 1080p/2-bounce
    (2026-08-21, v5e): the fused kernel wins everywhere — headline 3.2 vs
    16.8 ms, 1M-tri streamed 76 vs 201, 1M atlas 85 vs 199, resident atlas
    ~tied — EXCEPT moderate-cluster streamed ATLAS scenes (the museum
    class: <= FUSED_ROWS_STREAM_MAX_CLUSTERS clusters, r64 tiles, high hit
    rate), where per-bounce deferred-block writes + the resolve's winner
    re-DMA outweigh the saved shading fusions: two-phase 57.7 vs fused
    69.4 ms. Both paths agree to float precision (tests/test_trace.py)."""
    from clraytracer_tpu.ops.shade import _all_procedural

    clusters = scene.clusters
    if clusters is None:
        return False
    if _table_bytes(clusters) <= _tp.VMEM_TABLE_BUDGET:
        return True
    if _all_procedural(scene):
        return True
    return clusters.tri_a.shape[0] > FUSED_ROWS_STREAM_MAX_CLUSTERS


def split_rebin_preferred(scene: Scene) -> bool:
    """Auto gate for render_fused_camera's ``split_rebin`` — currently OFF
    for every scene class (measured 2026-08-21, v5e, 1080p): on the
    1M-tri streamed sphere it read 52.2 vs 54.5 Mrays/s unsplit.
    Reflections off a smooth convex surface stay COHERENT per tile
    (neighboring primaries reflect to neighboring directions), so
    re-binning buys no culling there, while the 19-block state round-trip
    + 19 row gathers cost ~2 ms — and that scene's bounce-2 cost is
    dominated by local leaf tests around each ray's own origin (rays
    start ON the surface, so nearby cluster AABBs pass the slab test
    regardless of tile grouping). The divergent-secondary win that
    motivated this (museum 57.6 -> 32.8 ms) lives on the two-phase path
    (render._trace_row_binned), whose scene class (streamed atlas) never
    reaches the fused kernel. Kept as an explicit opt-in
    (``split_rebin=True``) for mixed-surface procedural scenes;
    bit-exactness is pinned by tests/test_trace.py."""
    del scene
    return False


def fused_path_available(scene: Scene, reference_parity: bool,
                         integer_colors: bool) -> bool:
    """Static eligibility of the fused megakernel for this scene/config.

    Scenes where every texture is procedural shade fully in-kernel (their
    material rows are selected by a static in-kernel loop, so the material
    count is bounded); all others use the kernel's deferred-texel atlas
    modes — mode 2 reads no material data in-kernel at all, so any
    material count works there."""
    from clraytracer_tpu.ops.shade import _all_procedural

    return (
        reference_parity
        and integer_colors
        and scene.packed is not None
        and scene.clusters is not None
        and (
            _table_bytes(scene.clusters) <= _tp.VMEM_TABLE_BUDGET
            or scene.clusters.geo_stream is not None  # HBM-streamed tables
        )
        and (
            scene.materials.count <= MAX_FUSED_MATERIALS
            or not _all_procedural(scene)
        )
    )


def _finish_frame(
    scene: Scene,
    res: Array,  # [3, rows, 128] in-kernel radiance (spec_light only in
    #   atlas modes; full hit shading otherwise)
    men: Array,  # [3, rows, 128] throughput at first miss
    mdir: Array,  # [3, rows, 128] direction at first miss
    extra: Array | None,  # [T, K*B*ROWS, 128] deferred blocks (K = 7 or 6)
    n_tiles: int,
    rows: int,
    bounces: int,
    atlas_mode: int = 0,
    gi: bool = False,
) -> Array:
    """Shared XLA tail of the fused frame: deferred texel fetch per bounce
    when ``extra`` is present, then the deferred skybox add.

    Mode 1 blocks carry ready pool indices + material bytes from the
    kernel; mode 2 carries material ids — the material row is fetched
    here with one one-hot MXU gather and the pool index computed in i32
    (shade._pool_index expression; offsets exceed f32's 2^24 range on
    ~100 MB pools). Either way ONE combined texel row gather serves all
    bounces + sky, then the integer modulate and coefficient multiply.
    All texel/material values come from the same table rows the two-phase
    path gathers, so results agree to float precision."""
    from clraytracer_tpu.ops.gather import onehot_rows, take_rgb
    from clraytracer_tpu.ops.shade import (
        _OFF_SHIFT,
        _eval_skybox_inline,
        _skybox_index,
    )

    pk = scene.packed
    sky_idx = _skybox_index(pk.skybox_w, pk.skybox_h, pk.skybox_off, mdir)
    if extra is not None:
        K = (7, 6)[atlas_mode - 1] + (3 if gi else 0)
        rows_total = res.shape[1]

        # field row-block k as [rows_total, 128]: a pure reshape of the
        # kernel's native tile-major [T, K*B*ROWS, 128] output (the old
        # whole-array transpose to [K*B, rows_total, 128] materialized a
        # 2.8 ms relayout at 1080p, profiled)
        def blk(k: int) -> Array:
            return extra[:, k * rows : (k + 1) * rows, :].reshape(
                rows_total, 128
            )

        def blk3(k: int) -> Array:  # [3, rows_total, 128]
            return jnp.stack([blk(k), blk(k + 1), blk(k + 2)])

        if atlas_mode == 1:
            raw = jnp.stack(
                [
                    jax.lax.bitcast_convert_type(blk(K * b), jnp.int32)
                    for b in range(bounces)
                ]
            )
            miss_all = raw < 0
            hit_all = raw >= 0  # (dead lanes emit 0: P-safe, coefs zero)
            tex_idx = raw
            mats = [blk3(K * b + 1) for b in range(bounces)]
            coefs = [blk3(K * b + 4) for b in range(bounces)]
            # ambient coefficients: emitted by the kernel only in GI mode
            # (K covers them only then)
            coefs_a = [blk3(K * b + 7) for b in range(bounces)] if gi else None
        else:
            # one one-hot material-row gather over every bounce's lanes
            # (the -1 miss / -2 dead sentinels clamp to row 0, whose
            # values are discarded by the zero coefficients)
            mid_all = jnp.stack([blk(K * b) for b in range(bounces)])
            mat = onehot_rows(
                pk.mat_rows, mid_all.astype(jnp.int32)
            )  # [16, B, rows, 128]
            aw, ah = mat[8], mat[9]
            off_i = mat[10].astype(jnp.int32) * (
                1 << _OFF_SHIFT
            ) + mat[11].astype(jnp.int32)  # hi/lo split (ops/shade.py)
            uu = jnp.stack([blk(K * b + 1) for b in range(bounces)])
            vv = jnp.stack([blk(K * b + 2) for b in range(bounces)])
            # shade._pool_index, op for op (wrap + truncating scale)
            ui = ((uu - jnp.floor(uu)) * aw).astype(jnp.int32)
            vi = ((vv - jnp.floor(vv)) * ah).astype(jnp.int32)
            miss_all = mid_all == -1.0
            hit_all = mid_all >= 0.0
            tex_idx = jnp.where(
                hit_all,
                vi * aw.astype(jnp.int32) + ui + off_i,
                0,
            )
            mat_b = jnp.round(jnp.clip(mat[0:3], 0.0, 1.0) * 255.0)
            mats = [mat_b[:, b] for b in range(bounces)]
            coefs = [blk3(K * b + 3) for b in range(bounces)]
            coefs_a = [blk3(K * b + 6) for b in range(bounces)] if gi else None
        # lanes that missed at this bounce (sentinel -1 / mid -1) fetch
        # their skybox texel through the SAME combined gather — a lane
        # misses at most once, so summing the miss-masked texels
        # reconstructs the sky color each ray saw. All bounces + sky share
        # ONE gather: a second separate gather fell off XLA's scoped-VMEM
        # staging path and read HBM at ~17 ns/row (measured 35.7 vs
        # 3.75 ms, identical shapes, 1080p). Dead lanes pin to row 0 —
        # the gather is coherence-bound.
        idx_all = jnp.where(miss_all, sky_idx[None], tex_idx)  # [B, rows, 128]
        if pk.texels_u32 is not None:
            # large pool: flat packed-RGB8 gather (~7 ns/idx vs ~25 for the
            # un-staged [P, 4] row gather — measured 107 -> 30 ms on the
            # museum frame at 1080p) + byte unpack. texel = byte * (1/255)
            # is the pool's own construction formula, so values are
            # bit-identical to the row-gather path.
            word = jnp.take(pk.texels_u32, idx_all, mode="clip")
            tex_all = jnp.stack(
                [
                    (word & 0xFF).astype(jnp.float32) * _U8,
                    ((word >> 8) & 0xFF).astype(jnp.float32) * _U8,
                    ((word >> 16) & 0xFF).astype(jnp.float32) * _U8,
                ]
            )  # [3, B, rows, 128]
        else:
            tex_all = take_rgb(scene.atlas.texels, idx_all)
        # integer color modulate (shade._modulate_bytes, bit-exactly —
        # mats[b] carries the material's exact color bytes) and the
        # per-bounce coefficient multiply
        tex_b = jnp.round(tex_all * 255.0)
        colors = [
            jnp.floor(mats[b] * tex_b[:, b] * (1.0 / 256.0)) * _U8
            for b in range(bounces)
        ]
        sky = jnp.zeros_like(res)
        if gi:
            # GI energy is texel-dependent: fold the per-lane running color
            # product P back into the deferred coefficients (coefE rides
            # E*dif and needs x color_b x P_b; coefA = ambient needs
            # x color_b only; the sky a lane saw at its miss bounce is also
            # scaled by its P there)
            P = jnp.ones_like(res)
            for b in range(bounces):
                res = (
                    res
                    + coefs[b] * colors[b] * P
                    + coefs_a[b] * colors[b]
                )
                sky = jnp.where(
                    miss_all[b][None], sky + tex_all[:, b] * P, sky
                )
                P = jnp.where(hit_all[b][None], P * colors[b], P)
        else:
            for b in range(bounces):
                res = res + coefs[b] * colors[b]
                sky = jnp.where(miss_all[b][None], sky + tex_all[:, b], sky)
    else:
        sky = _eval_skybox_inline(scene, sky_idx, pk.skybox_w, pk.skybox_off)
    return res + sky * men


def _geo_inputs(clusters) -> tuple[bool, tuple]:
    """(stream?, geometry arrays) for _render_tiles — streamed when the
    tables exceed the VMEM budget (requires clusters.geo_stream)."""
    stream = _table_bytes(clusters) > _tp.VMEM_TABLE_BUDGET
    if stream:
        assert clusters.geo_stream is not None
        return True, (clusters.geo_stream,)
    return False, (
        clusters.tri_a, clusters.tri_b, clusters.tri_c,
        clusters.at_a, clusters.at_b, clusters.at_c, clusters.at_d,
    )


def _gi_seed_rows(gi_seed, bounces: int) -> Array | None:
    """Per-bounce GI seed bases as a TRACED [1, bounces] i32 SMEM row:
    ``1 + gi_seed*7919 + b*1237`` in wrapping i32 (bit-identical to the XLA
    path's uint32 arithmetic, ops/rng.py). Traced so every supersample seed
    reuses ONE compiled kernel (a static seed recompiled per sample)."""
    if gi_seed is None:
        return None
    return (
        jnp.int32(1)
        + jnp.asarray(gi_seed, jnp.int32) * jnp.int32(7919)
        + jnp.arange(bounces, dtype=jnp.int32) * jnp.int32(1237)
    ).reshape(1, bounces)


def render_fused(
    scene: Scene,
    origin: Array,  # [3, rows, 128] ray-linear (screen-tile order)
    direction: Array,  # [3, rows, 128]
    sun_angle: Array,
    bounces: int,
    rows: int | None = None,
    enable_shadows: bool = False,
    gi_seed: int | None = None,
) -> Array:
    """Full bounce loop in one kernel → [3, rows, 128] radiance (pre-post).

    Callers must check :func:`fused_path_available` first. ``rows`` overrides
    the kernel tile height (must divide the caller's screen-tile rows: a
    64-row screen tile processed as two 32-row kernel tiles still covers
    two stacked 32x128-PIXEL rectangles, so culling locality is preserved).
    """
    from clraytracer_tpu.ops.shade import _OFF_SHIFT, _all_procedural

    rows_total = origin.shape[1]
    n = rows_total * 128
    clusters = scene.clusters
    ROWS = (
        rows if rows is not None
        else min(_fused_rows_default(clusters), _tile_rows(n))
    )
    while rows is None and rows_total % ROWS:
        ROWS //= 2  # rows_total is a multiple of 8, so this terminates
    n_tiles = rows_total // ROWS
    assert n_tiles * ROWS == rows_total, (rows_total, ROWS)

    mesh_idx, _, _, _ = _instance_tables(scene)
    ranges = tuple(clusters.mesh_ranges[int(mi)] for mi in mesh_idx)
    atlas_mode = 0 if _all_procedural(scene) else (
        1 if scene.materials.count <= MAX_FUSED_MATERIALS else 2
    )
    tex_descs = () if atlas_mode else tuple(
        (off >> _OFF_SHIFT, off & ((1 << _OFF_SHIFT) - 1), desc)
        for _h, off, desc in scene.procedural_tex
    )

    rays6 = tuple(
        origin[c].reshape(n_tiles, ROWS, 128) for c in range(3)
    ) + tuple(direction[c].reshape(n_tiles, ROWS, 128) for c in range(3))
    sun = jnp.stack(
        [jnp.sin(sun_angle), jnp.cos(sun_angle)]
    ).astype(jnp.float32).reshape(1, 2)

    stream, geo = _geo_inputs(clusters)
    res, men, mdir, extra = _render_tiles(
        rays6,
        None,
        scene.packed.inst_rows,
        scene.packed.mat_rows,
        sun,
        clusters.super_aabb,
        clusters.cluster_aabb,
        geo,
        ranges,
        ROWS,
        tex_descs,
        bounces,
        stream=stream,
        shadows=enable_shadows,
        atlas_mode=atlas_mode,
        hyper=(
            (clusters.hyper_aabb,) if clusters.hyper_aabb is not None else ()
        ),
        gis=_gi_seed_rows(gi_seed, bounces),
    )

    def untile3(x: Array) -> Array:  # [T, 3*ROWS, 128] → [3, rows, 128]
        return (
            x.reshape(n_tiles, 3, ROWS, 128)
            .transpose(1, 0, 2, 3)
            .reshape(3, rows_total, 128)
        )

    res, men, mdir = untile3(res), untile3(men), untile3(mdir)

    # deferred texels (atlas mode) + deferred skybox: XLA-side gathers /
    # arctan2/arccos keep bit-parity with the two-phase/golden paths;
    # misses terminate rays, so one add suffices
    return _finish_frame(
        scene, res, men, mdir, extra, n_tiles, ROWS, bounces, atlas_mode,
        gi=gi_seed is not None,
    )


def render_fused_camera(
    scene: Scene,
    frame,  # render.FrameInputs
    width: int,
    height: int,
    bounces: int,
    rows: int | None = None,
    enable_shadows: bool = False,
    gi_seed: int | None = None,
    row0: Array | None = None,
    local_height: int | None = None,
    split_rebin: bool | None = None,
) -> tuple[Array, tuple[int, int, int]]:
    """Fused frame with **in-kernel raygen** → ([3, rows_total, 128]
    radiance in trows x 128 screen-strip order, (trows, tiles_x, tiles_y))
    — the same layout render._untile's "strip" branch inverts.

    The kernel derives each lane's pixel from its grid index and unprojects
    with camera matrices read from one SMEM row — the frame's only per-ray
    HBM traffic is the 9-field output block. Replaces ray_directions_tiled +
    render_fused for the flagship path; callers must check
    :func:`fused_path_available` first.

    ``row0``/``local_height``: render only the ``local_height``-row window
    starting at GLOBAL pixel row ``row0`` (traced) — the shard_map row
    shard's view of the frame (parallel/sharding.render_sharded). The
    unprojection still uses the full-frame ``height``, so a shard's pixels
    are bit-identical to the full frame's.

    ``split_rebin`` (None = auto via :func:`split_rebin_preferred`): run
    bounce 0 as one camera-mode invocation that also emits continuation
    state, re-bin whole ray ROWS by direction octant + origin cell (and
    compact fully-dead rows together, so pure-sky tiles skip traversal via
    the kernel's any(alive) early-out), then finish the remaining bounces
    in a second ray-mode invocation resumed from the carried state. The
    same divergent-secondary-ray fix render._trace_row_binned applies to
    the two-phase path, now without leaving the fused kernel. Bit-exact vs
    the unsplit kernel; gated to atlas_mode == 0, no GI (the in-kernel GI
    RNG streams are keyed by ORIGINAL row index, which a permuted second
    invocation would break).
    """
    from clraytracer_tpu.ops.shade import _OFF_SHIFT, _all_procedural

    win_height = local_height if local_height is not None else height
    trows = _tile_rows(width * win_height)
    tiles_x = -(-width // 128)
    tiles_y = -(-win_height // trows)
    rows_total = tiles_y * tiles_x * trows
    clusters = scene.clusters
    ROWS = (
        rows if rows is not None
        else min(_fused_rows_default(clusters), trows)
    )
    while rows is None and trows % ROWS:
        ROWS //= 2  # trows is a multiple of 8, so this terminates
    n_tiles = rows_total // ROWS
    assert n_tiles * ROWS == rows_total and trows % ROWS == 0, (
        rows_total, trows, ROWS,
    )

    mesh_idx, _, _, _ = _instance_tables(scene)
    ranges = tuple(clusters.mesh_ranges[int(mi)] for mi in mesh_idx)
    atlas_mode = 0 if _all_procedural(scene) else (
        1 if scene.materials.count <= MAX_FUSED_MATERIALS else 2
    )
    tex_descs = () if atlas_mode else tuple(
        (off >> _OFF_SHIFT, off & ((1 << _OFF_SHIFT) - 1), desc)
        for _h, off, desc in scene.procedural_tex
    )

    cam_vec = jnp.concatenate(
        [
            jnp.asarray(frame.inverse_projection, jnp.float32).reshape(-1),
            jnp.asarray(frame.inverse_view, jnp.float32).reshape(-1),
            jnp.asarray(frame.camera_position, jnp.float32).reshape(-1),
            jnp.zeros((1,), jnp.float32) if row0 is None
            else jnp.asarray(row0, jnp.float32).reshape(1),
        ]
    ).reshape(1, 36)
    sun = jnp.stack(
        [jnp.sin(frame.sun_angle), jnp.cos(frame.sun_angle)]
    ).astype(jnp.float32).reshape(1, 2)

    stream, geo = _geo_inputs(clusters)
    if split_rebin is None:
        split_rebin = split_rebin_preferred(scene)
    split_rebin = (
        split_rebin and bounces >= 2 and atlas_mode == 0 and gi_seed is None
    )
    common = dict(
        stream=stream,
        hyper=(
            (clusters.hyper_aabb,) if clusters.hyper_aabb is not None else ()
        ),
    )
    tables = (
        scene.packed.inst_rows, scene.packed.mat_rows, sun,
        clusters.super_aabb, clusters.cluster_aabb, geo, ranges, ROWS,
        tex_descs,
    )
    res, men, mdir, extra = _render_tiles(
        (),
        cam_vec,
        *tables,
        1 if split_rebin else bounces,
        cam=(trows, tiles_x, width, height),
        n_tiles=n_tiles,
        shadows=enable_shadows,
        atlas_mode=atlas_mode,
        gis=None if split_rebin else _gi_seed_rows(gi_seed, bounces),
        carry_out=split_rebin,
        **common,
    )

    def untile3(x: Array) -> Array:  # [T, 3*ROWS, 128] → [3, rows, 128]
        return (
            x.reshape(n_tiles, 3, ROWS, 128)
            .transpose(1, 0, 2, 3)
            .reshape(3, rows_total, 128)
        )

    if split_rebin:
        # ---- bounce-boundary row re-binning (see the docstring) ---------
        # continuation blocks: o(3) | d(3) | energy(3) | alive(1)
        rows_of = lambda x, k: (
            x[:, k * ROWS : (k + 1) * ROWS, :].reshape(rows_total, 128)
        )
        o_r = [rows_of(extra, c) for c in range(3)]
        d_r = [rows_of(extra, 3 + c) for c in range(3)]
        e_r = [rows_of(extra, 6 + c) for c in range(3)]
        al_r = rows_of(extra, 9)
        # per-row sort key: direction octant then coarse origin cell
        # (render._trace_row_binned's expression); fully-dead rows key
        # past every live octant so whole tiles of them skip traversal
        dm = [jnp.sign(d_r[c]).mean(axis=1) for c in range(3)]
        om = [o_r[c].mean(axis=1) for c in range(3)]
        key = jnp.where(
            al_r.max(axis=1) > 0.5,
            rebin_key(dm, om),
            jnp.int32(0x7FFFFFFF),
        )
        perm = jnp.argsort(key)
        inv = jnp.argsort(perm)
        tile_rows = lambda xs: tuple(
            x[perm].reshape(n_tiles, ROWS, 128) for x in xs
        )
        rays6 = tile_rows(o_r) + tile_rows(d_r)
        # carry layout: result(3) | men(3) | mdir(3) | energy(3) | alive(1)
        carry_fields = (
            [rows_of(res, c) for c in range(3)]
            + [rows_of(men, c) for c in range(3)]
            + [rows_of(mdir, c) for c in range(3)]
            + e_r
            + [al_r]
        )
        carry = (
            jnp.stack([f[perm] for f in carry_fields])
            .reshape(13, n_tiles, ROWS, 128)
            .transpose(1, 0, 2, 3)
            .reshape(n_tiles, 13 * ROWS, 128)
        )
        res, men, mdir, _ = _render_tiles(
            rays6,
            None,
            *tables,
            bounces - 1,
            carry=carry,
            start_bounce=1,
            # in-kernel shadows are gated to global bounce 0 (gb == 0),
            # unreachable here with start_bounce=1 — forwarded anyway so the
            # dependency can't silently break if shadows ever extend past
            # bounce 0 (compiles identically today)
            shadows=enable_shadows,
            **common,
        )
        unrows3 = lambda x: untile3(x)[:, inv]
        res, men, mdir = unrows3(res), unrows3(men), unrows3(mdir)
        extra = None
    else:
        res, men, mdir = untile3(res), untile3(men), untile3(mdir)
    img = _finish_frame(
        scene, res, men, mdir, extra, n_tiles, ROWS, bounces, atlas_mode,
        gi=gi_seed is not None,
    )
    return img, (trows, tiles_x, tiles_y)
