"""Pallas tile tracer: the TPU-native traversal megakernel.

Design (TPU-first replacement for per-thread stack traversal,
kernel_main.cl:124-160): the pixel grid is cut into **tiles of ROWS*128
rays** ([ROWS, 128] vector registers per component — large tiles amortize
the kernel's scalar-unit work over more rays); per tile the kernel runs
three phases per mesh instance, each a dense vector computation:

  A. Supercluster culling — exact per-ray slab tests against each
     supercluster AABB (32 clusters each); surviving supercluster indices are
     compacted into SMEM with a branch-free scalar scatter.
  B. Cluster culling — per-ray slab tests for the 32 clusters of each
     surviving supercluster; survivors compacted.

Phases A and B test boxes in **chunks of 32 with a per-lane bitmask**: each
box's hit mask sets bit k of a [ROWS, 128] i32 accumulator, ONE manual
OR-tree reduce (row folds + 7 lane rolls) collapses the chunk to a scalar
mask, and a scalar loop extracts survivor indices from its bits. A
cross-lane reduce costs ~2/3 of a slab test on the VPU, so the naive
slab+any-per-box loop pays 1.67 slab-units per box; the chunked form pays
~1.15 — and the static 32-slab unroll inside each chunk gives the compiler
ILP a serial traced-bound loop denies it (measured 4.3x on a 128-box
culling microbenchmark, 9.9 -> 2.3 ms over 255 tiles).
  C. Leaf intersection — for each surviving cluster, a statically unrolled
     batch of 32 Möller-Trumbore tests (triangle scalars at static column
     offsets), merged into per-ray best (t, u, v, tri, instance) — plus
     inline interpolation of the shading attributes (normal/uv/material)
     under the same accept mask, so shading needs no triangle gather at all.

No per-lane gathers, no stacks, no divergence: data-dependent work is skipped
at *tile* granularity via compacted index lists, which is exactly the control
the hardware gives us (scalar loops + dense vectors). Measured calibration:
~357 G tri-tests/s on a v5e — 1 Grays/s at ~350 tests/ray of total work.

Mosaic constraints honoured (discovered empirically, see repo history):
scalar VMEM reads must be [traced row, static column]; nested fori is legal
only with static bounds on the outer-traced combination — hence the flat
"j // 32, j % 32" loops; `lax.cond` nesting is avoided entirely.

Culling semantics: conservative (a box containing the ray origin still
passes, unlike the reference's tnear>0 quirk) — the Pallas path targets the
brute-force golden semantics; the wavefront/bvh tracers keep reference
bug-parity.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clraytracer_tpu import math3d
from clraytracer_tpu.ops.clusters import CLUSTER_SIZE, HYPER_SIZE, SUPER_SIZE
from clraytracer_tpu.ops.trace_ref import SceneHit, _instance_tables
from clraytracer_tpu.scene.types import MISS_DISTANCE, Scene

#: HBM-streaming DMA pipeline depth: cluster-geometry fetches kept in
#: flight during phase C (see the preflight comment in _emit_traversal).
#: 8 slots = 32 KiB of VMEM staging.
STREAM_PIPE = 8

#: instances with more superclusters than this cull through the
#: hypercluster level first (phase A0) — below it, direct phase A is at
#: most ~2 chunks and the extra level only adds work. Tests lower it to
#: exercise the hyper path on small scenes.
HYPER_MIN_SUPERS = 64

#: instances with more superclusters than this skip the exact O(na^2)
#: supercluster sort and rely on the hyper-granularity front-to-back
#: order alone (see the sort comment in _emit_traversal)
HYPER_SORT_MIN_SUPERS = 512

# The 32-wide bitmask chunking (one i32 of survivor bits per OR-tree) and
# the 32-super hyper grouping coincide throughout the phase-A0 indexing
# (hy0 = sc0 // 32, h_total sizing, chunk_a width under the hyper walk);
# changing HYPER_SIZE alone would silently misindex the hyper table.
assert HYPER_SIZE == 32, "phase A0 indexing assumes HYPER_SIZE == 32"

MAX_ROWS = 64  # sublane rows per tile: [64, 128] tiles measured fastest at
# 1080p (38.6 ms/frame vs 41.9 @ 32 rows, 43.1 @ 128, 68 @ 8) — bigger tiles
# amortize the kernel's scalar-unit work (25 scalar loads per tested
# triangle, any-reduces, serial counter chains) over more rays, until the
# working set outgrows VMEM headroom
TILE = MAX_ROWS * 128
_BIG = np.float32(MISS_DISTANCE)


def _tile_rows(n_rays: int) -> int:
    """Sublane rows per tile: MAX_ROWS for real frames, shrunk (multiple of
    8) for small renders/tests so one tile isn't mostly padding."""
    rows = -(-n_rays // 128)  # ceil
    rows = -(-rows // 8) * 8  # round up to a whole vreg
    return max(8, min(MAX_ROWS, rows))


def _emit_traversal(
    rays,  # (ox, oy, oz, dx, dy, dz) world-space registers [ROWS, 128]
    hit_ref,  # [>= 11*ROWS, 128] f32 ref — best-hit accumulator, layout:
    #   row blocks k*ROWS..(k+1)*ROWS = t | u | v | tri(i32 bitcast) |
    #   inst(i32 bitcast) | nx | ny | nz | uu | vv | mat_local.
    #   The ref doubles as the ACCUMULATOR: phase C updates it in place,
    #   which lets each leaf batch run under pl.when (occlusion skip) —
    #   register loop-carries cannot be updated from a predicated block.
    ROWS: int,
    instance_ranges,
    variant: str,
    inv_ref,  # [I, >=16] instance inverse transforms (row-major, row-vector)
    scab_ref,  # [S, 8] supercluster AABBs (min xyz @ 0..2, max xyz @ 3..5)
    clab_ref,  # [C, 8] cluster AABBs
    ta_ref,  # [C, 128] v0x|v0y|v0z|e1x (32 lanes each)
    tb_ref,  # [C, 128] e1y|e1z|e2x|e2y
    tc_ref,  # [C, 128] e2z|pad
    aa_ref,  # [C, 128] n0x|n0y|n0z|n1x (shading attrs)
    ab_ref,  # [C, 128] n1y|n1z|n2x|n2y
    ac_ref,  # [C, 128] n2z|uv0u|uv0v|uv1u
    ad_ref,  # [C, 128] uv1v|uv2u|uv2v|mat_local
    sc_scratch,  # SMEM [S_total] i32
    sk_scratch,  # SMEM [S_total] f32 supercluster min-tnear sort keys
    cl_scratch,  # SMEM [C_total] i32
    bits_scratch=None,  # VMEM [8, 128] i32 — OR-tree staging for the
    #   chunked phase A/B bitmask compaction (the reduced lane mask is
    #   written here so the scalar unit can read it back)
    bx_scratch=None,  # SMEM [32*6] f32 — the current chunk's box stash:
    #   phases A/B write each tested box's 6 scalars while unrolling (the
    #   packed AABB tables only support static-column reads); the sort-key
    #   and occlusion-recheck passes, whose box ids are fully traced, read
    #   from here
    live=None,  # optional [ROWS, 128] bool — lanes whose rays are still
    #   alive. Dead lanes get best_t = -BIG, which fails every slab test's
    #   ``tnear < best_t`` and every accept's ``t < best_t``: clusters whose
    #   only interested lanes are dead are culled like any other miss, so a
    #   mostly-terminated tile (bounce >= 2, shadow rays) pays phases A/B
    #   only for its surviving rays' geometry. None = all lanes live.
    stream=None,  # (geo_ref [8C, 128] ANY, buf_ref [16, 128] VMEM,
    #   sem_ref DMA[2]) — HBM-streamed cluster geometry for scenes whose
    #   tables exceed VMEM (see trace_pallas_streamed). When set, the
    #   ta..ad refs are unused (pass None): phase C double-buffers each
    #   surviving cluster's 4 KiB geometry row-block into ``buf_ref``
    #   (prefetch j+1 while intersecting j) and reads scalars from the
    #   buffer instead of the resident tables.
    fmx_scratch=None,  # VMEM [8, 128] f32 — max-tree staging for the
    #   supercluster occlusion skip (the tile's max best-t must reach the
    #   scalar unit)
    cnt_cell=None,  # SMEM [2] i32 — [0] survivor-count carry across the
    #   pl.when-guarded supercluster body (a predicated block cannot
    #   update a fori carry); [1] max-tree dirty flag (occlusion skip)
    hyab_ref=None,  # optional [ceil(H/16), 128] f32 hypercluster AABBs
    #   (phase A0; scenes/checkpoints without the table skip the level)
    hy_scratch=None,  # SMEM [H_max] i32 — surviving-hyper list (phase A0)
    hk_scratch=None,  # SMEM [H_max] f32 — hyper min-tnear sort keys
):
    """Emit the three-phase traversal over all instances into ``hit_ref``.

    Shared by the hit-record kernel (writes straight into the tile's output
    block) and the fused render kernel (writes into a VMEM scratch consumed
    by in-kernel shading, once per bounce).
    """
    n_instances = len(instance_ranges)
    if stream is not None:
        geo_ref, buf_ref, sem_ref = stream
        n_clusters_total = geo_ref.shape[0] // 8

        def _dma(c, slot):
            # clamp: under pl.when the predicate guards real-hardware
            # execution, but interpret mode evaluates guarded reads, and a
            # stale SMEM survivor entry must never address outside the
            # table either way
            c = jnp.clip(c, 0, n_clusters_total - 1)
            return pltpu.make_async_copy(
                geo_ref.at[pl.ds(c * 8, 8)],
                buf_ref.at[pl.ds(slot * 8, 8)],
                sem_ref.at[slot],
            )

        def _start_dma(c, slot):
            _dma(c, slot).start()

        def _wait_dma(c, slot):
            _dma(c, slot).wait()
    ox_w, oy_w, oz_w, dx_w, dy_w, dz_w = rays

    if live is None:
        hit_ref[0:ROWS, :] = jnp.full((ROWS, 128), _BIG, jnp.float32)
    else:
        # dead lanes: -BIG best_t culls everything (see ``live`` above);
        # callers mask their own consumption of t on dead lanes
        hit_ref[0:ROWS, :] = jnp.where(live, _BIG, -_BIG)
    hit_ref[ROWS : 11 * ROWS, :] = jnp.zeros((10 * ROWS, 128), jnp.float32)

    if True:  # keep the instance-loop indentation stable
        out_ref = hit_ref
        for inst in range(n_instances):
            sc0, sc_n, cl0, cl_n = instance_ranges[inst]
            m = [inv_ref[inst, c] for c in range(16)]
            # object-space ray: o' = o @ M + M[3,:], d' = d @ M (row-vector)
            ox = ox_w * m[0] + oy_w * m[4] + oz_w * m[8] + m[12]
            oy = ox_w * m[1] + oy_w * m[5] + oz_w * m[9] + m[13]
            oz = ox_w * m[2] + oy_w * m[6] + oz_w * m[10] + m[14]
            dx = dx_w * m[0] + dy_w * m[4] + dz_w * m[8]
            dy = dx_w * m[1] + dy_w * m[5] + dz_w * m[9]
            dz = dx_w * m[2] + dy_w * m[6] + dz_w * m[10]
            idx = 1.0 / dx
            idy = 1.0 / dy
            idz = 1.0 / dz

            # NOTE the (box - o) * inv_d form is load-bearing: hoisting the
            # origin term as box*inv_d + (-o*inv_d) turns axis-parallel rays
            # (inv_d = inf — every shadow ray has d.x == 0) into inf - inf
            # = NaN, which culls clusters that genuinely occlude. Measured
            # no speedup from the FMA form anyway.
            def _slab_core(b, bt):
                """(hit mask, tnear) from 6 box scalars (min xyz, max xyz)."""
                t0x = (b[0] - ox) * idx
                t1x = (b[3] - ox) * idx
                t0y = (b[1] - oy) * idy
                t1y = (b[4] - oy) * idy
                t0z = (b[2] - oz) * idz
                t1z = (b[5] - oz) * idz
                tnear = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.minimum(t0z, t1z),
                )
                tfar = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.maximum(t0z, t1z),
                )
                hit = (tnear <= tfar) & (tfar > 0.0) & (tnear < bt)
                return hit, tnear

            def slab_hits(ref, base16, off, k, bt, stash=None):
                """Conservative slab test of box ``base16 + off + k`` from a
                packed 16-boxes-per-row AABB table (scene/builder.py pad8).

                Mosaic only compiles scalar VMEM reads at [traced row,
                STATIC column], and it cannot prove a traced expression is
                a multiple of 16 — so the split is done in PYTHON here:
                ``base16`` is a traced value that is a multiple of 16 by
                construction (chunk_index * 32), ``off``/``k`` are python
                ints, and the packed column ((off + k) % 16) * 8 + c is a
                compile-time constant. Callers with fully-traced box ids
                read a chunk's SMEM ``stash`` instead (written here: 6
                scalar stores per box, hidden under the ~170 vector cycles
                of the test)."""
                row = base16 // 16 + (off + k) // 16
                col = ((off + k) % 16) * 8  # python-static
                b = [ref[row, col + c] for c in range(6)]
                if stash is not None:
                    for c in range(6):
                        stash[k * 6 + c] = b[c]
                return _slab_core(b, bt)

            def slab_hits_stash(stash, k, bt):
                """Slab test from a chunk's SMEM box stash (fully traced
                index — SMEM supports it, packed VMEM does not)."""
                return _slab_core([stash[k * 6 + c] for c in range(6)], bt)

            # best_t from previous instances: constant through phases A/B
            bt_in = out_ref[0:ROWS, :]

            def or_tree(bits):
                """[ROWS, 128] i32 → scalar OR of every lane, via row folds
                + 7 lane rolls staged through ``bits_scratch`` (the only way
                a vector value reaches the scalar unit)."""
                acc = bits[0:8, :]
                for i in range(1, ROWS // 8):
                    acc = acc | bits[8 * i : 8 * (i + 1), :]
                acc = acc[0:4, :] | acc[4:8, :]
                acc = acc[0:2, :] | acc[2:4, :]
                acc = acc[0:1, :] | acc[1:2, :]
                for sh in (64, 32, 16, 8, 4, 2, 1):
                    acc = acc | pltpu.roll(acc, sh, 1)
                bits_scratch[0:1, :] = acc
                return bits_scratch[0, 0]

            # i32(1 << k) constants (bit 31 wraps negative; harmless)
            BITS = tuple(
                int(np.int32(np.uint32(1) << np.uint32(k))) for k in range(32)
            )

            # ---- phase A: supercluster culling (chunks of <=32) -----------
            # sc_n is static, so the last (or only) chunk unrolls exactly
            # the real box count — an instance with 4 superclusters pays 4
            # slab tests per tile, not a full 32-wide chunk.
            def chunk_a(ci, cnt, width):
                bits = jnp.zeros((ROWS, 128), jnp.int32)
                for k in range(width):  # static unroll: ILP across slabs
                    hit, _ = slab_hits(
                        scab_ref, ci * 32, sc0, k, bt_in, stash=bx_scratch
                    )
                    # mask per-mesh hyper-padding supers by COUNT: their
                    # inverted-empty boxes (+BIG/-BIG) pass the
                    # conservative slab test (tnear -BIG <= tfar +BIG),
                    # and extracting them overflows sc_scratch (sized to
                    # the real count). Direct phase A unrolls exact widths
                    # so the guard only bites on the hyper path.
                    bitv = jnp.where(
                        ci * 32 + k < sc_n, jnp.int32(BITS[k]), 0
                    )
                    bits = bits | jnp.where(hit, bitv, 0)
                m = or_tree(bits)
                cnt0 = cnt

                def extract(k, cnt):
                    keep = ((m >> k) & 1) == 1
                    slot = jnp.minimum(cnt, sc_scratch.shape[0] - 1)
                    sc_scratch[slot] = jnp.where(
                        keep, ci * 32 + k, sc_scratch[slot]
                    )
                    return cnt + keep.astype(jnp.int32)

                cnt = jax.lax.fori_loop(0, width, extract, cnt)

                # survivors' min-tnear sort keys, from this chunk's SMEM box
                # stash (recomputed per survivor: na is small, and this
                # keeps the chunk loop free of min-reduces)
                def key_pass(i, _):
                    hit, tnear = slab_hits_stash(
                        bx_scratch, sc_scratch[i] - ci * 32, bt_in
                    )
                    sk_scratch[i] = jnp.min(jnp.where(hit, tnear, _BIG))
                    return _

                jax.lax.fori_loop(cnt0, cnt, key_pass, jnp.int32(0))
                return cnt

            use_hyper = hyab_ref is not None and sc_n > HYPER_MIN_SUPERS
            if use_hyper:
                # ---- phase A0: hypercluster culling (32 supers per box) --
                # Same chunked bitmask form one level up: surviving hypers
                # are extracted WITH min-tnear keys, bubble-sorted (nh is
                # ~na/32, so this replaces the O(na^2) supercluster sort —
                # measured 8.6 ms/trace on the 1M-tri scene), then each
                # hyper in front-to-back order runs its 32-super chunk_a
                # via the SMEM count cell (predicated blocks cannot update
                # a fori carry). Supers then emerge hyper-ordered; within
                # a 32-super group they keep index order, which is spatial
                # (BVH leaf order) — the per-super occlusion skip below
                # stays exact either way (its key is a valid lower bound
                # independent of processing order). Per-mesh super padding
                # (ops/clusters.py) makes every hyper group exactly 32
                # wide; pad supers are masked by count in chunk_a.
                assert sc0 % 32 == 0, "hyper path needs 32-aligned sc0"
                hy0 = sc0 // 32
                n_hyper = -(-sc_n // HYPER_SIZE)

                def hyper_chunk(ci, cnt, width):
                    bits = jnp.zeros((ROWS, 128), jnp.int32)
                    for k in range(width):  # static unroll
                        hit, _ = slab_hits(
                            hyab_ref, ci * 32, hy0, k, bt_in,
                            stash=bx_scratch,
                        )
                        bits = bits | jnp.where(hit, jnp.int32(BITS[k]), 0)
                    m = or_tree(bits)
                    cnt0 = cnt

                    def hextract(k, cnt):
                        keep = ((m >> k) & 1) == 1
                        slot = jnp.minimum(cnt, hy_scratch.shape[0] - 1)
                        hy_scratch[slot] = jnp.where(
                            keep, ci * 32 + k, hy_scratch[slot]
                        )
                        return cnt + keep.astype(jnp.int32)

                    cnt = jax.lax.fori_loop(0, width, hextract, cnt)

                    def hkey_pass(i, _):
                        hit, tnear = slab_hits_stash(
                            bx_scratch, hy_scratch[i] - ci * 32, bt_in
                        )
                        hk_scratch[i] = jnp.min(jnp.where(hit, tnear, _BIG))
                        return _

                    jax.lax.fori_loop(cnt0, cnt, hkey_pass, jnp.int32(0))
                    return cnt

                nh = jnp.int32(0)
                if n_hyper > 32:
                    nh = jax.lax.fori_loop(
                        0,
                        n_hyper // 32,
                        lambda ci, cnt: hyper_chunk(ci, cnt, 32),
                        nh,
                    )
                if n_hyper % 32:
                    nh = hyper_chunk(
                        jnp.int32(n_hyper // 32), nh, n_hyper % 32
                    )

                # bubble-sort the surviving hypers by min-tnear
                hstride = jnp.maximum(nh - 1, 1)

                def hsort_pass(j, _):
                    i = j % hstride
                    k_i, k_j = hk_scratch[i], hk_scratch[i + 1]
                    s_i, s_j = hy_scratch[i], hy_scratch[i + 1]
                    swap = (k_j < k_i) & (i + 1 < nh)
                    hk_scratch[i] = jnp.where(swap, k_j, k_i)
                    hk_scratch[i + 1] = jnp.where(swap, k_i, k_j)
                    hy_scratch[i] = jnp.where(swap, s_j, s_i)
                    hy_scratch[i + 1] = jnp.where(swap, s_i, s_j)
                    return _

                jax.lax.fori_loop(0, nh * hstride, hsort_pass, jnp.int32(0))

                if variant == "culla0":  # perf analysis: culling level only
                    continue

                # walk sorted hypers; each runs its 32-super chunk_a, so
                # supers reach the per-super occlusion skip below in
                # (approximate) front-to-back order. No occlusion skip at
                # THIS level: phase C hasn't run for this instance yet, so
                # best-t is still the previous instances' — the per-super
                # skip (which runs interleaved with phase C) is where
                # occlusion bites.
                na = jax.lax.fori_loop(
                    0,
                    nh,
                    lambda jj, cnt: chunk_a(hy_scratch[jj], cnt, 32),
                    jnp.int32(0),
                )
            else:
                na = jnp.int32(0)
                if sc_n > 32:
                    na = jax.lax.fori_loop(
                        0,
                        sc_n // 32,
                        lambda ci, cnt: chunk_a(ci, cnt, 32),
                        na,
                    )
                if sc_n % 32:
                    na = chunk_a(jnp.int32(sc_n // 32), na, sc_n % 32)

                if variant == "culla0":  # perf analysis: phase A, no sort
                    continue

            if not use_hyper or sc_n <= HYPER_SORT_MIN_SUPERS:
                # ---- front-to-back: bubble-sort survivors by min-tnear ----
                # A flat na*(na) scalar compare-swap pass in SMEM; the exact
                # order gives phase C's occlusion skip its bite: near
                # superclusters set best_t before far ones are rechecked.
                # (Nested traced-bound fori crashes Mosaic; the bubble is
                # one flat loop with j % stride index math.) Past
                # HYPER_SORT_MIN_SUPERS the O(na^2) cost outgrows the
                # B/C savings (8.6 ms/trace on the 1M-tri scene) and the
                # hyper-granularity order above stands alone — measured:
                # museum (150-super meshes) NEEDS the exact sort (82 vs
                # 66 Mrays/s), the 33k-cluster sphere must skip it.
                stride = jnp.maximum(na - 1, 1)

                def sort_pass(j, _):
                    i = j % stride
                    k_i, k_j = sk_scratch[i], sk_scratch[i + 1]
                    s_i, s_j = sc_scratch[i], sc_scratch[i + 1]
                    # never swap a stale entry beyond the survivor count in
                    swap = (k_j < k_i) & (i + 1 < na)
                    sk_scratch[i] = jnp.where(swap, k_j, k_i)
                    sk_scratch[i + 1] = jnp.where(swap, k_i, k_j)
                    sc_scratch[i] = jnp.where(swap, s_j, s_i)
                    sc_scratch[i + 1] = jnp.where(swap, s_i, s_j)
                    return _

                jax.lax.fori_loop(0, na * stride, sort_pass, jnp.int32(0))

            if variant == "culla":  # perf analysis: phase A + sort only
                continue

            # ---- phases B+C, interleaved per supercluster -----------------
            # Each surviving supercluster (walked in the sorted front-to-
            # back order) runs its 32-cluster bitmask cull and IMMEDIATELY
            # intersects its surviving clusters — so the NEXT supercluster's
            # cluster culling tests against a best-t already tightened by
            # everything in front of it. With the old B-then-C split, phase
            # B compared against the best-t from *previous instances only*:
            # on a single-instance interior (sponza is one 95k-tri mesh) it
            # had no occlusion term at all and tested every cluster along
            # the whole view corridor (measured 90/242 ms for bounce 1/2 of
            # the museum frame at 1080p).
            width_b = min(SUPER_SIZE, cl_n)  # static: tiny meshes unroll less

            # Deferred attribute interpolation: phase C tracks only
            # (t, u, v, tri, inst); the 16 attribute loads + ~26 interp/
            # select vector ops per TESTED triangle move to a post-pass over
            # WINNING clusters only (typically 1-3 per tile vs 5-15 tested).
            # The streamed path re-DMAs each winner's geometry row-block —
            # a handful of 4 KiB fetches per tile against the ~18 ms/bounce
            # the inline interpolation cost at 1080p on the museum scene.
            defer = variant == "full"
            phase_c_variant = "noattr" if defer else variant

            def phase_c(j, end, s):
                # ``end`` (loop carry, constant) is this supercluster's
                # survivor-range end — the DMA prefetch horizon; ``s`` its
                # (traced) supercluster index, for the SMEM box-stash read.
                c = cl_scratch[j]
                dslot = jax.lax.rem(j, STREAM_PIPE)  # DMA pipeline slot
                if stream is not None:
                    # prefetch j+STREAM_PIPE-1 into the slot iteration j-1
                    # just consumed, then wait for j — the next clusters'
                    # DMAs ride under this one's batch. The wait is
                    # UNCONDITIONAL (outside the occlusion skip): every
                    # started DMA must be consumed exactly once or the
                    # slot's semaphore carries residue into the next use
                    # (data race with the scalar reads).
                    @pl.when(j + STREAM_PIPE - 1 < end)
                    def _prefetch():
                        # clamp: interpret mode evaluates guarded reads,
                        # and the index can reach the scratch size
                        nxt = jnp.minimum(
                            j + STREAM_PIPE - 1, cl_scratch.shape[0] - 1
                        )
                        _start_dma(
                            cl_scratch[nxt],
                            jax.lax.rem(j + STREAM_PIPE - 1, STREAM_PIPE),
                        )

                    _wait_dma(c, dslot)
                bt_run = out_ref[0:ROWS, :]
                any_live, _ = slab_hits_stash(
                    bx_scratch, c - cl0 - s * SUPER_SIZE, bt_run
                )

                @pl.when(jnp.any(any_live))
                def _batch():
                    bt = bt_run
                    btri = jax.lax.bitcast_convert_type(
                        out_ref[3 * ROWS : 4 * ROWS, :], jnp.int32
                    )
                    binst = jax.lax.bitcast_convert_type(
                        out_ref[4 * ROWS : 5 * ROWS, :], jnp.int32
                    )
                    if phase_c_variant == "geom":
                        battr = ()
                    elif phase_c_variant == "noattr":
                        battr = (
                            out_ref[ROWS : 2 * ROWS, :],
                            out_ref[2 * ROWS : 3 * ROWS, :],
                        )
                    else:
                        battr = (
                            out_ref[ROWS : 2 * ROWS, :],
                            out_ref[2 * ROWS : 3 * ROWS, :],
                            out_ref[5 * ROWS : 6 * ROWS, :],
                            out_ref[6 * ROWS : 7 * ROWS, :],
                            out_ref[7 * ROWS : 8 * ROWS, :],
                            out_ref[8 * ROWS : 9 * ROWS, :],
                            out_ref[9 * ROWS : 10 * ROWS, :],
                            out_ref[10 * ROWS : 11 * ROWS, :],
                        )
                    if stream is None:
                        # resident tables: scalar loads [traced row c,
                        # static col] from the 7 VMEM tables
                        tabs = (ta_ref, tb_ref, tc_ref,
                                aa_ref, ab_ref, ac_ref, ad_ref)
                        g = lambda t, col: tabs[t][c, col]
                    else:
                        # streamed: same layout, table t = buffer row
                        # slot*8 + t (geo_stream packs the 7 tables as 8
                        # rows per cluster, scene/builder.py)
                        g = lambda t, col: buf_ref[dslot * 8 + t, col]
                    for k in range(CLUSTER_SIZE):
                        # plane-based intersection (ops/clusters.py layout):
                        # t from the triangle plane, u/v from the two
                        # barycentric planes evaluated at o + t*d
                        nx = g(0, k)
                        ny = g(0, 32 + k)
                        nz = g(0, 64 + k)
                        nw = g(0, 96 + k)
                        den = dx * nx + dy * ny + dz * nz
                        b_n = ox * nx + oy * ny + oz * nz + nw
                        t = b_n * (-1.0 / den)
                        ux = g(1, k)
                        uy = g(1, 32 + k)
                        uz = g(1, 64 + k)
                        uw = g(1, 96 + k)
                        u = (ox * ux + oy * uy + oz * uz + uw) + t * (
                            dx * ux + dy * uy + dz * uz
                        )
                        vx = g(2, k)
                        vy = g(2, 32 + k)
                        vz = g(2, 64 + k)
                        vw = g(2, 96 + k)
                        v = (ox * vx + oy * vy + oz * vz + vw) + t * (
                            dx * vx + dy * vy + dz * vz
                        )
                        # u <= 1 is implied by v >= 0 & u + v <= 1
                        ok = (
                            (t > 0.0)
                            & (t < bt)
                            & (u >= 0.0)
                            & (v >= 0.0)
                            & (u + v <= 1.0)
                        )
                        bt = jnp.where(ok, t, bt)
                        slot = c * CLUSTER_SIZE + k
                        btri = jnp.where(ok, slot, btri)
                        binst = jnp.where(ok, jnp.int32(inst), binst)
                        if phase_c_variant == "geom":
                            continue
                        if phase_c_variant == "noattr":
                            battr = (
                                jnp.where(ok, u, battr[0]),
                                jnp.where(ok, v, battr[1]),
                            )
                            continue
                        # attribute interpolation (same expression tree as
                        # the XLA path in shade_hits → bit-identical):
                        # w0*a0 + u*a1 + v*a2
                        w0 = 1.0 - u - v
                        n0x = g(3, k)
                        n0y = g(3, 32 + k)
                        n0z = g(3, 64 + k)
                        n1x = g(3, 96 + k)
                        n1y = g(4, k)
                        n1z = g(4, 32 + k)
                        n2x = g(4, 64 + k)
                        n2y = g(4, 96 + k)
                        n2z = g(5, k)
                        uv0u = g(5, 32 + k)
                        uv0v = g(5, 64 + k)
                        uv1u = g(5, 96 + k)
                        uv1v = g(6, k)
                        uv2u = g(6, 32 + k)
                        uv2v = g(6, 64 + k)
                        matl = g(6, 96 + k)
                        bu, bv, nx, ny, nz, uu, vv, mat = battr
                        battr = (
                            jnp.where(ok, u, bu),
                            jnp.where(ok, v, bv),
                            jnp.where(ok, n0x * w0 + n1x * u + n2x * v, nx),
                            jnp.where(ok, n0y * w0 + n1y * u + n2y * v, ny),
                            jnp.where(ok, n0z * w0 + n1z * u + n2z * v, nz),
                            jnp.where(ok, uv0u * w0 + uv1u * u + uv2u * v, uu),
                            jnp.where(ok, uv0v * w0 + uv1v * u + uv2v * v, vv),
                            jnp.where(ok, matl, mat),
                        )
                    as_f32 = lambda x: jax.lax.bitcast_convert_type(
                        x, jnp.float32
                    )
                    out_ref[0:ROWS, :] = bt
                    out_ref[3 * ROWS : 4 * ROWS, :] = as_f32(btri)
                    out_ref[4 * ROWS : 5 * ROWS, :] = as_f32(binst)
                    if phase_c_variant != "geom":
                        out_ref[ROWS : 2 * ROWS, :] = battr[0]
                        out_ref[2 * ROWS : 3 * ROWS, :] = battr[1]
                    if phase_c_variant == "full":
                        for fk, val in enumerate(battr[2:]):
                            out_ref[
                                (5 + fk) * ROWS : (6 + fk) * ROWS, :
                            ] = val

                return end

            def super_body(jj, s):
                """Cluster cull + leaf batches of supercluster ``s``; reads
                the survivor-count carry from ``cnt_cell`` (predicated
                blocks cannot update a fori carry)."""
                cnt = cnt_cell[0]
                # cluster cull vs the RUNNING best-t (tightened by the
                # superclusters already intersected in front of this one).
                # Reads past a mesh's last cluster land on the next mesh's
                # boxes (or the table's trailing empty pad) and are masked
                # by the c_local < cl_n bit below.
                bt_run = out_ref[0:ROWS, :]
                bits = jnp.zeros((ROWS, 128), jnp.int32)
                for k in range(width_b):  # static unroll
                    c_local = s * SUPER_SIZE + k
                    hit, _ = slab_hits(
                        clab_ref, s * SUPER_SIZE, cl0, k, bt_run,
                        stash=bx_scratch,
                    )
                    bitv = jnp.where(c_local < cl_n, jnp.int32(BITS[k]), 0)
                    bits = bits | jnp.where(hit, bitv, 0)
                m = or_tree(bits)
                cnt0 = cnt

                def extract(k, cnt):
                    keep = ((m >> k) & 1) == 1
                    # the write must stay in bounds even when every cluster
                    # of a whole-scratch instance survives (cnt can reach
                    # the scratch size): clamp the slot and rewrite its
                    # existing value when not keeping, so survivor entries
                    # are never clobbered
                    slot = jnp.minimum(cnt, cl_scratch.shape[0] - 1)
                    cl_scratch[slot] = jnp.where(
                        keep, cl0 + s * SUPER_SIZE + k, cl_scratch[slot]
                    )
                    return cnt + keep.astype(jnp.int32)

                cnt = jax.lax.fori_loop(0, width_b, extract, cnt)
                cnt_cell[0] = cnt
                if variant == "cull":  # perf analysis: culling only
                    return
                if stream is not None:
                    # kick this supercluster's DMA pipeline: up to
                    # STREAM_PIPE-1 survivors' geometry starts loading
                    # before the first batch needs it
                    for k in range(STREAM_PIPE - 1):

                        @pl.when(cnt0 + k < cnt)
                        def _preflight(k=k):
                            _start_dma(
                                cl_scratch[
                                    jnp.minimum(
                                        cnt0 + k, cl_scratch.shape[0] - 1
                                    )
                                ],
                                jax.lax.rem(cnt0 + k, STREAM_PIPE),
                            )

                jax.lax.fori_loop(
                    cnt0, cnt, lambda j, end: phase_c(j, end, s), cnt
                )
                # best_t may have tightened: invalidate the cached max
                cnt_cell[1] = jnp.int32(1)

            def super_pass(jj, carry):
                s = sc_scratch[jj]
                # ---- occlusion skip: the survivors are walked in sorted
                # min-tnear order, so once a supercluster's sort key (a
                # lower bound on any hit inside it) is at or past the
                # tile's max best-t, nothing inside it can win any lane —
                # skip its 32 cluster slabs + extraction for one max-tree
                # (amortizable: ~2/3 slab-test) + a scalar compare. On
                # occluded interiors most of the sorted tail skips.
                # The max-tree runs only when best_t may have changed
                # (cnt_cell[1], set by super_body): a long skipped tail
                # pays one cached-scalar compare per super, not a
                # cross-lane reduce each.
                @pl.when(cnt_cell[1] == 1)
                def _remax():
                    bt = out_ref[0:ROWS, :]
                    acc = bt[0:8, :]
                    for i in range(1, ROWS // 8):
                        acc = jnp.maximum(acc, bt[8 * i : 8 * (i + 1), :])
                    acc = jnp.maximum(acc[0:4, :], acc[4:8, :])
                    acc = jnp.maximum(acc[0:2, :], acc[2:4, :])
                    acc = jnp.maximum(acc[0:1, :], acc[1:2, :])
                    for sh in (64, 32, 16, 8, 4, 2, 1):
                        acc = jnp.maximum(acc, pltpu.roll(acc, sh, 1))
                    fmx_scratch[0:1, :] = acc
                    cnt_cell[1] = jnp.int32(0)

                pl.when(sk_scratch[jj] < fmx_scratch[0, 0])(
                    functools.partial(super_body, jj, s)
                )
                return carry

            cnt_cell[0] = jnp.int32(0)
            cnt_cell[1] = jnp.int32(1)  # force the first max-tree
            jax.lax.fori_loop(0, na, super_pass, jnp.int32(0))
            nb = cnt_cell[0]

            if variant == "cull":  # perf analysis: culling only
                continue

            if defer:
                # ---- deferred attribute resolution over winning clusters --
                # Pass 1 re-walks this instance's survivor list in chunks of
                # 32 and COMPACTS the clusters that won at least one lane
                # back into cl_scratch in place (the winner subsequence's
                # write cursor never passes the read cursor). A losing
                # cluster costs one vector compare + a 1/32nd share of an
                # OR-tree instead of a full cross-lane any-reduce each.
                def attr_chunk(ci, wcnt):
                    btri = jax.lax.bitcast_convert_type(
                        out_ref[3 * ROWS : 4 * ROWS, :], jnp.int32
                    )
                    binst = jax.lax.bitcast_convert_type(
                        out_ref[4 * ROWS : 5 * ROWS, :], jnp.int32
                    )
                    # per-lane winning cluster id; -1 on lanes that missed
                    # (t = +BIG), died (t = -BIG — their btri/binst are
                    # 0-defaults that would otherwise match cluster 0 of
                    # instance 0), or belong to another instance
                    wc = jnp.where(
                        (jnp.abs(out_ref[0:ROWS, :]) < _BIG)
                        & (binst == jnp.int32(inst)),
                        btri // CLUSTER_SIZE,
                        -1,
                    )
                    bits = jnp.zeros((ROWS, 128), jnp.int32)
                    for k in range(32):
                        j = ci * 32 + k
                        cj = cl_scratch[
                            jnp.minimum(j, cl_scratch.shape[0] - 1)
                        ]
                        bitv = jnp.where(j < nb, jnp.int32(BITS[k]), 0)
                        bits = bits | jnp.where(wc == cj, bitv, 0)
                    m = or_tree(bits)

                    def extract(k, wcnt):
                        keep = ((m >> k) & 1) == 1
                        src = jnp.minimum(
                            ci * 32 + k, cl_scratch.shape[0] - 1
                        )
                        cl_scratch[wcnt] = jnp.where(
                            keep, cl_scratch[src], cl_scratch[wcnt]
                        )
                        return wcnt + keep.astype(jnp.int32)

                    return jax.lax.fori_loop(0, 32, extract, wcnt)

                nw = jax.lax.fori_loop(
                    0, (nb + 31) // 32, attr_chunk, jnp.int32(0)
                )

                # Pass 2: resolve each winner. Streamed scenes re-fetch the
                # winner's geometry block through the SAME STREAM_PIPE-deep
                # DMA pipeline phase C uses (phase C's pipeline overwrote
                # the staging buffer) — the serial start/wait-per-winner
                # form this replaces left every fetch's full HBM latency
                # exposed. Every started DMA is waited exactly once.
                if stream is not None:
                    for k in range(STREAM_PIPE - 1):

                        @pl.when(k < nw)
                        def _attr_preflight(k=k):
                            _start_dma(
                                cl_scratch[
                                    jnp.minimum(k, cl_scratch.shape[0] - 1)
                                ],
                                jnp.int32(k),
                            )

                def _resolve(j, carry):
                    c = cl_scratch[jnp.minimum(j, cl_scratch.shape[0] - 1)]
                    dslot = jax.lax.rem(j, STREAM_PIPE)
                    if stream is not None:

                        @pl.when(j + STREAM_PIPE - 1 < nw)
                        def _prefetch():
                            nxt = jnp.minimum(
                                j + STREAM_PIPE - 1, cl_scratch.shape[0] - 1
                            )
                            _start_dma(
                                cl_scratch[nxt],
                                jax.lax.rem(j + STREAM_PIPE - 1, STREAM_PIPE),
                            )

                        _wait_dma(c, dslot)
                    btri = jax.lax.bitcast_convert_type(
                        out_ref[3 * ROWS : 4 * ROWS, :], jnp.int32
                    )
                    binst = jax.lax.bitcast_convert_type(
                        out_ref[4 * ROWS : 5 * ROWS, :], jnp.int32
                    )
                    wc = jnp.where(
                        (jnp.abs(out_ref[0:ROWS, :]) < _BIG)
                        & (binst == jnp.int32(inst)),
                        btri // CLUSTER_SIZE,
                        -1,
                    )
                    mine = wc == c
                    uu_ = out_ref[ROWS : 2 * ROWS, :]
                    vv_ = out_ref[2 * ROWS : 3 * ROWS, :]
                    w0 = 1.0 - uu_ - vv_
                    acc = (
                        out_ref[5 * ROWS : 6 * ROWS, :],
                        out_ref[6 * ROWS : 7 * ROWS, :],
                        out_ref[7 * ROWS : 8 * ROWS, :],
                        out_ref[8 * ROWS : 9 * ROWS, :],
                        out_ref[9 * ROWS : 10 * ROWS, :],
                        out_ref[10 * ROWS : 11 * ROWS, :],
                    )
                    if stream is None:
                        tabs = (ta_ref, tb_ref, tc_ref,
                                aa_ref, ab_ref, ac_ref, ad_ref)
                        g = lambda t, col: tabs[t][c, col]
                    else:
                        g = lambda t, col: buf_ref[dslot * 8 + t, col]
                    for k in range(CLUSTER_SIZE):
                        ok = mine & (btri == c * CLUSTER_SIZE + k)
                        n0x = g(3, k)
                        n0y = g(3, 32 + k)
                        n0z = g(3, 64 + k)
                        n1x = g(3, 96 + k)
                        n1y = g(4, k)
                        n1z = g(4, 32 + k)
                        n2x = g(4, 64 + k)
                        n2y = g(4, 96 + k)
                        n2z = g(5, k)
                        uv0u = g(5, 32 + k)
                        uv0v = g(5, 64 + k)
                        uv1u = g(5, 96 + k)
                        uv1v = g(6, k)
                        uv2u = g(6, 32 + k)
                        uv2v = g(6, 64 + k)
                        matl = g(6, 96 + k)
                        nx, ny, nz, uu2, vv2, mat = acc
                        acc = (
                            jnp.where(
                                ok, n0x * w0 + n1x * uu_ + n2x * vv_, nx
                            ),
                            jnp.where(
                                ok, n0y * w0 + n1y * uu_ + n2y * vv_, ny
                            ),
                            jnp.where(
                                ok, n0z * w0 + n1z * uu_ + n2z * vv_, nz
                            ),
                            jnp.where(
                                ok,
                                uv0u * w0 + uv1u * uu_ + uv2u * vv_,
                                uu2,
                            ),
                            jnp.where(
                                ok,
                                uv0v * w0 + uv1v * uu_ + uv2v * vv_,
                                vv2,
                            ),
                            jnp.where(ok, matl, mat),
                        )
                    for fk, val in enumerate(acc):
                        out_ref[
                            (5 + fk) * ROWS : (6 + fk) * ROWS, :
                        ] = val
                    return carry

                jax.lax.fori_loop(0, nw, _resolve, jnp.int32(0))


def _make_kernel(
    instance_ranges: tuple[tuple[int, int, int, int], ...],
    rows: int,
    variant: str = "full",
    stream: bool = False,
    has_live: bool = False,
    has_hyper: bool = False,
):
    """Builds the hit-record kernel body for a static per-instance range
    list (supercluster start/count, cluster start/count per instance).

    ``variant`` (perf analysis; tools/perf_breakdown.py): "full" = shipped
    kernel; "noattr" = skip the inline attribute interpolation; "geom" =
    intersection only (no best-attr carry at all).

    ``stream`` swaps the seven VMEM geometry tables for one HBM-resident
    ``geo_stream`` array DMA'd per surviving cluster (see _emit_traversal's
    ``stream`` arg) — scenes beyond the VMEM budget keep the Pallas path.

    ``has_live`` adds a seventh per-tile ray input: a [ROWS, 128] f32 mask
    (1.0 = live). Dead lanes cull like misses (``live`` in _emit_traversal),
    so a bounce whose rays mostly terminated pays almost nothing."""
    ROWS = rows
    n_ray_in = 7 if has_live else 6

    def kernel(*refs):
        ray_refs = refs[:n_ray_in]
        (inv_ref, scab_ref, clab_ref) = refs[n_ray_in : n_ray_in + 3]
        refs = refs[n_ray_in + 3 :]
        if has_hyper:
            hyab_ref, refs = refs[0], refs[1:]
        else:
            hyab_ref = None
        if stream:
            (geo_ref, out_ref, sc_scratch, sk_scratch, cl_scratch,
             bits_scratch, bx_scratch, fmx_scratch, cnt_cell,
             hy_scratch, hk_scratch, buf_ref, sem_ref) = refs
            tables = (None,) * 7
            stream_refs = (geo_ref, buf_ref, sem_ref)
        else:
            (ta_ref, tb_ref, tc_ref, aa_ref, ab_ref, ac_ref, ad_ref,
             out_ref, sc_scratch, sk_scratch, cl_scratch,
             bits_scratch, bx_scratch, fmx_scratch, cnt_cell,
             hy_scratch, hk_scratch) = refs
            tables = (ta_ref, tb_ref, tc_ref, aa_ref, ab_ref, ac_ref, ad_ref)
            stream_refs = None
        rays = tuple(r[...] for r in ray_refs[:6])
        live = (ray_refs[6][...] != 0.0) if has_live else None
        _emit_traversal(
            rays, out_ref, ROWS, instance_ranges, variant,
            inv_ref, scab_ref, clab_ref, *tables,
            sc_scratch, sk_scratch, cl_scratch, bits_scratch, bx_scratch,
            live=live,
            stream=stream_refs,
            fmx_scratch=fmx_scratch,
            cnt_cell=cnt_cell,
            hyab_ref=hyab_ref,
            hy_scratch=hy_scratch,
            hk_scratch=hk_scratch,
        )

    return kernel


def out_vma(*arrays) -> frozenset:
    """Varying-manual-axes set for a pallas_call output: the union over its
    inputs. Under ``jax.shard_map(check_vma=True)`` (the sharded render /
    train paths) pallas_call outputs must declare how they vary over the
    mesh; outside shard_map every input's vma is empty and this is a no-op."""
    vma: set = set()
    for a in arrays:
        if a is None:
            continue
        vma |= set(getattr(jax.typeof(a), "vma", ()) or ())
    return frozenset(vma)


def align_vma(vma: frozenset, *arrays):
    """Mark every array varying over all axes in ``vma`` (pcast replicated →
    varying is a no-op value-wise). Interpret-mode pallas evaluates the
    kernel body as jax ops under shard_map's vma checking, which rejects
    mixing varying ray tiles with replicated scene tables; on hardware the
    kernel body is opaque, so this only canonicalizes the call boundary."""
    out = []
    for a in arrays:
        if a is not None:
            missing = vma - set(getattr(jax.typeof(a), "vma", ()) or ())
            if missing:
                a = jax.lax.pcast(a, tuple(sorted(missing)), to="varying")
        out.append(a)
    return out


@functools.partial(
    jax.jit, static_argnames=("instance_ranges", "rows", "variant", "stream")
)
def _trace_tiles(
    rays6: tuple[Array, ...],  # 6 x [T, ROWS, 128]: ox oy oz dx dy dz
    #   (+ an optional 7th: f32 live mask, 1.0 = lane still alive)
    inv: Array,  # [I, 16]
    scab: Array,  # [S, 8]
    clab: Array,  # [C, 8]
    geo: tuple[Array, ...],  # resident: 7 x [C, 128] tables
    #   (tri_a..tri_c, at_a..at_d); streamed: 1 x [8C, 128] geo_stream
    instance_ranges: tuple[tuple[int, int, int, int], ...],
    rows: int = MAX_ROWS,
    variant: str = "full",
    stream: bool = False,
    hyper: tuple[Array, ...] = (),  # 0 or 1 packed hypercluster AABB table
):
    n_tiles = rays6[0].shape[0]
    n_ray_in = len(rays6)
    ROWS = rows
    kernel = _make_kernel(
        instance_ranges, rows, variant, stream, has_live=n_ray_in == 7,
        has_hyper=len(hyper) == 1,
    )
    # tests and the golden path run on CPU: interpret the kernel there
    # (the streamed variant uses DMA semantics → TPU-interpret mode)
    on_tpu = jax.default_backend() == "tpu"
    interpret = (
        False if on_tpu
        else (pltpu.InterpretParams() if stream else True)
    )
    # each ray component arrives as its own [T, ROWS, 128] array — a pure
    # reshape of a planar [N] row, and a simple dense block per tile.
    # (A combined [3, T, 8, 128] input with block (3, None, 8, 128) made
    # Mosaic's pipelining pathological: single-kernel compiles took 490 s.)
    tile_spec = pl.BlockSpec(
        (None, ROWS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    # single fused result (see the kernel's out_ref comment)
    out_spec = pl.BlockSpec((None, 11 * ROWS, 128), lambda i: (i, 0, 0))
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
    ]
    if stream:
        scratch += [
            # STREAM_PIPE-deep cluster staging (8 rows per slot)
            pltpu.VMEM((8 * STREAM_PIPE, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((STREAM_PIPE,)),
        ]
    vma = out_vma(*rays6, inv, scab, clab, *hyper, *geo)
    inputs = align_vma(vma, *rays6, inv, scab, clab, *hyper, *geo)
    big = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, 11 * ROWS, 128), jnp.float32, vma=vma
        ),
        in_specs=[tile_spec] * n_ray_in + [full] * (3 + len(hyper))
        + geo_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)

    fld = lambda k: big[:, k * ROWS:(k + 1) * ROWS, :]
    as_i32 = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    return (
        fld(0), fld(1), fld(2), as_i32(fld(3)), as_i32(fld(4)),
        fld(5), fld(6), fld(7), fld(8), fld(9), fld(10),
    )


#: VMEM budget for the resident cluster tables (bytes). A v5e core has
#: ~16 MiB of VMEM; beyond this the tables cannot stay resident alongside
#: the ray tiles/outputs and the tracer falls back to the wavefront path.
#: (~12 MiB of tables ≈ 100k triangles at 115 B/tri.)
VMEM_TABLE_BUDGET = 12 * 1024 * 1024


def _table_bytes(clusters) -> int:
    c = clusters.tri_a.shape[0]
    return (
        c * 7 * 128 * 4
        + clusters.cluster_aabb.size * 4
        + clusters.super_aabb.size * 4
    )


def trace_pallas(
    scene: Scene, origin: Array, direction: Array, variant: str = "full",
    rows: int | None = None, live: Array | None = None,
    return_slots: bool = False,
) -> SceneHit:
    """Drop-in Tracer backed by the Pallas tile kernel.
    ``origin``/``direction``: planar [3, ...] — tiling is a pure reshape.

    ``rows`` overrides the kernel tile height (must divide the caller's ray
    count's row padding): smaller tiles cull tighter on cluster-dense scenes
    (each tile covers a smaller screen rect → fewer surviving clusters per
    ray) at the cost of scalar-work amortization.

    ``live``: optional [...]-shaped bool — lanes whose rays already
    terminated are culled inside the kernel like misses (they fail every
    slab/accept test, so clusters only dead lanes wanted are never fetched)
    and report ``hit=False``. The bounce loop passes the previous bounce's
    alive mask here."""
    clusters = scene.clusters
    assert clusters is not None, "scene built without cluster tables"
    stream = _table_bytes(clusters) > VMEM_TABLE_BUDGET
    if stream and clusters.geo_stream is None:
        # scene too large for VMEM-resident tables and built without a
        # streaming table — use the XLA wavefront traversal (HBM-native)
        # rather than failing in Mosaic allocation
        from clraytracer_tpu.ops.trace_wavefront import trace_wavefront

        return trace_wavefront(scene, origin, direction)
    shape = origin.shape[1:]
    n = int(np.prod(shape)) if shape else 1
    ROWS = rows if rows is not None else _tile_rows(n)
    tile = ROWS * 128
    n_tiles = -(-n // tile)
    pad = n_tiles * tile - n

    def tile_layout(x: Array, pad_value: float) -> Array:
        """One planar component [N] → [T, ROWS, 128] (pure reshape + pad)."""
        flat = x.reshape(-1)
        if pad:
            # non-zero pad for directions so 1/d stays finite in pad lanes
            flat = jnp.concatenate(
                [flat, jnp.full((pad,), pad_value, flat.dtype)]
            )
        return flat.reshape(n_tiles, ROWS, 128)

    rays6 = tuple(
        [tile_layout(origin[c], 0.0) for c in range(3)]
        + [tile_layout(direction[c], 1.0) for c in range(3)]
        + (
            [tile_layout(live.astype(jnp.float32), 0.0)]
            if live is not None
            else []
        )
    )

    mesh_idx, _, _, _ = _instance_tables(scene)
    ranges = tuple(clusters.mesh_ranges[int(mi)] for mi in mesh_idx)
    inv = scene.instances.inverse_transform.reshape(-1, 16)

    geo = (
        (clusters.geo_stream,)
        if stream
        else (
            clusters.tri_a, clusters.tri_b, clusters.tri_c,
            clusters.at_a, clusters.at_b, clusters.at_c, clusters.at_d,
        )
    )
    t, u, v, tri_slot, inst, nx, ny, nz, uu, vv, matl = _trace_tiles(
        rays6,
        inv,
        clusters.super_aabb,
        clusters.cluster_aabb,
        geo,
        ranges,
        rows=ROWS,
        variant=variant,
        stream=stream,
        hyper=(
            (clusters.hyper_aabb,) if clusters.hyper_aabb is not None else ()
        ),
    )

    def untile(x: Array) -> Array:
        return x.reshape(-1)[:n].reshape(shape)

    t = untile(t)
    tri_slot = untile(tri_slot)
    inst = untile(inst)
    # dead lanes carry t = -BIG (see ``live``): report them as misses
    hit = (t < _BIG) if live is None else (jnp.abs(t) < _BIG)

    # ``return_slots``: hand back the kernel's RAW cluster-slot ids and skip
    # the slot -> original-triangle remap, a per-ray serialized s32 gather
    # XLA can't vectorize (measured 14.8 ms/bounce at 1080p). The
    # differentiable tracer (diff.py) gathers its per-triangle table by
    # slot instead — it reorders the [T, 25] table into slot order once per
    # step (a T-row gather) — so the 2M-ray remap is dead code there.
    if return_slots:
        tri = tri_slot
    else:
        tri = jnp.take(clusters.tri_gid, tri_slot, mode="clip")

    # NOTE deliberately no mesh_origin/mesh_direction here: reconstructing
    # the object-space ray per ray costs a per-ray instance gather, which
    # shading already performs (and shares) — doing it here too measured
    # ~60 ms/bounce of pure waste at 1080p.
    # attrs only exist for the 'full' variant — 'noattr'/'geom' kernels
    # never write the attr blocks, and returning their zero-filled arrays
    # would silently shade with zero normals through the attrs-presence
    # convention (render.py / shade.py check `attrs is not None`); None
    # routes those callers to the gather path automatically
    full = variant == "full"
    return SceneHit(
        t=jnp.where(hit, t, MISS_DISTANCE),
        u=untile(u),
        v=untile(v),
        tri=tri,
        instance=inst,
        hit=hit,
        attr_normal=(
            jnp.stack([untile(nx), untile(ny), untile(nz)]) if full else None
        ),
        attr_uu=untile(uu) if full else None,
        attr_vv=untile(vv) if full else None,
        attr_mat=untile(matl) if full else None,
    )
