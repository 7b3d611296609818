"""MXU-based differentiable row gather for mid-size tables (Pallas).

The differentiable tracer recomputes Möller-Trumbore + attribute
interpolation from a packed per-triangle table (diff.py): every ray needs
the 25 floats of its WINNING triangle's row, and the backward needs the
transpose — a scatter-add of per-ray cotangents onto the table. On TPU both
directions are pathological in XLA at frame scale: the forward row gather
serializes per index (~30 ms/step of the 1080p fwd at 2 x 2M rows,
tools/grads_breakdown.py), and the scatter VJP is worse.

This module replaces BOTH with chunked one-hot **matmuls** inside a Pallas
kernel — gather/scatter as MXU work instead of serialized memory ops:

* every f32 operand is split into the exact 3-plane bf16 cascade of
  :func:`ops.gather.onehot_rows` (hi/mid/lo mantissa planes, an exact
  telescoping decomposition of f32), so the matmuls run as single native
  bf16 MXU passes whose per-term products are exact — the forward (exactly
  one nonzero term per output) is **bit-exact** vs ``jnp.take``, the
  backward accumulates in the MXU's f32 accumulator. The cotangent's
  cascade is built INSIDE the scatter kernel (VMEM-local VPU work): an
  XLA-side decomposition profiled ~6 ms/step of pad/convert/relayout glue
  at 1080p;
* each grid step covers a 2048-ray tile; triangle ids within a tile are
  spatially coherent (the same coherence the traversal's cluster culling
  exploits), so the kernel tests each 512-row chunk for presence with one
  vector compare+reduce and runs the one-hot matmul **only for chunks that
  contain a winner** (``pl.when``-predicated);
* I/O stays in the caller's native FIELD-PLANAR layout ([W, rows, 128]) in
  both directions — no transposes or width padding anywhere in XLA;
* the backward accumulates chunk gradients into a VMEM-resident [T, 3W]
  output across grid steps — no scatter instruction exists anywhere.

Shapes: table [T, W] f32 with W <= 32, T <= TABLE_MAX_ROWS (VMEM-resident;
larger tables keep the XLA paths in ops/gather.py). The public entry is
:func:`take_rows_mxu` (custom_vjp) with the same contract as
``gather.take_rows``: planar ``[W, *idx.shape]`` out, clip-mode indices,
VJP = row scatter-add.

Reference anchor: this feeds the differentiable twin of the hit path
(CPURayTrace.cpp:186-249 reconstructs the same per-triangle data on hit);
the reference itself has no gradient path at all (SURVEY.md §7 step 7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: rays per grid step (= 16 sublane rows x 128 lanes)
TILE = 2048
#: triangle rows per one-hot chunk (MXU contraction dim)
CHUNK = 256
#: largest table the VMEM-resident kernel accepts (3 bf16 planes x 32 wide
#: at 16k rows = 3 MB, plus the backward's f32 [T, 3W] accumulator)
TABLE_MAX_ROWS = 16384
#: widest table field count the kernels accept
WMAX = 32


def _planes3_arrays(x: Array):
    """Exact 3-plane bf16 cascade of f32 (see gather.onehot_rows: hi/mid/lo
    8-mantissa-bit planes, telescoping and exact)."""
    x = x.astype(jnp.float32)
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _gather_kernel(nc: int, w: int, planes_ref, idx_ref, out_ref, acc_ref):
    """One 2048-ray tile: out[w, p] = table[idx[p], w] via chunk-predicated
    one-hot matmuls. planes_ref [3w, Tpad] bf16 (table^T planes), idx_ref
    [1, TILE] i32, out_ref [w, TILE//128, 128] f32 (the caller's
    FIELD-PLANAR layout — the plane fold below writes it as aligned
    lane-slice stores, so no XLA-side [N, W] -> [W, N] relayout exists
    anywhere), acc_ref [3w, TILE] f32 scratch."""
    idx = idx_ref[:]  # [1, TILE]
    chunk_of = jax.lax.div(idx, CHUNK)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(c, _):
        @pl.when(jnp.any(chunk_of == c))
        def _():
            base = c * CHUNK
            # one-hot [CHUNK, TILE]: row r is 1 where idx == base + r
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE), 0) + base
                == jnp.broadcast_to(idx, (CHUNK, TILE))
            ).astype(jnp.bfloat16)
            pw = planes_ref[:, pl.ds(base, CHUNK)]  # [3w, CHUNK] bf16
            acc_ref[:] += jnp.dot(
                pw, oh, preferred_element_type=jnp.float32
            )
        return None

    jax.lax.fori_loop(0, nc, body, None)
    acc = acc_ref[:]
    folded = acc[:w] + acc[w : 2 * w] + acc[2 * w :]
    for g in range(TILE // 128):
        out_ref[:, g, :] = folded[:, g * 128 : (g + 1) * 128]


def _scatter_kernel(nc: int, w: int, cot_ref, idx_ref, out_ref, cotp_ref):
    """Transpose of the gather: out[t, w] += sum_p oh[t, p] * cot[w, p].
    cot_ref [w, TILE//128, 128] f32 — the RAW cotangent in its native
    field-planar layout (the 3-plane cascade is built here, in VMEM);
    idx_ref [TILE//128, 128] i32 (sublane-grouped: Mosaic can broadcast a
    SUBLANE slice to [CHUNK, 128], but rejects a lane-offset slice of
    [1, TILE]); out_ref [Tpad, 3w] f32 accumulated across the grid (same
    VMEM block every step); cotp_ref [3w, TILE//128, 128] bf16 scratch.
    Each present chunk contracts the 16 lane groups separately (lane-lane
    dot_general) — the planar layout's natural matmul decomposition."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    idx = idx_ref[:]  # [TILE//128, 128]
    chunk_of = jax.lax.div(idx, CHUNK)

    hi, mid, lo = _planes3_arrays(cot_ref[:])
    cotp_ref[0:w] = hi
    cotp_ref[w : 2 * w] = mid
    cotp_ref[2 * w : 3 * w] = lo

    def body(c, _):
        @pl.when(jnp.any(chunk_of == c))
        def _():
            base = c * CHUNK
            dg = jnp.zeros((CHUNK, 3 * w), jnp.float32)
            for g in range(TILE // 128):
                idx_g = idx[g : g + 1, :]  # [1, 128] sublane slice
                oh = (
                    jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 128), 0)
                    + base
                    == jnp.broadcast_to(idx_g, (CHUNK, 128))
                ).astype(jnp.bfloat16)
                cot_g = cotp_ref[:, g, :]  # [3w, 128] bf16
                dg = dg + jax.lax.dot_general(
                    oh, cot_g, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            out_ref[pl.ds(base, CHUNK), :] += dg
        return None

    jax.lax.fori_loop(0, nc, body, None)


def _interpret():
    return jax.default_backend() != "tpu"


def _pad_idx(table_rows: int, idx: Array) -> tuple[Array, int, int]:
    flat = jnp.clip(idx.reshape(-1), 0, table_rows - 1).astype(jnp.int32)
    n = flat.shape[0]
    n_pad = -(-n // TILE) * TILE
    flat = jnp.pad(flat, (0, n_pad - n))  # pad lanes index row 0 (chunk 0)
    return flat.reshape(n_pad // TILE, 1, TILE), n, n_pad


def supported(table: Array, idx: Array) -> bool:
    """Whether the VMEM-resident kernel path applies."""
    return (
        table.ndim == 2
        and table.shape[0] <= TABLE_MAX_ROWS
        and table.shape[1] <= WMAX
        and table.dtype == jnp.float32
    )


def _gather_rows(table: Array, idx: Array) -> Array:
    t_rows, width = table.shape
    t_pad = -(-t_rows // CHUNK) * CHUNK
    nc = t_pad // CHUNK
    tab = jnp.pad(table, ((0, t_pad - t_rows), (0, 0)))
    hi, mid, lo = _planes3_arrays(tab.T)
    planes = jnp.concatenate([hi, mid, lo], axis=0)  # [3w, Tpad] bf16
    tiles_idx, n, n_pad = _pad_idx(t_rows, idx)
    n_tiles = n_pad // TILE
    groups = TILE // 128

    out = pl.pallas_call(
        functools.partial(_gather_kernel, nc, width),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, TILE), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((width, groups, 128), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (width, n_pad // 128, 128), jnp.float32
        ),
        scratch_shapes=[pltpu.VMEM((3 * width, TILE), jnp.float32)],
        interpret=_interpret(),
    )(planes, tiles_idx)
    return out.reshape(width, n_pad)[:, :n].reshape((width,) + idx.shape)


def _scatter_rows(table_shape, idx: Array, g: Array) -> Array:
    """VJP: accumulate planar cotangent ``g [W, *idx.shape]`` into a
    [T, W] table gradient."""
    t_rows, width = table_shape
    t_pad = -(-t_rows // CHUNK) * CHUNK
    nc = t_pad // CHUNK
    tiles_idx, n, n_pad = _pad_idx(t_rows, idx)
    n_tiles = n_pad // TILE
    groups = TILE // 128
    tiles_idx = tiles_idx.reshape(n_pad // 128, 128)  # sublane-grouped

    gf = g.astype(jnp.float32).reshape(width, -1)
    gf = jnp.pad(gf, ((0, 0), (0, n_pad - n)))
    cot = gf.reshape(width, n_pad // 128, 128)

    out = pl.pallas_call(
        functools.partial(_scatter_kernel, nc, width),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((width, groups, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((groups, 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((t_pad, 3 * width), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((t_pad, 3 * width), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3 * width, groups, 128), jnp.bfloat16)
        ],
        interpret=_interpret(),
    )(cot, tiles_idx)
    out = out[:t_rows]
    return out[:, :width] + out[:, width : 2 * width] + out[:, 2 * width :]


@jax.custom_vjp
def take_rows_mxu(table: Array, idx: Array) -> Array:
    """Differentiable ``gather.take_rows`` twin for VMEM-size tables:
    bit-exact forward, scatter-add VJP — both as chunk-predicated one-hot
    MXU matmuls (module docstring)."""
    return _gather_rows(table, idx)


def _take_rows_mxu_fwd(table, idx):
    return _gather_rows(table, idx), (idx, table.shape)


def _take_rows_mxu_bwd(res, g):
    idx, table_shape = res
    return _scatter_rows(table_shape, idx, g), None


take_rows_mxu.defvjp(_take_rows_mxu_fwd, _take_rows_mxu_bwd)
