"""TPU-efficient table gathers for the shading data path.

XLA lowers a per-ray ``jnp.take`` on TPU to a serialized scalar gather —
measured ~14 ms for 2M elements from a 25k-entry f32 table on a v5e,
*independent of how many such gathers share an index*. Two escape hatches,
both measured on hardware (2026-08, 1080p ray counts):

* **Wide row gathers** (:func:`take_rows`): gathering a whole [R, W] row
  costs the same as gathering one scalar (~5.3 ms for 2M rows, W <= 16+),
  so every table is packed so one gather fetches all fields at once.
* **One-hot MXU gathers** (:func:`onehot_rows`): for small tables
  (materials <= 256, instances <= 401) the gather is a ``one_hot(idx) @
  table`` matmul — ~0.06 ms, ~85x faster than a row gather. Because each
  output row sums exactly **one** product (``1.0 * table[j]``), accuracy is
  set by the MXU pass decomposition alone; ``precision=HIGHEST`` keeps f32
  table values to f32 accuracy, and the op is differentiable w.r.t. the
  table (VJP = one_hot^T @ grad = scatter-add).

Integer table columns must stay below 2^24 for f32 exactness — larger values
(texel-pool offsets) are stored hi/lo-split by the packers in scene/builder.

The reference has no analogue — its OpenCL kernels gather per-thread
(kernel_main.cl:229-243); on a vector machine the data layout IS the
algorithm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


#: tables at or below this row count use the one-hot MXU gather on the
#: differentiable path too (onehot_rows_exact): the one-hot matrix is
#: N x R — past ~512 rows its HBM traffic outgrows the row-gather cost
ONEHOT_DIFF_MAX_ROWS = 512


def take_rows(table: Array, idx: Array) -> Array:
    """Gather rows of ``table [R, W]`` at ``idx [...]`` → planar ``[W, ...]``.

    One wide row gather + a (cheap) transpose; the planar result keeps the
    field axis major so per-field slices are layout-friendly [...] arrays.
    Differentiable (VJP = scatter-add over rows).
    """
    flat = idx.reshape(-1)
    rows = jnp.take(table, flat, axis=0, mode="clip")  # [N, W]
    return rows.T.reshape((table.shape[1],) + idx.shape)


#: index counts at or above this use the sorted-segment backward for pool
#: gathers on TPU. Below it the serialized scatter wins: the pipeline's
#: searchsorted leg costs ~14 ms regardless of N (it scales with the POOL
#: row count), so the crossover vs ~16 ns/update scatter sits near 2M
SORTED_VJP_MIN_N = 2 << 20

#: crossover for the WIDE-table perm variant — only reachable for tables
#: too large for the gather_pallas MXU kernel (> 16k rows, museum-class).
#: Kept at the conservative pool-derived value: a 1080p A/B (2026-08-21,
#: tools/grads_breakdown.py) read the perm backward SLOWER than the
#: serialized scatter at 2M x 25 on the 4k-row table (349.8 vs ~161 ms
#: all-leaves step), so the lower crossover the r4 advisor hypothesized
#: did not materialize on hardware
SORTED_VJP_WIDE_MIN_N = 2 << 20


def take_rgb(pool: Array, idx: Array) -> Array:
    """Row-gather an RGB pool ``[P, 3|4]`` at ``idx [...]`` → planar
    ``[3, ...]``.

    Scene pools are built [P, 4] (builder zero-pads the 4th column) so no
    per-frame pad op runs — the in-graph ``jnp.pad`` a [P, 3] pool needs
    measured 2 x 3.3 ms/frame at 1080p, and XLA folds the pad INTO the
    gather (slice_sizes={1,3}) so it only ever cost time. Row alignment
    itself measured neutral at 2M random indices on v5e (~41 ms either
    way): the TPU gather is latency-bound, not width-bound; in-frame cost
    is coherence-dependent (3.7 ms for primary-hit UVs vs 22.6 ms for
    reflection UVs at 1080p).

    Differentiable. On TPU at frame-scale index counts the backward uses
    the sorted-segment pipeline (:func:`take_rows_sorted_vjp`) instead of
    XLA's per-update-serialized scatter-add — measured 43 vs 63 ms for 4M
    updates into a 147k-row pool (tools/scatter_bench.py).
    """
    if pool.shape[1] == 3:
        pool = jnp.pad(pool, ((0, 0), (0, 1)))
    if (
        jax.default_backend() == "tpu"
        and idx.size >= SORTED_VJP_MIN_N
    ):
        return take_rows_sorted_vjp(pool, idx)[:3]
    return take_rows(pool, idx)[:3]


@jax.custom_vjp
def take_rows_sorted_vjp(table: Array, idx: Array) -> Array:
    """:func:`take_rows` with a sort-based table VJP.

    XLA lowers TPU scatter-add per update (~16 ns each — 63 ms for the
    4M texel-pool updates of a 1080p 2-bounce differentiable frame, the
    single largest term of the fwd+bwd step). The backward here is all
    dense/log-depth primitives instead:

      sort (idx, g) by idx  →  cumsum  →  searchsorted(row boundaries)
      →  adjacent difference = per-row segment sums

    Measured 42.8 ms for the same shape (14.4 sort + 3.3 cumsum + 14.0
    searchsorted + gathers; tools/scatter_bench.py ``extra``). Summation
    ORDER differs from the scatter (f32 rounding differs in ulps), which
    is within every gradient tolerance used here.
    """
    return take_rows(table, idx)


def _take_rows_sorted_fwd(table, idx):
    return take_rows(table, idx), (
        idx, table.shape[0], table.shape[1], table[:0, :0]
    )


def _take_rows_sorted_bwd(res, g):
    idx, num_rows, width, table_proto = res
    flat = jnp.clip(idx.reshape(-1), 0, num_rows - 1)
    gf = g.astype(jnp.float32).reshape(width, -1)  # [W, N]
    ops = [flat] + [gf[k] for k in range(width)]
    out = jax.lax.sort(ops, num_keys=1)
    si = out[0]
    c = jnp.cumsum(jnp.stack(out[1:], axis=1), axis=0)  # [N, W]
    # pos[r] = first sorted position with si >= r; rows' segment sums are
    # then adjacent differences of the (zero-padded) cumsum at boundaries
    pos = jnp.searchsorted(
        si, jnp.arange(num_rows + 1, dtype=si.dtype), side="left"
    )  # [P+1]
    cpad = jnp.concatenate([jnp.zeros((1, width), c.dtype), c], axis=0)
    bounds = jnp.take(cpad, pos, axis=0)  # [P+1, W]
    d_table = bounds[1:] - bounds[:-1]
    return _reduce_to_table_vma(d_table, g, table_proto), None


take_rows_sorted_vjp.defvjp(_take_rows_sorted_fwd, _take_rows_sorted_bwd)


@jax.custom_vjp
def take_rows_sorted_perm_vjp(table: Array, idx: Array) -> Array:
    """:func:`take_rows` with a sort-based table VJP for WIDE tables.

    :func:`take_rows_sorted_vjp` drags every value column through
    ``lax.sort`` (W + 1 operands) — fine at the texel pool's W = 4, ruinous
    at the differentiable tracer's [T, 25] triangle table. Here the sort
    carries only (idx, iota): the cotangent columns are re-ordered
    afterwards by ONE wide row gather at the resulting permutation, then
    the same cumsum → searchsorted → adjacent-difference segment reduction
    runs in [W, N] layout (cumsum along the 128-lane minor axis, no
    W → 128 lane padding). The searchsorted leg scales with the TABLE row
    count, which for triangle tables (thousands of rows, not the pool's
    ~147k) is noise. Summation order differs from XLA's scatter-add by
    f32 rounding only.
    """
    return take_rows(table, idx)


def _take_rows_sorted_perm_fwd(table, idx):
    return take_rows(table, idx), (
        idx, table.shape[0], table.shape[1], table[:0, :0]
    )


def _take_rows_sorted_perm_bwd(res, g):
    idx, num_rows, width, table_proto = res
    flat = jnp.clip(idx.reshape(-1), 0, num_rows - 1)
    gf = g.astype(jnp.float32).reshape(width, -1)  # [W, N]
    n = flat.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    si, perm = jax.lax.sort([flat, iota], num_keys=1)
    gs = jnp.take(gf, perm, axis=1)  # [W, N] in idx-sorted column order
    c = jnp.cumsum(gs, axis=1)
    pos = jnp.searchsorted(
        si, jnp.arange(num_rows + 1, dtype=si.dtype), side="left"
    )  # [R+1]
    cpad = jnp.concatenate(
        [jnp.zeros((width, 1), c.dtype), c], axis=1
    )
    bounds = jnp.take(cpad, pos, axis=1)  # [W, R+1]
    d_table = (bounds[:, 1:] - bounds[:, :-1]).T  # [R, W]
    return _reduce_to_table_vma(d_table, g, table_proto), None


take_rows_sorted_perm_vjp.defvjp(
    _take_rows_sorted_perm_fwd, _take_rows_sorted_perm_bwd
)


def wide_rows_diff(table: Array, idx: Array) -> Array:
    """Differentiable row gather for WIDE mid-size tables (the tracer's
    [T, 25] combined triangle table).

    On TPU, tables that fit VMEM take the chunk-predicated one-hot MXU
    kernel (ops/gather_pallas.py) — bit-exact forward, matmul-accumulated
    backward, no serialized gather/scatter in either direction. Larger
    tables fall back to the XLA row gather, with the sorted-permutation
    backward at very large index counts."""
    if jax.default_backend() == "tpu":
        from clraytracer_tpu.ops import gather_pallas

        if gather_pallas.supported(table, idx) and idx.size >= 4096:
            return gather_pallas.take_rows_mxu(table, idx)
        if idx.size >= SORTED_VJP_WIDE_MIN_N:
            return take_rows_sorted_perm_vjp(table, idx)
    return take_rows(table, idx)


def onehot_rows(table: Array, idx: Array) -> Array:
    """One-hot MXU gather of ``table [R, W]`` rows → planar ``[W, ...]`` f32.

    **Bit-exact** despite bf16 matmuls: the f32 table is split into three
    bf16 planes (top / middle / low 8 mantissa bits — the residual cascade
    ``hi = bf16(x)``, ``mid = bf16(x - hi)``, ``lo = x - hi - mid`` is an
    exact telescoping decomposition of f32's 24-bit mantissa), each one-hot
    product is a single exact ``1.0 * plane`` term, and the f32 sum
    reconstructs the original value exactly. (``precision=HIGHEST`` would
    express the same thing, but its TPU lowering hung compilation >10 min
    inside fori chains; three explicit default-precision matmuls compile and
    run fast.)

    Out-of-range indices clamp (matching ``take_rows``'s mode="clip").
    Differentiable w.r.t. the table: the plane casts carry unit tangents, so
    the VJP is the usual one-hot-transpose scatter-add.
    """
    num_rows, width = table.shape
    flat = jnp.clip(idx.reshape(-1), 0, num_rows - 1)

    if jax.default_backend() != "tpu":
        # CPU/GPU: f32 dots are exact (no MXU rounding) and the CPU runtime
        # has no bf16 x bf16 = f32 dot thunk at some shapes — one plane does.
        oh32 = jax.nn.one_hot(flat, num_rows, dtype=jnp.float32)
        out = oh32 @ table.astype(jnp.float32)
        return out.T.reshape((width,) + idx.shape)

    oh = jax.nn.one_hot(flat, num_rows, dtype=jnp.bfloat16)

    t = table.astype(jnp.float32)
    hi = t.astype(jnp.bfloat16)
    r = t - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    planes = jnp.concatenate([hi, mid, lo], axis=1)  # [R, 3W]

    out = jax.lax.dot_general(
        oh, planes, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, 3W] f32, each element exact
    # transpose to [3W, N] BEFORE slicing/adding: [N, 3W] ops pad the minor
    # dim 3W→128 lanes (measured ~9 ms of waste at 2M rays); [3W, N] pads
    # only 3W→next multiple of 8 sublanes
    out = out.T
    out = out[:width] + out[width : 2 * width] + out[2 * width :]
    return out.reshape((width,) + idx.shape)


@jax.custom_vjp
def onehot_rows_exact(table: Array, idx: Array) -> Array:
    """:func:`onehot_rows` with a hand-written **exact** table VJP.

    Autodiff through ``onehot_rows`` would cast the f32 cotangent to bf16
    for the transposed MXU matmul (8 mantissa bits of gradient). Here the
    backward pass applies the same three-plane residual-cascade
    decomposition to the COTANGENT: each ``one_hot^T @ g_plane`` product is
    an exact ``1.0 * g_plane`` term accumulated in f32, so the scatter-add
    is reproduced to f32 accuracy on the MXU — the differentiable path's
    small-table gathers (materials <= 256 rows, instances <= 401) then cost
    matmuls instead of TPU scatter loops (measured: the instance + material
    gather/scatter pairs were ~33 ms of the 99 ms fwd+bwd step at 540p).
    """
    return onehot_rows(table, idx)


def _vma(x) -> frozenset:
    """Varying-manual-axes set of a (possibly traced) array — which
    shard_map mesh axes the value varies over; empty outside shard_map."""
    aval = getattr(x, "aval", None)
    return getattr(aval, "vma", frozenset()) or frozenset()


def _onehot_rows_exact_fwd(table, idx):
    # tables are f32 (ShadingTables); residuals carry ints, idx, and a
    # zero-size slice of the table — its aval keeps the table's vma so the
    # bwd can reduce the cotangent over exactly the right mesh axes
    return onehot_rows(table, idx), (
        idx, table.shape[0], table.shape[1], table[:0, :0]
    )


def _onehot_rows_exact_bwd(res, g):
    idx, num_rows, width, table_proto = res
    flat = jnp.clip(idx.reshape(-1), 0, num_rows - 1)
    gf = g.astype(jnp.float32).reshape(width, -1).T  # [N, W]

    if jax.default_backend() != "tpu":
        oh32 = jax.nn.one_hot(flat, num_rows, dtype=jnp.float32)
        d_table = oh32.T @ gf
        return _reduce_to_table_vma(d_table, g, table_proto), None

    oh = jax.nn.one_hot(flat, num_rows, dtype=jnp.bfloat16)
    hi = gf.astype(jnp.bfloat16)
    r = gf - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    planes = jnp.concatenate([hi, mid, lo], axis=1)  # [N, 3W]
    d = jax.lax.dot_general(
        oh, planes, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, 3W]: contract over rays — each term an exact 1.0 * g_plane
    d_table = d[:, :width] + d[:, width : 2 * width] + d[:, 2 * width :]
    return _reduce_to_table_vma(d_table, g, table_proto), None


def _reduce_to_table_vma(d_table, g, table_proto):
    """Under ``shard_map``, reduce the table cotangent over the mesh axes
    the COTANGENT varies on but the TABLE does not.

    A custom_vjp replaces the autodiff transpose that would normally turn
    the forward's implicit replicated→varying broadcast into a psum, so the
    bwd must perform that reduction itself or a replicated (``P()``) table
    param would receive a device-varying gradient (shard_map's vma check
    rejects it). Axes the table itself varies over (e.g. instance tables
    sharded along a 'geo' axis) are left unreduced. No-op outside
    shard_map (both vma sets are empty)."""
    axes = tuple(sorted(_vma(g) - _vma(table_proto)))
    if axes:
        d_table = jax.lax.psum(d_table, axes)
    return d_table


onehot_rows_exact.defvjp(_onehot_rows_exact_fwd, _onehot_rows_exact_bwd)


def select_rows_diff(table: Array, idx: Array) -> Array:
    """Differentiable row gather for TINY tables (a handful of rows — e.g.
    a 1-2 instance registry) as a static select chain: R masked
    broadcast-accumulate passes, each a fused [W, N] op. The one-hot form
    materializes [3*W, N] plane products per gather (profiled ~1.2-1.4 ms
    each at 1080p for a 1-row instance table); this is R cheap passes, and
    its autodiff VJP is the matching chain of masked reductions — exact
    (each term is a plain f32 multiply by a {0,1} mask, no MXU pass)."""
    num_rows, width = table.shape
    idx = jnp.clip(idx, 0, num_rows - 1)  # take_rows/onehot clip semantics
    out = jnp.zeros((width,) + idx.shape, jnp.float32)
    for j in range(num_rows):
        mask = (idx == j).astype(jnp.float32)
        out = out + mask * table[j].reshape((width,) + (1,) * idx.ndim)
    return out


#: row count at or below which the select chain beats the one-hot matmul
#: (each one-hot gather moves 3-plane [3W, N] products through HBM; the
#: chain costs R fused passes — crossover measured shallow, keep it small)
SELECT_DIFF_MAX_ROWS = 8


def small_rows_diff(table: Array, idx: Array) -> Array:
    """Differentiable row gather that picks the cheapest exact form by
    table size: select chain for tiny tables, MXU one-hot (exact values
    AND exact gradients) for small ones, row gather + scatter VJP past
    :data:`ONEHOT_DIFF_MAX_ROWS`."""
    if table.shape[0] <= SELECT_DIFF_MAX_ROWS:
        return select_rows_diff(table, idx)
    if table.shape[0] <= ONEHOT_DIFF_MAX_ROWS:
        return onehot_rows_exact(table, idx)
    return take_rows(table, idx)

