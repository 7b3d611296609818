"""Microbench: texel-pool scatter-add strategies on the real TPU.

The differentiable step's dominant cost (tools/grads_breakdown.py, 1080p:
~76 of 200 ms) is the scatter-add VJP of the texel-pool row gathers —
XLA serializes TPU scatters per update (~18 ns/update). Candidate
replacements, all exact:

  base      — jnp .at[idx].add(g) (the status quo VJP)
  sort      — argsort(idx) alone (cost floor for sort-based schemes)
  sorted_sc — argsort + permute cotangent + scatter_add(indices_are_sorted)
  seg       — argsort + permute + run-boundary segment reduction via
              scan-free shifted adds + scatter of unique rows

Usage: python tools/scatter_bench.py [--n 4000000] [--pool 147456]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def chain_time(fn, n_iters: int = 4) -> float:
    def chain(reps):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(
                0, reps, lambda i, acc: jnp.sin(fn(acc)), x
            )

        return run

    c1, cn = chain(1), chain(1 + n_iters)
    v1 = float(c1(jnp.float32(0.1)))
    vn = float(cn(jnp.float32(0.1)))
    assert np.isfinite(v1) and np.isfinite(vn)
    t1 = time.perf_counter()
    float(c1(jnp.float32(0.1)))
    t1 = time.perf_counter() - t1
    tn = time.perf_counter()
    float(cn(jnp.float32(0.1)))
    tn = time.perf_counter() - tn
    return max((tn - t1) / n_iters, 1e-9)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--pool", type=int, default=147_456)
    ap.add_argument("--width", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    # coherent-ish indices: smooth walk over the pool like screen-space uv,
    # plus a random 10% tail (reflection rays)
    base_idx = (
        np.cumsum(rng.integers(-3, 4, size=args.n)) % args.pool
    ).astype(np.int32)
    tail = rng.integers(0, args.pool, size=args.n // 10).astype(np.int32)
    base_idx[: tail.shape[0]] = tail
    idx = jnp.asarray(base_idx)
    g = jnp.asarray(
        rng.standard_normal((args.n, args.width)).astype(np.float32)
    )
    W = args.width

    def base(acc):
        gg = g + acc * 1e-20
        out = jnp.zeros((args.pool, W), jnp.float32).at[idx].add(gg)
        return acc * 0.5 + jnp.sum(out) * 1e-9

    def sort_only(acc):
        order = jnp.argsort(idx + (acc * 1e-20).astype(jnp.int32))
        return acc * 0.5 + jnp.sum(order[::131072]).astype(jnp.float32) * 1e-9

    def sorted_sc(acc):
        order = jnp.argsort(idx + (acc * 1e-20).astype(jnp.int32))
        si = jnp.take(idx, order)
        sg = jnp.take(g, order, axis=0)
        out = jax.lax.scatter_add(
            jnp.zeros((args.pool, W), jnp.float32),
            si[:, None],
            sg,
            jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1,),
                inserted_window_dims=(0,),
                scatter_dims_to_operand_dims=(0,),
            ),
            indices_are_sorted=True,
            unique_indices=False,
        )
        return acc * 0.5 + jnp.sum(out) * 1e-9

    def seg(acc):
        order = jnp.argsort(idx + (acc * 1e-20).astype(jnp.int32))
        si = jnp.take(idx, order)
        sg = jnp.take(g, order, axis=0)
        # reduce equal runs with log2(run) shifted adds: after k passes,
        # element i holds the sum of up to 2^k entries of its run ending at i
        run = sg
        sh = 1
        while sh < args.n:
            same = si[sh:] == si[:-sh]
            run = run.at[sh:].add(jnp.where(same[:, None], run[:-sh], 0.0))
            sh *= 2
            if sh > 64:  # runs longer than 128 finish in the scatter
                break
        is_end = jnp.concatenate([si[1:] != si[:-1], jnp.array([True])])
        out = jnp.zeros((args.pool, W), jnp.float32).at[
            jnp.where(is_end, si, args.pool)
        ].add(jnp.where(is_end[:, None], run, 0.0), mode="drop")
        return acc * 0.5 + jnp.sum(out) * 1e-9

    for name, fn in (
        ("base", base),
        ("sort", sort_only),
        ("sorted_sc", sorted_sc),
        ("seg", seg),
    ):
        try:
            dt = chain_time(fn, args.iters)
            print(f"{name:12s} {dt * 1e3:8.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}", flush=True)




def extra_bench():  # pragma: no cover - TPU microbench only
    """Second round: pieces of the sort+cumsum+searchsorted backward."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--pool", type=int, default=147_456)
    ap.add_argument("--width", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args(sys.argv[2:])

    rng = np.random.default_rng(0)
    base_idx = (
        np.cumsum(rng.integers(-3, 4, size=args.n)) % args.pool
    ).astype(np.int32)
    tail = rng.integers(0, args.pool, size=args.n // 10).astype(np.int32)
    base_idx[: tail.shape[0]] = tail
    idx = jnp.asarray(base_idx)
    g = jnp.asarray(
        rng.standard_normal((args.n, args.width)).astype(np.float32)
    )
    W = args.width
    P = args.pool

    def paysort(acc):
        ops = [idx + (acc * 1e-20).astype(jnp.int32)] + [
            g[:, k] for k in range(W)
        ]
        out = jax.lax.sort(ops, num_keys=1)
        return acc * 0.5 + sum(jnp.sum(o[::131072]) for o in out[1:]) * 1e-9

    def full(acc):
        ops = [idx + (acc * 1e-20).astype(jnp.int32)] + [
            g[:, k] for k in range(W)
        ]
        out = jax.lax.sort(ops, num_keys=1)
        si = out[0]
        c = jnp.cumsum(jnp.stack(out[1:], axis=1), axis=0)  # [N, W]
        pos = jnp.searchsorted(si, jnp.arange(P + 1, dtype=si.dtype),
                               side="left") - 1  # [P+1]
        cpad = jnp.concatenate([jnp.zeros((1, W), c.dtype), c], axis=0)
        ends = jnp.take(cpad, pos[1:] + 1, axis=0)
        starts = jnp.take(cpad, pos[:-1] + 1, axis=0)
        d_table = ends - starts
        return acc * 0.5 + jnp.sum(d_table) * 1e-9

    def perm_full(acc):
        # permutation-payload variant (gather.take_rows_sorted_perm_vjp):
        # sort (idx, iota) only, re-order g afterwards with one wide
        # row gather, cumsum in [W, N] layout (no W -> 128 lane padding)
        si, perm = jax.lax.sort(
            [idx + (acc * 1e-20).astype(jnp.int32),
             jnp.arange(args.n, dtype=jnp.int32)],
            num_keys=1,
        )
        gs = jnp.take(g.T, perm, axis=1)  # [W, N]
        c = jnp.cumsum(gs, axis=1)
        pos = jnp.searchsorted(si, jnp.arange(P + 1, dtype=si.dtype),
                               side="left")
        cpad = jnp.concatenate([jnp.zeros((W, 1), c.dtype), c], axis=1)
        bounds = jnp.take(cpad, pos, axis=1)
        d_table = bounds[:, 1:] - bounds[:, :-1]
        return acc * 0.5 + jnp.sum(d_table) * 1e-9

    def cumsum_only(acc):
        c = jnp.cumsum(g + acc * 1e-20, axis=0)
        return acc * 0.5 + jnp.sum(c[-1]) * 1e-9

    def ss_only(acc):
        si = idx + (acc * 1e-20).astype(jnp.int32)
        pos = jnp.searchsorted(si, jnp.arange(P, dtype=si.dtype))
        return acc * 0.5 + jnp.sum(pos[::4096]).astype(jnp.float32) * 1e-9

    for name, fn in (
        ("paysort", paysort),
        ("cumsum", cumsum_only),
        ("searchsorted", ss_only),
        ("full", full),
        ("perm_full", perm_full),
    ):
        try:
            dt = chain_time(fn, args.iters)
            print(f"{name:12s} {dt * 1e3:8.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "extra":
        extra_bench()
    else:
        main()
