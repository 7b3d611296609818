"""A/B of the wide-table differentiable gather paths on real hardware.

Times forward and fwd+bwd of take_rows (XLA gather + serialized-scatter
VJP), take_rows_sorted_perm_vjp, and take_rows_mxu (the chunk-predicated
one-hot MXU kernel, ops/gather_pallas.py) at tracer-realistic shapes:
[T, 25] table, ~2M coherent indices (1080p, 1 bounce worth).

    python tools/gather_mxu_bench.py --tris 4096 --rows 16384
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=4096)
    ap.add_argument("--rows", type=int, default=16384)  # rows x 128 rays
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from clraytracer_tpu.ops import gather
    from clraytracer_tpu.ops import gather_pallas

    rng = np.random.default_rng(0)
    T, W = args.tris, 25
    table = jnp.asarray(rng.normal(size=(T, W)).astype(np.float32))
    # coherent ids: sorted blocks with jitter — winner statistics of a
    # screen-tiled trace (nearby rays hit nearby triangles)
    base = np.sort(rng.integers(0, T, args.rows))
    idx = np.clip(
        base[:, None] + rng.integers(-40, 40, (args.rows, 128)), 0, T - 1
    ).astype(np.int32)
    idx = jnp.asarray(idx)
    g = jnp.asarray(rng.normal(size=(W, args.rows, 128)).astype(np.float32))

    def timed(label, fn):
        def chain(reps):
            @jax.jit
            def run(t):
                def body(i, acc):
                    out = fn(t * (1.0 + acc * 1e-20))
                    return acc * 0.5 + out * 1e-6
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
            return run

        c1, cn = chain(1), chain(1 + args.iters)
        assert np.isfinite(float(c1(table))) and np.isfinite(float(cn(table)))
        t1 = time.perf_counter(); float(c1(table)); t1 = time.perf_counter() - t1
        tn = time.perf_counter(); float(cn(table)); tn = time.perf_counter() - tn
        dt = max((tn - t1) / args.iters, 1e-9)
        print(f"{label:44s} {dt * 1e3:8.2f} ms")

    def fwd(take):
        def fn(t):
            return jnp.sum(take(t, idx))
        return fn

    def fwdbwd(take):
        def fn(t):
            def loss(tt):
                return jnp.sum(take(tt, idx) * g)
            l, d = jax.value_and_grad(loss)(t)
            return l + jnp.sum(d) * 1e-9
        return fn

    paths = [("xla take_rows", gather.take_rows),
             ("sorted-perm", gather.take_rows_sorted_perm_vjp),
             ("mxu kernel", gather_pallas.take_rows_mxu)]
    for name, take in paths:
        timed(f"fwd      {name}", fwd(take))
    for name, take in paths:
        timed(f"fwd+bwd  {name}", fwdbwd(take))


if __name__ == "__main__":
    main()
