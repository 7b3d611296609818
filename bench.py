"""Benchmark harness: forward ray throughput on the flagship scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}

``vs_baseline`` is the fraction of the BASELINE north-star target of
1 Grays/s/chip forward (1.0 == target met). The reference publishes no
absolute throughput (SURVEY.md §6); for context, its fatal watchdog implies a
floor of ~22 Mrays/s (1249x720x2 bounces / 80 ms) on its 2022-era GPU.

Scene: BASELINE config-2 shape — textured UV sphere + equirect sky at
1920x1080, 2 bounces, full BVH traversal + shading + post chain.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--tracer", default=None, help="tracer name (default: best)")
    ap.add_argument("--tris", type=int, default=4096, help="approx triangle count")
    ap.add_argument("--scene", default=None,
                    help="named scene or path (.obj/.clm/.clsnap.npz); "
                    "default: the built-in textured-sphere config-2 scene")
    ap.add_argument("--camera-pos", type=float, nargs=3, default=None)
    ap.add_argument("--yaw", type=float, default=-90.0)
    ap.add_argument("--atlas", action="store_true",
                    help="bake the default scene's textures into the texel "
                    "pool (imported-image path) instead of registering "
                    "procedural descriptors — benches the two-phase "
                    "trace+XLA-shade path with real per-ray pool gathers")
    ap.add_argument("--gi", action="store_true",
                    help="benchmark the Monte-Carlo diffuse GI frame "
                    "(cosine-hemisphere continuations; two-phase path)")
    ap.add_argument("--grads", action="store_true",
                    help="benchmark the DIFFERENTIABLE fwd+bwd step (image "
                    "L2 loss, gradients w.r.t. every scene leaf) instead of "
                    "the forward frame (BASELINE configs 3/4)")
    ap.add_argument("--matrix", action="store_true",
                    help="run the full benchmark matrix (flagship / museum / "
                    "1M-tri / atlas / GI / grads) as isolated subprocesses, "
                    "print one JSON line per row, and write BENCH_MATRIX.json")
    args = ap.parse_args()

    if args.matrix:
        return _bench_matrix(args)

    import jax

    from clraytracer_tpu.camera import Camera
    from clraytracer_tpu.config import CameraConfig, RenderConfig
    from clraytracer_tpu.render import TRACERS, frame_inputs_from_camera, render_frame
    from clraytracer_tpu.scene import SceneBuilder
    from clraytracer_tpu.scene.procedural import uv_sphere
    from clraytracer_tpu.scene import procedural_tex as ptex

    # ~args.tris triangles: 2 * n_lon * (n_lat - 1) with n_lon = 2 * n_lat
    n_lat = max(4, int((args.tris / 4) ** 0.5) + 1)
    n_lon = 2 * n_lat

    if args.scene:
        from clraytracer_tpu.cli import build_scene

        scene = jax.device_put(build_scene(args.scene, args.tris))
        scene_label = args.scene.rsplit("/", 1)[-1]
    else:
        b = SceneBuilder()
        if args.atlas:
            from clraytracer_tpu.scene.textures import checkerboard, gradient_sky

            b.import_texture(gradient_sky(512, 256))
            checker = b.import_texture(checkerboard(128, 8))
        else:
            b.import_procedural(ptex.sky_gradient(512, 256))
            checker = b.import_procedural(ptex.checker(128, 8))
        mat = b.create_material(
            albedo=(0.9, 0.6, 0.3), albedo_tex=checker, shininess=1.0, roughness=0.4
        )
        mesh = b.add_mesh(uv_sphere(2.0, n_lat=n_lat, n_lon=n_lon), materials_start=mat)
        b.add_instance(mesh)
        scene = jax.device_put(b.build())
        scene_label = "sphere scene" + (" (atlas tex)" if args.atlas else "")

    pos = tuple(args.camera_pos) if args.camera_pos else (0.13, 0.21, 10.0)
    cam = Camera.create(
        CameraConfig(position=pos, yaw_deg=args.yaw), args.width, args.height
    )
    config = RenderConfig(
        width=args.width, height=args.height, enable_gi=args.gi
    )
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)

    tracer_name = args.tracer or _best_tracer_name(TRACERS)
    tracer = TRACERS[tracer_name]

    if args.grads:
        return _bench_grads(args, scene, frame, config, scene_label)

    if args.gi:
        from clraytracer_tpu.ops.render_pallas import fused_path_available

        if tracer_name not in ("pallas", "best") or not fused_path_available(
            scene, config.reference_parity_shading, config.integer_colors
        ):
            # GI through the TWO-PHASE path only (fused unavailable): its
            # fori-chained program trips an axon-backend bug on its second
            # invocation at 1080p-scale (identical executable + args;
            # unchained repeated renders are fine — verified 2026-08-20):
            # host-chain dependent frames instead. Per-dispatch tunnel
            # overhead makes that an UPPER bound on frame time. Fused GI
            # (procedural AND atlas scenes, via the deferred color-product
            # pass) uses the normal chained timing below.
            return _bench_gi_hostchain(args, scene, frame, config, scene_label)

    # Honest timing on a tunneled TPU: block_until_ready can return before
    # device work completes (measured 50x too fast), so the per-frame time is
    # taken as the wall-clock DIFFERENCE between an in-graph chain of
    # (1 + iters) dependent frames and a 1-frame chain, each consumed down to
    # one scalar readback. Every frame in the chain depends on the previous
    # frame's pixels (sun_angle perturbation), so nothing can be hoisted,
    # cached, or overlapped away.
    import jax.numpy as jnp

    def chain(reps: int):
        @jax.jit
        def run(s, f):
            def body(i, acc):
                img = render_frame(
                    s,
                    f._replace(sun_angle=f.sun_angle + acc * 1e-20),
                    config,
                    tracer=tracer,
                )
                # FULL reduce: a strided-slice consume (img[::97]) lets XLA
                # slice-propagate backward and dead-code-eliminate real frame
                # work (measured: the final bounce's texel gather vanished
                # entirely) — only a complete reduction forces every pixel
                return acc * 0.5 + jnp.sum(img) * 1e-6
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        return run

    c1, cn = chain(1), chain(1 + args.iters)
    v1 = float(c1(scene, frame))  # compile + warm
    vn = float(cn(scene, frame))
    assert np.isfinite(v1) and np.isfinite(vn), "render produced non-finite values"
    t1 = time.perf_counter()
    float(c1(scene, frame))
    t1 = time.perf_counter() - t1
    tn = time.perf_counter()
    float(cn(scene, frame))
    tn = time.perf_counter() - tn
    dt = max((tn - t1) / args.iters, 1e-9)

    rays = args.width * args.height * config.bounces
    mrays = rays / dt / 1e6
    print(
        json.dumps(
            {
                "metric": f"fwd rays/s, {args.width}x{args.height}x"
                f"{config.bounces}bounce {scene_label}"
                + (" +GI" if args.gi else "")
                + f", tracer={tracer_name}",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 1000.0, 4),
            }
        )
    )


def _bench_gi_hostchain(args, scene, frame, config, scene_label) -> None:
    import jax
    import jax.numpy as jnp

    from clraytracer_tpu.render import TRACERS, render_frame

    tracer = TRACERS[args.tracer or _best_tracer_name(TRACERS)]

    @jax.jit
    def one(s, f):
        img = render_frame(s, f, config, tracer=tracer)
        return jnp.sum(img) * 1e-6

    acc = float(one(scene, frame))  # compile + warm
    assert np.isfinite(acc)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        acc = float(
            one(scene, frame._replace(sun_angle=frame.sun_angle + acc * 1e-20))
        )
    dt = max((time.perf_counter() - t0) / args.iters, 1e-9)
    rays = args.width * args.height * config.bounces
    print(
        json.dumps(
            {
                "metric": f"fwd rays/s, {args.width}x{args.height}x"
                f"{config.bounces}bounce {scene_label} +GI "
                "(host-chained: includes per-dispatch overhead)",
                "value": round(rays / dt / 1e6, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(rays / dt / 1e9, 4),
            }
        )
    )


def _bench_grads(args, scene, frame, config, scene_label) -> None:
    """fwd+bwd rays/s: one differentiable render + L2 loss + gradients
    w.r.t. every scene leaf per rep (the float shading path — the integer
    reference-parity modulate is non-differentiable)."""
    import jax
    import jax.numpy as jnp

    from clraytracer_tpu.diff import image_loss_and_grads

    W, H = args.width, args.height

    def chain(reps: int):
        @jax.jit
        def run(s, f):
            def body(i, acc):
                loss, grads = image_loss_and_grads(
                    s, f._replace(sun_angle=f.sun_angle + acc * 1e-20), W, H
                )
                # consume EVERY float gradient leaf: anything unconsumed
                # (vertices, normals, instance transforms, ...) would be
                # dead code XLA eliminates — the step being timed must be
                # the full all-leaves backward
                leaf_sums = sum(
                    jnp.sum(x) * 1e-9
                    for x in jax.tree_util.tree_leaves(grads)
                    if jnp.issubdtype(x.dtype, jnp.floating)
                )
                return acc * 0.5 + loss * 1e-6 + leaf_sums
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        return run

    c1, cn = chain(1), chain(1 + args.iters)
    v1 = float(c1(scene, frame))
    vn = float(cn(scene, frame))
    assert np.isfinite(v1) and np.isfinite(vn), (v1, vn)
    t1 = time.perf_counter()
    float(c1(scene, frame))
    t1 = time.perf_counter() - t1
    tn = time.perf_counter()
    float(cn(scene, frame))
    tn = time.perf_counter() - tn
    dt = max((tn - t1) / args.iters, 1e-9)
    rays = W * H * config.bounces
    mrays = rays / dt / 1e6
    print(
        json.dumps(
            {
                "metric": f"fwd+bwd rays/s, {W}x{H}x{config.bounces}bounce "
                f"{scene_label}, grads w.r.t. all scene leaves",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 1000.0, 4),
            }
        )
    )


def _bench_matrix(args) -> None:
    """The numbers that actually move round to round (VERDICT r4 item 7):
    each row runs in its own subprocess (fresh backend — one row's compile
    or failure can't poison the next), prints its own JSON line, and the
    collected rows land in BENCH_MATRIX.json next to this script."""
    import os
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    rows_spec = [
        ("flagship", []),
        ("museum", ["--scene", "museum"]),
        ("1M-tri", ["--tris", "1000000"]),
        ("atlas", ["--atlas"]),
        ("gi", ["--gi"]),
        ("grads", ["--grads", "--iters", "4"]),
    ]
    rows = []
    for name, extra in rows_spec:
        cmd = [sys.executable, os.path.join(here, "bench.py"),
               "--width", str(args.width), "--height", str(args.height),
               "--iters", str(args.iters), *extra]
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=1800
            )
            line = next(
                (ln for ln in proc.stdout.splitlines()
                 if ln.startswith("{")), None
            )
            if proc.returncode != 0 or line is None:
                row = {"metric": name, "error":
                       (proc.stderr or "no output").strip()[-500:]}
            else:
                row = json.loads(line)
                row["row"] = name
        except subprocess.TimeoutExpired:
            row = {"metric": name, "error": "timeout"}
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(os.path.join(here, "BENCH_MATRIX.json"), "w") as f:
        json.dump(rows, f, indent=1)


def _best_tracer_name(tracers: dict) -> str:
    """Prefer the Pallas kernel when registered, else the wavefront path."""
    for name in ("pallas", "wavefront"):
        if name in tracers:
            return name
    return next(iter(tracers))


if __name__ == "__main__":
    sys.exit(main())
