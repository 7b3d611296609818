"""Ablation timing of the differentiable fwd+bwd step.

Times image_loss_and_grads variants with selected scene-leaf groups
stop-gradded, using the same chained-dependency differencing bench.py
trusts, to locate where the fwd+bwd time goes. Usage:

    python tools/grads_breakdown.py --width 960 --height 540 --iters 4
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--tris", type=int, default=4096)
    args = ap.parse_args()

    from clraytracer_tpu.camera import Camera
    from clraytracer_tpu.config import CameraConfig
    from clraytracer_tpu.diff import render_image_diff
    from clraytracer_tpu.render import frame_inputs_from_camera
    from clraytracer_tpu.scene import SceneBuilder
    from clraytracer_tpu.scene import procedural_tex as ptex
    from clraytracer_tpu.scene.procedural import uv_sphere

    n_lat = max(4, int((args.tris / 4) ** 0.5) + 1)
    b = SceneBuilder()
    b.import_procedural(ptex.sky_gradient(512, 256))
    checker = b.import_procedural(ptex.checker(128, 8))
    mat = b.create_material(
        albedo=(0.9, 0.6, 0.3), albedo_tex=checker, shininess=1.0,
        roughness=0.4,
    )
    mesh = b.add_mesh(
        uv_sphere(2.0, n_lat=n_lat, n_lon=2 * n_lat), materials_start=mat
    )
    b.add_instance(mesh)
    scene = jax.device_put(b.build())
    cam = Camera.create(
        CameraConfig(position=(0.13, 0.21, 10.0), yaw_deg=-90.0),
        args.width, args.height,
    )
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)
    W, H = args.width, args.height

    sg = jax.lax.stop_gradient

    def stopped(s, groups):
        """Return scene with the named leaf groups stop-gradded."""
        r = s
        if "tris" in groups:
            r = dataclasses.replace(r, tris=sg(r.tris))
        if "atlas" in groups:
            r = dataclasses.replace(r, atlas=sg(r.atlas))
        if "materials" in groups:
            r = dataclasses.replace(r, materials=sg(r.materials))
        if "instances" in groups:
            r = dataclasses.replace(r, instances=sg(r.instances))
        return r

    def timed(label, fn):
        def chain(reps):
            @jax.jit
            def run(s, f):
                def body(i, acc):
                    out = fn(
                        s, f._replace(sun_angle=f.sun_angle + acc * 1e-20)
                    )
                    return acc * 0.5 + out * 1e-6
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
            return run

        c1, cn = chain(1), chain(1 + args.iters)
        v1 = float(c1(scene, frame))
        vn = float(cn(scene, frame))
        assert np.isfinite(v1) and np.isfinite(vn), (label, v1, vn)
        t1 = time.perf_counter()
        float(c1(scene, frame))
        t1 = time.perf_counter() - t1
        tn = time.perf_counter()
        float(cn(scene, frame))
        tn = time.perf_counter() - tn
        dt = max((tn - t1) / args.iters, 1e-9)
        print(f"{label:40s} {dt * 1e3:8.2f} ms/step")

    def fwd_only(s, f):
        img = render_image_diff(s, f, W, H)
        return jnp.mean(img)

    def grads_with(groups):
        def fn(s, f):
            def compute(sc):
                img = render_image_diff(sc, f, W, H)
                return jnp.mean(img)

            loss, g = jax.value_and_grad(
                lambda sc: compute(stopped(sc, groups)), allow_int=True
            )(s)
            leaves = [
                jnp.sum(x) for x in jax.tree_util.tree_leaves(g)
                if jnp.issubdtype(x.dtype, jnp.floating)
            ]
            return loss + sum(leaves) * 1e-9
        return fn

    timed("fwd only (diff path, no grad)", fwd_only)

    # ---- forward-stage ablations (monkeypatched fakes, same shapes) -----
    from clraytracer_tpu.ops import gather as _gather

    real_take_rgb = _gather.take_rgb
    real_take_rows = _gather.take_rows

    def fake_take_rgb(pool, idx):
        return jnp.broadcast_to(
            jnp.asarray([0.5, 0.5, 0.5], jnp.float32).reshape(
                3, *([1] * idx.ndim)
            ),
            (3,) + idx.shape,
        )

    def fake_take_rows(table, idx):
        # row 0 (a real triangle) so the Möller-Trumbore recompute stays
        # finite; only the gather itself is removed
        return jnp.broadcast_to(
            table[0].reshape((table.shape[1],) + (1,) * idx.ndim),
            (table.shape[1],) + idx.shape,
        )

    def timed_patched(label, fn, **patches):
        saved = {k: getattr(_gather, k) for k in patches}
        try:
            for k, v in patches.items():
                setattr(_gather, k, v)
            timed(label, fn)
        finally:
            for k, v in saved.items():
                setattr(_gather, k, v)

    timed_patched("fwd: no texel-pool gathers", fwd_only,
                  take_rgb=fake_take_rgb)
    timed_patched("fwd: no row gathers (tri table)", fwd_only,
                  take_rows=fake_take_rows)
    timed_patched("fwd: neither gather", fwd_only,
                  take_rgb=fake_take_rgb, take_rows=fake_take_rows)

    timed("grads: ALL leaves", grads_with(()))
    timed(
        "grads: NO leaves (backward floor)",
        grads_with(("tris", "atlas", "materials", "instances")),
    )
    timed("grads: no atlas (texel scatter off)", grads_with(("atlas",)))
    timed("grads: no tris", grads_with(("tris",)))
    timed("grads: no materials", grads_with(("materials",)))
    timed("grads: no instances", grads_with(("instances",)))
    timed(
        "grads: only atlas",
        grads_with(("tris", "materials", "instances")),
    )
    timed(
        "grads: only tris",
        grads_with(("atlas", "materials", "instances")),
    )


if __name__ == "__main__":
    main()
