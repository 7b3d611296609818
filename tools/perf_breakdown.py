"""Component-level frame-time breakdown on the real TPU.

Times each pipeline stage with the chained-fori difference method (the only
honest timing on the tunneled device — see bench.py): for each component a
jitted chain of (1 + N) dependent reps is compared against a 1-rep chain;
every rep's inputs depend on the previous rep's outputs so nothing hoists.

Components:
  raygen      — camera unprojection only
  trace1      — one Pallas traversal (no shading)
  frame_b1    — 1-bounce frame, no post
  frame_b2    — 2-bounce frame, no post
  frame_post  — 2-bounce frame + post chain

Derived: shade/bounce = frame_b1 - trace1 - raygen; bounce cost =
frame_b2 - frame_b1; post = frame_post - frame_b2.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def chain_time(fn, n_iters: int) -> float:
    """Seconds per rep of ``fn(acc) -> acc`` via the (1+N)-vs-1 difference."""

    def chain(reps):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, reps, lambda i, acc: fn(acc), x)

        return run

    c1, cn = chain(1), chain(1 + n_iters)
    v1 = float(c1(jnp.float32(0.0)))  # compile + warm
    vn = float(cn(jnp.float32(0.0)))
    assert np.isfinite(v1) and np.isfinite(vn), (v1, vn)
    t = time.perf_counter()
    float(c1(jnp.float32(0.0)))
    t1 = time.perf_counter() - t
    t = time.perf_counter()
    float(cn(jnp.float32(0.0)))
    tn = time.perf_counter() - t
    return max((tn - t1) / n_iters, 1e-9)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--tris", type=int, default=4096)
    ap.add_argument(
        "--only", default=None, help="comma list of component names to run"
    )
    args = ap.parse_args()

    from clraytracer_tpu.camera import Camera, ray_directions_planar
    from clraytracer_tpu.config import CameraConfig, RenderConfig
    from clraytracer_tpu.ops.trace_pallas import trace_pallas
    from clraytracer_tpu.ops.post import post_process
    from clraytracer_tpu.render import (
        frame_inputs_from_camera,
        render_frame,
        trace_image,
    )
    from clraytracer_tpu.scene import SceneBuilder
    from clraytracer_tpu.scene.procedural import uv_sphere
    from clraytracer_tpu.scene.textures import checkerboard, gradient_sky

    W, H = args.width, args.height
    n_lat = max(4, int((args.tris / 4) ** 0.5) + 1)
    b = SceneBuilder()
    b.import_texture(gradient_sky(512, 256))
    checker = b.import_texture(checkerboard(128, 8))
    mat = b.create_material(
        albedo=(0.9, 0.6, 0.3), albedo_tex=checker, shininess=1.0, roughness=0.4
    )
    mesh = b.add_mesh(
        uv_sphere(2.0, n_lat=n_lat, n_lon=2 * n_lat), materials_start=mat
    )
    b.add_instance(mesh)
    scene = jax.device_put(b.build())
    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), W, H)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)

    def raygen(acc):
        dirs = ray_directions_planar(
            frame.inverse_view + acc * 1e-20,
            frame.inverse_projection,
            W,
            H,
        )
        return acc * 0.5 + dirs[0, 0, 0] + jnp.sum(dirs[2, ::97, ::97]) * 1e-6

    dirs0 = ray_directions_planar(
        frame.inverse_view, frame.inverse_projection, W, H
    )
    origin0 = jnp.broadcast_to(
        frame.camera_position[:, None, None], dirs0.shape
    )

    def trace1(acc):
        hit = trace_pallas(scene, origin0 + acc * 1e-20, dirs0)
        return (
            acc * 0.5
            + hit.t[0, 0]
            + jnp.sum(hit.t[::97, ::97]) * 1e-6
            + hit.u[5, 5]
        )

    def frame_fn(bounces, post):
        cfg = RenderConfig(width=W, height=H, bounces=bounces, enable_post=post)

        def fn(acc):
            img = render_frame(
                scene,
                frame._replace(sun_angle=frame.sun_angle + acc * 1e-20),
                cfg,
                tracer=trace_pallas,
            )
            return (
                acc * 0.5
                + img[0, 0, 0]
                + img[-1, -1, 1]
                + jnp.sum(img[::97, ::97, 2]) * 1e-6
            )

        return fn

    # ---- shading micro-components (fixed trace outputs as jit inputs) ----
    from clraytracer_tpu.ops import gather
    from clraytracer_tpu.ops.shade import initial_bounce_state, shade_hits

    hit0 = jax.block_until_ready(trace_pallas(scene, origin0, dirs0))
    attrs0 = (hit0.attr_normal, hit0.attr_uu, hit0.attr_vv, hit0.attr_mat)

    def shade1(acc):
        state = initial_bounce_state(
            origin0, dirs0, jnp.float32(-1.96) + acc * 1e-20
        )
        st = shade_hits(
            scene, state, t=hit0.t, u=hit0.u, v=hit0.v, tri_idx=hit0.tri,
            instance_idx=hit0.instance, hit=hit0.hit, attrs=attrs0,
        )
        return (
            acc * 0.5 + st.result[0, 0, 0]
            + jnp.sum(st.result[2, ::97, ::97]) * 1e-6
        )

    def texel_gather(acc):
        idx = (
            (dirs0[0] * 1e4 + acc).astype(jnp.int32) % scene.atlas.texels.shape[0]
        )
        tex = gather.take_rows(scene.atlas.texels, idx)
        return acc * 0.5 + tex[0, 0, 0] + jnp.sum(tex[2, ::97, ::97]) * 1e-6

    def tri_take(acc):
        slot = (dirs0[0] * 1e4 + acc).astype(jnp.int32) % scene.clusters.tri_gid.shape[0]
        tri = jnp.take(scene.clusters.tri_gid, slot, mode="clip")
        return acc * 0.5 + jnp.sum(tri[::97, ::97]).astype(jnp.float32) * 1e-6

    from clraytracer_tpu.ops import planar
    from clraytracer_tpu.render import trace_planar

    def interleave(acc):
        p = dirs0 + acc * 1e-20  # [3, H, W]
        img = planar.to_last(p, (H, W))
        return acc * 0.5 + img[0, 0, 0] + jnp.sum(img[::97, ::97, 2]) * 1e-6

    def frame_planar(bounces):
        def fn(acc):
            res = trace_planar(
                scene, origin0, dirs0,
                frame.sun_angle + acc * 1e-20, bounces, trace_pallas,
                True, True,
            )
            return (
                acc * 0.5 + res[0, 0, 0]
                + jnp.sum(res[2, ::97, ::97]) * 1e-6
            )
        return fn

    components = {
        "raygen": raygen,
        "trace1": trace1,
        "shade1": shade1,
        "interleave": interleave,
        "frame_planar_b1": frame_planar(1),
        "frame_planar_b2": frame_planar(2),
        "texel_gather": texel_gather,
        "tri_take": tri_take,
        "frame_b1": frame_fn(1, False),
        "frame_b2": frame_fn(2, False),
        "frame_post": frame_fn(2, True),
    }
    if args.only:
        names = args.only.split(",")
        components = {k: components[k] for k in names}

    out = {}
    for name, fn in components.items():
        dt = chain_time(fn, args.iters)
        out[name] = round(dt * 1e3, 3)
        print(f"{name}: {dt * 1e3:.3f} ms", flush=True)

    if {"frame_b1", "trace1", "raygen"} <= out.keys():
        out["shade1_derived"] = round(
            out["frame_b1"] - out["trace1"] - out["raygen"], 3
        )
    if {"frame_b2", "frame_b1"} <= out.keys():
        out["bounce2_derived"] = round(out["frame_b2"] - out["frame_b1"], 3)
    if {"frame_post", "frame_b2"} <= out.keys():
        out["post_derived"] = round(out["frame_post"] - out["frame_b2"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
