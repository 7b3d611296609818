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
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _bounded(fn):
    """Wrap a chain body so the accumulator stays in [-1, 1] every rep.

    CRITICAL honesty guard: components feed ``acc * 1e-20`` into ray
    origins/angles for the dependence chain. If a component's reduction is
    unbounded (e.g. summing hit.t, where every MISS contributes 1e30), acc
    explodes to ~1e30, the perturbation becomes ~1e10, every ray leaves the
    scene, and the kernel's data-dependent traversal collapses to the
    empty-scene fast path — measured 4.1 ms vs the true 14.9 ms at 1080p.
    With |acc| <= 1, acc * 1e-20 is a bit-exact no-op on O(1) origins while
    remaining an un-hoistable data dependence, so the measured work is the
    real workload's."""
    return lambda acc: jnp.sin(fn(acc))


def chain_time(fn, n_iters: int) -> float:
    """Seconds per rep of ``fn(acc) -> acc`` via the (1+N)-vs-1 difference."""
    fn = _bounded(fn)

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


def profile_time(fn, name: str, reps: int = 4) -> dict:
    """Trace a ``reps``-chain of fn under jax.profiler and aggregate device
    op durations (ms per rep). The chain-difference wall-clock method
    under-reports ops the scheduler overlaps (measured: the Pallas kernel
    read 0.6 ms by chain-difference vs 13 ms/bounce in the device trace),
    so the profiler is the arbiter for per-op attribution."""
    import collections
    import glob
    import gzip
    import json as _json
    import shutil
    import tempfile

    fn = _bounded(fn)

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, reps, lambda i, acc: fn(acc), x)

    float(run(jnp.float32(0.0)))  # compile + warm
    tmp = tempfile.mkdtemp(prefix=f"xprof_{name}_")
    jax.profiler.start_trace(tmp)
    float(run(jnp.float32(0.0)))
    jax.profiler.stop_trace()

    traces = glob.glob(f"{tmp}/**/*.trace.json.gz", recursive=True)
    dur: collections.Counter = collections.Counter()
    total = 0.0
    for path in traces:
        with gzip.open(path) as f:
            tr = _json.load(f)
        ev = tr.get("traceEvents", [])
        tidname = {
            (e["pid"], e["tid"]): e["args"]["name"]
            for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"
        }
        for e in ev:
            if (
                e.get("ph") == "X"
                and tidname.get((e.get("pid"), e.get("tid"))) == "XLA Ops"
                and not e["name"].startswith("while")
            ):
                dur[e["name"]] += e.get("dur", 0)
                total += e.get("dur", 0)
    shutil.rmtree(tmp, ignore_errors=True)
    out = {
        "total_ms_per_rep": round(total / reps / 1e3, 3),
        "top": [
            (n, round(d / reps / 1e3, 3)) for n, d in dur.most_common(12)
        ],
    }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--tris", type=int, default=4096)
    ap.add_argument(
        "--only", default=None, help="comma list of component names to run"
    )
    ap.add_argument(
        "--mode", default="chain", choices=["chain", "profile"],
        help="chain = wall-clock difference; profile = device-trace op sums",
    )
    ap.add_argument("--scene", default=None,
                    help="scene spec override (cli.build_scene); the "
                    "default is the procedural config-2 sphere")
    ap.add_argument("--camera-pos", type=float, nargs=3, default=None)
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
    from clraytracer_tpu.scene import procedural_tex as ptex

    W, H = args.width, args.height
    n_lat = max(4, int((args.tris / 4) ** 0.5) + 1)
    b = SceneBuilder()
    b.import_procedural(ptex.sky_gradient(512, 256))
    checker = b.import_procedural(ptex.checker(128, 8))
    mat = b.create_material(
        albedo=(0.9, 0.6, 0.3), albedo_tex=checker, shininess=1.0, roughness=0.4
    )
    mesh = b.add_mesh(
        uv_sphere(2.0, n_lat=n_lat, n_lon=2 * n_lat), materials_start=mat
    )
    b.add_instance(mesh)
    if args.scene:
        from clraytracer_tpu.cli import build_scene

        scene = jax.device_put(build_scene(args.scene, args.tris))
    else:
        scene = jax.device_put(b.build())
    pos = tuple(args.camera_pos) if args.camera_pos else (0.13, 0.21, 10.0)
    cam = Camera.create(CameraConfig(position=pos), W, H)
    frame = frame_inputs_from_camera(cam, sun_angle=-1.96)

    def raygen(acc):
        dirs = ray_directions_planar(
            frame.inverse_view + acc * 1e-20,
            frame.inverse_projection,
            W,
            H,
        )
        return acc * 0.5 + jnp.sum(dirs) * 1e-6

    # standalone trace components use the frame path's screen-tile ray
    # order — traversal cost is strongly layout-dependent (a scanline-band
    # tile crosses the whole image and defeats per-tile culling)
    from clraytracer_tpu.camera import ray_directions_tiled
    from clraytracer_tpu.ops.trace_pallas import _tile_rows

    dirs0 = ray_directions_tiled(
        frame.inverse_view, frame.inverse_projection, W, H,
        _tile_rows(W * H),
    )
    origin0 = jnp.broadcast_to(
        frame.camera_position[:, None, None], dirs0.shape
    )

    def trace1(acc):
        hit = trace_pallas(scene, origin0 + acc * 1e-20, dirs0)
        return acc * 0.5 + jnp.sum(hit.t) * 1e-6 + jnp.sum(hit.u) * 1e-6

    def frame_fused_rows(rows):
        """Fused megakernel with an explicit kernel tile height (vreg
        pressure vs scalar-amortization sweep)."""
        from clraytracer_tpu.ops.render_pallas import render_fused

        def fn(acc):
            res = render_fused(
                scene, origin0 + acc * 1e-20, dirs0,
                jnp.float32(-1.96), 2, rows=rows,
            )
            return acc * 0.5 + jnp.sum(res) * 1e-6

        return fn

    def frame_fn(bounces, post):
        cfg = RenderConfig(width=W, height=H, bounces=bounces, enable_post=post)

        def fn(acc):
            img = render_frame(
                scene,
                frame._replace(sun_angle=frame.sun_angle + acc * 1e-20),
                cfg,
                tracer=trace_pallas,
            )
            return acc * 0.5 + jnp.sum(img) * 1e-6

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
        return acc * 0.5 + jnp.sum(st.result) * 1e-6

    def texel_gather(acc):
        idx = (
            (dirs0[0] * 1e4 + acc).astype(jnp.int32) % scene.atlas.texels.shape[0]
        )
        tex = gather.take_rows(scene.atlas.texels, idx)
        return acc * 0.5 + jnp.sum(tex) * 1e-6

    def tri_take(acc):
        slot = (dirs0[0] * 1e4 + acc).astype(jnp.int32) % scene.clusters.tri_gid.shape[0]
        tri = jnp.take(scene.clusters.tri_gid, slot, mode="clip")
        return acc * 0.5 + jnp.sum(tri).astype(jnp.float32) * 1e-6

    from clraytracer_tpu.ops import planar
    from clraytracer_tpu.render import trace_planar

    def interleave(acc):
        # dirs0 is ray-tiled [3, rows, 128] with padding: crop to H*W
        # planar pixels before the [H, W, 3] interleave being measured
        p = (dirs0 + acc * 1e-20).reshape(3, -1)[:, : H * W]
        img = planar.to_last(p, (H, W))
        return acc * 0.5 + jnp.sum(img) * 1e-6

    def frame_planar(bounces):
        def fn(acc):
            res = trace_planar(
                scene, origin0, dirs0,
                frame.sun_angle + acc * 1e-20, bounces, trace_pallas,
                True, True,
            )
            return acc * 0.5 + jnp.sum(res) * 1e-6
        return fn

    def relayout(acc):
        x = dirs0 + acc * 1e-20  # [3, H, W]
        rows = (H * W) // 128
        lin = x.reshape(3, -1).reshape(3, rows, 128)
        back = lin.reshape(3, -1).reshape(3, H, W)
        return acc * 0.5 + jnp.sum(back) * 1e-6

    def tshade(acc):
        hit = trace_pallas(scene, origin0 + acc * 1e-20, dirs0)
        at = (hit.attr_normal, hit.attr_uu, hit.attr_vv, hit.attr_mat)
        state = initial_bounce_state(origin0, dirs0, jnp.float32(-1.96))
        st = shade_hits(
            scene, state, t=hit.t, u=hit.u, v=hit.v, tri_idx=hit.tri,
            instance_idx=hit.instance, hit=hit.hit, attrs=at,
        )
        return acc * 0.5 + jnp.sum(st.result) * 1e-6

    def tshade_bar(acc):
        hit = trace_pallas(scene, origin0 + acc * 1e-20, dirs0)
        hit = jax.tree.map(jax.lax.optimization_barrier, hit)
        at = (hit.attr_normal, hit.attr_uu, hit.attr_vv, hit.attr_mat)
        state = initial_bounce_state(origin0, dirs0, jnp.float32(-1.96))
        st = shade_hits(
            scene, state, t=hit.t, u=hit.u, v=hit.v, tri_idx=hit.tri,
            instance_idx=hit.instance, hit=hit.hit, attrs=at,
        )
        return acc * 0.5 + jnp.sum(st.result) * 1e-6

    def gather_coh(acc):
        # coherent indices: neighboring rays → neighboring pool rows
        base = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) // 4
        idx = (base + acc.astype(jnp.int32)) % scene.atlas.texels.shape[0]
        tex = gather.take_rows(scene.atlas.texels, idx)
        return acc * 0.5 + jnp.sum(tex) * 1e-6

    def texel_rgb4(acc):
        idx = (
            (dirs0[0] * 1e4 + acc).astype(jnp.int32) % scene.atlas.texels.shape[0]
        )
        tex = gather.take_rgb(scene.atlas.texels, idx)
        return acc * 0.5 + jnp.sum(tex) * 1e-6

    def trace_all(acc):
        hit = trace_pallas(scene, origin0 + acc * 1e-20, dirs0)
        leaves = jax.tree.leaves(hit)
        return acc * 0.5 + sum(
            jnp.sum(l.astype(jnp.float32)) for l in leaves
        ) * 1e-6

    from clraytracer_tpu.camera import ray_directions_linear

    rows_lin = dirs0.shape[1]
    dirs_lin = ray_directions_linear(
        frame.inverse_view, frame.inverse_projection, W, H, rows_lin
    )
    origin_lin = jnp.broadcast_to(
        frame.camera_position[:, None, None], dirs_lin.shape
    )

    def trace_all_lin(acc):
        hit = trace_pallas(scene, origin_lin + acc * 1e-20, dirs_lin)
        leaves = jax.tree.leaves(hit)
        return acc * 0.5 + sum(
            jnp.sum(l.astype(jnp.float32)) for l in leaves
        ) * 1e-6

    def texel_extpad(acc):
        # pool padded to [P, 4] OUTSIDE jit (device-resident argument)
        idx = (
            (dirs0[0] * 1e4 + acc).astype(jnp.int32) % pool4.shape[0]
        )
        tex = gather.take_rows(pool4, idx)
        return acc * 0.5 + jnp.sum(tex) * 1e-6

    pool4 = jax.device_put(
        jnp.pad(np.asarray(scene.atlas.texels), ((0, 0), (0, 1)))
    )

    def trace_variant(variant):
        def fn(acc):
            hit = trace_pallas(
                scene, origin0 + acc * 1e-20, dirs0, variant=variant
            )
            # consume geometry + one attr; skip hit.tri (tri_gid take)
            # (non-'full' variants return attr_* = None)
            leaves = [hit.t, hit.u, hit.v]
            if hit.attr_uu is not None:
                leaves.append(hit.attr_uu)
            return acc * 0.5 + sum(jnp.sum(l) for l in leaves) * 1e-6

        return fn

    def trace_lin(acc):
        """Exactly the frame's bounce-1 trace input path (ray-linear)."""
        from clraytracer_tpu.camera import ray_directions_linear
        from clraytracer_tpu.ops.trace_pallas import _tile_rows

        n = W * H
        tile = _tile_rows(n) * 128
        rows = (-(-n // tile) * tile) // 128
        dirs = ray_directions_linear(
            frame.inverse_view + acc * 1e-20,
            frame.inverse_projection, W, H, rows,
        )
        origin = jnp.broadcast_to(
            frame.camera_position[:, None, None], dirs.shape
        )
        hit = trace_pallas(scene, origin, dirs)
        leaves = [hit.t, hit.u, hit.v, hit.attr_uu]
        return acc * 0.5 + sum(jnp.sum(l) for l in leaves) * 1e-6

    def trace_consume(which):
        def fn(acc):
            hit = trace_pallas(scene, origin0 + acc * 1e-20, dirs0)
            sel = {
                "base": [hit.t, hit.u, hit.v, hit.attr_uu],
                "vvmat": [hit.t, hit.attr_uu, hit.attr_vv, hit.attr_mat],
                "normal": [hit.t, hit.attr_normal],
                "inst": [hit.t, hit.instance.astype(jnp.float32)],
                "tri": [hit.t, hit.tri.astype(jnp.float32)],
                "all": [
                    hit.t, hit.u, hit.v, hit.attr_uu, hit.attr_vv,
                    hit.attr_mat, hit.attr_normal,
                    hit.instance.astype(jnp.float32),
                ],
            }[which]
            return acc * 0.5 + sum(jnp.sum(l) for l in sel) * 1e-6

        return fn

    def tmin(mode):
        from clraytracer_tpu.ops.shade import initial_bounce_state as _ibs

        def fn(acc):
            hit = trace_pallas(scene, origin0 + acc * 1e-20, dirs0)
            t, u, v = hit.t, hit.u, hit.v
            n = hit.attr_normal
            if mode == "mix":
                r = n * t[None] + u[None]
                return acc * 0.5 + jnp.sum(r) * 1e-6 + jnp.sum(v) * 1e-6
            if mode == "state":
                state = _ibs(origin0, dirs0, jnp.float32(-1.96))
                r = planar.where(
                    hit.hit, n * t[None] + state.energy, state.atmospheric
                )
                return acc * 0.5 + jnp.sum(r) * 1e-6
            if mode == "norm":
                nn = planar.normalize(n)
                r = planar.reflect(dirs0, nn)
                return acc * 0.5 + jnp.sum(r) * 1e-6 + jnp.sum(t) * 1e-6
            raise ValueError(mode)

        return fn

    def tshade_variant(patches):
        """tshade with named pieces stubbed out (jit-trace-time patches)."""
        import contextlib
        from clraytracer_tpu.ops import shade as shade_mod

        @contextlib.contextmanager
        def patched():
            saved = {}
            if "nogather" in patches:
                saved["take_rgb"] = gather.take_rgb
                gather.take_rgb = lambda pool, idx: jnp.zeros(
                    (3,) + idx.shape, jnp.float32
                ) + idx[None].astype(jnp.float32) * 1e-20
            if "noonehot" in patches:
                saved["onehot_rows"] = gather.onehot_rows
                gather.onehot_rows = lambda table, idx: (
                    jnp.zeros((table.shape[1],) + idx.shape, jnp.float32)
                    + table[0][(...,) + (None,) * idx.ndim]
                    + idx[None].astype(jnp.float32) * 1e-20
                )
            if "nosky" in patches:
                saved["_skybox_index"] = shade_mod._skybox_index
                shade_mod._skybox_index = lambda w, h, off, d: (
                    d[0].astype(jnp.int32) * 0
                )
            try:
                yield
            finally:
                gather.take_rgb = saved.get("take_rgb", gather.take_rgb)
                gather.onehot_rows = saved.get("onehot_rows", gather.onehot_rows)
                shade_mod._skybox_index = saved.get(
                    "_skybox_index", shade_mod._skybox_index
                )

        def fn(acc):
            with patched():
                hit = trace_pallas(scene, origin0 + acc * 1e-20, dirs0)
                at = (hit.attr_normal, hit.attr_uu, hit.attr_vv, hit.attr_mat)
                state = initial_bounce_state(origin0, dirs0, jnp.float32(-1.96))
                st = shade_hits(
                    scene, state, t=hit.t, u=hit.u, v=hit.v, tri_idx=hit.tri,
                    instance_idx=hit.instance, hit=hit.hit, attrs=at,
                )
            return acc * 0.5 + jnp.sum(st.result) * 1e-6

        return fn

    def gather_w(width):
        pool = jnp.zeros((scene.atlas.texels.shape[0], width), jnp.float32)

        def fn(acc):
            idx = (
                (dirs0[0] * 1e4 + acc).astype(jnp.int32) % pool.shape[0]
            )
            tex = gather.take_rows(pool, idx)
            return acc * 0.5 + jnp.sum(tex) * 1e-6

        return fn

    def frame_shadows(acc):
        cfg = RenderConfig(width=W, height=H, bounces=2, enable_post=False,
                           enable_shadows=True)
        img = render_frame(
            scene,
            frame._replace(sun_angle=frame.sun_angle + acc * 1e-20),
            cfg,
            tracer=trace_pallas,
        )
        return acc * 0.5 + jnp.sum(img) * 1e-6

    def frame_tracer_b2(acc):
        from clraytracer_tpu.ops.trace_wavefront import trace_wavefront

        cfg = RenderConfig(width=W, height=H, bounces=2, enable_post=False)
        img = render_frame(
            scene,
            frame._replace(sun_angle=frame.sun_angle + acc * 1e-20),
            cfg,
            tracer=trace_wavefront,
        )
        return acc * 0.5 + jnp.sum(img) * 1e-6

    def trace_rows(rows, variant="full"):
        """trace_pallas with an explicit kernel tile height (culling
        locality vs scalar-amortization sweep on cluster-dense scenes)."""
        def fn(acc):
            hit = trace_pallas(
                scene, origin0 + acc * 1e-20, dirs0, rows=rows,
                variant=variant,
            )
            leaves = [hit.t, hit.u, hit.v]
            if hit.attr_uu is not None:
                leaves.append(hit.attr_uu)
            return acc * 0.5 + sum(jnp.sum(l) for l in leaves) * 1e-6

        return fn

    components = {
        "trace_r8": trace_rows(8),
        "trace_r16": trace_rows(16),
        "trace_r32": trace_rows(32),
        "trace_r64": trace_rows(64),
        "trace_r16_cull": trace_rows(16, "cull"),
        "trace_r16_geom": trace_rows(16, "geom"),
        "trace_r16_noattr": trace_rows(16, "noattr"),
        "raygen": raygen,
        "tshade_bar": tshade_bar,
        "gather_coh": gather_coh,
        "trace_full": trace_variant("full"),
        "trace_lin": trace_lin,
        "tmin_mix": tmin("mix"),
        "tmin_state": tmin("state"),
        "tmin_norm": tmin("norm"),
        "trace_c_vvmat": trace_consume("vvmat"),
        "trace_c_normal": trace_consume("normal"),
        "trace_c_inst": trace_consume("inst"),
        "trace_c_tri": trace_consume("tri"),
        "trace_c_all": trace_consume("all"),
        "trace_noattr": trace_variant("noattr"),
        "trace_geom": trace_variant("geom"),
        "trace_cull": trace_variant("cull"),
        "trace_culla": trace_variant("culla"),
        "trace_culla0": trace_variant("culla0"),
        "texel_rgb4": texel_rgb4,
        "texel_extpad": texel_extpad,
        "trace_all": trace_all,
        "trace_all_lin": trace_all_lin,
        "tshade_nogather": tshade_variant({"nogather"}),
        "tshade_noonehot": tshade_variant({"noonehot"}),
        "tshade_nosky": tshade_variant({"nosky"}),
        "tshade_bare": tshade_variant({"nogather", "noonehot", "nosky"}),
        "gather_w1": gather_w(1),
        "gather_w4": gather_w(4),
        "gather_w8": gather_w(8),
        "gather_w16": gather_w(16),
        "trace1": trace1,
        "shade1": shade1,
        "relayout": relayout,
        "tshade": tshade,
        "interleave": interleave,
        "frame_planar_b1": frame_planar(1),
        "frame_planar_b2": frame_planar(2),
        "texel_gather": texel_gather,
        "tri_take": tri_take,
        "fused_r8": frame_fused_rows(8),
        "fused_r16": frame_fused_rows(16),
        "fused_r32": frame_fused_rows(32),
        "fused_r64": frame_fused_rows(64),
        "frame_b1": frame_fn(1, False),
        "frame_b2": frame_fn(2, False),
        "frame_post": frame_fn(2, True),
        "frame_shadows": frame_shadows,
        "frame_wavefront_b2": frame_tracer_b2,
    }
    if args.only:
        names = args.only.split(",")
        components = {k: components[k] for k in names}

    if args.mode == "profile":
        for name, fn in components.items():
            prof = profile_time(fn, name)
            print(f"== {name}: {prof['total_ms_per_rep']} ms/rep ==", flush=True)
            for opname, ms in prof["top"]:
                print(f"  {ms:9.3f} ms  {opname[:100]}", flush=True)
        return

    out = {}
    for name, fn in components.items():
        try:
            dt = chain_time(fn, args.iters)
        except Exception as e:  # one broken component must not kill the run
            print(f"{name}: FAILED ({type(e).__name__}: {e})", flush=True)
            continue
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
