"""Command-line app shell.

The reference's app layer is a Win32 window + ImGui editor (EngineMain.cpp,
Window.cpp, Editor/*); the TPU-native equivalent is headless: commands that
render to PNG, benchmark, compute gradients, and inspect scenes. A scene is
either a bundled procedural set (``sphere``, ``two``, ``field``) or any OBJ
path (with MTL + textures + binary cache, like the reference's
Engine_Start imports, Engine.cpp:61-76).

Usage:
  python -m clraytracer_tpu render  --scene sphere --width 1024 --height 768 -o out.png
  python -m clraytracer_tpu bench   --scene sphere --width 1920 --height 1080
  python -m clraytracer_tpu grads   --scene sphere
  python -m clraytracer_tpu inspect --scene path/to/mesh.obj
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def build_scene(spec: str, tris: int = 4096):
    """Scene factory: named procedural scenes or an OBJ path."""
    from clraytracer_tpu import math3d
    from clraytracer_tpu.scene import SceneBuilder
    from clraytracer_tpu.scene.procedural import cube, sphere_field, uv_sphere
    from clraytracer_tpu.scene import procedural_tex as ptex

    # named scenes register their textures as procedural descriptors, which
    # makes them eligible for the fused render megakernel (the flagship
    # fast path); OBJ scenes bake stb-style image textures into the atlas
    b = SceneBuilder()
    b.import_procedural(ptex.sky_gradient(512, 256))
    if spec == "sphere":
        n_lat = max(4, int((tris / 4) ** 0.5) + 1)
        checker = b.import_procedural(ptex.checker(128, 8))
        mat = b.create_material(
            albedo=(0.9, 0.6, 0.3), albedo_tex=checker, shininess=1.0, roughness=0.4
        )
        mesh = b.add_mesh(
            uv_sphere(2.0, n_lat=n_lat, n_lon=2 * n_lat), materials_start=mat
        )
        b.add_instance(mesh)
    elif spec == "two":
        checker = b.import_procedural(ptex.checker(64, 8))
        m1 = b.create_material(albedo=(0.9, 0.2, 0.2), albedo_tex=checker)
        m2 = b.create_material(albedo=(0.2, 0.9, 0.2))
        s = b.add_mesh(uv_sphere(1.5, 24, 48), materials_start=m1)
        c = b.add_mesh(cube(1.0), materials_start=m2)
        b.add_instance(s, math3d.translation(-2.0, 1.0, 0.0))
        b.add_instance(c, math3d.rotation_y(0.7) @ math3d.translation(2.5, 0.5, -1.0))
    elif spec == "glass":
        # refraction demo (render with --refraction): a transmissive sphere
        # in front of a checkered backdrop sphere
        m_glass = b.create_material(
            albedo=(0.95, 0.98, 1.0), transmission=0.85, shininess=2.0,
            roughness=0.1,
        )
        checker = b.import_procedural(ptex.checker(64, 8))
        m_back = b.create_material(albedo=(0.9, 0.5, 0.3), albedo_tex=checker)
        glass = b.add_mesh(uv_sphere(1.5, 24, 48), materials_start=m_glass)
        back = b.add_mesh(uv_sphere(2.5, 16, 32), materials_start=m_back)
        b.add_instance(glass, math3d.translation(0.0, 0.5, 2.5))
        b.add_instance(back, math3d.translation(0.0, 0.5, -3.0))
    elif spec == "field":
        mat = b.create_material(albedo=(0.7, 0.7, 0.9))
        mesh = b.add_mesh(sphere_field(n_side=6, n_lat=16, n_lon=32), materials_start=mat)
        b.add_instance(mesh)
    elif spec == "museum":
        # the three reference .clm scenes as one multi-instance scene
        # (~160k tris — cluster tables exceed the VMEM budget, so this is
        # the HBM-streamed Pallas path's benchmark scene). Needs a texture
        # pool past the reference's 32-cap: the three scenes together carry
        # ~45 textures
        from clraytracer_tpu.config import PoolConfig
        from clraytracer_tpu.scene import SceneBuilder as _SB

        ref = Path("/root/reference/CLRayTracer/Assets")
        if not ref.exists():
            raise SystemExit("error: museum scene needs the reference assets")
        b = _SB(PoolConfig(max_textures=64))
        b.import_procedural(ptex.sky_gradient(512, 256))
        sponza = b.import_mesh(ref / "sponza/sponza.clm")
        sibenik = b.import_mesh(ref / "sibenik/sibenik.clm")
        nanosuit = b.import_mesh(ref / "nanosuit/nanosuit.clm")
        b.add_instance(sponza)
        b.add_instance(sibenik, math3d.translation(0.0, 25.0, 0.0))
        b.add_instance(nanosuit, math3d.translation(0.0, 0.0, 3.0))
    elif spec.endswith(".clsnap.npz"):
        # full-scene checkpoint: restore exact runtime state (instances,
        # live material edits, cluster tables) — no re-import/rebuild
        from clraytracer_tpu.scene.checkpoint import load_scene

        scene, _ = load_scene(spec)
        return scene
    else:
        path = Path(spec)
        if not path.exists():
            raise SystemExit(
                f"error: scene '{spec}' is neither a named scene "
                f"(sphere, two, field) nor an existing OBJ/.clsnap path"
            )
        mesh = b.import_mesh(path)
        b.add_instance(mesh)
    return b.build()


def _camera(args):
    from clraytracer_tpu.camera import Camera
    from clraytracer_tpu.config import CameraConfig

    return Camera.create(
        CameraConfig(
            position=tuple(args.camera_pos),
            yaw_deg=args.yaw,
            pitch_deg=args.pitch,
        ),
        args.width,
        args.height,
    )


def cmd_snapshot(args) -> int:
    from clraytracer_tpu.scene.checkpoint import save_scene
    from clraytracer_tpu.utils.logging import log_info

    scene = build_scene(args.scene, args.tris)
    save_scene(scene, args.output)
    log_info("wrote %s", args.output)
    return 0


def cmd_render(args) -> int:
    import jax

    from clraytracer_tpu.config import RenderConfig
    from clraytracer_tpu.render import render, save_png
    from clraytracer_tpu.utils.logging import log_info

    scene = jax.device_put(build_scene(args.scene, args.tris))
    cam = _camera(args)
    cfg = RenderConfig(
        width=args.width,
        height=args.height,
        bounces=args.bounces,
        sun_angle=args.sun_angle,
        enable_fxaa=args.fxaa,
        enable_post=not args.no_post,
        enable_shadows=args.shadows,
        enable_refraction=args.refraction,
        refraction_ior=args.ior,
        samples=args.spp,
        enable_gi=args.gi,
        gi_seed=args.gi_seed,
    )
    t0 = time.perf_counter()
    if getattr(args, "profile_dir", None):
        # device-level tracing (the analogue of the reference's frame-time
        # profiler panel, Engine.cpp:41-50, but per-op via XLA)
        with jax.profiler.trace(args.profile_dir):
            img = render(scene, cam, cfg, tracer_name=args.tracer)
        log_info("profiler trace written to %s", args.profile_dir)
    else:
        img = render(scene, cam, cfg, tracer_name=args.tracer)
    log_info("rendered %dx%d in %.1f ms (incl. compile)",
             args.width, args.height, (time.perf_counter() - t0) * 1e3)
    save_png(args.output, img)
    log_info("wrote %s", args.output)
    return 0


def cmd_bench(args) -> int:
    import bench as bench_mod  # repo-root harness

    sys.argv = [
        "bench.py",
        "--width", str(args.width),
        "--height", str(args.height),
        "--tris", str(args.tris),
        "--yaw", str(args.yaw),
        "--camera-pos", *(str(c) for c in args.camera_pos),
    ] + (
        ["--tracer", args.tracer]
        if args.tracer and args.tracer != "best"
        else []
    ) + (
        ["--scene", args.scene]
        if args.scene and args.scene != "sphere"
        else []
    )
    bench_mod.main()
    return 0


def cmd_grads(args) -> int:
    import jax
    import jax.numpy as jnp

    from clraytracer_tpu.diff import image_loss_and_grads
    from clraytracer_tpu.render import frame_inputs_from_camera

    scene = jax.device_put(build_scene(args.scene, args.tris))
    cam = _camera(args)
    frame = frame_inputs_from_camera(cam, args.sun_angle)
    target = jnp.zeros((args.height, args.width, 3), jnp.float32)
    loss, grads = image_loss_and_grads(
        scene, frame, args.width, args.height, target=target
    )
    out = {
        "loss": float(loss),
        "grad_norms": {
            "materials.albedo": float(jnp.linalg.norm(grads.materials.albedo)),
            "atlas.texels": float(jnp.linalg.norm(grads.atlas.texels)),
            "tris.v0": float(
                jnp.linalg.norm(grads.tris.v0.astype(jnp.float32))
            ),
            "instances.inverse_transform": float(
                jnp.linalg.norm(grads.instances.inverse_transform)
            ),
        },
    }
    print(json.dumps(out, indent=2))
    return 0


def cmd_fit(args) -> int:
    """Inverse rendering: recover scene parameters from a target image.

    The end-to-end "training loop" demo of the differentiable path
    (SURVEY.md §7 step 7): render a target with the true scene, scramble
    the chosen parameter group, and Adam-descend the image L2 back. Prints
    a JSON report (loss curve, recovered-parameter error) and optionally
    writes before/after renders and a .clsnap checkpoint."""
    import jax
    import jax.numpy as jnp
    import optax

    from clraytracer_tpu.diff import render_image_diff
    from clraytracer_tpu.render import frame_inputs_from_camera, save_png
    from clraytracer_tpu.utils.logging import log_info

    scene_true = jax.device_put(build_scene(args.scene, args.tris))
    cam = _camera(args)
    frame = frame_inputs_from_camera(cam, args.sun_angle)
    w, h = args.width, args.height

    target = render_image_diff(scene_true, frame, w, h, bounces=args.bounces)

    group = args.fit_param  # "albedo" | "texels"
    leaf = {
        "albedo": scene_true.materials.albedo,
        "texels": scene_true.atlas.texels,
    }[group]
    key = jax.random.PRNGKey(args.seed)
    init = jnp.clip(
        jnp.full_like(leaf, 0.5)
        + 0.1 * jax.random.normal(key, leaf.shape, leaf.dtype),
        0.0,
        1.0,
    )

    def with_param(p):
        if group == "albedo":
            return scene_true.replace(
                materials=scene_true.materials.replace(albedo=p)
            )
        return scene_true.replace(atlas=scene_true.atlas.replace(texels=p))

    opt = optax.adam(args.lr)

    @jax.jit
    def step(p, opt_state):
        def loss_fn(q):
            img = render_image_diff(
                with_param(q), frame, w, h, bounces=args.bounces
            )
            return jnp.mean((img - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(p, updates), opt_state, loss

    p, opt_state = init, opt.init(init)
    losses = []
    if args.output:
        save_png(args.output.replace(".png", "_init.png"),
                 render_image_diff(with_param(p), frame, w, h,
                                   bounces=args.bounces))
    for i in range(args.steps):
        p, opt_state, loss = step(p, opt_state)
        losses.append(float(loss))
        if i % max(1, args.steps // 10) == 0:
            log_info("fit step %d: loss %.6g", i, float(loss))
    err0 = float(jnp.abs(init - leaf).mean())
    err1 = float(jnp.abs(p - leaf).mean())
    report = {
        "param": group,
        "steps": args.steps,
        "loss_first": losses[0],
        "loss_last": losses[-1],
        "param_mae_init": err0,
        "param_mae_final": err1,
    }
    print(json.dumps(report, indent=2))
    if args.output:
        save_png(args.output,
                 render_image_diff(with_param(p), frame, w, h,
                                   bounces=args.bounces))
        log_info("wrote %s", args.output)
    if args.save_snapshot:
        from clraytracer_tpu.scene.checkpoint import save_scene

        save_scene(with_param(p), args.save_snapshot,
                   extras={"fit": report})
        log_info("wrote %s", args.save_snapshot)
    return 0


def _maybe_init_distributed(args) -> int:
    """Multi-host launch glue (SURVEY.md §5 "distributed communication
    backend"): starts ``jax.distributed`` when a coordinator is configured,
    via flags or env fallbacks (CLRT_COORDINATOR / CLRT_NUM_PROCESSES /
    CLRT_PROCESS_ID). Must run before any jax computation. Returns this
    process's index (0 for single-process runs).

    On a real pod slice the same command runs unchanged on every host:
      clrt sweep --coordinator host0:1234 --num-processes N --process-id $i
    (on Cloud TPU, plain ``jax.distributed.initialize()`` auto-detects; pass
    ``--coordinator auto`` to request that form.)
    """
    import os

    coord = getattr(args, "coordinator", None) or os.environ.get(
        "CLRT_COORDINATOR"
    )
    if coord is None:
        return 0
    import jax

    if coord == "auto":
        jax.distributed.initialize()
    else:
        nproc = getattr(args, "num_processes", None) or int(
            os.environ.get("CLRT_NUM_PROCESSES", "0")
        )
        pid = getattr(args, "process_id", None)
        if pid is None:
            pid = int(os.environ.get("CLRT_PROCESS_ID", "-1"))
        assert nproc > 0 and pid >= 0, (
            "--num-processes/--process-id (or CLRT_* env) required with "
            "--coordinator"
        )
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=nproc, process_id=pid
        )
    return jax.process_index()


def cmd_sweep(args) -> int:
    """Scaling sweep: rays/s at 1, 2, 4, ... N devices (BASELINE config 5).

    On a multi-chip TPU slice this measures real ICI scaling; on CPU it runs
    against the virtual 8-device platform (mechanism check). Efficiency is
    rays/s(N) / (N * rays/s(1)). With ``--coordinator`` the sweep spans all
    hosts' devices (device subsets are dealt per-process so every host
    participates in every row; DCN carries the cross-host legs).
    """
    proc = _maybe_init_distributed(args)

    import jax
    import jax.numpy as jnp

    from clraytracer_tpu.config import RenderConfig
    from clraytracer_tpu.parallel.sharding import (
        make_device_mesh,
        render_sharded,
        replicate_scene,
    )
    from clraytracer_tpu.render import TRACERS, frame_inputs_from_camera

    tracer = TRACERS[args.tracer]
    scene_h = build_scene(args.scene, args.tris)
    cam = _camera(args)
    frame = frame_inputs_from_camera(cam, args.sun_angle)
    cfg = RenderConfig(width=args.width, height=args.height,
                       bounces=args.bounces)
    devices = jax.devices()
    nprocs = jax.process_count()
    if nprocs > 1:
        # every process must own part of every mesh: pick ceil(n/nprocs)
        # devices from EACH process's block
        by_proc = [
            [d for d in devices if d.process_index == p]
            for p in range(nprocs)
        ]
        counts = [
            nprocs * m
            for m in (1, 2, 4, 8, 16, 32)
            if nprocs * m <= len(devices)
        ]

        def pick(n: int) -> list:
            k = n // nprocs
            return [d for block in by_proc for d in block[:k]]
    else:
        counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
        pick = lambda n: devices[:n]

    def time_n(n: int) -> float:
        mesh = make_device_mesh(pick(n))
        scene = replicate_scene(scene_h, mesh)

        # chained dependent frames (honest on the tunneled TPU; see bench.py)
        def chain(reps):
            @jax.jit
            def run(s, f):
                def body(i, acc):
                    img = render_sharded(
                        s, f._replace(sun_angle=f.sun_angle + acc * 1e-20),
                        cfg, mesh, tracer=tracer,
                    )
                    return (
                        acc * 0.5 + img[0, 0, 0]
                        + jnp.sum(img[::31, ::31, 2]) * 1e-6
                    )
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
            return run

        c1, cn = chain(1), chain(1 + args.iters)
        float(c1(scene, frame)); float(cn(scene, frame))  # compile + warm
        t = time.perf_counter(); float(c1(scene, frame))
        t1 = time.perf_counter() - t
        t = time.perf_counter(); float(cn(scene, frame))
        tn = time.perf_counter() - t
        return max((tn - t1) / args.iters, 1e-9)

    rays = args.width * args.height * args.bounces
    results = []
    base = None
    for n in counts:
        dt = time_n(n)
        mrays = rays / dt / 1e6
        base = mrays if base is None else base
        results.append(
            {
                "devices": n,
                "mrays_per_s": round(mrays, 2),
                "efficiency": round(mrays / (n * base), 4),
            }
        )
        if proc == 0:
            print(json.dumps(results[-1]), flush=True)
    if proc == 0:
        print(json.dumps({
            "platform": jax.default_backend(),
            "tracer": args.tracer,
            "processes": jax.process_count(),
            "sweep": results,
        }))
    return 0


def cmd_inspect(args) -> int:
    from clraytracer_tpu.scene.types import scene_summary

    scene = build_scene(args.scene, args.tris)
    print(json.dumps(scene_summary(scene), indent=2))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="clraytracer_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--scene", default="sphere",
                       help="sphere | two | glass | field | museum | path (.obj/.clm/.clsnap.npz)")
        p.add_argument("--width", type=int, default=1024)
        p.add_argument("--height", type=int, default=768)
        p.add_argument("--tris", type=int, default=4096)
        p.add_argument("--bounces", type=int, default=2)
        p.add_argument("--sun-angle", type=float, default=-1.96)
        p.add_argument("--camera-pos", type=float, nargs=3,
                       default=[0.13, 0.21, 10.0])
        p.add_argument("--yaw", type=float, default=-90.0)
        p.add_argument("--pitch", type=float, default=0.0)
        p.add_argument(
            "--tracer", default="best",
            help="best (auto: pallas when available) | pallas | wavefront "
            "| bvh | brute",
        )

    p = sub.add_parser("render", help="render a frame to PNG")
    # (scene specs accept .clsnap.npz checkpoints everywhere --scene does)
    common(p)
    p.add_argument("-o", "--output", default="render.png")
    p.add_argument("--fxaa", action="store_true")
    p.add_argument("--no-post", action="store_true")
    p.add_argument("--shadows", action="store_true",
                   help="sun shadow rays (beyond the reference: its TODO)")
    p.add_argument("--refraction", action="store_true",
                   help="Snell refraction through transmissive materials "
                   "(beyond the reference: its TODO); see the 'glass' scene")
    p.add_argument("--ior", type=float, default=1.45,
                   help="index of refraction for --refraction")
    p.add_argument("--spp", type=int, default=1,
                   help="sub-pixel samples per pixel (supersampling AA)")
    p.add_argument("--gi", action="store_true",
                   help="Monte-Carlo diffuse GI: uniform-hemisphere bounce "
                   "continuations, albedo * 2*cosTheta throughput (the "
                   "hemisphere sampler the reference ships unused) — "
                   "combine with --spp N to integrate")
    p.add_argument("--gi-seed", type=int, default=0,
                   help="base RNG seed for --gi sample streams")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace (TensorBoard format) here")
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("bench", help="throughput benchmark")
    common(p)
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("grads", help="gradient sanity report")
    common(p)
    p.set_defaults(fn=cmd_grads)

    p = sub.add_parser("inspect", help="scene statistics")
    common(p)
    p.set_defaults(fn=cmd_inspect)

    p = sub.add_parser(
        "sweep", help="multi-device scaling sweep (rays/s vs device count)"
    )
    common(p)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator host:port ('auto' for "
                   "Cloud-TPU autodetect); env fallback CLRT_COORDINATOR")
    p.add_argument("--num-processes", type=int, default=None,
                   help="multi-host: total process count "
                   "(CLRT_NUM_PROCESSES)")
    p.add_argument("--process-id", type=int, default=None,
                   help="multi-host: this process's id (CLRT_PROCESS_ID)")
    p.set_defaults(fn=cmd_sweep)

    p = sub.add_parser(
        "fit", help="inverse rendering: recover parameters from a target"
    )
    common(p)
    p.add_argument("--fit-param", choices=("albedo", "texels"),
                   default="albedo")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=5e-2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("-o", "--output", default=None,
                   help="write the recovered render here (+ _init.png)")
    p.add_argument("--save-snapshot", default=None,
                   help="write the fitted scene as a .clsnap.npz")
    p.set_defaults(fn=cmd_fit)

    p = sub.add_parser(
        "snapshot",
        help="save a scene's full runtime state to a .clsnap.npz checkpoint",
    )
    common(p)
    p.add_argument("-o", "--output", default="scene.clsnap.npz")
    p.set_defaults(fn=cmd_snapshot)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
