"""Device-side op profile of the differentiable fwd+bwd step (or forward).

``jax.profiler`` works over the axon tunnel: the trace's ``/device:TPU:0``
plane carries real per-op durations ("XLA Ops" line). This harness runs the
1080p flagship step a few times under the profiler and prints the top ops
by device time — the tool that located the serialized slot->tri remap
(14.8 ms/bounce) and the cotangent-plane XLA glue (~6 ms) in round 5.

    python tools/profile_step.py [--forward] [--width W --height H]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--tris", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--forward", action="store_true",
                    help="profile the forward render_frame instead of the "
                    "fwd+bwd step")
    args = ap.parse_args()

    from clraytracer_tpu.camera import Camera
    from clraytracer_tpu.config import CameraConfig, RenderConfig
    from clraytracer_tpu.diff import image_loss_and_grads
    from clraytracer_tpu.render import frame_inputs_from_camera, render_frame
    from clraytracer_tpu.scene import SceneBuilder
    from clraytracer_tpu.scene import procedural_tex as ptex
    from clraytracer_tpu.scene.procedural import uv_sphere

    W, H = args.width, args.height
    n_lat = max(4, int((args.tris / 4) ** 0.5) + 1)
    b = SceneBuilder()
    b.import_procedural(ptex.sky_gradient(512, 256))
    checker = b.import_procedural(ptex.checker(128, 8))
    mat = b.create_material(
        albedo=(0.9, 0.6, 0.3), albedo_tex=checker, shininess=1.0,
        roughness=0.4,
    )
    b.add_instance(
        b.add_mesh(uv_sphere(2.0, n_lat=n_lat, n_lon=2 * n_lat),
                   materials_start=mat)
    )
    scene = jax.device_put(b.build())
    cam = Camera.create(
        CameraConfig(position=(0.13, 0.21, 10.0), yaw_deg=-90.0), W, H
    )
    frame = frame_inputs_from_camera(cam, -1.96)

    if args.forward:
        cfg = RenderConfig(width=W, height=H)

        @jax.jit
        def step(s, f):
            return jnp.sum(render_frame(s, f, cfg))
    else:

        @jax.jit
        def step(s, f):
            loss, g = image_loss_and_grads(s, f, W, H)
            leaf = sum(
                jnp.sum(x) * 1e-9
                for x in jax.tree_util.tree_leaves(g)
                if jnp.issubdtype(x.dtype, jnp.floating)
            )
            return loss + leaf

    assert np.isfinite(float(step(scene, frame)))  # compile + warm
    trace_dir = tempfile.mkdtemp(prefix="clrt_prof_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.reps):
            float(step(scene, frame))

    # ---- aggregate the device plane -------------------------------------
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    path = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")
    )[0]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    plane = next(p for p in xs.planes if "TPU" in p.name)
    names = plane.event_metadata
    tot: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    total_ps = 0
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            nm = names[ev.metadata_id].name
            tot[nm] += ev.duration_ps
            cnt[nm] += 1
            total_ps += ev.duration_ps
    r = args.reps
    print(f"total XLA-op device time: {total_ps / 1e9 / r:.2f} ms/step "
          f"({r} steps; trace at {trace_dir})")
    for nm, ps in tot.most_common(args.top):
        print(f"{ps / 1e9 / r:9.3f} ms  x{cnt[nm] // r:<4d} {nm[:105]}")


if __name__ == "__main__":
    main()
