"""Turntable viewer: render an orbiting-camera PNG/GIF sequence.

The reference's display layer is a Win32 window + ImGui editor showing the
live render target (Window.cpp, Editor/Editor.cpp:71-102); this headless
stand-in drives the same Engine frame loop (tick → render → end_frame) with
an animated camera and writes the frames to disk.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/viewer.py \
      --scene two --frames 24 --width 480 --height 360 -o /tmp/turn
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="two")
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--radius", type=float, default=10.0)
    ap.add_argument("--elevation", type=float, default=1.5)
    ap.add_argument("--tracer", default="pallas")
    ap.add_argument("--gif", action="store_true", help="also write turn.gif")
    ap.add_argument("-o", "--output", default="/tmp/turntable")
    args = ap.parse_args()

    import numpy as np

    import jax

    from clraytracer_tpu.camera import Camera
    from clraytracer_tpu.cli import build_scene
    from clraytracer_tpu.config import CameraConfig, RenderConfig
    from clraytracer_tpu.engine import Engine
    from clraytracer_tpu.render import save_png, to_srgb_u8

    os.makedirs(args.output, exist_ok=True)

    cfg = RenderConfig(width=args.width, height=args.height)
    engine = Engine(
        config=cfg,
        tracer=args.tracer,
        scene=jax.device_put(build_scene(args.scene)),
    )

    frames = []
    t0 = time.perf_counter()
    for i in range(args.frames):
        ang = 2.0 * math.pi * i / args.frames
        pos = (
            args.radius * math.sin(ang),
            args.elevation,
            args.radius * math.cos(ang),
        )
        yaw = math.degrees(math.atan2(-math.cos(ang), -math.sin(ang)))
        engine.camera = Camera.create(
            CameraConfig(position=pos, yaw_deg=yaw), args.width, args.height
        )
        img = np.asarray(engine.render())
        engine.end_frame()
        path = os.path.join(args.output, f"frame_{i:04d}.png")
        save_png(path, img)
        frames.append(to_srgb_u8(img)[::-1])  # display flip, as save_png
        print(f"frame {i + 1}/{args.frames} -> {path}", flush=True)
    dt = time.perf_counter() - t0
    print(f"{args.frames} frames in {dt:.1f} s ({dt / args.frames * 1e3:.0f} ms avg)")

    if args.gif:
        from PIL import Image

        imgs = [Image.fromarray(f) for f in frames]
        gif = os.path.join(args.output, "turn.gif")
        imgs[0].save(
            gif, save_all=True, append_images=imgs[1:], duration=80, loop=0
        )
        print(f"wrote {gif}")

    engine.close()


if __name__ == "__main__":
    main()
