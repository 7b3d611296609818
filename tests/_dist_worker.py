"""One process of a 2-process CPU ``jax.distributed`` render.

Spawned by tests/test_distributed.py (and usable by hand):

    python tests/_dist_worker.py <process_id> <port> <out.npy>

Each process owns 2 virtual CPU devices; the 4-device global mesh renders
the row-sharded frame (the same ``render_sharded`` path a pod slice runs,
with DCN standing in for the gloo transport here), allgathers it, and
process 0 writes the image. SURVEY.md §5 "distributed communication
backend" — the reference has no multi-node analogue (single OpenCL queue,
Renderer.cpp:341-367).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    import numpy as np
    from jax.experimental import multihost_utils

    from clraytracer_tpu.camera import Camera
    from clraytracer_tpu.cli import build_scene
    from clraytracer_tpu.config import CameraConfig, RenderConfig
    from clraytracer_tpu.parallel.sharding import (
        make_device_mesh,
        render_sharded,
        replicate_scene,
    )
    from clraytracer_tpu.render import frame_inputs_from_camera

    W, H = 64, 32
    scene = build_scene("sphere", 256)
    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), W, H)
    frame = frame_inputs_from_camera(cam, -1.96)
    mesh = make_device_mesh()  # all 4 global devices, 2 per process
    scene = replicate_scene(scene, mesh)
    cfg = RenderConfig(width=W, height=H)
    img = render_sharded(scene, frame, cfg, mesh)
    img_full = multihost_utils.process_allgather(img, tiled=True)
    if jax.process_index() == 0:
        np.save(out, np.asarray(img_full))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
