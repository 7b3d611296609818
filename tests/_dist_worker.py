"""One process of a 2-process CPU ``jax.distributed`` run.

Spawned by tests/test_distributed.py (and usable by hand):

    python tests/_dist_worker.py <process_id> <port> <out.npz> [mode]

Each process owns 2 virtual CPU devices; the 4-device global mesh runs the
same code path a pod slice runs, with gloo standing in for DCN here.
Modes:

* ``render`` (default) — row-sharded forward frame (``render_sharded``),
  allgathered; process 0 writes ``img``.
* ``train``  — ``train_step_sharded`` (fwd + bwd + cross-process psum +
  SGD update); process 0 writes ``loss`` and the updated material
  ``albedo`` table. Also renders an UNEVEN-height frame (30 rows over 4
  devices → padded) to pin row padding across process boundaries.

SURVEY.md §5 "distributed communication backend" — the reference has no
multi-node analogue (single OpenCL queue, Renderer.cpp:341-367).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "render"
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
        train_step_sharded,
    )
    from clraytracer_tpu.render import frame_inputs_from_camera

    W, H = 64, 32
    scene = build_scene("sphere", 256)
    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), W, H)
    frame = frame_inputs_from_camera(cam, -1.96)
    mesh = make_device_mesh()  # all 4 global devices, 2 per process
    scene = replicate_scene(scene, mesh)

    if mode == "render":
        cfg = RenderConfig(width=W, height=H)
        img = render_sharded(scene, frame, cfg, mesh)
        img_full = multihost_utils.process_allgather(img, tiled=True)
        if jax.process_index() == 0:
            np.save(out, np.asarray(img_full))
    elif mode == "train":
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        target = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
        loss, new_scene = train_step_sharded(
            scene, frame, target, mesh, lr=1.0
        )
        # uneven rows across the 4-device mesh: 30 → padded to 32
        Hu = 30
        cam_u = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), W, Hu)
        frame_u = frame_inputs_from_camera(cam_u, -1.96)
        img_u = render_sharded(
            scene, frame_u, RenderConfig(width=W, height=Hu), mesh
        )
        img_u = multihost_utils.process_allgather(img_u, tiled=True)
        if jax.process_index() == 0:
            np.savez(
                out,
                loss=np.asarray(loss),
                albedo=np.asarray(new_scene.materials.albedo),
                img_uneven=np.asarray(img_u),
            )
    else:
        raise SystemExit(f"unknown mode {mode}")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
