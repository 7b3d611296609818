"""Multi-PROCESS (multi-host stand-in) test: a 2-process CPU
``jax.distributed`` render over a 4-device global mesh must equal the
single-process frame (VERDICT r3 item 4 — the launch glue that runs
unchanged on an N-host slice; see cli._maybe_init_distributed)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_render_matches_single(tmp_path):
    worker = Path(__file__).parent / "_dist_worker.py"
    out = tmp_path / "dist.npy"
    port = _free_port()

    env = dict(os.environ)
    # the axon sitecustomize pre-initializes a backend, which blocks
    # jax.distributed.initialize — the workers must start clean
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(Path(__file__).parent.parent) + (
        os.pathsep + env["PYTHONPATH"] if "PYTHONPATH" in env else ""
    )

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), str(out)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    assert out.exists()
    img_dist = np.load(out)

    # single-process reference: same scene/camera, default (Pallas) tracer
    from clraytracer_tpu.camera import Camera
    from clraytracer_tpu.cli import build_scene
    from clraytracer_tpu.config import CameraConfig, RenderConfig
    from clraytracer_tpu.render import frame_inputs_from_camera, render_frame

    W, H = 64, 32
    scene = build_scene("sphere", 256)
    cam = Camera.create(CameraConfig(position=(0.13, 0.21, 10.0)), W, H)
    frame = frame_inputs_from_camera(cam, -1.96)
    img_single = np.asarray(
        render_frame(scene, frame, RenderConfig(width=W, height=H))
    )
    assert img_dist.shape == img_single.shape
    close = np.isclose(img_dist, img_single, atol=1e-4).all(axis=-1)
    assert close.mean() > 0.999, close.mean()
