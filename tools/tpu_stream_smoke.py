"""TPU smoke test for the HBM-streamed cluster geometry path.

Builds the same small scene twice (resident tables vs VMEM_TABLE_BUDGET=0 →
geo_stream + streamed kernel), traces identical rays on the real chip, and
compares the full hit records. Run:
    cd /root/repo && timeout 900 python tools/tpu_stream_smoke.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    print("backend:", jax.default_backend(), flush=True)

    from clraytracer_tpu.camera import Camera
    from clraytracer_tpu.config import CameraConfig
    from clraytracer_tpu.ops import trace_pallas as tp
    from clraytracer_tpu.render import frame_inputs_from_camera
    from clraytracer_tpu.scene import SceneBuilder
    from clraytracer_tpu.scene import procedural_tex as ptex
    from clraytracer_tpu.scene.procedural import uv_sphere

    def build():
        b = SceneBuilder()
        b.import_procedural(ptex.sky_gradient(64, 32))
        checker = b.import_procedural(ptex.checker(32, 4))
        mat = b.create_material(albedo=(0.9, 0.6, 0.3), albedo_tex=checker)
        b.add_instance(
            b.add_mesh(uv_sphere(2.0, n_lat=12, n_lon=24), materials_start=mat)
        )
        return jax.device_put(b.build())

    budget = tp.VMEM_TABLE_BUDGET
    scene_r = build()
    assert scene_r.clusters.geo_stream is None
    tp.VMEM_TABLE_BUDGET = 0
    try:
        scene_s = build()
        assert scene_s.clusters.geo_stream is not None

        import jax.numpy as jnp

        from clraytracer_tpu.camera import ray_directions_planar

        W, H = 256, 192
        cam = Camera.create(
            CameraConfig(position=(0.13, 0.21, 10.0), yaw_deg=-90.0), W, H
        )
        frame = frame_inputs_from_camera(cam, sun_angle=-1.96)
        d = ray_directions_planar(
            jnp.asarray(cam.inverse_view),
            jnp.asarray(cam.inverse_projection), W, H,
        )
        o = jnp.broadcast_to(jnp.asarray(cam.position)[:, None, None], d.shape)

        t0 = time.time()
        hs = tp.trace_pallas(scene_s, o, d)
        jax.block_until_ready(hs.t)
        print(f"streamed trace compiled+ran in {time.time()-t0:.1f}s",
              flush=True)
        tp.VMEM_TABLE_BUDGET = budget
        hr = tp.trace_pallas(scene_r, o, d)
        jax.block_until_ready(hr.t)

        ht_r = np.asarray(hr.t)
        ht_s = np.asarray(hs.t)
        tri_r = np.asarray(hr.tri)
        tri_s = np.asarray(hs.tri)
        uu_r = np.asarray(hr.attr_uu)
        uu_s = np.asarray(hs.attr_uu)
        print("t equal:", np.array_equal(ht_r, ht_s),
              "tri equal:", np.array_equal(tri_r, tri_s),
              "uu equal:", np.array_equal(uu_r, uu_s), flush=True)
        nhit = (ht_r < 1e29).sum()
        print(f"hits {nhit}/{ht_r.size}", flush=True)
        if not np.array_equal(ht_r, ht_s):
            bad = np.nonzero(ht_r != ht_s)
            print("first mismatches:", bad[0][:10] if bad else None)
            print("r:", ht_r[bad][:10], "s:", ht_s[bad][:10])
            raise SystemExit(1)

        # fused camera-mode frame: streamed vs resident
        from clraytracer_tpu.ops import render_pallas as rp

        assert rp.fused_path_available(scene_s, True, True)
        tp.VMEM_TABLE_BUDGET = 0
        img_s, _ = rp.render_fused_camera(scene_s, frame, W, H, bounces=2)
        jax.block_until_ready(img_s)
        tp.VMEM_TABLE_BUDGET = budget
        img_r, _ = rp.render_fused_camera(scene_r, frame, W, H, bounces=2)
        jax.block_until_ready(img_r)
        eq = np.array_equal(np.asarray(img_s), np.asarray(img_r))
        print("fused frame equal:", eq, flush=True)
        raise SystemExit(0 if eq else 1)
    finally:
        tp.VMEM_TABLE_BUDGET = budget


if __name__ == "__main__":
    main()
