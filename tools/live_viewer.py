"""Interactive HTTP viewer — the Window/Editor analogue for a headless TPU.

The reference's display layer is a GLFW window with WASD-fly + mouse-look
(Window.cpp, Camera.hpp:47-87) and an ImGui editor with a materials panel
(Editor/*, ResourceManager.cpp:102-128). A TPU host has no display; this
serves the same loop over HTTP instead: a browser page shows the latest
frame, forwards WASD/QE + drag-look + sun-angle input, and offers a live
material color editor (SceneBuilder.edit_material → refresh on next frame,
the PushMaterialsToGPU analogue). Click to pick (CPU_RayCast analogue —
reports the hit instance/triangle/distance under the cursor).

Run:
    python tools/live_viewer.py --scene two --width 480 --height 320 --port 8765
Then open http://localhost:8765/.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_PAGE = """<!doctype html>
<meta charset="utf-8"><title>clraytracer_tpu</title>
<style>
 body{margin:0;background:#111;color:#ddd;font:13px monospace;display:flex}
 #v{image-rendering:pixelated;cursor:crosshair}
 #panel{padding:10px;min-width:240px}
 input[type=range]{width:160px}
 .mat{margin:2px 0}
</style>
<img id="v" draggable="false">
<div id="panel">
  <div>WASD+QE fly &middot; drag to look &middot; click to pick</div>
  <div>sun <input id="sun" type="range" min="-3.14" max="3.14" step="0.01"></div>
  <div id="mats"></div>
  <pre id="pick"></pre>
  <pre id="stats"></pre>
</div>
<script>
const v = document.getElementById('v');
let keys = {}, dragging = false, lastX=0, lastY=0, busy=false;
onkeydown = e => keys[e.key.toLowerCase()] = true;
onkeyup = e => keys[e.key.toLowerCase()] = false;
v.onmousedown = e => { dragging = true; lastX = e.clientX; lastY = e.clientY; };
onmouseup = e => dragging = false;
let mdx = 0, mdy = 0;
onmousemove = e => {
  if (dragging) { mdx += e.clientX - lastX; mdy += e.clientY - lastY;
                  lastX = e.clientX; lastY = e.clientY; }
};
v.onclick = async e => {
  if (Math.abs(mdx) + Math.abs(mdy) > 4) return;
  const r = v.getBoundingClientRect();
  const res = await fetch('/pick?x=' + (e.clientX - r.left) + '&y=' + (e.clientY - r.top));
  document.getElementById('pick').textContent = JSON.stringify(await res.json(), null, 1);
};
document.getElementById('sun').oninput = e => fetch('/sun?v=' + e.target.value);
async function loadMats() {
  const ms = await (await fetch('/materials')).json();
  const div = document.getElementById('mats');
  div.innerHTML = ms.map((m, i) =>
    `<div class="mat">mat ${i} <input type="color" value="${m}" ` +
    `onchange="fetch('/material?i=${i}&c=' + encodeURIComponent(this.value))"></div>`).join('');
}
loadMats();
async function loop() {
  if (busy) return;
  busy = true;
  const mv = [(keys.d?1:0)-(keys.a?1:0), (keys.e?1:0)-(keys.q?1:0), (keys.w?1:0)-(keys.s?1:0)];
  const q = `mx=${mdx}&my=${mdy}&r=${mv[0]}&u=${mv[1]}&f=${mv[2]}`;
  mdx = 0; mdy = 0;
  const t0 = performance.now();
  const res = await fetch('/frame?' + q);
  const blob = await res.blob();
  v.src = URL.createObjectURL(blob);
  document.getElementById('stats').textContent =
    `frame ${res.headers.get('x-frame')} ${(performance.now()-t0).toFixed(0)} ms`;
  busy = false;
}
setInterval(loop, 60);
</script>"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="two")
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--tracer", default="wavefront")
    ap.add_argument("--shadows", action="store_true",
                    help="sun shadow rays (beyond the reference)")
    ap.add_argument("--refraction", action="store_true",
                    help="Snell refraction through transmissive materials")
    ap.add_argument("--gi", action="store_true",
                    help="Monte-Carlo diffuse GI bounce continuations")
    ap.add_argument("--camera-pos", type=float, nargs=3,
                    default=[0.13, 0.21, 10.0])
    args = ap.parse_args()

    import os

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # sitecustomize may pin another platform before env vars are read
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from clraytracer_tpu.cli import build_scene
    from clraytracer_tpu.config import CameraConfig, RenderConfig
    from clraytracer_tpu.engine import Engine
    from clraytracer_tpu.render import to_srgb_u8

    config = RenderConfig(width=args.width, height=args.height,
                          enable_shadows=args.shadows,
                          enable_refraction=args.refraction,
                          enable_gi=args.gi)
    engine = Engine(
        scene=build_scene(args.scene),
        config=config,
        camera_config=CameraConfig(position=tuple(args.camera_pos)),
        tracer=args.tracer,
    )
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, body: bytes, ctype: str, extra=()):
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in extra:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _q(self):
            from urllib.parse import parse_qs, urlparse

            return {k: v[0] for k, v in
                    parse_qs(urlparse(self.path).query).items()}

        def do_GET(self):  # noqa: N802 (http.server API)
            from PIL import Image

            path = self.path.split("?")[0]
            q = self._q()
            if path == "/":
                self._send(_PAGE.encode(), "text/html")
            elif path == "/frame":
                with lock:
                    engine.camera = engine.camera.updated(
                        (float(q.get("mx", 0)), float(q.get("my", 0))),
                        (float(q.get("r", 0)), float(q.get("u", 0)),
                         float(q.get("f", 0))),
                        dt=0.1,
                    )
                    engine.tick()
                    img = np.asarray(engine.render())
                    engine.end_frame()
                    n = engine.frame_index
                buf = io.BytesIO()
                Image.fromarray(to_srgb_u8(img)[::-1]).save(buf, "PNG")
                self._send(buf.getvalue(), "image/png",
                           [("X-Frame", str(n)), ("Cache-Control", "no-store")])
            elif path == "/pick":
                from clraytracer_tpu.raycast import pick

                with lock:
                    hit = pick(engine.scene, engine.camera,
                               float(q["x"]), float(q["y"]))
                self._send(json.dumps({
                    "hit": bool(hit.hit),
                    "instance": int(hit.instance),
                    "triangle": int(hit.index),
                    "distance": float(hit.distance),
                    "color": [round(float(c), 3) for c in hit.color],
                }).encode(), "application/json")
            elif path == "/sun":
                with lock:
                    engine.sun_angle = float(q["v"])
                self._send(b"{}", "application/json")
            elif path == "/materials":
                with lock:
                    alb = np.asarray(engine.scene.materials.albedo)
                    n = int(engine.scene.materials.count)
                hexes = [
                    "#%02x%02x%02x" % tuple(
                        int(round(float(c) * 255)) for c in alb[i]
                    )
                    for i in range(n)
                ]
                self._send(json.dumps(hexes).encode(), "application/json")
            elif path == "/material":
                # live material edit (ResourceManager.cpp:102-128 analogue):
                # update the albedo row + refresh the packed tables
                import dataclasses as dc

                import jax.numpy as jnp

                from clraytracer_tpu.ops.shade import refresh_packed

                i = int(q["i"])
                c = q["c"].lstrip("#")
                rgb = tuple(int(c[k : k + 2], 16) / 255.0 for k in (0, 2, 4))
                with lock:
                    alb = engine.scene.materials.albedo.at[i].set(
                        jnp.asarray(rgb, engine.scene.materials.albedo.dtype)
                    )
                    mats = engine.scene.materials.replace(albedo=alb)
                    engine.scene = refresh_packed(
                        dc.replace(engine.scene, materials=mats)
                    )
                self._send(b"{}", "application/json")
            else:
                self.send_error(404)

    srv = ThreadingHTTPServer(("127.0.0.1", args.port), Handler)
    print(f"live viewer on http://localhost:{args.port}/  "
          f"(scene={args.scene}, tracer={args.tracer})", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
