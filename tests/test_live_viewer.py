"""Live-viewer HTTP loop: frame streaming, picking, live material edit."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
PORT = 8973


def _get(path: str, timeout: float = 120.0) -> bytes:
    return urllib.request.urlopen(
        f"http://127.0.0.1:{PORT}{path}", timeout=timeout
    ).read()


@pytest.fixture(scope="module")
def viewer():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, str(ROOT / "tools" / "live_viewer.py"),
         "--scene", "two", "--width", "64", "--height", "48",
         "--port", str(PORT)],
        env=env, cwd=ROOT,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                _get("/", timeout=5)
                break
            except Exception:
                if proc.poll() is not None:
                    out = proc.stdout.read().decode(errors="replace")
                    raise RuntimeError(f"viewer died:\n{out}")
                time.sleep(1.0)
        else:
            raise RuntimeError("viewer did not come up")
        yield proc
    finally:
        proc.terminate()
        proc.wait(timeout=10)


@pytest.mark.slow
def test_viewer_endpoints(viewer):
    page = _get("/")
    assert b"clraytracer_tpu" in page

    frame = _get("/frame?mx=0&my=0&r=0&u=0&f=0")
    assert frame[:8] == b"\x89PNG\r\n\x1a\n"

    mats = json.loads(_get("/materials"))
    assert len(mats) >= 3 and all(m.startswith("#") for m in mats)

    # live edit material 1 to pure blue; the materials panel reflects it
    _get("/material?i=1&c=%230000ff")
    assert json.loads(_get("/materials"))[1] == "#0000ff"

    # pick the sphere: at 64x48 it sits around (24, 26) (top-origin px);
    # color is texel-modulated (checker), so only hit metadata is exact
    hit = json.loads(_get("/pick?x=24&y=26"))
    assert hit["hit"] is True
    assert hit["instance"] == 0
    assert hit["color"][0] <= 0.25  # red channel gone after the blue edit

    # a fly step moves the camera: consecutive frames differ
    f2 = _get("/frame?mx=0&my=0&r=0&u=0&f=1")
    assert f2 != frame


def test_viewer_resource_panel(viewer):
    """The editor's scene-tree/resource panel (ResourceWindow.cpp
    analogue): resources listing, texture thumbnails, file browser,
    hot-swap open."""
    res = json.loads(_get("/resources"))
    assert res["summary"]["instances"] == 2
    assert len(res["meshes"]) == 2
    assert res["meshes"][0]["tris"] > 0
    assert len(res["instances"]) == 2
    # conftest 'two' scene: sphere instance translated to (-2, 1, 0)
    assert res["instances"][0]["position"][0] == pytest.approx(-2.0, abs=1e-3)
    assert len(res["textures"]) >= 3
    assert len(res["materials"]) >= 3

    thumb = _get("/thumb?i=2")
    assert thumb[:8] == b"\x89PNG\r\n\x1a\n"

    files = json.loads(_get("/files"))
    assert "dir" in files and isinstance(files["dirs"], list)

    # hot-swap the scene to 'sphere' (one mesh, one instance), then back
    out = json.loads(_get("/open?path=sphere", timeout=300))
    assert out["instances"] == 1
    res2 = json.loads(_get("/resources"))
    assert res2["summary"]["instances"] == 1
    frame = _get("/frame?mx=0&my=0&r=0&u=0&f=0", timeout=300)
    assert frame[:8] == b"\x89PNG\r\n\x1a\n"
    out = json.loads(_get("/open?path=two", timeout=300))
    assert out["instances"] == 2


def test_page_theme_and_dragdrop_hooks():
    """The served page carries the Editor-cosmetics analogues (PARITY
    residual, GUI.cpp:77-136 / Editor.cpp theme functions): theme
    selector with CSS variables + persisted choice, and drag-drop of
    Files-browser entries onto the viewport."""
    from tools.live_viewer import _PAGE

    assert "setTheme" in _PAGE and "localStorage" in _PAGE
    for theme in ("light", "classic"):
        assert f"body.{theme}" in _PAGE
    assert "ondrop" in _PAGE and "ondragstart" in _PAGE
    assert "text/clrt-path" in _PAGE
    assert 'draggable="true"' in _PAGE
