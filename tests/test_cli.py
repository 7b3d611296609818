"""CLI app-shell smoke tests (the EngineMain.cpp analogue surface): render
to PNG, inspect, snapshot round-trip, and the multi-device scaling sweep
over the virtual 8-device mesh."""

import json
import sys

import numpy as np
import pytest

from clraytracer_tpu.cli import main


def _run(argv, capsys=None):
    saved = sys.argv
    try:
        sys.argv = ["clrt"] + argv
        rc = main(argv)
    finally:
        sys.argv = saved
    return rc


def test_cli_render_writes_png(tmp_path):
    out = tmp_path / "r.png"
    rc = _run([
        "render", "--scene", "sphere", "--tris", "256",
        "--width", "64", "--height", "48", "-o", str(out),
    ])
    assert rc == 0
    data = out.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_cli_inspect_and_snapshot_roundtrip(tmp_path, capsys):
    rc = _run(["inspect", "--scene", "two"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out)
    assert summary["instances"] == 2 and summary["triangles"] > 0

    snap = tmp_path / "two.clsnap.npz"
    rc = _run(["snapshot", "--scene", "two", "-o", str(snap)])
    assert rc == 0
    rc = _run(["inspect", "--scene", str(snap)])
    assert rc == 0
    summary2 = json.loads(capsys.readouterr().out)
    assert summary2 == summary


@pytest.mark.slow
def test_cli_sweep_virtual_mesh(capsys):
    """The scaling sweep runs end-to-end over the virtual 8-device mesh
    (mechanism check; real-ICI numbers need hardware): rows for 1/2/4/8
    devices, finite rates, the production Pallas tracer recorded."""
    rc = _run([
        "sweep", "--scene", "sphere", "--tris", "128",
        "--width", "64", "--height", "32", "--iters", "1",
    ])
    assert rc == 0
    lines = [
        json.loads(l) for l in capsys.readouterr().out.splitlines() if l
    ]
    summary = lines[-1]
    assert summary["tracer"] == "best"
    assert summary["processes"] == 1
    counts = [row["devices"] for row in summary["sweep"]]
    assert counts == [1, 2, 4, 8]
    assert all(np.isfinite(row["mrays_per_s"]) for row in summary["sweep"])
