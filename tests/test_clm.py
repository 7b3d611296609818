"""Reference `.clm` binary-cache interop: container parse, QuickLZ decode
(native + pure-Python), save round-trip, and asset-path resolution."""

from pathlib import Path

import numpy as np
import pytest

from clraytracer_tpu.scene.cache import import_mesh
from clraytracer_tpu.scene.clm import (
    TRI_DTYPE,
    _qlz_decompress_py,
    load_clm,
    qlz_decompress,
    qlz_store,
    resolve_asset_path,
    save_clm,
)
from clraytracer_tpu.scene.obj import ObjMaterial, ObjMesh
from clraytracer_tpu.scene.procedural import MeshData

REF_ASSETS = Path("/root/reference/CLRayTracer/Assets")

needs_reference = pytest.mark.skipif(
    not REF_ASSETS.exists(), reason="reference assets not mounted"
)


def _random_mesh(n: int, seed: int = 0) -> ObjMesh:
    rng = np.random.default_rng(seed)
    verts = rng.normal(size=(3, n, 3)).astype(np.float32)
    uv = rng.uniform(size=(3, n, 2)).astype(np.float16).astype(np.float32)
    nrm = rng.normal(size=(3, n, 3)).astype(np.float16).astype(np.float32)
    mesh = MeshData(
        v0=verts[0], v1=verts[1], v2=verts[2],
        uv0=uv[0], uv1=uv[1], uv2=uv[2],
        n0=nrm[0], n1=nrm[1], n2=nrm[2],
        mat_idx=(rng.integers(0, 2, n)).astype(np.int32),
    )
    mats = [
        ObjMaterial(
            name="stone",
            diffuse=np.array([1.0, 0.5, 0.25], np.float32),
            specular=np.array([0.2, 0.2, 0.2], np.float32),
            shininess=0.5, roughness=0.75,
            diffuse_map="Assets/demo/stone.JPG", specular_map=None,
        ),
        ObjMaterial(
            name="flat",
            diffuse=np.array([0.0, 1.0, 0.0], np.float32),
            specular=np.array([0.0, 0.0, 0.0], np.float32),
            shininess=1.0, roughness=0.0,
            diffuse_map=None, specular_map="spec.png",
        ),
    ]
    return ObjMesh(mesh=mesh, materials=mats)


def test_qlz_stored_container_roundtrip():
    payload = bytes(range(256)) * 5
    blob = qlz_store(payload)
    assert qlz_decompress(blob, len(payload)) == payload
    assert _qlz_decompress_py(blob, len(payload)) == payload


@pytest.mark.parametrize("n", [16, 3000])  # raw and compressed-branch sizes
def test_clm_save_load_roundtrip(tmp_path, n):
    obj = _random_mesh(n)
    save_clm(tmp_path / "m.clm", obj)
    back = load_clm(tmp_path / "m.clm")
    m, b = obj.mesh, back.mesh
    np.testing.assert_array_equal(b.v0, m.v0)
    np.testing.assert_array_equal(b.v2, m.v2)
    # uv/normals stored as f16 — inputs were f16-exact, so equal
    np.testing.assert_array_equal(b.uv1, m.uv1)
    np.testing.assert_array_equal(b.n0, m.n0)
    np.testing.assert_array_equal(b.mat_idx, m.mat_idx)
    assert [x.name for x in back.materials] == ["stone", "flat"]
    assert back.materials[0].diffuse_map == "Assets/demo/stone.JPG"
    assert back.materials[1].specular_map == "spec.png"
    assert back.materials[1].diffuse_map is None
    # colors round through u32 pack at 1/255 precision
    np.testing.assert_allclose(
        back.materials[0].diffuse, obj.materials[0].diffuse, atol=1 / 254
    )


def test_import_mesh_accepts_clm(tmp_path):
    obj = _random_mesh(16)
    save_clm(tmp_path / "m.clm", obj)
    direct = import_mesh(tmp_path / "m.clm")
    assert direct.mesh.count == 16
    # sibling fallback: asking for the (absent) OBJ finds the .clm
    sibling = import_mesh(tmp_path / "m.obj")
    assert sibling.mesh.count == 16


def test_resolve_asset_path_case_and_prefix(tmp_path):
    (tmp_path / "Tex").mkdir()
    (tmp_path / "Tex" / "Stone.JPG").write_bytes(b"x")
    # windows-case, project-root-relative path stored in the file
    got = resolve_asset_path(tmp_path, "Assets/scene/tex/stone.jpg")
    assert got == tmp_path / "Tex" / "Stone.JPG"
    assert resolve_asset_path(tmp_path, "absent/nothere.png") is None


@needs_reference
def test_reference_clm_assets_load():
    expected = {
        "sphere.clm": 80,
        "nanosuit/nanosuit.clm": 19058,
        "sibenik/sibenik.clm": 75283,
        "sponza/sponza.clm": 66447,
    }
    for rel, tris in expected.items():
        obj = load_clm(REF_ASSETS / rel)
        assert obj.mesh.count == tris, rel
        m = obj.mesh
        assert np.isfinite(m.v0).all() and np.isfinite(m.n2).all(), rel
        # every stored texture path must resolve on disk (case-fixed)
        for mat in obj.materials:
            if mat.diffuse_map:
                assert (
                    resolve_asset_path((REF_ASSETS / rel).parent, mat.diffuse_map)
                    is not None
                ), (rel, mat.diffuse_map)


def _compressible(n: int, seed: int) -> bytes:
    """Tri-blob-like data: repetitive records with noise sprinkled in."""
    rng = np.random.default_rng(seed)
    rec = rng.integers(0, 256, 80, dtype=np.uint8)
    buf = np.tile(rec, n // 80 + 1)[:n]
    idx = rng.integers(0, max(n, 1), max(n // 7, 1))
    buf[idx] = rng.integers(0, 256, idx.size, dtype=np.uint8)
    return buf.tobytes()


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize(
    "n", [16, 17, 30, 31, 32, 100, 215, 216, 1000, 4096, 100_000]
)
def test_qlz_compress_roundtrip(n, seed):
    """Level-1 encode -> decode identity through BOTH decoders, across the
    stored/compressed and narrow/wide boundaries and control-word edges."""
    from clraytracer_tpu.scene.clm import qlz_compress

    for payload in (
        _compressible(n, seed),
        np.random.default_rng(seed).integers(0, 256, n, np.uint8).tobytes(),
        bytes(n),
    ):
        blob = qlz_compress(payload)
        assert qlz_decompress(blob, len(payload)) == payload
        assert _qlz_decompress_py(blob, len(payload)) == payload


def test_qlz_compress_python_mirror_is_bit_identical():
    """The pure-Python encoder and the native one emit the same stream
    (same greedy algorithm, same table discipline)."""
    from clraytracer_tpu.runtime.build import native_lib
    from clraytracer_tpu.scene.clm import _qlz_compress_py, qlz_compress

    if native_lib() is None:
        pytest.skip("native runtime unavailable")
    for n, seed in ((216, 0), (5000, 1), (77_777, 2)):
        payload = _compressible(n, seed)
        assert qlz_compress(payload) == _qlz_compress_py(payload)


def test_qlz_compress_shrinks_tri_blobs():
    from clraytracer_tpu.scene.clm import qlz_compress

    obj = _random_mesh(3000)
    tris = np.zeros(3000, TRI_DTYPE)
    for name in ("v0", "v1", "v2"):
        tris[name][:, :3] = getattr(obj.mesh, name)
    payload = tris.tobytes()
    blob = qlz_compress(payload)
    assert blob[0] & 1, "tri blob should take the compressed branch"
    assert len(blob) < len(payload) * 0.8
    assert qlz_decompress(blob, len(payload)) == payload


def test_qlz_compress_incompressible_falls_back_to_stored():
    from clraytracer_tpu.scene.clm import qlz_compress

    payload = np.random.default_rng(7).integers(0, 256, 4096, np.uint8).tobytes()
    blob = qlz_compress(payload)
    assert not blob[0] & 1  # stored container
    assert qlz_decompress(blob, len(payload)) == payload


@needs_reference
def test_qlz_recompressed_sponza_size_near_reference():
    """Our encoder's output on sponza's tri arena lands within 1.2x of the
    reference's own compressed stream for the same bytes."""
    import struct

    from clraytracer_tpu.scene.clm import qlz_compress

    data = (REF_ASSETS / "sponza/sponza.clm").read_bytes()
    _, num_tris, num_mats = struct.unpack_from("<Iii", data, 0)
    off = 12 + num_mats * 24
    (msz,) = struct.unpack_from("<I", data, off)
    off += 4 + msz
    (csz,) = struct.unpack_from("<Q", data, off)
    blob = data[off + 8 : off + 8 + csz]
    dsize = num_tris * TRI_DTYPE.itemsize
    raw = qlz_decompress(blob, dsize)
    ours = qlz_compress(raw)
    assert qlz_decompress(ours, dsize) == raw
    assert len(ours) <= 1.2 * len(blob), (len(ours), len(blob))


@needs_reference
def test_qlz_python_fallback_matches_native():
    """Decode sponza's real compressed stream with both implementations."""
    import struct

    data = (REF_ASSETS / "sponza/sponza.clm").read_bytes()
    _, num_tris, num_mats = struct.unpack_from("<Iii", data, 0)
    off = 12 + num_mats * 24
    (msz,) = struct.unpack_from("<I", data, off)
    off += 4 + msz
    (csz,) = struct.unpack_from("<Q", data, off)
    blob = data[off + 8 : off + 8 + csz]
    dsize = num_tris * TRI_DTYPE.itemsize
    native = qlz_decompress(blob, dsize)
    assert len(native) == dsize
    assert _qlz_decompress_py(blob, dsize) == native
