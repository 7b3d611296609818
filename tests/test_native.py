"""Native runtime tests: C++ OBJ parse and BVH build match the Python paths."""

import numpy as np
import pytest

from clraytracer_tpu.runtime.build import native_available
from clraytracer_tpu.runtime.fastobj import build_bvh_native, parse_obj_arrays
from clraytracer_tpu.bvh import build_bvh, validate_bvh
from clraytracer_tpu.scene.procedural import uv_sphere

needs_native = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)

OBJ = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vn 0 0 1
usemtl a
f 1/1/1 2/2/1 3/3/1
usemtl b
f 1 3 4
f -4/-3/-1 -3/-2/-1 -2/-1/-1
"""


@needs_native
def test_native_obj_parse():
    out = parse_obj_arrays(OBJ)
    assert out is not None
    pos, uv, nrm, tp, tu, tn, stmt = out
    assert pos.shape == (4, 3)
    assert uv.shape == (3, 2)
    assert nrm.shape == (1, 3)
    assert tp.shape == (3, 3)
    np.testing.assert_array_equal(tp[0], [0, 1, 2])
    np.testing.assert_array_equal(tu[0], [0, 1, 2])
    np.testing.assert_array_equal(tn[0], [0, 0, 0])
    # 'f 1 3 4' → no uv/normal
    np.testing.assert_array_equal(tp[1], [0, 2, 3])
    np.testing.assert_array_equal(tu[1], [-1, -1, -1])
    # negative (relative) indices resolve
    np.testing.assert_array_equal(tp[2], [0, 1, 2])
    np.testing.assert_array_equal(stmt, [0, 1, 1])


@needs_native
def test_native_bvh_invariants_and_parity():
    mesh = uv_sphere(1.0, 12, 24)
    b = build_bvh_native(mesh.v0, mesh.v1, mesh.v2, [mesh.count], max_leaf=4)
    assert b is not None
    validate_bvh(b, mesh.count)
    assert b.tri_count[b.tri_count > 0].max() <= 4
    # same leaf-coverage quality class as the numpy builder (node counts in
    # the same ballpark; exact trees differ by partition order)
    py = build_bvh(mesh.v0, mesh.v1, mesh.v2, [mesh.count], max_leaf=4)
    assert 0.5 < len(b.tri_count) / len(py.tri_count) < 2.0


@needs_native
def test_native_bvh_multi_mesh():
    a = uv_sphere(1.0, 6, 8)
    c = uv_sphere(2.0, 8, 10)
    v0 = np.concatenate([a.v0, c.v0])
    v1 = np.concatenate([a.v1, c.v1])
    v2 = np.concatenate([a.v2, c.v2])
    b = build_bvh_native(v0, v1, v2, [a.count, c.count], max_leaf=4)
    assert b is not None
    validate_bvh(b, a.count + c.count)
    assert set(b.perm[: a.count]) == set(range(a.count))


@needs_native
def test_native_bvh_parallel_path_deterministic():
    """Above the sequential cutoff (16k tris) the builder fans subtrees out
    to worker threads with task-local node pools; the merged tree must be
    bit-identical across runs (checkpoints and build-twice tests rely on
    deterministic builds) and still satisfy every invariant."""
    from clraytracer_tpu.scene.procedural import sphere_field

    mesh = sphere_field(n_side=5, n_lat=14, n_lon=28)
    assert mesh.count > 16384  # actually exercises the parallel phase
    a = build_bvh_native(mesh.v0, mesh.v1, mesh.v2, [mesh.count], max_leaf=32)
    b = build_bvh_native(mesh.v0, mesh.v1, mesh.v2, [mesh.count], max_leaf=32)
    assert a is not None and b is not None
    validate_bvh(a, mesh.count)
    for f in ("node_min", "node_max", "left_first", "tri_count", "perm"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f))
