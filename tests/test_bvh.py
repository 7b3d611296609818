"""BVH builder invariants (SURVEY.md §4 test plan: all tris covered exactly
once, child AABBs within parents, SAH behaves)."""

import numpy as np
import pytest

from clraytracer_tpu.bvh import build_bvh, validate_bvh
from clraytracer_tpu.scene.procedural import cube, sphere_field, uv_sphere


def _build(mesh, **kw):
    return build_bvh(mesh.v0, mesh.v1, mesh.v2, [mesh.count], **kw)


def test_sphere_invariants():
    mesh = uv_sphere(1.0, 12, 24)
    b = _build(mesh)
    validate_bvh(b, mesh.count)
    assert len(b.roots) == 1
    # non-trivial tree
    assert (b.tri_count == 0).sum() > 4


def test_perm_is_permutation():
    mesh = uv_sphere(1.0, 8, 16)
    b = _build(mesh)
    assert sorted(b.perm.tolist()) == list(range(mesh.count))


def test_root_bounds_cover_everything():
    mesh = uv_sphere(2.5, 10, 20)
    b = _build(mesh)
    root = b.roots[0]
    np.testing.assert_array_less(b.node_min[root] - 1e-4, mesh.v0.min(0))
    np.testing.assert_array_less(mesh.v0.max(0), b.node_max[root] + 1e-4)


def test_multi_mesh_forest():
    a, c = uv_sphere(1.0, 6, 8), cube(1.0)
    v0 = np.concatenate([a.v0, c.v0])
    v1 = np.concatenate([a.v1, c.v1])
    v2 = np.concatenate([a.v2, c.v2])
    b = build_bvh(v0, v1, v2, [a.count, c.count])
    validate_bvh(b, a.count + c.count)
    assert len(b.roots) == 2
    # each mesh's triangles remain within its arena range
    assert set(b.perm[: a.count]) == set(range(a.count))
    assert set(b.perm[a.count :]) == set(range(a.count, a.count + c.count))


def test_max_leaf_forces_splits():
    mesh = uv_sphere(1.0, 10, 20)
    b = _build(mesh, max_leaf=8)
    leaf_sizes = b.tri_count[b.tri_count > 0]
    assert leaf_sizes.max() <= 8
    validate_bvh(b, mesh.count)


def test_min_leaf_caps_depth():
    mesh = uv_sphere(1.0, 8, 16)
    b = _build(mesh, min_leaf=16)
    leaf_sizes = b.tri_count[b.tri_count > 0]
    assert leaf_sizes.min() >= 1
    # far fewer nodes than the unconstrained build
    full = _build(mesh)
    assert len(b.tri_count) < len(full.tri_count)


def test_degenerate_identical_centroids():
    # all triangles identical → unsplittable → single leaf
    v = np.tile(np.array([[0.0, 0.0, 0.0]], np.float32), (32, 1))
    b = build_bvh(v, v + 0.1, v + 0.2, [32])
    validate_bvh(b, 32)
    assert b.tri_count[b.roots[0]] == 32


@pytest.mark.slow
def test_large_scene_builds():
    mesh = sphere_field(n_side=4, n_lat=16, n_lon=32)
    b = _build(mesh)
    validate_bvh(b, mesh.count)
