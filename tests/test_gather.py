"""Tests for the TPU gather layer (ops/gather.py) and packed shading tables."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from clraytracer_tpu.ops import gather
from clraytracer_tpu.ops.shade import build_shading_tables, refresh_packed


def test_take_rows_matches_naive():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((40, 7)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 40, (5, 6)), jnp.int32)
    out = gather.take_rows(table, idx)
    assert out.shape == (7, 5, 6)
    expect = np.asarray(table)[np.asarray(idx)]  # [5, 6, 7]
    np.testing.assert_array_equal(np.asarray(out), np.moveaxis(expect, -1, 0))


def test_onehot_rows_exact_f32():
    rng = np.random.default_rng(1)
    # adversarial values: huge exponent spread + exact integers
    vals = rng.standard_normal((64, 9)) * np.exp2(rng.integers(-30, 30, (64, 9)))
    vals[:, 3] = rng.integers(0, 1 << 24, 64)  # int columns must stay exact
    table = jnp.asarray(vals, jnp.float32)
    idx = jnp.asarray(rng.integers(0, 64, 257), jnp.int32)
    out = gather.onehot_rows(table, idx)
    expect = np.moveaxis(np.asarray(table)[np.asarray(idx)], -1, 0)
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_onehot_rows_clamps_out_of_range():
    table = jnp.asarray([[1.0], [2.0], [3.0]])
    idx = jnp.asarray([-5, 0, 2, 7])
    out = np.asarray(gather.onehot_rows(table, idx))[0]
    np.testing.assert_array_equal(out, [1.0, 1.0, 3.0, 3.0])


def test_packed_tables_match_injit_build(sphere_scene):
    """The builder's host-packed tables must be bit-identical to the
    in-jit (differentiable) build — shading's fast and slow paths agree."""
    tabs = build_shading_tables(sphere_scene)
    pk = sphere_scene.packed
    assert pk is not None
    np.testing.assert_array_equal(np.asarray(pk.tri_attr), np.asarray(tabs.tri_attr))
    np.testing.assert_array_equal(np.asarray(pk.inst_rows), np.asarray(tabs.inst_rows))
    np.testing.assert_array_equal(np.asarray(pk.mat_rows), np.asarray(tabs.mat_rows))


def test_refresh_packed_tracks_material_edit(sphere_scene):
    mats = dataclasses.replace(
        sphere_scene.materials,
        albedo=sphere_scene.materials.albedo * 0.5,
    )
    edited = dataclasses.replace(sphere_scene, materials=mats)
    refreshed = refresh_packed(edited)
    tabs = build_shading_tables(edited)
    np.testing.assert_array_equal(
        np.asarray(refreshed.packed.mat_rows), np.asarray(tabs.mat_rows)
    )
    # skybox statics carry over
    assert refreshed.packed.skybox_w == sphere_scene.packed.skybox_w


def test_take_rows_sorted_vjp_matches_scatter():
    """The sort-based table VJP (TPU frame-scale backward for pool
    gathers) must match the scatter-add VJP: same values, same gradients
    (up to summation-order ulps)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from clraytracer_tpu.ops import gather

    rng = np.random.default_rng(0)
    P, W = 1000, 4
    table = jnp.asarray(rng.standard_normal((P, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(-5, P + 5, size=(50, 100)).astype(np.int32))
    cot = jnp.asarray(rng.standard_normal((W, 50, 100)).astype(np.float32))

    f1 = lambda t: jnp.sum(gather.take_rows(t, idx) * cot)
    f2 = lambda t: jnp.sum(gather.take_rows_sorted_vjp(t, idx) * cot)
    v1, g1 = jax.value_and_grad(f1)(table)
    v2, g2 = jax.value_and_grad(f2)(table)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5
    )


def test_take_rows_sorted_perm_vjp_matches_scatter():
    """The permutation-payload sorted VJP (wide-table backward for the
    differentiable tracer's [T, 25] triangle table) must match the
    scatter-add VJP: same values, same gradients (summation-order ulps)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from clraytracer_tpu.ops import gather

    rng = np.random.default_rng(1)
    P, W = 700, 25
    table = jnp.asarray(rng.standard_normal((P, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(-5, P + 5, size=(40, 90)).astype(np.int32))
    cot = jnp.asarray(rng.standard_normal((W, 40, 90)).astype(np.float32))

    f1 = lambda t: jnp.sum(gather.take_rows(t, idx) * cot)
    f2 = lambda t: jnp.sum(gather.take_rows_sorted_perm_vjp(t, idx) * cot)
    v1, g1 = jax.value_and_grad(f1)(table)
    v2, g2 = jax.value_and_grad(f2)(table)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    # the running cumsum accumulates ~W more rounding than the scatter's
    # pairwise adds at this duplication level (measured max 2e-5)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4
    )


def test_take_rows_mxu_forward_bit_exact():
    """The chunk-predicated one-hot MXU gather (ops/gather_pallas.py,
    interpret mode on CPU) is bit-exact vs the XLA row gather, including
    clip-mode out-of-range indices and non-multiple shapes."""
    import jax

    from clraytracer_tpu.ops.gather_pallas import take_rows_mxu

    rng = np.random.default_rng(1)
    for T, W, shape in ((700, 25, (24, 128)), (512, 32, (9,)), (1500, 7, (4, 40))):
        table = jnp.asarray(rng.normal(size=(T, W)).astype(np.float32) * 100)
        idx = jnp.asarray(rng.integers(-3, T + 5, shape).astype(np.int32))
        ref = gather.take_rows(table, idx)
        got = take_rows_mxu(table, idx)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_take_rows_mxu_vjp_matches_scatter():
    import jax

    from clraytracer_tpu.ops.gather_pallas import take_rows_mxu

    rng = np.random.default_rng(2)
    T, W = 1300, 25
    table = jnp.asarray(rng.normal(size=(T, W)).astype(np.float32))
    # coherent winner blocks + some repeats, the tracer's idx statistics
    idx = jnp.asarray(
        np.sort(rng.integers(0, T, (16, 128)).astype(np.int32), axis=None)
        .reshape(16, 128)
    )
    g = jnp.asarray(rng.normal(size=(W, 16, 128)).astype(np.float32))
    _, vjp_ref = jax.vjp(lambda t: gather.take_rows(t, idx), table)
    _, vjp_got = jax.vjp(lambda t: take_rows_mxu(t, idx), table)
    (dr,) = vjp_ref(g)
    (dg,) = vjp_got(g)
    np.testing.assert_allclose(
        np.asarray(dr), np.asarray(dg), rtol=1e-5, atol=1e-5
    )
