"""RNG parity tests: bit-exact Wang hash / xorshift32 vs a scalar numpy
emulation of the reference kernels (MathAndSTL.cl:187-215)."""

import numpy as np
import jax.numpy as jnp

from clraytracer_tpu.ops import planar
from clraytracer_tpu.ops.rng import (
    hemisphere_sample,
    next_float01,
    pixel_streams,
    tangent_space,
    wang_hash,
    xorshift32,
)

M = np.uint64(0xFFFFFFFF)


def np_wang(s: int) -> int:
    s = np.uint64(s)
    s = (s ^ np.uint64(61)) ^ (s >> np.uint64(16))
    s = (s * np.uint64(9)) & M
    s = s ^ (s >> np.uint64(4))
    s = (s * np.uint64(0x27D4EB2D)) & M
    s = s ^ (s >> np.uint64(15))
    return int(s & M)


def np_xorshift(s: int) -> int:
    s = np.uint64(s)
    s = (s ^ (s << np.uint64(13))) & M
    s = s ^ (s >> np.uint64(17))
    s = (s ^ (s << np.uint64(5))) & M
    return int(s)


def test_wang_hash_bit_exact():
    seeds = np.asarray([0, 1, 61, 12345, 0xDEADBEEF, 0xFFFFFFFF], np.uint32)
    got = np.asarray(wang_hash(jnp.asarray(seeds)))
    expect = np.asarray([np_wang(int(s)) for s in seeds], np.uint32)
    np.testing.assert_array_equal(got, expect)


def test_xorshift_sequence_bit_exact():
    state = 0x12345678
    js = jnp.asarray(np.uint32(state))
    for _ in range(8):
        state = np_xorshift(state)
        js = xorshift32(js)
        assert int(js) == state


def test_next_float01_range_and_scaling():
    s = pixel_streams(64, 32)
    f, s2 = next_float01(s)
    f = np.asarray(f)
    assert (f >= 0.0).all() and (f < 1.0).all()
    assert 0.4 < f.mean() < 0.6  # uniform
    # 24-bit granularity: f * 2^24 is integral (MathAndSTL.cl:127)
    np.testing.assert_array_equal(f * 16777216.0, np.round(f * 16777216.0))
    assert (np.asarray(s2) != np.asarray(s)).all()


def test_pixel_streams_decorrelated():
    s = np.asarray(pixel_streams(16, 16, frame=3))
    assert np.unique(s).size == s.size


def test_tangent_space_orthonormal():
    n = planar.normalize(jnp.asarray(np.random.default_rng(0)
                                     .normal(size=(3, 33)).astype(np.float32)))
    t, b = tangent_space(n)
    for v in (t, b):
        np.testing.assert_allclose(
            np.asarray(planar.dot(v, v)), 1.0, atol=1e-5
        )
    np.testing.assert_allclose(np.asarray(planar.dot(t, n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(planar.dot(t, b)), 0.0, atol=1e-5)
    # the near-+X special case (helper flips to +Z, MathAndSTL.cl:177)
    nx = jnp.asarray(np.asarray([[1.0], [0.0], [0.0]], np.float32))
    tx, bx = tangent_space(nx)
    assert np.isfinite(np.asarray(tx)).all() and np.isfinite(np.asarray(bx)).all()


def test_hemisphere_sample_above_surface():
    rng = np.random.default_rng(1)
    n = planar.normalize(jnp.asarray(rng.normal(size=(3, 257)).astype(np.float32)))
    state = pixel_streams(257, 1)[0]
    d, state2 = hemisphere_sample(state, n)
    d = np.asarray(d)
    np.testing.assert_allclose((d * d).sum(0), 1.0, atol=1e-4)
    cos = np.asarray(planar.dot(jnp.asarray(d), n))
    assert (cos >= -1e-6).all()
    assert (np.asarray(state2) != np.asarray(state)).all()


def test_pcg32_matches_reference_sequence():
    """Host PCG32 vs a pure-python-int replica of the reference's
    Random::PCG (Random.hpp:106-138, the canonical pcg32)."""
    from clraytracer_tpu.ops.rng import PCG32

    M64 = (1 << 64) - 1

    def ref_pcg(initstate, seed, n):
        state, inc = 0, ((seed << 1) | 1) & M64

        def nxt():
            nonlocal state
            old = state
            state = (old * 6364136223846793005 + (inc | 1)) & M64
            xorshifted = (((old >> 18) ^ old) >> 27) & M64
            rot = old >> 59
            x32 = xorshifted & 0xFFFFFFFF
            return ((x32 >> rot) | (x32 << ((-rot) & 31))) & 0xFFFFFFFF

        nxt()
        state = (state + initstate) & M64
        nxt()
        return [nxt() for _ in range(n)]

    r = PCG32(seed=np.uint64(42), initstate=np.uint64(12345))
    assert [int(r.next()) for _ in range(8)] == ref_pcg(12345, 42, 8)
    # vectorized: every lane an independent stream
    rv = PCG32(seed=np.arange(4, dtype=np.uint64) + 1,
               initstate=np.full(4, 7, np.uint64))
    v1, v2 = rv.next(), rv.next()
    for i in range(4):
        e = ref_pcg(7, i + 1, 2)
        assert int(v1[i]) == e[0] and int(v2[i]) == e[1]
    # uniform floats use the reference's 24-bit mantissa scaling
    f = PCG32(seed=np.uint64(1)).next_float01()
    assert 0.0 <= float(f) < 1.0
