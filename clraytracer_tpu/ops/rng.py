"""Device RNG + sampling utilities.

TPU-native re-design of the reference's kernel-side random toolkit
(MathAndSTL.cl:187-215): Wang-hash seeding, xorshift32 streams, uniform
floats, tangent-frame construction (MathAndSTL.cl:173-185) and cosine/
uniform hemisphere sampling. The reference keeps per-thread `uint` state;
here every op is vectorized over arbitrary-shaped uint32 state arrays so a
whole tile/image of independent streams advances in one VPU op. Bit-exact
with the reference for the same seeds (same shifts, same 24-bit mantissa
scaling ``c_FMul = 1/2^24``, MathAndSTL.cl:127, 204-205).

The reference never calls HemisphereSample from Trace (reflection is pure
specular, kernel_main.cl:252-271) — it ships the toolkit for the path-traced
extension; we do the same, and the diff/AO demos use it. For gradient-bearing
sampling prefer ``jax.random``; this module is the parity path + a cheap
in-kernel alternative (a xorshift step is 3 VPU ops vs threefry's dozens).
"""

from __future__ import annotations

import jax.numpy as jnp

from clraytracer_tpu.ops import planar

Array = jnp.ndarray

#: float multiplier for 24-bit mantissa uniforms (MathAndSTL.cl:127)
_FMUL = jnp.float32(1.0 / 16777216.0)


def wang_hash(seed: Array) -> Array:
    """Wang integer hash (MathAndSTL.cl:189-195; also Random.hpp:24-33).

    Good single-round scrambling of structured seeds (pixel index, frame
    counter) into decorrelated xorshift stream states.
    """
    s = jnp.asarray(seed, jnp.uint32)
    s = (s ^ jnp.uint32(61)) ^ (s >> 16)
    s = s * jnp.uint32(9)
    s = s ^ (s >> 4)
    s = s * jnp.uint32(0x27D4EB2D)
    s = s ^ (s >> 15)
    return s


def xorshift32(state: Array) -> Array:
    """One xorshift32 step: returns the new state, which is also the sample
    (MathAndSTL.cl:197-202)."""
    s = jnp.asarray(state, jnp.uint32)
    s = s ^ (s << 13)
    s = s ^ (s >> 17)
    s = s ^ (s << 5)
    return s


def next_float01(state: Array) -> tuple[Array, Array]:
    """Uniform float in [0, 1) with 24-bit granularity + the advanced state
    (MathAndSTL.cl:204-206)."""
    s = xorshift32(state)
    return (s >> 8).astype(jnp.float32) * _FMUL, s


def pixel_streams(width: int, height: int, frame: int = 0) -> Array:
    """Planar [H, W] uint32 stream states, decorrelated per pixel and frame
    (the per-thread ``WangHash(i * 9999 + time)`` idiom)."""
    idx = jnp.arange(width * height, dtype=jnp.uint32).reshape(height, width)
    return wang_hash(idx * jnp.uint32(9999) + jnp.uint32(frame))


def tangent_space(normal: Array) -> tuple[Array, Array]:
    """(tangent, binormal) frame around planar normals [3, *S]
    (GetTangentSpace, MathAndSTL.cl:173-185)."""
    nx = jnp.abs(normal[0]) > 0.99
    # helper = +X, or +Z when normal is nearly +X
    hx = jnp.where(nx, 0.0, 1.0)
    hz = jnp.where(nx, 1.0, 0.0)
    helper = jnp.stack([hx, jnp.zeros_like(hx), hz])
    tangent = planar.normalize(planar.cross(normal, helper))
    binormal = planar.normalize(planar.cross(normal, tangent))
    return tangent, binormal


def hemisphere_sample(state: Array, normal: Array) -> tuple[Array, Array]:
    """Cosine^0-weighted (uniform-in-cosTheta) hemisphere directions about
    planar normals [3, *S] (HemisphereSample, MathAndSTL.cl:208-215).

    Returns ([3, *S] directions, advanced state).
    """
    cos_theta, state = next_float01(state)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    u, state = next_float01(state)
    phi = 2.0 * jnp.pi * u
    tx = jnp.cos(phi) * sin_theta
    ty = jnp.sin(phi) * sin_theta
    tangent, binormal = tangent_space(normal)
    d = jnp.stack(
        [
            tangent[c] * tx + binormal[c] * ty + normal[c] * cos_theta
            for c in range(3)
        ]
    )
    return d, state


class PCG32:
    """Host-side PCG32, bit-exact with the reference's ``Random::PCG``
    (Random.hpp:106-138; the standard pcg32 from pcg-random.org) —
    vectorized over numpy uint64 state arrays. The reference uses it
    host-side (shuffles, seeds); device streams use :func:`xorshift32`.

    Constructor forms mirror the reference:
    ``PCG32()`` (default state), ``PCG32(seed)`` (Random.hpp:114-117:
    default state, inc = seed << 1 | 1), ``PCG32(initstate, seed)``
    (Random.hpp:119-125: the canonical pcg32_srandom).
    """

    _MUL = 6364136223846793005
    _M64 = (1 << 64) - 1

    def __init__(self, seed=None, initstate=None):
        import numpy as _np

        if seed is None:
            self.state = _np.asarray(0x853C49E6748FEA9B, _np.uint64)
            self.inc = _np.asarray(0xDA3E39CB94B95BDB, _np.uint64)
        elif initstate is None:
            self.state = _np.broadcast_to(
                _np.asarray(0x853C49E6748FEA9B, _np.uint64),
                _np.shape(seed),
            ).copy() if _np.ndim(seed) else _np.asarray(
                0x853C49E6748FEA9B, _np.uint64
            )
            self.inc = (
                (_np.asarray(seed, _np.uint64) << _np.uint64(1))
                | _np.uint64(1)
            )
        else:
            self.state = _np.zeros_like(_np.asarray(seed, _np.uint64))
            self.inc = (
                (_np.asarray(seed, _np.uint64) << _np.uint64(1))
                | _np.uint64(1)
            )
            self.next()
            self.state = self.state + _np.asarray(initstate, _np.uint64)
            self.next()

    def next(self):
        """One pcg32 step → uint32 sample(s) (Random.hpp:130-138)."""
        import numpy as _np

        old = self.state
        with _np.errstate(over="ignore"):
            self.state = (
                old * _np.uint64(self._MUL) + (self.inc | _np.uint64(1))
            )
        xorshifted = ((old >> _np.uint64(18)) ^ old) >> _np.uint64(27)
        rot = (old >> _np.uint64(59)).astype(_np.uint32)
        x32 = xorshifted.astype(_np.uint32)
        with _np.errstate(over="ignore"):
            return (x32 >> rot) | (x32 << ((-rot) & _np.uint32(31)))

    def next_float01(self):
        """float(Next() >> 8) / 2^24 (Random.hpp:82)."""
        import numpy as _np

        return (self.next() >> _np.uint32(8)).astype(_np.float32) * _np.float32(
            1.0 / 16777216.0
        )


class MTwister:
    """Host-side Mersenne Twister, bit-exact with the reference's 32-bit
    ``Random::MTwister`` (Random.hpp:231-330): MT19937 state layout
    (SIZE 624 / PERIOD 397 / init 0x6c078965 / standard tempering), plus
    the reference's own ``Next64`` quirk — it combines two draws with
    ``&`` instead of ``|`` (Random.hpp:270), so the 64-bit stream is
    reproduced exactly as shipped (mostly zeros), not "fixed"."""

    _SIZE, _PERIOD = 624, 397
    _MAGIC = 0x9908B0DF

    def __init__(self, seed: int = 4586):
        import numpy as np

        mt = np.empty(self._SIZE, np.uint32)
        mt[0] = np.uint32(seed)
        with np.errstate(over="ignore"):
            for i in range(1, self._SIZE):
                mt[i] = np.uint32(0x6C078965) * (
                    mt[i - 1] ^ (mt[i - 1] >> np.uint32(30))
                ) + np.uint32(i)
        self._mt = mt
        self._index = self._SIZE

    def _generate(self) -> None:
        import numpy as np

        mt = self._mt
        S, P = self._SIZE, self._PERIOD
        for i in range(S):
            y = (np.uint32(0x80000000) & mt[i]) | (
                np.uint32(0x7FFFFFFF) & mt[(i + 1) % S]
            )
            sel = np.uint32(0xFFFFFFFF) if (y & np.uint32(1)) else np.uint32(0)
            mt[i] = (
                mt[(i + P) % S]
                ^ (y >> np.uint32(1))
                ^ (sel & np.uint32(self._MAGIC))
            )
        self._index = 0

    def next(self) -> int:
        import numpy as np

        if self._index >= self._SIZE:
            self._generate()
        y = self._mt[self._index]
        self._index += 1
        y ^= y >> np.uint32(11)
        y ^= (y << np.uint32(7)) & np.uint32(0x9D2C5680)
        y ^= (y << np.uint32(15)) & np.uint32(0xEFC60000)
        y ^= y >> np.uint32(18)
        return int(y)

    def next64(self) -> int:
        """Reference parity INCLUDING its bug: ``a & (b << 32)`` — the low
        word is always zero and the high word is ``a_hi & b_lo``-ish, so
        values are almost always 0 (Random.hpp:265-278)."""
        import numpy as np

        if self._index + 1 >= self._SIZE:
            self._generate()
        a = np.uint64(self._mt[self._index]); self._index += 1
        b = np.uint64(self._mt[self._index]); self._index += 1
        y = a & (b << np.uint64(32))
        y ^= y >> np.uint64(11)
        y ^= (y << np.uint64(7)) & np.uint64(0x9D2C5680 & (0x9D2C5680 << 32))
        y ^= (y << np.uint64(15)) & np.uint64(0xEFC60000 & (0xEFC60000 << 32))
        y ^= y >> np.uint64(18)
        return int(y)


class MTwister64:
    """Host-side twin of the reference's NONSTANDARD 64-bit ``MTwister64``
    (Random.hpp:158-230): 624-word uint64 state, M = 367 (not MT19937-64's
    156), multiplicative 69069 seeding with no tempering mask, 32-bit
    mixing masks applied to 64-bit words, and ``Next() = uint32(x >> 16)``.

    Faithfully reproduces the refill's two off-spec behaviours:

    * index 257 is processed TWICE — the first unrolled-by-3 loop
      (``while kk < N - M`` with N-M = 257) overruns to kk = 257, then
      ``kk--`` lets the second loop redo it (Random.hpp:196-208);
    * that overrun reads ``m_MT[624]`` — one past the array, landing on
      ``m_Index`` (value 624/625, padding above). Only bit 31 of that word
      can reach later state (via the re-done index 257's ``y``), and it is
      always 0, so the sequence is deterministic; we model the word as
      ``m_Index``'s value."""

    _N, _M = 624, 367
    _MAGIC = 0x9908B0DF

    def __init__(self, seed: int = 4357):
        import numpy as np

        mt = np.empty(self._N, np.uint64)
        mt[0] = np.uint64(seed)
        with np.errstate(over="ignore"):
            for i in range(1, self._N):
                mt[i] = np.uint64(69069) * mt[i - 1]
        self._mt = mt
        self._index = self._N + 1

    def _generate(self) -> None:
        import numpy as np

        mt = self._mt
        N, M = self._N, self._M
        magic = np.uint64(self._MAGIC)
        one = np.uint64(1)
        hi = np.uint64(0x80000000)
        lo = np.uint64(0x7FFFFFFF)

        def mix(kk: int, base: int) -> None:
            y = (mt[kk] & hi) | (mt[kk + 1] & lo)
            sel = magic if (y & one) else np.uint64(0)
            src = (
                np.uint64(self._index)  # the m_MT[624] == m_Index overrun
                if base == N
                else mt[base]
            )
            mt[kk] = src ^ (y >> one) ^ sel

        kk = 0
        while kk < N - M:  # unrolled-by-3 in the reference: overruns to 257
            for _ in range(3):
                mix(kk, kk + M)
                kk += 1
        kk -= 1  # 257 re-done below, exactly like the reference
        while kk < N - 1:
            for _ in range(3):
                mix(kk, kk + M - N)
                kk += 1
        y = (mt[N - 1] & hi) | (mt[0] & lo)
        sel = magic if (y & one) else np.uint64(0)
        mt[N - 1] = mt[M - 1] ^ (y >> one) ^ sel
        self._index = 0

    def next(self) -> int:
        import numpy as np

        if self._index >= self._N:
            self._generate()
        x = self._mt[self._index]
        self._index += 1
        x ^= x >> np.uint64(11)
        x ^= (x << np.uint64(7)) & np.uint64(0x9D2C5680)
        x ^= (x << np.uint64(15)) & np.uint64(0xEFC60000)
        x ^= x >> np.uint64(18)
        return int(np.uint32(x >> np.uint64(16)))

    def next64(self) -> int:
        """``uint32(Next() >> 16)`` — as shipped (Random.hpp:185)."""
        return self.next() >> 16
