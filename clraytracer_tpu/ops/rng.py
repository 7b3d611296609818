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
