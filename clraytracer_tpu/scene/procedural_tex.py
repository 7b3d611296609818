"""First-class procedural textures: evaluated inline on the VPU.

XLA's TPU per-ray gather is a serial scalar loop (~7-10 ns/index — measured
15-22 ms for one 2M-ray texel fetch at 1080p, the single largest cost in the
frame). For textures that are closed-form functions of the texel coordinate,
the fetch can instead be *computed* in-register: a handful of fused
elementwise ops across all rays (~0.1 ms). This module defines the
descriptor families; the shading path (ops/shade.py) evaluates them inline
whenever every texture a scene references is procedural, and falls back to
the pool gather otherwise.

The reference has no analogue (all its textures are stb_image files,
ResourceManager.cpp:180-222) — this is a TPU-native feature motivated by the
hardware's gather cost. Parity contract: ``eval_texel(desc, i, j)`` must
equal ``bake(desc)[j, i]`` **bit-exactly**, so the procedural path and the
baked-atlas path render identical images (tests/test_scene.py asserts this).
Every formula below therefore uses integer arithmetic that is exact in f32
(all intermediates < 2^24) with power-of-two divisions only — no operation
whose rounding could differ between numpy (host bake) and the TPU VPU.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp
from jax import Array


@dataclasses.dataclass(frozen=True)
class ProceduralTexture:
    """Static descriptor of a closed-form texture.

    Hashable & immutable — stored as static pytree metadata on the Scene so
    jitted shading can specialize on it.

    kind:
      - "constant": rgb0 everywhere (the reference's default white/black
        1x1 textures, ResourceManager.cpp:168-177)
      - "checker":  cells x cells checkerboard of rgb0/rgb1
      - "sky_gradient": vertical zenith→horizon gradient over the upper
        half, ground color below, plus a circular sun disc
    """

    kind: str
    width: int
    height: int
    rgb0: tuple[int, int, int] = (255, 255, 255)
    rgb1: tuple[int, int, int] = (0, 0, 0)
    cells: int = 8
    # sky_gradient params (texel units)
    ground: tuple[int, int, int] = (90, 70, 55)
    sun_center: tuple[int, int] = (0, 0)  # (i, j)
    sun_radius: int = 0


def constant(rgb: tuple[int, int, int]) -> ProceduralTexture:
    return ProceduralTexture(kind="constant", width=1, height=1, rgb0=rgb)


def checker(
    size: int = 64,
    cells: int = 8,
    color_a: tuple[int, int, int] = (255, 255, 255),
    color_b: tuple[int, int, int] = (40, 40, 40),
) -> ProceduralTexture:
    """``size`` and ``cells`` must be powers of two: the cell index is then
    ``floor(i * (cells/size))`` with an exactly-representable power-of-two
    ratio — bit-exact on any IEEE machine (a general f32 division is NOT
    guaranteed correctly rounded on the TPU VPU)."""
    if size & (size - 1) or cells & (cells - 1):
        raise ValueError("checker size and cells must be powers of two")
    return ProceduralTexture(
        kind="checker", width=size, height=size,
        rgb0=tuple(color_a), rgb1=tuple(color_b), cells=cells,
    )


def sky_gradient(
    width: int = 256,
    height: int = 128,
    zenith: tuple[int, int, int] = (60, 90, 170),
    horizon: tuple[int, int, int] = (200, 210, 235),
    ground: tuple[int, int, int] = (90, 70, 55),
) -> ProceduralTexture:
    """Equirect sky: gradient upper hemisphere + ground + sun disc.

    ``height`` must be a power of two (the gradient divides by height/2,
    keeping every texel value integer-exact in f32).
    """
    if height & (height - 1):
        raise ValueError("sky_gradient height must be a power of two")
    return ProceduralTexture(
        kind="sky_gradient", width=width, height=height,
        rgb0=tuple(zenith), rgb1=tuple(horizon), ground=tuple(ground),
        sun_center=(width // 4, (3 * height) // 10),
        sun_radius=max(1, height // 32),
    )


# ---------------------------------------------------------------------------
# evaluation — shared formula, numpy (bake) and jnp (inline) front-ends
# ---------------------------------------------------------------------------


def eval_texel(desc: ProceduralTexture, i: Array, j: Array) -> Array:
    """Byte values [3, *S] f32 in [0, 255] at integer texel coords (i, j).

    ``i``/``j`` may be f32 arrays holding exact integers (the shading path
    computes them with the same wrap+truncate as the pool index math).
    """
    return _eval(desc, jnp, i, j)


def bake(desc: ProceduralTexture) -> np.ndarray:
    """Render the descriptor to an [H, W, 3] u8 image for the atlas (the
    baked image backs the differentiable/golden paths and texel edits)."""
    jj, ii = np.meshgrid(
        np.arange(desc.height, dtype=np.float32),
        np.arange(desc.width, dtype=np.float32),
        indexing="ij",
    )
    rgb = _eval(desc, np, ii, jj)  # [3, H, W] f32 bytes
    return np.moveaxis(rgb, 0, -1).astype(np.uint8)


def _eval(desc: ProceduralTexture, xp, i, j):
    """The one formula both front-ends share. ``xp`` is numpy or jax.numpy;
    ``i``/``j`` are f32 arrays of exact integers. Returns [3, *S] f32 bytes.

    Integer-exact contract: every arithmetic result stays an integer
    < 2^24 represented in f32, except the final checker/gradient selects
    whose operands are such integers — identical on any IEEE machine.
    """
    stack = xp.stack
    if desc.kind == "constant":
        r, g, b = (xp.full_like(i, float(c)) for c in desc.rgb0)
        return stack([r, g, b])

    if desc.kind == "checker":
        # cell index = floor(i * (cells/size)): the ratio is a power of two
        # (enforced by the factory) so the product is exactly rounded and
        # the floor is bit-exact everywhere
        ratio = float(desc.cells) / float(desc.width)
        ci = xp.floor(i * ratio)
        cj = xp.floor(j * ratio)
        odd = xp.floor((ci + cj) * 0.5) * 2.0 != (ci + cj)  # parity, exact
        r = xp.where(odd, float(desc.rgb1[0]), float(desc.rgb0[0]))
        g = xp.where(odd, float(desc.rgb1[1]), float(desc.rgb0[1]))
        b = xp.where(odd, float(desc.rgb1[2]), float(desc.rgb0[2]))
        return stack([r, g, b])

    if desc.kind == "sky_gradient":
        half = float(desc.height // 2)  # power of two → /half exact
        upper = j < half
        jj = xp.minimum(j, half - 1.0)
        out = []
        for c in range(3):
            z, h = float(desc.rgb0[c]), float(desc.rgb1[c])
            # integer lerp: floor((z*(half-j) + h*j) / half); products
            # < 255 * 2^15 < 2^23 exact, /half exact (power of two)
            grad = xp.floor((z * (half - jj) + h * jj) * (1.0 / half))
            out.append(xp.where(upper, grad, float(desc.ground[c])))
        # sun disc (integer circle test, exact)
        ci, cj = desc.sun_center
        dx = i - float(ci)
        dy = j - float(cj)
        sun = dx * dx + dy * dy < float(desc.sun_radius * desc.sun_radius)
        return stack([xp.where(sun, 255.0, ch) for ch in out])

    raise ValueError(f"unknown procedural texture kind: {desc.kind}")
