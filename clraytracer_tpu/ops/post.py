"""Post-processing chain: saturation → Reinhard-extended tone map → gamma →
vignette, plus FXAA.

jnp twins of the reference kernels (fused by XLA into one elementwise pass):

* ``saturation`` — MathAndSTL.cl:154-158 (luma-sqrt pivot, change=1.2).
* ``reinhard`` — extended Reinhard with max_white 0.8 plus an internal
  pow(1/1.55) (MathAndSTL.cl:143-152).
* ``gamma_correct`` — pow(1/1.2) (MathAndSTL.cl:160).
* ``vignette`` — shadertoy-style uv falloff (MathAndSTL.cl:163-169).
* ``fxaa`` — the reference implements FXAA but never calls it
  (kernel_main.cl:294-340, 349); here it's implemented and toggleable.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

_MAX_WHITE = 0.8
# numpy literals, NOT jnp: module-level device arrays become jit-captured
# constants that axon re-uploads per call
import numpy as _np

_LUMA_R = _np.asarray([0.2126, 0.7152, 0.0722], _np.float32)
_FXAA_LUMA = _np.asarray([0.299, 0.587, 0.114], _np.float32)

_FXAA_SPAN_MAX = 8.0
_FXAA_REDUCE_MUL = 1.0 / 8.0
_FXAA_REDUCE_MIN = 1.0 / 128.0


def _luminance(rgb: Array) -> Array:
    return jnp.einsum("...c,c->...", rgb, _LUMA_R)


def saturation(rgb: Array, change: float = 1.2) -> Array:
    p = jnp.sqrt(
        rgb[..., 0] ** 2 * 0.299 + rgb[..., 1] ** 2 * 0.587 + rgb[..., 2] ** 2 * 0.114
    )[..., None]
    return p + (rgb - p) * change


def reinhard(rgb: Array) -> Array:
    l_old = _luminance(rgb)
    numerator = l_old * (1.0 + l_old / (_MAX_WHITE * _MAX_WHITE))
    l_new = numerator / (1.0 + l_old)
    scaled = rgb * (l_new / jnp.where(l_old == 0.0, 1.0, l_old))[..., None]
    return jnp.power(jnp.maximum(scaled, 0.0), 1.0 / 1.55)


def gamma_correct(rgb: Array) -> Array:
    return jnp.power(jnp.maximum(rgb, 0.0), 1.0 / 1.2)


def vignette_mask(height: int, width: int) -> Array:
    """[H, W] multiplicative vignette (MathAndSTL.cl:163-169)."""
    u = (jnp.arange(width, dtype=jnp.float32) + 0.0) / width
    v = (jnp.arange(height, dtype=jnp.float32) + 0.0) / height
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    fu = uu * (1.0 - uu)
    fv = vv * (1.0 - vv)
    vig = fu * fv * 15.0
    return jnp.power(jnp.maximum(vig, 0.0), 0.15)


def fxaa(img: Array) -> Array:
    """FXAA over an [H, W, 3] image (kernel_main.cl:294-340).

    Image-space neighbour fetches become array shifts; the sub-texel bilinear
    taps of the original sample along ``dir`` at ±1/6 and ±1/2 texels.
    """
    h, w = img.shape[:2]

    def shift2(a: Array, dy: int, dx: int) -> Array:
        return jnp.roll(a, shift=(-dy, -dx), axis=(0, 1))

    rgb_nw = shift2(img, -1, -1)
    rgb_ne = shift2(img, -1, 1)
    rgb_sw = shift2(img, 1, -1)
    rgb_se = shift2(img, 1, 1)

    def luma(a: Array) -> Array:
        return jnp.einsum("...c,c->...", a, _FXAA_LUMA)

    l_nw, l_ne, l_sw, l_se, l_m = map(luma, (rgb_nw, rgb_ne, rgb_sw, rgb_se, img))

    dir_x = -((l_nw + l_ne) - (l_sw + l_se))
    dir_y = (l_nw + l_sw) - (l_ne + l_se)
    luma_sum = l_nw + l_ne + l_sw + l_se
    dir_reduce = jnp.maximum(luma_sum * 0.25 * _FXAA_REDUCE_MUL, _FXAA_REDUCE_MIN)
    rcp_dir_min = 1.0 / (jnp.minimum(jnp.abs(dir_x), jnp.abs(dir_y)) + dir_reduce)
    d = jnp.stack([dir_x, dir_y], axis=-1) * rcp_dir_min[..., None]
    d = jnp.clip(d, -_FXAA_SPAN_MAX, _FXAA_SPAN_MAX)  # in texel units

    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )

    def bilinear(dy: Array, dx: Array) -> Array:
        fy = jnp.clip(ys + dy, 0.0, h - 1.0)
        fx = jnp.clip(xs + dx, 0.0, w - 1.0)
        y0 = jnp.floor(fy).astype(jnp.int32)
        x0 = jnp.floor(fx).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        wy = (fy - y0)[..., None]
        wx = (fx - x0)[..., None]
        p00 = img[y0, x0]
        p01 = img[y0, x1]
        p10 = img[y1, x0]
        p11 = img[y1, x1]
        return (
            p00 * (1 - wy) * (1 - wx)
            + p01 * (1 - wy) * wx
            + p10 * wy * (1 - wx)
            + p11 * wy * wx
        )

    rgb_a = 0.5 * (
        bilinear(d[..., 1] * -0.166667, d[..., 0] * -0.166667)
        + bilinear(d[..., 1] * 0.166667, d[..., 0] * 0.166667)
    )
    rgb_b = rgb_a * 0.5 + 0.25 * (
        bilinear(d[..., 1] * -0.5, d[..., 0] * -0.5)
        + bilinear(d[..., 1] * 0.5, d[..., 0] * 0.5)
    )
    l_b = luma(rgb_b)
    l_min = jnp.minimum(l_m, jnp.minimum(jnp.minimum(l_nw, l_ne), jnp.minimum(l_sw, l_se)))
    l_max = jnp.maximum(l_m, jnp.maximum(jnp.maximum(l_nw, l_ne), jnp.maximum(l_sw, l_se)))
    use_a = (l_b < l_min) | (l_b > l_max)
    return jnp.where(use_a[..., None], rgb_a, rgb_b)


def _post_core(p: Array, vig: Array | None) -> Array:
    """saturation → Reinhard → merged pow over planar [3, *spatial] pixels.

    ``vig`` is an optional [*spatial] multiplicative vignette mask. The
    per-pixel expression tree is layout-independent, so every caller
    ([3, N], [3, H, W], or the render loop's [3, rows, 128] tile layout)
    produces bit-identical values for the same pixel."""
    # saturation (MathAndSTL.cl:154-158)
    piv = jnp.sqrt(
        p[0] * p[0] * 0.299 + p[1] * p[1] * 0.587 + p[2] * p[2] * 0.114
    )
    p = piv[None] + (p - piv[None]) * 1.2

    # Reinhard luminance rescale (MathAndSTL.cl:143-148)
    l_old = p[0] * 0.2126 + p[1] * 0.7152 + p[2] * 0.0722
    l_new = l_old * (1.0 + l_old / (_MAX_WHITE * _MAX_WHITE)) / (1.0 + l_old)
    p = p * (l_new / jnp.where(l_old == 0.0, 1.0, l_old))[None]

    # merged reinhard-gamma pow (1/1.55 then 1/1.2)
    p = jnp.power(jnp.maximum(p, 0.0), 1.0 / (1.55 * 1.2))

    if vig is not None:
        p = p * vig[None]
    return p


def _vignette_factors(n: int, size: int) -> Array:
    """Per-coordinate separable vignette factor:
    (x*(1-x)*sqrt(15))^0.15 for x = arange(n)/size."""
    x = jnp.arange(n, dtype=jnp.float32) / size
    return jnp.power(jnp.maximum(x * (1.0 - x) * jnp.sqrt(15.0), 0.0), 0.15)


def vignette_mask_tiled(
    width: int, height: int, layout: tuple, rows_total: int
) -> Array:
    """[rows_total, 128] vignette mask in the render loop's screen-tile
    layout (``("strip", trows, tiles_x, _)`` = camera.ray_directions_tiled's
    tile→pixel mapping). Pad lanes (pixel outside the image) get
    u*(1-u) <= 0 → mask 0; they are cropped by the caller's untile."""
    import jax

    _kind, rows, nx, _ny = layout
    r = jax.lax.broadcasted_iota(jnp.int32, (rows_total, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows_total, 128), 1)
    tile = r // rows
    px = ((tile % nx) * 128 + lane).astype(jnp.float32)
    py = ((tile // nx) * rows + r % rows).astype(jnp.float32)
    u = px / width
    v = py / height
    fu = jnp.power(jnp.maximum(u * (1.0 - u) * jnp.sqrt(15.0), 0.0), 0.15)
    fv = jnp.power(jnp.maximum(v * (1.0 - v) * jnp.sqrt(15.0), 0.0), 0.15)
    return fu * fv


def post_process_tiled(
    p: Array,  # [3, rows_total, 128] screen-tile-ordered radiance
    width: int,
    height: int,
    layout: tuple,  # tagged tile layout (render._trace_tiled)
    enable_vignette: bool = True,
) -> Array:
    """Post chain directly on the render loop's [3, rows, 128] tile layout —
    no [H, W, 3] relayout before the elementwise pass (the interleaved
    round-trip costs two full-image transposes per frame at 1080p). FXAA
    needs cross-pixel neighbours and is not available here; callers with
    ``enable_fxaa`` use :func:`post_process` on the untiled image."""
    vig = (
        vignette_mask_tiled(width, height, layout, p.shape[1])
        if enable_vignette
        else None
    )
    return _post_core(p, vig)


def post_process(
    img: Array, enable_fxaa: bool = False, enable_vignette: bool = True
) -> Array:
    """Full chain over an [H, W, 3] linear image (kernel_main.cl:342-359).

    Internally planar ([3, N] channel-major — see ops/planar.py for why) with
    the Reinhard-internal and gamma pows merged into one
    (x^(1/1.55))^(1/1.2) = x^(1/1.86); the separable vignette is evaluated on
    one row + one column instead of per pixel. Same math as the standalone
    ops up to float rounding.
    """
    h, w = img.shape[:2]
    if enable_fxaa:
        img = fxaa(img)
    p = img.reshape(-1, 3).T  # [3, N]

    vig = None
    if enable_vignette:
        # vignette is separable: (fu*fv*15)^0.15 = (fu*sqrt(15))^0.15 * (fv*sqrt(15))^0.15
        fu = _vignette_factors(w, w)
        fv = _vignette_factors(h, h)
        vig = (fv[:, None] * fu[None, :]).reshape(-1)

    p = _post_core(p, vig)
    return p.T.reshape(h, w, 3)
