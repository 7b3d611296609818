"""Texture decode and packed-atlas assembly.

The reference decodes every image to RGB8 via stb_image and appends it to one
~100 MB texel pool, storing {width, height, texel_offset} per texture
(ResourceManager.cpp:180-222). Defaults: texture 0 is 1x1 white, texture 1 is
1x1 black (ResourceManager.cpp:168-177), so a real texture imported first
lands at texel offset 2 — which is why the skybox sampler's flat index is
``phi * width + theta + 2`` (MathAndSTL.cl:253-258).

Here the pool is built host-side in numpy and shipped to device as one flat
[P, 3] array.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np


@dataclasses.dataclass
class AtlasBuilder:
    """Accumulates RGB8 images into a flat texel pool."""

    max_texels: int | None = None
    _pool: list[np.ndarray] = dataclasses.field(default_factory=list)
    _width: list[int] = dataclasses.field(default_factory=list)
    _height: list[int] = dataclasses.field(default_factory=list)
    _offset: list[int] = dataclasses.field(default_factory=list)
    _cursor: int = 0

    def __post_init__(self) -> None:
        if not self._pool:
            # Default white (handle 0) and black (handle 1) 1x1 textures.
            self.add_image(np.full((1, 1, 3), 255, np.uint8))
            self.add_image(np.zeros((1, 1, 3), np.uint8))

    def add_image(self, rgb8: np.ndarray) -> int:
        """Append an [H, W, 3] uint8 image; returns its texture handle."""
        rgb8 = np.ascontiguousarray(rgb8, np.uint8)
        if rgb8.ndim != 3 or rgb8.shape[2] != 3:
            raise ValueError(f"expected [H, W, 3] RGB8, got {rgb8.shape}")
        h, w = rgb8.shape[:2]
        n = h * w
        if self.max_texels is not None and self._cursor + n > self.max_texels:
            raise MemoryError(
                f"texel pool overflow: {self._cursor + n} > {self.max_texels} "
                "(reference MAX_TEXTURE_MEMORY guard, ResourceManager.cpp:198)"
            )
        handle = len(self._width)
        self._pool.append(rgb8.reshape(n, 3))
        self._width.append(w)
        self._height.append(h)
        self._offset.append(self._cursor)
        self._cursor += n
        return handle

    def load_image(self, path: str | Path) -> int:
        """Decode an image file to RGB8 and append it (stb_image equivalent)."""
        from PIL import Image

        with Image.open(path) as im:
            rgb8 = np.asarray(im.convert("RGB"), np.uint8)
        return self.add_image(rgb8)

    @property
    def num_textures(self) -> int:
        return len(self._width)

    @property
    def num_texels(self) -> int:
        return self._cursor

    def build(self) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Returns (texels_u8 [P,3], width [K], height [K], offset [K])."""
        texels = (
            np.concatenate(self._pool, axis=0)
            if self._pool
            else np.zeros((0, 3), np.uint8)
        )
        return (
            texels,
            np.asarray(self._width, np.int32),
            np.asarray(self._height, np.int32),
            np.asarray(self._offset, np.int32),
        )


def checkerboard(
    size: int = 64,
    cells: int = 8,
    color_a: tuple[int, int, int] = (255, 255, 255),
    color_b: tuple[int, int, int] = (40, 40, 40),
) -> np.ndarray:
    """Checker texture image — the bake of the ``checker`` procedural
    descriptor (scene/procedural_tex.py), so image-imported and
    procedurally-registered checkers are texel-identical."""
    from clraytracer_tpu.scene import procedural_tex as ptex

    return ptex.bake(ptex.checker(size, cells, color_a, color_b))


def gradient_sky(width: int = 256, height: int = 128) -> np.ndarray:
    """Equirect sky image (gradient + ground + sun disc) — the bake of the
    ``sky_gradient`` procedural descriptor. Stand-in for the reference's
    ``cape_hill_4k.jpg`` skybox (Engine.cpp:61) where no asset files are
    wanted."""
    from clraytracer_tpu.scene import procedural_tex as ptex

    return ptex.bake(ptex.sky_gradient(width, height))
