"""Camera: perspective/view matrices and batched primary-ray generation.

TPU-native re-design of the reference's FPS camera (Math/Camera.hpp) and the
RayGen OpenCL kernel (kernels/kernel_main.cl:277-287). Instead of one GPU
work-item per pixel writing into a ray buffer, ``ray_directions`` produces the
whole [H, W, 3] direction grid as a single fused jnp computation — XLA maps it
onto the VPU; no kernel is needed.

Interactive-input handling (mouse-look, WASDQE fly, "infinite mouse" wrap,
Camera.hpp:47-93) is host-side state: ``Camera.updated`` applies the same
pitch/yaw/position deltas.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array

from clraytracer_tpu import math3d
from clraytracer_tpu.config import CameraConfig

_DEG2RAD = np.pi / 180.0


@dataclasses.dataclass(frozen=True)
class Camera:
    """Host-side camera state; matrices are plain numpy (cheap, per frame)."""

    config: CameraConfig
    width: int
    height: int
    position: np.ndarray
    yaw_deg: float
    pitch_deg: float

    @classmethod
    def create(cls, config: CameraConfig, width: int, height: int) -> "Camera":
        return cls(
            config=config,
            width=width,
            height=height,
            position=np.asarray(config.position, np.float32),
            yaw_deg=config.yaw_deg,
            pitch_deg=config.pitch_deg,
        )

    # -- orientation ------------------------------------------------------

    @property
    def front(self) -> np.ndarray:
        """Forward vector from yaw/pitch (reference Camera.hpp:74-77)."""
        yaw = self.yaw_deg * _DEG2RAD
        pitch = self.pitch_deg * _DEG2RAD
        f = np.array(
            [
                np.cos(yaw) * np.cos(pitch),
                np.sin(pitch),
                np.sin(yaw) * np.cos(pitch),
            ],
            np.float32,
        )
        return f / np.linalg.norm(f)

    @property
    def right(self) -> np.ndarray:
        r = np.cross(self.front, np.array([0.0, 1.0, 0.0], np.float32))
        return r / np.linalg.norm(r)

    @property
    def up(self) -> np.ndarray:
        u = np.cross(self.right, self.front)
        return u / np.linalg.norm(u)

    # -- matrices ----------------------------------------------------------

    @property
    def projection(self) -> np.ndarray:
        return math3d.perspective_fov_rh(
            self.config.vertical_fov_deg * _DEG2RAD,
            float(self.width),
            float(self.height),
            self.config.near_clip,
            self.config.far_clip,
        )

    @property
    def view(self) -> np.ndarray:
        return math3d.look_at_rh(
            self.position, self.front, np.array([0.0, 1.0, 0.0], np.float32)
        )

    @property
    def inverse_projection(self) -> np.ndarray:
        return np.linalg.inv(self.projection).astype(np.float32)

    @property
    def inverse_view(self) -> np.ndarray:
        return np.linalg.inv(self.view).astype(np.float32)

    # -- movement (reference Camera.hpp:56-94) ------------------------------

    def updated(
        self,
        mouse_delta: tuple[float, float] = (0.0, 0.0),
        move: tuple[float, float, float] = (0.0, 0.0, 0.0),
        dt: float = 1.0 / 60.0,
        sensitivity: float = 20.0,
    ) -> "Camera":
        """Apply one tick of mouse-look + fly movement, returning a new camera.

        ``move`` is (right, up, forward) in key units (D-A, E-Q, W-S).
        """
        pitch = self.pitch_deg - mouse_delta[1] * dt * sensitivity
        yaw = self.yaw_deg + mouse_delta[0] * dt * sensitivity
        pitch = float(np.clip(pitch, -89.0, 89.0))
        speed = dt * 2.0
        cam = dataclasses.replace(self, yaw_deg=yaw, pitch_deg=pitch)
        pos = (
            cam.position
            + cam.right * (move[0] * speed)
            + cam.up * (move[1] * speed)
            + cam.front * (move[2] * speed)
        )
        return dataclasses.replace(cam, position=pos.astype(np.float32))


def ray_directions_planar(
    inverse_view: Array,
    inverse_projection: Array,
    width: int,
    height: int,
    row_start: Array | int = 0,
    num_rows: int | None = None,
) -> Array:
    """Planar [3, num_rows, W] normalized primary-ray directions.

    Vectorized twin of the RayGen kernel (kernel_main.cl:277-287):
    ``coord = (i/W, j/H) * 2 - 1``; unproject via inverseProjection;
    perspective divide; rotate into world by inverseView; normalize. Ray
    ``j * W + i`` is pixel (i, j). All math is per-component on [rows, W]
    grids (planar) — interleaved [..., 4] intermediates are slow on TPU and
    MXU matmuls of these matrices are numerically unsafe (bf16 input
    rounding), see math3d.matvec.

    ``row_start``/``num_rows`` select a row window of the full H-row grid —
    how each device of a mesh generates only its shard of the pixel grid.
    """
    if num_rows is None:
        num_rows = height
    xs = (jnp.arange(width, dtype=jnp.float32) / width) * 2.0 - 1.0
    rows = row_start + jnp.arange(num_rows, dtype=jnp.float32)
    ys = (rows / height) * 2.0 - 1.0
    cx, cy = jnp.meshgrid(xs, ys, indexing="xy")  # [num_rows, W]
    return _unproject_grid(inverse_view, inverse_projection, cx, cy)


def _unproject_grid(
    inverse_view: Array, inverse_projection: Array, cx: Array, cy: Array
) -> Array:
    """NDC grids → normalized world directions [3, *cx.shape] (the RayGen
    unprojection, kernel_main.cl:277-287, as explicit sums of products —
    MXU matmuls of 4x4 matrices are numerically unsafe, see math3d)."""
    ip = inverse_projection
    tx = cx * ip[0, 0] + cy * ip[1, 0] + ip[2, 0] + ip[3, 0]
    ty = cx * ip[0, 1] + cy * ip[1, 1] + ip[2, 1] + ip[3, 1]
    tz = cx * ip[0, 2] + cy * ip[1, 2] + ip[2, 2] + ip[3, 2]
    tw = cx * ip[0, 3] + cy * ip[1, 3] + ip[2, 3] + ip[3, 3]
    inv_w = 1.0 / tw
    tx, ty, tz = tx * inv_w, ty * inv_w, tz * inv_w

    iv = inverse_view
    wx = tx * iv[0, 0] + ty * iv[1, 0] + tz * iv[2, 0] + iv[3, 0]
    wy = tx * iv[0, 1] + ty * iv[1, 1] + tz * iv[2, 1] + iv[3, 1]
    wz = tx * iv[0, 2] + ty * iv[1, 2] + tz * iv[2, 2] + iv[3, 2]
    rn = 1.0 / jnp.sqrt(wx * wx + wy * wy + wz * wz)
    return jnp.stack([wx * rn, wy * rn, wz * rn])


def ray_directions_linear(
    inverse_view: Array,
    inverse_projection: Array,
    width: int,
    height: int,
    rows: int,
) -> Array:
    """Ray-linear [3, rows, 128] normalized primary-ray directions.

    Same unprojection as :func:`ray_directions_planar`, but generated
    directly in the render loop's [rows, 128] tile layout (ray ``r*128+l``
    is pixel ``(n % W, n // W)``) — entering the bounce loop through a
    [3, H, W] grid costs a full lane relayout at 1080p. Pad lanes
    (``n >= W*H``) get valid off-screen directions (``cy > 1``), so no
    special pad handling is needed downstream.
    """
    n = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    )
    i = (n % width).astype(jnp.float32)
    j = (n // width).astype(jnp.float32)
    cx = (i / width) * 2.0 - 1.0
    cy = (j / height) * 2.0 - 1.0
    return _unproject_grid(inverse_view, inverse_projection, cx, cy)


def ray_directions_tiled(
    inverse_view: Array,
    inverse_projection: Array,
    width: int,
    height: int,
    tile_rows: int,
) -> Array:
    """Screen-tile-ordered [3, rows, 128] primary-ray directions.

    Row block ``t*tile_rows..(t+1)*tile_rows`` (one Pallas tracer tile)
    covers the **pixel rectangle** ``[ty*tile_rows, +tile_rows) x
    [tx*128, +128)`` with ``t = ty*tiles_x + tx`` — a compact square-ish
    footprint whose ray cone is narrow, so the tracer's per-tile
    supercluster/cluster culling discards almost everything for empty
    tiles. The ray-linear scanline order makes each tile a 1920x4-pixel
    band that crosses the entire image and intersects most of the scene.
    Rays within a tile and the [rows, 128] shape are unchanged — only the
    tile→pixel mapping differs; the frame path un-tiles once at the end
    (a pure reshape/transpose, see render.trace_image).

    Pad lanes (``i >= width`` or ``j >= height``) get valid off-screen
    directions, so no special handling is needed downstream.
    """
    tiles_x = -(-width // 128)
    rows = -(-height // tile_rows) * tile_rows * tiles_x
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    tile = r // tile_rows
    i = ((tile % tiles_x) * 128 + lane).astype(jnp.float32)
    j = ((tile // tiles_x) * tile_rows + r % tile_rows).astype(jnp.float32)
    cx = (i / width) * 2.0 - 1.0
    cy = (j / height) * 2.0 - 1.0
    return _unproject_grid(inverse_view, inverse_projection, cx, cy)


def ray_directions(
    inverse_view: Array,
    inverse_projection: Array,
    width: int,
    height: int,
    row_start: Array | int = 0,
    num_rows: int | None = None,
) -> Array:
    """Interleaved [num_rows, W, 3] wrapper around the planar ray generator."""
    if num_rows is None:
        num_rows = height
    p = ray_directions_planar(
        inverse_view, inverse_projection, width, height, row_start, num_rows
    )
    return jnp.moveaxis(p, 0, -1)


def screen_point_to_ray(
    camera: Camera, x: float, y: float
) -> tuple[np.ndarray, np.ndarray]:
    """Unproject one screen point for picking (reference Camera.hpp:109-135).

    Note the picking path flips y (mouse coords are top-down) — RayGen does
    not; this matches ScreenPointToRay exactly.
    """
    cx = (x / camera.width) * 2.0 - 1.0
    cy = (1.0 - y / camera.height) * 2.0 - 1.0
    target = np.array([cx, cy, 1.0, 1.0], np.float32) @ camera.inverse_projection
    target /= target[3]
    world = target @ camera.inverse_view
    d = world[:3] / np.linalg.norm(world[:3])
    return camera.position.copy(), d.astype(np.float32)
