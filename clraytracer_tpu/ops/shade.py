"""Texture sampling, skybox, and the Whitted/Phong shading step.

Vectorized twins of the reference device functions:

* ``sample_texture`` — UV wrap + point sample into the flat texel pool
  (MathAndSTL.cl:260-266).
* ``sample_skybox`` — equirect mapping ``theta = atan2(x,-z)/pi * 0.5 * w``,
  ``phi = acos(y)/pi * h``, flat index ``phi*w + theta + offset``
  (MathAndSTL.cl:253-258; the literal ``+2`` there is the skybox texture's
  pool offset).
* ``shade_hits`` — one bounce of the Trace megakernel's shading block
  (kernel_main.cl:226-271): barycentric normal/uv interpolation from half
  attributes, normals transformed by the instance's inverse 3x3, integer
  color modulate, sun-angle Phong with "atmospheric" ambient, and the
  specular energy carried into the next (reflection) bounce.

Layout: all per-ray vectors/colors are **planar [3, N]** (ops/planar.py) —
interleaved [..., 3] arrays cost ~500x on TPU. Scene tables keep their
canonical [T, 3] layout; shading slices each component column once (cheap at
table scale) and gathers per-channel [N] arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from clraytracer_tpu.ops import planar
from clraytracer_tpu.scene.types import Scene, TextureAtlas

_U8 = jnp.float32(1.0 / 255.0)


def _tex_record(atlas: TextureAtlas, tex_idx: Array) -> tuple[Array, Array, Array]:
    w = jnp.take(atlas.width, tex_idx, mode="clip")
    h = jnp.take(atlas.height, tex_idx, mode="clip")
    off = jnp.take(atlas.offset, tex_idx, mode="clip")
    return w, h, off


def _gather_texels(atlas: TextureAtlas, flat: Array) -> Array:
    """Per-channel planar gather from the texel pool → [3, N]."""
    return jnp.stack(
        [jnp.take(atlas.texels[:, c], flat, mode="clip") for c in range(3)]
    )


def sample_texture_planar(atlas: TextureAtlas, tex_idx: Array, u: Array, v: Array) -> Array:
    """Point-sample RGB → [3, N] with UV wrap (truncating casts as in the
    reference, MathAndSTL.cl:262-264)."""
    w, h, off = _tex_record(atlas, tex_idx)
    uw = u - jnp.floor(u)
    vw = v - jnp.floor(v)
    us = (w.astype(jnp.float32) * uw).astype(jnp.int32)
    vs = (h.astype(jnp.float32) * vw).astype(jnp.int32)
    return _gather_texels(atlas, vs * w + off + us)


def sample_skybox_planar(atlas: TextureAtlas, tex_idx: Array, d: Array) -> Array:
    """Equirect skybox sample for planar [3, N] directions → [3, N]."""
    w, h, off = _tex_record(atlas, tex_idx)
    theta = (
        jnp.arctan2(d[0], -d[2]) / jnp.pi * 0.5 * w.astype(jnp.float32)
    ).astype(jnp.int32)
    phi = (
        jnp.arccos(jnp.clip(d[1], -1.0, 1.0)) / jnp.pi * h.astype(jnp.float32)
    ).astype(jnp.int32)
    return _gather_texels(atlas, phi * w + theta + off)


# interleaved-API wrappers (tests, tooling)
def sample_texture(atlas: TextureAtlas, tex_idx: Array, uv: Array) -> Array:
    shape = uv.shape[:-1]
    out = sample_texture_planar(
        atlas,
        tex_idx.reshape(-1),
        uv[..., 0].reshape(-1),
        uv[..., 1].reshape(-1),
    )
    return planar.to_last(out, shape)


def sample_skybox(atlas: TextureAtlas, tex_idx: Array, direction: Array) -> Array:
    shape = direction.shape[:-1]
    idx = jnp.broadcast_to(tex_idx, shape).reshape(-1)
    out = sample_skybox_planar(atlas, idx, planar.from_last(direction))
    return planar.to_last(out, shape)


def _modulate_u32(texel: Array, color_u32: Array) -> Array:
    """Reference integer color modulate, planar: texel [3, N] float in [0,1],
    color_u32 [N] packed → ((mat_u8 * texel_u8) >> 8) / 255."""
    c = color_u32.astype(jnp.uint32)
    out = []
    for ch, shift in ((0, 0), (1, 8), (2, 16)):
        mat = (c >> shift) & 0xFF
        tex = jnp.round(texel[ch] * 255.0).astype(jnp.uint32)
        out.append(((mat * tex) >> 8).astype(jnp.float32) * _U8)
    return jnp.stack(out)


def object_space_rays(
    scene: Scene, instance_idx: Array, origin: Array, direction: Array
) -> tuple[Array, Array]:
    """Planar object-space rays of each ray's (gathered) instance: the
    per-ray analogue of the Trace kernel's MatMul with the cached inverse
    transform (kernel_main.cl:205-207). 12 tiny-table gathers + fused FMAs."""
    inv = scene.instances.inverse_transform
    m = lambda a, b: jnp.take(inv[:, a, b], instance_idx, mode="clip")
    o = jnp.stack(
        [
            origin[0] * m(0, 0) + origin[1] * m(1, 0) + origin[2] * m(2, 0) + m(3, 0),
            origin[0] * m(0, 1) + origin[1] * m(1, 1) + origin[2] * m(2, 1) + m(3, 1),
            origin[0] * m(0, 2) + origin[1] * m(1, 2) + origin[2] * m(2, 2) + m(3, 2),
        ]
    )
    d = jnp.stack(
        [
            direction[0] * m(0, 0) + direction[1] * m(1, 0) + direction[2] * m(2, 0),
            direction[0] * m(0, 1) + direction[1] * m(1, 1) + direction[2] * m(2, 1),
            direction[0] * m(0, 2) + direction[1] * m(1, 2) + direction[2] * m(2, 2),
        ]
    )
    return o, d


class BounceState(NamedTuple):
    """Per-ray accumulation state across the 2-bounce loop
    (kernel_main.cl:183-186). All vectors planar [3, N]."""

    result: Array
    energy: Array
    atmospheric: Array
    light_dir: Array
    origin: Array
    direction: Array
    alive: Array  # [N] bool


def initial_bounce_state(origin: Array, direction: Array, sun_angle: Array) -> BounceState:
    """``origin``/``direction``: planar [3, N]."""
    n = direction.shape[1]
    zeros = jnp.zeros((3, n), jnp.float32)
    sun = jnp.stack(
        [jnp.zeros_like(sun_angle), jnp.sin(sun_angle), jnp.cos(sun_angle)]
    )
    return BounceState(
        result=zeros,
        energy=jnp.ones((3, n), jnp.float32),
        atmospheric=jnp.broadcast_to(
            jnp.asarray([0.255, 0.25, 0.27], jnp.float32)[:, None], (3, n)
        ),
        light_dir=jnp.broadcast_to(sun[:, None], (3, n)),
        origin=origin,
        direction=direction,
        alive=jnp.ones(n, bool),
    )


def shade_hits(
    scene: Scene,
    state: BounceState,
    t: Array,  # [N] hit distance (object-space, as in the reference)
    u: Array,
    v: Array,
    tri_idx: Array,  # [N] i32
    instance_idx: Array,  # [N] i32
    hit: Array,  # [N] bool
    mesh_origin: Array,  # [3, N] object-space ray of the hit instance
    mesh_direction: Array,  # [3, N]
    reference_parity: bool = True,
    integer_colors: bool = True,
) -> BounceState:
    """Apply one bounce of shading + update throughput (planar).

    Misses sample the skybox and terminate (kernel_main.cl:219-224); hits run
    the Phong block (kernel_main.cl:226-271). ``reference_parity`` keeps the
    kernel's hard-coded specular(0.2)/roughness(0.5)/shininess(1.0) overrides
    (kernel_main.cl:248-250). ``integer_colors`` selects the bit-faithful u8
    modulate (non-differentiable) vs the float path used for gradients.
    """
    tris = scene.tris
    mats = scene.materials

    # ---- miss: skybox -----------------------------------------------------
    sky = sample_skybox_planar(
        scene.atlas,
        jnp.full(t.shape, scene.skybox_tex, jnp.int32),
        state.direction,
    )
    miss_now = state.alive & ~hit
    result = planar.where(
        miss_now, state.result + sky * state.energy, state.result
    )

    live = state.alive & hit

    # ---- gather hit attributes (per-channel: slice table column, gather) --
    def gcol(table: Array, c: int) -> Array:
        return jnp.take(table[:, c], tri_idx, mode="clip").astype(jnp.float32)

    mat_id = (
        jnp.take(scene.instances.material_start, instance_idx, mode="clip")
        + jnp.take(tris.mat_idx, tri_idx, mode="clip")
    )
    mgather = lambda arr: jnp.take(arr, mat_id, mode="clip")

    w0 = 1.0 - u - v
    bary = (w0, u, v)

    # instance inverse 3x3 per ray (12 tiny-table gathers)
    inv = scene.instances.inverse_transform
    minv = lambda a, b: jnp.take(inv[:, a, b], instance_idx, mode="clip")

    # normals: object → world via n @ inv[:3,:3] (kernel_main.cl:232-236)
    def world_normal(table: Array) -> Array:
        nx, ny, nz = gcol(table, 0), gcol(table, 1), gcol(table, 2)
        return jnp.stack(
            [
                nx * minv(0, 0) + ny * minv(1, 0) + nz * minv(2, 0),
                nx * minv(0, 1) + ny * minv(1, 1) + nz * minv(2, 1),
                nx * minv(0, 2) + ny * minv(1, 2) + nz * minv(2, 2),
            ]
        )

    n0 = world_normal(tris.n0)
    n1 = world_normal(tris.n1)
    n2 = world_normal(tris.n2)
    normal = planar.normalize(
        planar.scale(n0, bary[0]) + planar.scale(n1, bary[1]) + planar.scale(n2, bary[2])
    )

    uu = gcol(tris.uv0, 0) * w0 + gcol(tris.uv1, 0) * u + gcol(tris.uv2, 0) * v
    vv = gcol(tris.uv0, 1) * w0 + gcol(tris.uv1, 1) * u + gcol(tris.uv2, 1) * v

    texel = sample_texture_planar(scene.atlas, mgather(mats.albedo_tex), uu, vv)
    if integer_colors:
        color = _modulate_u32(texel, mgather(mats.color_u32))
    else:
        alb = mats.albedo
        color = texel * jnp.stack(
            [jnp.take(alb[:, c], mat_id, mode="clip") for c in range(3)]
        )

    if reference_parity:
        # kernel_main.cl:248-250 overrides material properties
        specular_color = jnp.full_like(color, 0.2)
        roughness = jnp.full_like(t, 0.5)
        shininess = jnp.full_like(t, 1.0)
    else:
        spec_texel = sample_texture_planar(
            scene.atlas, mgather(mats.specular_tex), uu, vv
        )
        if integer_colors:
            specular_color = _modulate_u32(spec_texel, mgather(mats.specular_u32))
        else:
            spec = mats.specular
            specular_color = spec_texel * jnp.stack(
                [jnp.take(spec[:, c], mat_id, mode="clip") for c in range(3)]
            )
        roughness = mgather(mats.roughness)
        shininess = mgather(mats.shininess)

    # hit point in the hit instance's object space — the reference reuses it
    # directly as the next world-space origin (kernel_main.cl:246-253); with
    # identity instance transforms the two coincide.
    point = mesh_origin + planar.scale(mesh_direction, t)
    new_origin = point + normal * 0.01
    new_direction = planar.reflect(state.direction, normal)

    # ---- Phong shade (kernel_main.cl:258-271) -----------------------------
    shadow = 1.0
    ndl_raw = planar.dot(normal, -state.light_dir)
    ambient = planar.scale(
        state.atmospheric * color, jnp.maximum(-ndl_raw, 0.1)
    )
    ndl = jnp.maximum(ndl_raw, 0.0)
    specular = planar.scale(specular_color, (1.0 - roughness) * ndl * shadow * ndl)
    refl_light = planar.reflect(-state.light_dir, normal)
    spec_light = (
        ndl
        * jnp.power(
            jnp.maximum(planar.dot(refl_light, mesh_direction), 0.0), shininess
        )
        * 0.2
    )

    contrib = (
        planar.scale(state.energy * color, ndl)
        + ambient
        + spec_light[None]
    )
    result = planar.where(live, result + contrib, result)

    return BounceState(
        result=result,
        energy=planar.where(live, state.energy * specular, state.energy),
        atmospheric=planar.where(
            live, state.atmospheric * 0.4, state.atmospheric
        ),
        light_dir=planar.where(live, new_direction, state.light_dir),
        origin=planar.where(live, new_origin, state.origin),
        direction=planar.where(live, new_direction, state.direction),
        alive=live,
    )
