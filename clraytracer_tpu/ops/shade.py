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
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from clraytracer_tpu import math3d
from clraytracer_tpu.scene.types import Scene, TextureAtlas


def _tex_record(atlas: TextureAtlas, tex_idx: Array) -> tuple[Array, Array, Array]:
    w = jnp.take(atlas.width, tex_idx, mode="clip")
    h = jnp.take(atlas.height, tex_idx, mode="clip")
    off = jnp.take(atlas.offset, tex_idx, mode="clip")
    return w, h, off


def sample_texture(atlas: TextureAtlas, tex_idx: Array, uv: Array) -> Array:
    """Point-sample RGB (float in [0,1]) with UV wrap.

    ``tex_idx``: [...] i32 texture handles; ``uv``: [..., 2].
    Truncating int casts match the reference (MathAndSTL.cl:262-264).
    """
    w, h, off = _tex_record(atlas, tex_idx)
    uvw = uv - jnp.floor(uv)
    us = (w.astype(jnp.float32) * uvw[..., 0]).astype(jnp.int32)
    vs = (h.astype(jnp.float32) * uvw[..., 1]).astype(jnp.int32)
    flat = vs * w + off + us
    return jnp.take(atlas.texels, flat, axis=0, mode="clip")


def sample_skybox(atlas: TextureAtlas, tex_idx: Array, direction: Array) -> Array:
    """Equirect skybox sample for [..., 3] ray directions."""
    w, h, off = _tex_record(atlas, tex_idx)
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    theta = (
        jnp.arctan2(direction[..., 0], -direction[..., 2]) / jnp.pi * 0.5 * wf
    ).astype(jnp.int32)
    phi = (
        jnp.arccos(jnp.clip(direction[..., 1], -1.0, 1.0)) / jnp.pi * hf
    ).astype(jnp.int32)
    flat = phi * w + theta + off
    return jnp.take(atlas.texels, flat, axis=0, mode="clip")


class BounceState(NamedTuple):
    """Per-ray accumulation state across the 2-bounce loop
    (kernel_main.cl:183-186)."""

    result: Array  # [..., 3] accumulated radiance
    energy: Array  # [..., 3] path throughput
    atmospheric: Array  # [..., 3] ambient tint (decays 0.4x per bounce)
    light_dir: Array  # [..., 3]
    origin: Array  # [..., 3] next-bounce ray origin
    direction: Array  # [..., 3] next-bounce ray direction
    alive: Array  # [...] bool — False once the ray escaped to the skybox


def initial_bounce_state(origin: Array, direction: Array, sun_angle: Array) -> BounceState:
    shape = direction.shape
    zeros = jnp.zeros(shape, jnp.float32)
    sun = jnp.stack(
        [
            jnp.zeros_like(sun_angle),
            jnp.sin(sun_angle),
            jnp.cos(sun_angle),
        ],
        axis=-1,
    )
    return BounceState(
        result=zeros,
        energy=jnp.ones(shape, jnp.float32),
        atmospheric=jnp.broadcast_to(
            jnp.array([0.255, 0.25, 0.27], jnp.float32), shape
        ),
        light_dir=jnp.broadcast_to(sun, shape),
        origin=origin,
        direction=direction,
        alive=jnp.ones(shape[:-1], bool),
    )


def shade_hits(
    scene: Scene,
    state: BounceState,
    t: Array,  # [...] hit distance (object-space, as in the reference)
    u: Array,
    v: Array,
    tri_idx: Array,  # [...] i32
    instance_idx: Array,  # [...] i32
    hit: Array,  # [...] bool
    mesh_origin: Array,  # [..., 3] object-space ray origin of the hit instance
    mesh_direction: Array,  # [..., 3] object-space ray direction
    reference_parity: bool = True,
    integer_colors: bool = True,
) -> BounceState:
    """Apply one bounce of shading + update throughput.

    Misses sample the skybox and terminate (kernel_main.cl:219-224); hits run
    the Phong block (kernel_main.cl:226-271). ``reference_parity`` keeps the
    kernel's hard-coded specular(0.2)/roughness(0.5)/shininess(1.0) overrides
    (kernel_main.cl:248-250); otherwise real material values are used.

    ``integer_colors`` selects the reference's u8 color modulate
    ((mat*texel)>>8, MathAndSTL.cl:243-249) — bit-faithful but
    non-differentiable; the float path (texel * albedo) is used for gradient
    work and is equal to within 1/255 quantization.
    """
    tris = scene.tris
    mats = scene.materials

    # ---- miss: skybox ------------------------------------------------------
    sky = sample_skybox(
        scene.atlas,
        jnp.asarray(scene.skybox_tex, jnp.int32),
        state.direction,
    )
    miss_now = state.alive & ~hit
    result = jnp.where(
        miss_now[..., None], state.result + sky * state.energy, state.result
    )

    live = state.alive & hit

    # ---- gather hit attributes ----------------------------------------------
    g = lambda arr: jnp.take(arr, tri_idx, axis=0, mode="clip")
    inv_t = jnp.take(
        scene.instances.inverse_transform, instance_idx, axis=0, mode="clip"
    )  # [..., 4, 4]
    inv3 = inv_t[..., :3, :3]
    mat_id = (
        jnp.take(scene.instances.material_start, instance_idx, mode="clip")
        + g(tris.mat_idx)
    )
    mg = lambda arr: jnp.take(arr, mat_id, axis=0, mode="clip")

    bary = jnp.stack([1.0 - u - v, u, v], axis=-1)  # [..., 3]

    def bary_mix(a0: Array, a1: Array, a2: Array) -> Array:
        return (
            a0.astype(jnp.float32) * bary[..., 0:1]
            + a1.astype(jnp.float32) * bary[..., 1:2]
            + a2.astype(jnp.float32) * bary[..., 2:3]
        )

    # normals: object → world via v @ inv[:3,:3] (kernel_main.cl:232-236)
    tfm = lambda n: math3d.matvec(n.astype(jnp.float32), inv3)
    n0, n1, n2 = tfm(g(tris.n0)), tfm(g(tris.n1)), tfm(g(tris.n2))
    normal = math3d.normalize(bary_mix(n0, n1, n2))

    uv = bary_mix(g(tris.uv0), g(tris.uv1), g(tris.uv2))

    texel = sample_texture(scene.atlas, mg(mats.albedo_tex), uv)
    if integer_colors:
        # integer color modulate parity: ((mat_u8 * texel_u8) >> 8) / 255
        color = math3d.multiply_color_u32(
            jnp.round(texel * 255.0).astype(jnp.uint32), mg(mats.color_u32)
        )
    else:
        color = texel * mg(mats.albedo)

    if reference_parity:
        # kernel_main.cl:248-250 overrides material properties
        specular_color = jnp.full_like(color, 0.2)
        roughness = jnp.full_like(t, 0.5)
        shininess = jnp.full_like(t, 1.0)
    else:
        spec_texel = sample_texture(scene.atlas, mg(mats.specular_tex), uv)
        if integer_colors:
            specular_color = math3d.multiply_color_u32(
                jnp.round(spec_texel * 255.0).astype(jnp.uint32),
                mg(mats.specular_u32),
            )
        else:
            specular_color = spec_texel * mg(mats.specular)
        roughness = mg(mats.roughness)
        shininess = mg(mats.shininess)

    # hit point in the hit instance's object space — the reference reuses it
    # directly as the next world-space origin (kernel_main.cl:246-253); with
    # identity instance transforms the two coincide.
    point = mesh_origin + t[..., None] * mesh_direction
    new_origin = point + normal * 0.01
    new_direction = math3d.reflect(state.direction, normal)

    # ---- Phong shade (kernel_main.cl:258-271) -------------------------------
    shadow = 1.0
    ndl_raw = jnp.sum(normal * (-state.light_dir), axis=-1)
    ambient = (
        jnp.maximum(-ndl_raw, 0.1)[..., None] * state.atmospheric * color
    )
    ndl = jnp.maximum(ndl_raw, 0.0)
    specular = (
        ((1.0 - roughness) * ndl * shadow)[..., None]
        * specular_color
        * ndl[..., None]
    )
    refl_light = math3d.reflect(-state.light_dir, normal)
    spec_light = (
        ndl
        * jnp.power(
            jnp.maximum(jnp.sum(refl_light * mesh_direction, axis=-1), 0.0),
            shininess,
        )
        * 0.2
    )[..., None]

    contrib = state.energy * (color * ndl[..., None]) + ambient + spec_light
    result = jnp.where(live[..., None], result + contrib, result)

    return BounceState(
        result=result,
        energy=jnp.where(live[..., None], state.energy * specular, state.energy),
        atmospheric=jnp.where(
            live[..., None], state.atmospheric * 0.4, state.atmospheric
        ),
        light_dir=jnp.where(live[..., None], new_direction, state.light_dir),
        origin=jnp.where(live[..., None], new_origin, state.origin),
        direction=jnp.where(live[..., None], new_direction, state.direction),
        alive=live,
    )
