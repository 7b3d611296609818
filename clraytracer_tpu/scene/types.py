"""Scene data model: SoA pytrees for triangles, BVH, materials, textures,
instances.

The reference packs everything into AoS records tuned for SSE loads — ``Tri``
is 3 x __m128 vertices with centroids hidden in the .w lanes plus half uv /
normals (ResourceManager.hpp:54-67); ``BVHNode`` bit-casts leftFirst/triCount
into the .w lanes of min/max float4s (ResourceManager.hpp:7-11). On TPU the
same data is laid out as separate flat arrays (structure-of-arrays) so that
gathers fetch only what a stage needs and every op vectorizes across the
ray/triangle axis.

Canonical material/texel storage is **float** (differentiable — gradients flow
to these leaves); packed u32 colors are derived views used by the
reference-parity integer shading mode and picking.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax.numpy as jnp
from jax import Array

from clraytracer_tpu.utils.pytree import pytree_dataclass, static_field

#: Miss sentinel distance (reference Infinite=99999 / RayacastMissDistance=1e30;
#: kernels/MathAndSTL.cl:123, CPURayTrace.hpp:14). We standardise on 1e30 and
#: treat anything above HIT_EPSILON * inf as miss.
MISS_DISTANCE = 1e30


@pytree_dataclass
class Triangles:
    """Triangle soup, SoA. One entry per triangle; meshes are contiguous
    ranges (reference Tri arena, ResourceManager.cpp:149).

    uv*/n* are stored float16 to mirror the reference's half attributes
    (AssetManager.cpp:270-274); compute casts to f32.
    """

    v0: Array  # [T, 3] f32 vertex positions
    v1: Array  # [T, 3] f32
    v2: Array  # [T, 3] f32
    uv0: Array  # [T, 2] f16
    uv1: Array  # [T, 2] f16
    uv2: Array  # [T, 2] f16
    n0: Array  # [T, 3] f16 vertex normals
    n1: Array  # [T, 3] f16
    n2: Array  # [T, 3] f16
    mat_idx: Array  # [T] i32 material index local to the owning mesh

    @property
    def count(self) -> int:
        return self.v0.shape[0]

    def centroids(self) -> Array:
        """Triangle centroids (reference BVH.cpp:229-235 precompute)."""
        return (self.v0 + self.v1 + self.v2) * (1.0 / 3.0)


@pytree_dataclass
class BVH:
    """Flattened BVH forest: one root per mesh into a shared node pool.

    Mirrors the reference layout (BVH.cpp:239-252): children are adjacent
    (right = left + 1); ``tri_count > 0`` marks a leaf whose triangles are
    ``[left_first, left_first + tri_count)`` in the (reordered) triangle
    arrays. leftFirst/triCount live in their own i32 arrays instead of
    bit-cast float lanes.
    """

    node_min: Array  # [N, 3] f32
    node_max: Array  # [N, 3] f32
    left_first: Array  # [N] i32
    tri_count: Array  # [N] i32
    #: Root node index per mesh (reference bvhIndices) and per-mesh triangle
    #: ranges (reference MeshInfo.{triangleStart,numTriangles}). Static pytree
    #: metadata: tracers unroll the instance loop over these host-side ints.
    roots: tuple[int, ...] = static_field(default=())
    mesh_tri_start: tuple[int, ...] = static_field(default=())
    mesh_tri_count: tuple[int, ...] = static_field(default=())
    #: Largest leaf in the forest (static): batched tracers unroll leaf
    #: intersection to exactly this width.
    max_leaf_size: int = static_field(default=0)

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]


@pytree_dataclass
class TextureAtlas:
    """Packed texel pool: every texture appended to one flat array and
    addressed by {width, height, offset} records — the reference's design
    (ResourceManager.cpp:180-222, MathAndSTL.cl:229-266), which maps directly
    onto TPU flat gathers.

    ``texels`` are float RGB in [0,1] (differentiable). ``texels_u8`` in the
    builder derives the byte view for parity-mode integer math.
    """

    texels: Array  # [P, 3] f32 in [0, 1]
    width: Array  # [K] i32
    height: Array  # [K] i32
    offset: Array  # [K] i32 texel offset into the pool

    @property
    def num_textures(self) -> int:
        return self.width.shape[0]


@pytree_dataclass
class Materials:
    """Material table (reference Material, ResourceManager.hpp:44-51).

    Float RGB is canonical; ``color_u32``/``specular_u32`` are packed derived
    views kept for the reference-parity integer modulate
    (MathAndSTL.cl:243-249) and for picking records.
    """

    albedo: Array  # [M, 3] f32 in [0, 1]
    specular: Array  # [M, 3] f32 in [0, 1]
    albedo_tex: Array  # [M] i32 texture index
    specular_tex: Array  # [M] i32
    shininess: Array  # [M] f32 (reference stores half; Ns clamped 0-100 / 50)
    roughness: Array  # [M] f32 (reference stores half; from MTL 'd')
    color_u32: Array  # [M] u32 packed 0x00BBGGRR
    specular_u32: Array  # [M] u32
    #: [M] f32 in [0, 1] — NEW beyond the reference (refraction is on its
    #: TODO list, README.md:12): fraction of the continuation ray that
    #: refracts through the surface when RenderConfig.enable_refraction is
    #: set; 0 (the default everywhere, incl. every imported MTL/.clm
    #: material) keeps exact reference behavior.
    transmission: Array

    @property
    def count(self) -> int:
        return self.albedo.shape[0]


@pytree_dataclass
class Instances:
    """Mesh instance registry (reference MeshInstance, Renderer.hpp:6-10):
    cached inverse transforms so rays move into object space
    (kernel_main.cl:205-207) instead of transforming meshes."""

    inverse_transform: Array  # [I, 4, 4] f32 (row-vector convention)
    material_start: Array  # [I] i32
    #: Mesh handle per instance — static metadata (tracers resolve each
    #: instance's BVH root / triangle range host-side and unroll).
    mesh_index: tuple[int, ...] = static_field(default=())

    @property
    def count(self) -> int:
        return self.inverse_transform.shape[0]


@pytree_dataclass
class Clusters:
    """Device cluster tables for the Pallas tile tracer (see
    ops/clusters.py for the layout rationale)."""

    tri_a: Array  # [C, 128] f32: v0x|v0y|v0z|e1x, 32 lanes each
    tri_b: Array  # [C, 128] f32: e1y|e1z|e2x|e2y
    tri_c: Array  # [C, 128] f32: e2z|pad
    at_a: Array  # [C, 128] f32: n0x|n0y|n0z|n1x (shading attrs, f32-from-f16)
    at_b: Array  # [C, 128] f32: n1y|n1z|n2x|n2y
    at_c: Array  # [C, 128] f32: n2z|uv0u|uv0v|uv1u
    at_d: Array  # [C, 128] f32: uv1v|uv2u|uv2v|mat_local
    tri_gid: Array  # [C*32] i32: padded slot → global arena triangle index
    #: AABBs packed 16 boxes per 128-lane row (box i = cols [(i%16)*8,
    #: +8) of row i//16: min xyz | max xyz | 2 pad) — a [N, 8] layout
    #: would be lane-padded 16x by TPU (8, 128) tiling
    cluster_aabb: Array  # [ceil(C/16), 128] f32
    super_aabb: Array  # [ceil(S/16), 128] f32 (S per-mesh padded to a
    #   multiple of 32 — ops/clusters.py HYPER_SIZE)
    #: [8C, 128] f32 HBM-streaming copy of the 7 geometry tables, packed 8
    #: rows per cluster (tri_a|tri_b|tri_c|at_a..at_d|pad) so one cluster is
    #: one contiguous, tile-aligned 4 KiB DMA. Built only for scenes whose
    #: tables exceed the Pallas VMEM budget (scene/builder.py); None keeps
    #: small scenes free of the duplicate.
    geo_stream: Array | None = None
    #: hypercluster AABBs (32 superclusters each), same 16-per-row packing.
    #: None on scenes/checkpoints built before the phase-A0 culling level —
    #: the tracer then runs phase A directly over superclusters.
    hyper_aabb: Array | None = None
    #: per-mesh (super_start, super_count, cluster_start, cluster_count);
    #: super_start is a multiple of 32 (per-mesh hyper padding),
    #: super_count is the real (unpadded) count
    mesh_ranges: tuple[tuple[int, int, int, int], ...] = static_field(default=())


@pytree_dataclass
class PackedTables:
    """Gather-friendly derived tables (see ops/gather.py and
    ops/shade.ShadingTables for the column layouts).

    Everything here is a pure re-layout of the canonical Scene arrays,
    rebuilt by the SceneBuilder whenever materials/instances change.
    Texel-pool offsets are stored hi/lo-split (shade._OFF_SHIFT) so every
    integer column stays f32-exact below 2^24.
    """

    tri_attr: Array  # [T, 16] f32: n0 n1 n2 | uv0 uv1 uv2 | mat_local
    inst_rows: Array  # [I, 17] f32: inverse transform (row-major) | mat_start
    mat_rows: Array  # [M, 16] f32: albedo spec shin rough | tex records
    #: Static skybox texture record (texture sizes are build-time constants;
    #: static ints let XLA fold the equirect index math).
    skybox_w: int = static_field(default=1)
    skybox_h: int = static_field(default=1)
    skybox_off: int = static_field(default=0)
    #: [P] i32 texel pool packed 0x00BBGGRR (the reference's RGB8 word,
    #: MathAndSTL.cl:238-251) — built only for pools too large for XLA to
    #: stage in scoped VMEM: a flat 1-D gather runs ~7 ns/idx on v5e
    #: regardless of coherence, vs ~11-25 ns/idx for un-staged [P, 4] f32
    #: row gathers (ops/render_pallas._finish_frame). Byte-exact: texel
    #: f32 values reconstruct as byte * f32(1/255), the pool's own formula.
    texels_u32: Array | None = None


@pytree_dataclass
class Scene:
    """Complete renderable scene state — the single pytree handed to jitted
    render/trace functions (and sharded/replicated across the device mesh)."""

    tris: Triangles
    bvh: BVH
    materials: Materials
    atlas: TextureAtlas
    instances: Instances
    #: Cluster tables for the Pallas tracer (None → builder skipped them).
    clusters: "Clusters | None" = None
    #: Gather-friendly derived tables (None → shading falls back to building
    #: them in-jit from the canonical arrays, which is also the
    #: differentiable path).
    packed: "PackedTables | None" = None
    #: Texture index used for the equirect skybox (reference hardcodes
    #: textures[2], kernel_main.cl:220).
    skybox_tex: int = static_field(default=2)
    #: Procedural-texture registry: (texture handle, texel-pool offset,
    #: descriptor) triples, static. Every registered handle is ALSO baked
    #: into the atlas (differentiable/golden paths and texel edits keep
    #: working); when every texture a scene references is registered here,
    #: the fast shading path evaluates textures in-register instead of
    #: gathering the pool (see ops/shade.py and scene/procedural_tex.py).
    procedural_tex: tuple = static_field(default=())

    @property
    def num_instances(self) -> int:
        return self.instances.count


def as_device_scene(scene: Scene) -> Scene:
    """Move all scene leaves onto the default device(s)."""
    import jax

    return jax.tree_util.tree_map(jnp.asarray, scene)


def scene_summary(scene: Scene) -> dict[str, Any]:
    return {
        "triangles": int(scene.tris.count),
        "bvh_nodes": int(scene.bvh.num_nodes),
        "meshes": int(np.asarray(scene.bvh.roots).shape[0]),
        "materials": int(scene.materials.count),
        "textures": int(scene.atlas.num_textures),
        "texels": int(scene.atlas.texels.shape[0]),
        "instances": int(scene.instances.count),
    }
