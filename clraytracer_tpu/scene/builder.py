"""SceneBuilder: the TPU-native ResourceManager.

Mirrors the reference's resource flow (ResourceManager.cpp): import meshes
into a shared triangle arena, append MTL materials to a global material table
(ImportMesh, ResourceManager.cpp:241-276), pack textures into one texel pool
(ImportTexture, ResourceManager.cpp:180-222), register transformed instances
with cached inverse matrices (Renderer.cpp:226-241), then "push": build the
BVH forest and materialize one immutable device-ready ``Scene`` pytree
(PushMeshesToGPU, ResourceManager.cpp:280-300 — here the "GPU push" is simply
``jax.device_put`` of the arrays).

Material handles follow the reference: material 0 is the prepared default
(PrepareMeshes, ResourceManager.cpp:224-232), ``DEFAULT_MATERIAL`` (0xFFFF)
resolves to the instance's mesh material block (Renderer.cpp:231-233).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from clraytracer_tpu import math3d
from clraytracer_tpu.config import PoolConfig
from clraytracer_tpu.scene import cache as mesh_cache
from clraytracer_tpu.scene.procedural import MeshData
from clraytracer_tpu.scene.textures import AtlasBuilder
from clraytracer_tpu.scene.types import (
    BVH,
    Clusters,
    Instances,
    Materials,
    PackedTables,
    Scene,
    TextureAtlas,
    Triangles,
)
from clraytracer_tpu.bvh import build_bvh
from clraytracer_tpu.ops.clusters import build_clusters
from clraytracer_tpu.utils.logging import get_logger

#: Reference ResourceManager::DefaultMaterial sentinel (ResourceManager.hpp:88).
DEFAULT_MATERIAL = 0xFFFF
NONE_MATERIAL = 0

WHITE_TEXTURE = 0

#: Pools larger than this many texels get a packed-RGB8 i32 copy for the
#: flat texel gather (PackedTables.texels_u32): measured crossover on v5e —
#: [P, 4] f32 row gathers win below (XLA stages the pool in scoped VMEM),
#: flat 1-D gathers win above (~7 ns/idx vs ~11-25 un-staged).
FLAT_TEXEL_MIN = 4_000_000
BLACK_TEXTURE = 1


@dataclasses.dataclass
class _MatRec:
    albedo: np.ndarray
    specular: np.ndarray
    albedo_tex: int
    specular_tex: int
    shininess: float
    roughness: float
    transmission: float = 0.0  # NEW beyond reference (see Materials)


@dataclasses.dataclass
class _InstanceRec:
    mesh: int
    material_start: int
    transform: np.ndarray


class SceneBuilder:
    """Accumulates meshes/textures/materials/instances; ``build()`` produces
    an immutable Scene."""

    def __init__(self, pools: PoolConfig | None = None) -> None:
        from clraytracer_tpu.scene import procedural_tex as ptex

        self.pools = pools or PoolConfig()
        self.atlas = AtlasBuilder(max_texels=self.pools.max_texel_bytes // 3)
        self._meshes: list[MeshData] = []
        self._mesh_material_start: list[int] = []
        self._materials: list[_MatRec] = []
        self._instances: list[_InstanceRec] = []
        # the default white/black 1x1 textures are trivially procedural
        self._procedurals: dict[int, ptex.ProceduralTexture] = {
            WHITE_TEXTURE: ptex.constant((255, 255, 255)),
            BLACK_TEXTURE: ptex.constant((0, 0, 0)),
        }
        self._prepare_default_material()

    # -- materials ----------------------------------------------------------

    def _prepare_default_material(self) -> None:
        """Material 0 (reference PrepareMeshes, ResourceManager.cpp:224-232):
        packed color 0x00FF0037 → rgb (55, 0, 255), specular (250, 228, 210),
        shininess 1.2, roughness 0.8, white albedo / black specular texture."""
        self._materials.append(
            _MatRec(
                albedo=np.array([55, 0, 255], np.float32) / 255.0,
                specular=np.array([250, 228, 210], np.float32) / 255.0,
                albedo_tex=WHITE_TEXTURE,
                specular_tex=BLACK_TEXTURE,
                shininess=1.2,
                roughness=0.8,
            )
        )

    def create_material(
        self,
        albedo: tuple[float, float, float] = (1.0, 1.0, 1.0),
        specular: tuple[float, float, float] = (1.0, 1.0, 1.0),
        albedo_tex: int = WHITE_TEXTURE,
        specular_tex: int = WHITE_TEXTURE,
        shininess: float = 2.2,
        roughness: float = 0.6,
        transmission: float = 0.0,
    ) -> int:
        """ResourceManager::CreateMaterial equivalent; returns the handle."""
        if len(self._materials) >= self.pools.max_materials:
            raise MemoryError("material pool overflow (reference MaxMaterials)")
        self._materials.append(
            _MatRec(
                albedo=np.asarray(albedo, np.float32),
                specular=np.asarray(specular, np.float32),
                albedo_tex=albedo_tex,
                specular_tex=specular_tex,
                shininess=shininess,
                roughness=roughness,
                transmission=transmission,
            )
        )
        return len(self._materials) - 1

    def edit_material(self, handle: int, **updates: object) -> None:
        """Live material editing (reference EditMaterial + PushMaterialsToGPU,
        ResourceManager.cpp:102-143): on the next build/refresh the updated
        table ships to device."""
        rec = self._materials[handle]
        for k, v in updates.items():
            if not hasattr(rec, k):
                raise AttributeError(k)
            setattr(rec, k, np.asarray(v, np.float32) if k in ("albedo", "specular") else v)

    # -- textures -------------------------------------------------------------

    def import_texture(self, source: str | Path | np.ndarray) -> int:
        """Decode + append to the texel pool; returns the texture handle."""
        if len(self.atlas._width) >= self.pools.max_textures:
            raise MemoryError("texture pool overflow (reference MaxTextures)")
        if isinstance(source, np.ndarray):
            return self.atlas.add_image(source)
        return self.atlas.load_image(source)

    def import_procedural(self, desc) -> int:
        """Register a procedural texture (scene/procedural_tex.py): bakes it
        into the atlas like any image (so the differentiable/golden paths and
        texel editing work unchanged) AND records the closed-form descriptor
        so the fast shading path can evaluate it in-register instead of
        gathering the pool. Returns the texture handle."""
        from clraytracer_tpu.scene import procedural_tex as ptex

        handle = self.import_texture(ptex.bake(desc))
        self._procedurals[handle] = desc
        return handle

    # -- meshes ---------------------------------------------------------------

    def add_mesh(self, mesh: MeshData, materials_start: int | None = None) -> int:
        """Add a triangle soup; returns the mesh handle.

        ``materials_start``: index of the mesh's material block in the global
        table (None → 0, i.e. local material indices address the default)."""
        total = sum(m.count for m in self._meshes) + mesh.count
        if total > self.pools.max_triangles:
            raise MemoryError("triangle pool overflow (reference MAX_TRIANGLES)")
        self._meshes.append(mesh)
        self._mesh_material_start.append(
            0 if materials_start is None else materials_start
        )
        return len(self._meshes) - 1

    def import_mesh(self, path: str | Path, use_cache: bool = True) -> int:
        """Import an OBJ/cached mesh and register its materials + textures
        (reference ImportMesh, ResourceManager.cpp:241-276)."""
        from clraytracer_tpu.scene.clm import resolve_asset_path

        path = Path(path)
        obj = mesh_cache.import_mesh(path, use_cache=use_cache)
        mat_start = len(self._materials) if obj.materials else 0
        for om in obj.materials:
            albedo_tex = WHITE_TEXTURE
            specular_tex = WHITE_TEXTURE
            if om.diffuse_map:
                # .clm/.mtl paths may be project-root relative and in Windows
                # case ("Assets/sponza/01_ST_KP.JPG") — resolve both forms.
                tex_path = resolve_asset_path(path.parent, om.diffuse_map)
                if tex_path is not None:
                    albedo_tex = self.import_texture(tex_path)
                else:
                    get_logger().warning(
                        "missing diffuse map %s (near %s)", om.diffuse_map, path
                    )
            if om.specular_map:
                tex_path = resolve_asset_path(path.parent, om.specular_map)
                if tex_path is not None:
                    specular_tex = self.import_texture(tex_path)
            self.create_material(
                albedo=tuple(om.diffuse),
                specular=tuple(om.specular),
                albedo_tex=albedo_tex,
                specular_tex=specular_tex,
                shininess=om.shininess,
                roughness=om.roughness,
            )
        return self.add_mesh(obj.mesh, materials_start=mat_start)

    # -- instances -------------------------------------------------------------

    def add_instance(
        self,
        mesh: int,
        transform: np.ndarray | None = None,
        material: int = DEFAULT_MATERIAL,
    ) -> int:
        """RegisterMeshInstance equivalent (Renderer.cpp:226-241): caches the
        inverse transform; DEFAULT_MATERIAL resolves to the mesh's block."""
        if len(self._instances) >= self.pools.max_instances:
            raise MemoryError("instance pool overflow (reference MaxNumInstances)")
        if material == DEFAULT_MATERIAL:
            material = self._mesh_material_start[mesh]
        m = np.eye(4, dtype=np.float32) if transform is None else np.asarray(
            transform, np.float32
        )
        self._instances.append(_InstanceRec(mesh=mesh, material_start=material, transform=m))
        return len(self._instances) - 1

    def set_instance_transform(self, handle: int, transform: np.ndarray) -> None:
        """SetMeshMatrix equivalent (Renderer.cpp:288-298). The per-frame
        "dirty range upload" becomes rebuilding the small instance arrays."""
        self._instances[handle].transform = np.asarray(transform, np.float32)

    def instance_arrays(self) -> Instances:
        """Host-side instance table; cheap to rebuild every frame (the
        analogue of the dirty-range clEnqueueWriteBuffer, Renderer.cpp:312-320)."""
        if self._instances:
            inv = np.stack(
                [
                    np.linalg.inv(rec.transform).astype(np.float32)
                    for rec in self._instances
                ]
            )
            mat_start = np.array([r.material_start for r in self._instances], np.int32)
        else:
            inv = np.zeros((0, 4, 4), np.float32)
            mat_start = np.zeros(0, np.int32)
        return Instances(
            inverse_transform=jnp.asarray(inv),
            material_start=jnp.asarray(mat_start),
            mesh_index=tuple(int(r.mesh) for r in self._instances),
        )

    # -- build -------------------------------------------------------------------

    def build(self, max_leaf: int | None = 4, min_leaf: int = 1) -> Scene:
        """Build BVHs + finalize device arrays (PushMeshesToGPU +
        PushTexturesToGPU + PushMaterialsToGPU rolled into one).

        ``max_leaf`` defaults to 4: SAH leaves average 2-3 triangles anyway,
        and a hard bound lets the wavefront/Pallas tracers intersect leaves
        as fixed-width dense batches."""
        assert self._meshes, "no meshes added"
        concat = self._meshes[0]
        for m in self._meshes[1:]:
            concat = concat.concat(m)
        counts = [m.count for m in self._meshes]

        # native builder first (reference's cold-start hot path, BVH.cpp),
        # numpy level-synchronous build as the portable fallback
        from clraytracer_tpu.runtime.fastobj import build_bvh_native

        build = build_bvh_native(
            concat.v0, concat.v1, concat.v2, counts,
            min_leaf=min_leaf, max_leaf=max_leaf,
        )
        if build is None:
            build = build_bvh(
                concat.v0, concat.v1, concat.v2, counts,
                min_leaf=min_leaf, max_leaf=max_leaf,
            )
        p = build.perm
        # keep host copies for cluster/packed-table building — reading device
        # arrays back over a tunneled TPU costs tens of seconds
        hv0, hv1, hv2 = concat.v0[p], concat.v1[p], concat.v2[p]
        h_uv = [math3d.to_half(concat.uv0[p]), math3d.to_half(concat.uv1[p]),
                math3d.to_half(concat.uv2[p])]
        h_n = [math3d.to_half(concat.n0[p]), math3d.to_half(concat.n1[p]),
               math3d.to_half(concat.n2[p])]
        h_mat_idx = concat.mat_idx[p]

        tris = Triangles(
            v0=jnp.asarray(hv0),
            v1=jnp.asarray(hv1),
            v2=jnp.asarray(hv2),
            uv0=jnp.asarray(h_uv[0]),
            uv1=jnp.asarray(h_uv[1]),
            uv2=jnp.asarray(h_uv[2]),
            n0=jnp.asarray(h_n[0]),
            n1=jnp.asarray(h_n[1]),
            n2=jnp.asarray(h_n[2]),
            mat_idx=jnp.asarray(h_mat_idx),
        )
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
        bvh = BVH(
            node_min=jnp.asarray(build.node_min),
            node_max=jnp.asarray(build.node_max),
            left_first=jnp.asarray(build.left_first),
            tri_count=jnp.asarray(build.tri_count),
            roots=tuple(int(r) for r in build.roots),
            mesh_tri_start=tuple(int(s) for s in starts),
            mesh_tri_count=tuple(int(cn) for cn in counts),
            max_leaf_size=int(build.tri_count.max(initial=1)),
        )

        texels_u8, width, height, offset = self.atlas.build()
        # NOTE bytes * (1/255), not bytes / 255: the procedural inline path
        # computes exactly `byte * np.float32(1/255)`, and using the same
        # product here keeps pool-gathered and in-register texel values
        # bit-identical (f32 division is not correctly rounded on TPU)
        # texels stored [P, 4] (4th column zero): 16-byte-aligned rows for
        # the per-ray pool gather, and no per-frame in-graph pad op (the
        # jnp.pad inside take_rgb measured 2 x 3.3 ms/frame at 1080p)
        atlas = TextureAtlas(
            texels=jnp.asarray(
                np.concatenate(
                    [
                        texels_u8.astype(np.float32) * np.float32(1.0 / 255.0),
                        np.zeros((texels_u8.shape[0], 1), np.float32),
                    ],
                    axis=1,
                )
            ),
            width=jnp.asarray(width),
            height=jnp.asarray(height),
            offset=jnp.asarray(offset),
        )

        albedo = np.stack([m.albedo for m in self._materials])
        specular = np.stack([m.specular for m in self._materials])
        materials = Materials(
            albedo=jnp.asarray(albedo),
            specular=jnp.asarray(specular),
            albedo_tex=jnp.asarray([m.albedo_tex for m in self._materials], jnp.int32),
            specular_tex=jnp.asarray(
                [m.specular_tex for m in self._materials], jnp.int32
            ),
            shininess=jnp.asarray([m.shininess for m in self._materials], jnp.float32),
            roughness=jnp.asarray([m.roughness for m in self._materials], jnp.float32),
            color_u32=jnp.asarray(math3d.pack_rgb_u32(albedo), jnp.uint32),
            specular_u32=jnp.asarray(math3d.pack_rgb_u32(specular), jnp.uint32),
            transmission=jnp.asarray(
                [getattr(m, "transmission", 0.0) for m in self._materials],
                jnp.float32,
            ),
        )

        skybox = 2 if self.atlas.num_textures > 2 else WHITE_TEXTURE
        instances = self.instance_arrays()
        h_tri_attr = np.concatenate(
            [
                np.asarray(h_n[0], np.float32),
                np.asarray(h_n[1], np.float32),
                np.asarray(h_n[2], np.float32),
                np.asarray(h_uv[0], np.float32),
                np.asarray(h_uv[1], np.float32),
                np.asarray(h_uv[2], np.float32),
                np.asarray(h_mat_idx, np.float32)[:, None],
            ],
            axis=1,
        )
        packed = self._packed_tables(
            h_tri_attr, albedo, specular, width, height, offset, skybox
        )
        if texels_u8.shape[0] > FLAT_TEXEL_MIN:
            # large pools: packed RGB8 words for the flat texel gather
            # (PackedTables.texels_u32; reference word layout 0x00BBGGRR)
            w32 = (
                texels_u8[:, 0].astype(np.uint32)
                | (texels_u8[:, 1].astype(np.uint32) << 8)
                | (texels_u8[:, 2].astype(np.uint32) << 16)
            )
            packed = dataclasses.replace(
                packed, texels_u32=jnp.asarray(w32.astype(np.int32))
            )

        # cluster tables for the Pallas tile tracer (built from the
        # BVH-reordered, spatially coherent triangle order); shading attrs
        # packed alongside so the kernel interpolates them in-VMEM
        from clraytracer_tpu.ops.clusters import (
            merge_cluster_ranges,
            subtree_cluster_ranges,
        )

        ct = build_clusters(
            hv0, hv1, hv2, bvh.mesh_tri_start, bvh.mesh_tri_count,
            attrs=h_tri_attr,
            # BVH-subtree-aligned clusters: ~2.2-2.4x tighter AABBs than
            # fixed 32-triangle runs (see subtree_cluster_ranges), then
            # adjacent partials greedily packed where the union AABB costs
            # no more than the parts (merge_cluster_ranges)
            cluster_ranges=[
                merge_cluster_ranges(
                    subtree_cluster_ranges(
                        build.left_first, build.tri_count, int(root)
                    ),
                    hv0, hv1, hv2,
                    area_factor=float(
                        __import__("os").environ.get(
                            "CLRT_MERGE_AREA_FACTOR", "1.0"
                        )
                    ),
                )
                for root in build.roots
            ],
        )
        def pad8(mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
            """Pack AABBs 16-per-row: [N, 8] (min xyz | max xyz | 2 pad)
            rows would be lane-padded 16x by the TPU's (8, 128) tiling —
            22 MB of VMEM for a 1M-tri scene's cluster boxes. The packed
            [ceil(N/16), 128] layout stores box ``i`` at
            [i // 16, (i % 16) * 8 + c]; padding rows are inverted-empty
            boxes (min +BIG, max -BIG). NOTE: inverted-empty boxes PASS
            the kernel's conservative slab test (tnear -BIG <= tfar +BIG)
            — the traversal masks padding by COUNT (exact chunk widths /
            the sc_n guard in chunk_a), never by box values."""
            n = mn.shape[0]
            flat = np.concatenate(
                [mn, mx, np.zeros((n, 2), np.float32)], axis=1
            ).astype(np.float32)
            # 32 extra empty boxes beyond the lane pad: a partial last
            # chunk's static unroll may read up to 31 boxes past the table
            # end (masked, but the addresses must stay in bounds)
            pad = (-n % 16) + 32
            empty = np.zeros((pad, 8), np.float32)
            empty[:, 0:3] = 1e30
            empty[:, 3:6] = -1e30
            flat = np.concatenate([flat, empty])
            return flat.reshape(-1, 128)
        # scenes beyond the Pallas VMEM table budget additionally get the
        # HBM-streaming layout: the 7 tables stacked 8 rows per cluster
        # ([8C, 128]; row 7 is padding for tile-aligned 4 KiB DMAs) so the
        # tile tracer can double-buffer cluster geometry instead of
        # falling back to the wavefront path
        from clraytracer_tpu.ops.trace_pallas import VMEM_TABLE_BUDGET

        n_c, n_s = ct.tri_a.shape[0], ct.super_min.shape[0]
        table_bytes = n_c * (7 * 128 * 4 + 8 * 4) + n_s * 8 * 4
        geo_stream = None
        if table_bytes > VMEM_TABLE_BUDGET:
            geo_stream = jnp.asarray(
                np.stack(
                    [ct.tri_a, ct.tri_b, ct.tri_c, ct.at_a, ct.at_b,
                     ct.at_c, ct.at_d, np.zeros_like(ct.tri_a)],
                    axis=1,
                ).reshape(-1, 128)
            )
        clusters = Clusters(
            geo_stream=geo_stream,
            tri_a=jnp.asarray(ct.tri_a),
            tri_b=jnp.asarray(ct.tri_b),
            tri_c=jnp.asarray(ct.tri_c),
            at_a=jnp.asarray(ct.at_a),
            at_b=jnp.asarray(ct.at_b),
            at_c=jnp.asarray(ct.at_c),
            at_d=jnp.asarray(ct.at_d),
            tri_gid=jnp.asarray(ct.tri_gid),
            cluster_aabb=jnp.asarray(pad8(ct.cluster_min, ct.cluster_max)),
            super_aabb=jnp.asarray(pad8(ct.super_min, ct.super_max)),
            hyper_aabb=jnp.asarray(pad8(ct.hyper_min, ct.hyper_max)),
            mesh_ranges=ct.mesh_ranges,
        )
        procedural = tuple(
            sorted(
                (h, int(offset[h]), desc)
                for h, desc in self._procedurals.items()
            )
        )
        return Scene(
            clusters=clusters,
            tris=tris,
            bvh=bvh,
            materials=materials,
            atlas=atlas,
            instances=instances,
            packed=packed,
            skybox_tex=skybox,
            procedural_tex=procedural,
        )

    def _packed_tables(
        self,
        h_tri_attr: np.ndarray,
        albedo: np.ndarray,
        specular: np.ndarray,
        tex_width: np.ndarray,
        tex_height: np.ndarray,
        tex_offset: np.ndarray,
        skybox: int,
    ) -> PackedTables:
        """Derive the gather-friendly tables (ops/gather.py): one wide f32
        row per triangle, small f32 row tables for the one-hot MXU gathers
        of instances/materials, and denormalized per-material texture
        records (killing the dependent tex-record gather in shading). All
        inputs are host numpy (device readback over a tunneled TPU is ~60 s
        flat). Layouts mirror ops/shade.ShadingTables exactly —
        tests assert the packed tables equal the in-jit-built ones."""
        from clraytracer_tpu.ops.shade import _OFF_MASK, _OFF_SHIFT

        tri_attr = h_tri_attr

        if self._instances:
            inv = np.stack(
                [np.linalg.inv(r.transform).astype(np.float32) for r in self._instances]
            ).reshape(-1, 16)
            mat_start = np.array(
                [r.material_start for r in self._instances], np.float32
            )
            inst_rows = np.concatenate([inv, mat_start[:, None]], axis=1)
        else:
            inst_rows = np.zeros((1, 17), np.float32)

        texrec = lambda ti: np.stack(
            [
                tex_width[ti],
                tex_height[ti],
                tex_offset[ti] >> _OFF_SHIFT,
                tex_offset[ti] & _OFF_MASK,
            ],
            axis=1,
        ).astype(np.float32)
        a_tex = np.array([m.albedo_tex for m in self._materials])
        s_tex = np.array([m.specular_tex for m in self._materials])
        mat_rows = np.concatenate(
            [
                albedo,
                specular,
                np.array(
                    [[m.shininess, m.roughness] for m in self._materials],
                    np.float32,
                ),
                texrec(a_tex),
                texrec(s_tex),
            ],
            axis=1,
        ).astype(np.float32)

        return PackedTables(
            tri_attr=jnp.asarray(tri_attr),
            inst_rows=jnp.asarray(inst_rows),
            mat_rows=jnp.asarray(mat_rows),
            skybox_w=int(tex_width[skybox]),
            skybox_h=int(tex_height[skybox]),
            skybox_off=int(tex_offset[skybox]),
        )
