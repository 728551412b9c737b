"""Scene representation: host-side scene graph -> flat device arrays.

TPU-native replacement for the reference's Donut glTF scene graph + bindless
buffer tables + SubInstanceData indirection (reference: External/Donut scene,
Rtxpt/Shaders/SubInstanceData.h, PathTracerBridgeDonut.hlsli:170-171,676 —
SURVEY.md §2.4 "SubInstance system").

Design choices (TPU-first):
  * All geometry is flattened to world space into one triangle soup with a
    per-triangle subinstance id (the BLAS/TLAS split becomes a single
    skip-link BVH over world-space triangles — gather-only traversal; see
    rtxpt_tpu/accel). Instances are kept on the host (`MeshInstance`) so that
    animated/skinned instances can re-flatten + refit per frame.
  * Materials are a structure-of-arrays table gathered per hit — the analog
    of PTMaterialData (reference: Materials/MaterialsBaker.h:234,
    Shaders/PathTracer/Materials/MaterialPT.h).
  * Everything on device is a flax.struct pytree of fixed-shape jnp arrays.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax.numpy as jnp
from flax import struct

# Analytic light kinds (reference: PolymorphicLight.h:28-38 kPoint/
# kDirectional + SpotLightEx in SampleCommon/ExtendedScene.h:17-80).
LIGHT_POINT = 0
LIGHT_DIRECTIONAL = 1
LIGHT_SPOT = 2
LIGHT_SPHERE = 3   # intensity = surface radiance; angular_size = radius
#                    (PolymorphicLight.h:28-38 kSphere analog)


@struct.dataclass
class Materials:
    """Material table, SoA over material index [M].

    Field semantics follow the reference's StandardBSDFData
    (Rtxpt/Shaders/PathTracer/Rendering/Materials/BxDF.hlsli:615-690):
    diffuse albedo, specular F0, roughness, metallic, eta (IoR),
    (specular) transmission, diffuse transmission, plus emissive and
    alpha-test data from PTMaterialData.
    """

    base_color: jnp.ndarray        # [M,3] linear albedo
    metallic: jnp.ndarray          # [M]
    roughness: jnp.ndarray         # [M] perceptual (alpha = r^2)
    ior: jnp.ndarray               # [M] index of refraction (>=1)
    transmission: jnp.ndarray      # [M] specular transmission weight
    diffuse_transmission: jnp.ndarray  # [M]
    emissive: jnp.ndarray          # [M,3] radiance
    specular_f0_scale: jnp.ndarray  # [M] scales the 0.08*specular F0 term
    thin: jnp.ndarray              # [M] bool-ish: thin-walled (no interior)
    alpha_cutoff: jnp.ndarray      # [M] alpha-test threshold; <0 = opaque
    volume_absorption: jnp.ndarray  # [M,3] Beer-Lambert sigma_a inside
    base_color_tex: jnp.ndarray    # [M] texture id or -1
    emissive_tex: jnp.ndarray      # [M] texture id or -1
    metal_rough_tex: jnp.ndarray   # [M] texture id or -1
    normal_tex: jnp.ndarray        # [M] texture id or -1
    # Nested-dielectric priority (reference: PTMaterialData nestedPriority,
    # PathTracerNestedDielectrics.hlsli:48): when a ray inside a medium
    # hits the boundary of a LOWER-priority medium, the hit is a false
    # intersection and is skipped. 0 = default; vacuum is -1 implicitly.
    nested_priority: jnp.ndarray = None  # [M] i32
    # KHR_materials_anisotropy strength (0 = isotropic)
    anisotropy: jnp.ndarray = None       # [M]

    @staticmethod
    def create(n: int) -> "Materials":
        z = lambda *s: jnp.zeros((n, *s), jnp.float32)
        zi = lambda: jnp.full((n,), -1, jnp.int32)
        return Materials(
            nested_priority=jnp.zeros((n,), jnp.int32),
            anisotropy=jnp.zeros((n,), jnp.float32),
            base_color=jnp.full((n, 3), 0.5, jnp.float32),
            metallic=z(), roughness=jnp.full((n,), 0.5, jnp.float32),
            ior=jnp.full((n,), 1.5, jnp.float32), transmission=z(),
            diffuse_transmission=z(), emissive=z(3),
            # Falcor convention: F0 = 0.08 * specular; default specular=0.5
            # gives the physical 0.04 for IoR 1.5 (BxDF.hlsli StandardBSDFData).
            specular_f0_scale=jnp.full((n,), 0.5, jnp.float32),
            thin=z(), alpha_cutoff=jnp.full((n,), -1.0, jnp.float32),
            volume_absorption=z(3),
            base_color_tex=zi(), emissive_tex=zi(), metal_rough_tex=zi(),
            normal_tex=zi(),
        )


@struct.dataclass
class Geometry:
    """World-space flattened triangle soup [V vertices, T triangles]."""

    positions: jnp.ndarray       # [V,3] f32
    normals: jnp.ndarray         # [V,3] f32 (shading normals)
    uvs: jnp.ndarray             # [V,2] f32
    indices: jnp.ndarray         # [T,3] i32
    tri_material: jnp.ndarray    # [T] i32 material id
    tri_subinstance: jnp.ndarray  # [T] i32 subinstance id

    @property
    def num_triangles(self) -> int:
        return self.indices.shape[0]


@struct.dataclass
class AnalyticLights:
    """Analytic light SoA [L] (point / directional / spot)."""

    kind: jnp.ndarray        # [L] i32
    position: jnp.ndarray    # [L,3]
    direction: jnp.ndarray   # [L,3] unit (spot/directional)
    intensity: jnp.ndarray   # [L,3] point/spot: radiant intensity W/sr;
    #                                directional: radiance
    angular_size: jnp.ndarray  # [L] directional: apex angle (rad); 0 = delta
    cos_inner: jnp.ndarray   # [L] spot cone
    cos_outer: jnp.ndarray   # [L]

    @staticmethod
    def empty() -> "AnalyticLights":
        z = lambda *s: jnp.zeros((0, *s), jnp.float32)
        return AnalyticLights(kind=jnp.zeros((0,), jnp.int32), position=z(3),
                              direction=z(3), intensity=z(3), angular_size=z(),
                              cos_inner=z(), cos_outer=z())


@struct.dataclass
class SceneData:
    """Everything the wavefront integrator needs on device."""

    geometry: Geometry
    materials: Materials
    analytic_lights: AnalyticLights
    # Filled in by accel.build / lighting.bake — see those modules.
    bvh: Optional["object"] = None        # accel.bvh.ThreadedBVH
    lights: Optional["object"] = None     # lighting.lights_baker.LightList
    envmap: Optional["object"] = None     # lighting.envmap.EnvMap
    textures: Optional["object"] = None   # scene.textures.TextureAtlas
    tri_opacity: Optional[jnp.ndarray] = None  # [T] u8 OMM classes (omm.py)
    # Level-2 opacity micromaps: 16 x 2-bit micro states per triangle
    # (original tri order; the BVH carries a packed-order copy in-loop)
    tri_micromap: Optional[jnp.ndarray] = None  # [T] i32
    # Fused gather tables (TPU gathers are expensive; one row fetch per hit
    # replaces ~13 separate takes in load_surface — see build_packs):
    tri_pack: Optional[jnp.ndarray] = None   # [T,25] v0v1v2|n0n1n2|uv012|mat
    mat_pack: Optional[jnp.ndarray] = None   # [M,17] material scalars
    # Fused Pallas bounce-kernel tables (pt/bounce_pallas.BounceTables);
    # None when the scene is ineligible for the kernel fast path.
    bounce_tables: Optional["object"] = None
    # Clustered large-scene tables (accel/cluster.ClusterTables); built
    # when the triangle count exceeds the VMEM-resident kernel cap.
    cluster_tables: Optional["object"] = None
    # Static: any material has nested_priority != 0 -> the integrator runs
    # the false-hit rejection retrace (PathTracerNestedDielectrics analog).
    has_nested_priorities: bool = struct.field(pytree_node=False,
                                               default=False)
    # Two-level acceleration structure (accel/tlas.TLAS) for instanced
    # scenes; geometry/tri_pack are then the OBJECT-space prototype pool
    # and hits carry (inst, pool prim). None on the flattened path.
    tlas: Optional["object"] = None


def build_packs(geometry: Geometry, materials: Materials):
    """Build the fused per-triangle and per-material gather tables."""
    idx = geometry.indices
    p = geometry.positions
    nrm = geometry.normals
    uv = geometry.uvs
    cols = [jnp.take(p, idx[:, 0], axis=0),
            jnp.take(p, idx[:, 1], axis=0),
            jnp.take(p, idx[:, 2], axis=0),
            jnp.take(nrm, idx[:, 0], axis=0),
            jnp.take(nrm, idx[:, 1], axis=0),
            jnp.take(nrm, idx[:, 2], axis=0),
            jnp.take(uv, idx[:, 0], axis=0),
            jnp.take(uv, idx[:, 1], axis=0),
            jnp.take(uv, idx[:, 2], axis=0),
            geometry.tri_material.astype(jnp.float32)[:, None]]
    tri_pack = jnp.concatenate(cols, axis=1)          # [T, 25]
    m = materials
    mat_pack = jnp.concatenate([
        m.base_color,                                  # 0:3
        m.metallic[:, None], m.roughness[:, None],     # 3,4
        m.ior[:, None], m.transmission[:, None],       # 5,6
        m.diffuse_transmission[:, None],               # 7
        m.emissive,                                    # 8:11
        m.specular_f0_scale[:, None], m.thin[:, None],  # 11,12
        m.alpha_cutoff[:, None],                       # 13
        m.volume_absorption,                           # 14:17
        m.anisotropy[:, None],                         # 17
    ], axis=1)                                         # [M, 18]
    return tri_pack, mat_pack


# ---------------------------------------------------------------------------
# Host-side scene description (pre-flattening)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MeshInstance:
    """One instanced mesh: host arrays + transform (TLAS-instance analog,
    reference Sample.cpp:1200-1242 BuildTLAS per-instance entries)."""

    positions: np.ndarray    # [v,3]
    normals: np.ndarray      # [v,3]
    uvs: np.ndarray          # [v,2]
    indices: np.ndarray      # [t,3]
    material: np.ndarray     # [t] per-triangle material id
    transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32))
    name: str = ""
    # Instances sharing a mesh_key (or literally the same positions array)
    # are treated as one prototype by the two-level BVH (accel/tlas.py) —
    # the BLAS-reuse contract of the reference (Sample.cpp:1088-1242).
    mesh_key: Optional[str] = None


@dataclasses.dataclass
class HostScene:
    """Host scene: instances + materials + lights; `.flatten()` produces the
    device SceneData (sans BVH/lights bake, done by prepare())."""

    instances: List[MeshInstance] = dataclasses.field(default_factory=list)
    materials: Optional[Materials] = None
    analytic_lights: Optional[AnalyticLights] = None
    envmap_image: Optional[np.ndarray] = None   # [H,W,3] equirect radiance
    envmap_scale: float = 1.0
    envmap_rotation: float = 0.0                # azimuth radians
    textures: Optional[list] = None             # list of np [h,w,4] images
    camera: Optional[dict] = None               # loader-provided camera hint
    material_names: Optional[list] = None       # sidecar match keys
    # (scene/materials_io.py, MaterialsBaker.h:209-218 analog)
    # Build the two-level BVH even below the sharing-ratio heuristic
    # (e.g. few instances but animated rigid transforms).
    force_instancing: bool = False
    # >0: bake the environment as this many kEnvironmentQuad region
    # lights instead of one kEnvironment light (lighting/lights_baker).
    env_quad_lights: int = 0

    def flatten(self) -> SceneData:
        """Flatten instances to world space (SubInstance bake analog)."""
        pos, nrm, uv, idx, mat, sub = [], [], [], [], [], []
        voff = 0
        for si, inst in enumerate(self.instances):
            m = inst.transform
            p = inst.positions @ m[:3, :3].T + m[:3, 3]
            # normal matrix = inverse-transpose of upper 3x3
            nmat = np.linalg.inv(m[:3, :3]).T
            n = inst.normals @ nmat.T
            n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
            pos.append(p.astype(np.float32))
            nrm.append(n.astype(np.float32))
            uvs_i = inst.uvs if inst.uvs is not None else np.zeros(
                (len(p), 2), np.float32)
            uv.append(uvs_i.astype(np.float32))
            idx.append(inst.indices.astype(np.int32) + voff)
            mat.append(inst.material.astype(np.int32))
            sub.append(np.full((len(inst.indices),), si, np.int32))
            voff += len(p)
        geometry = Geometry(
            positions=jnp.asarray(np.concatenate(pos)),
            normals=jnp.asarray(np.concatenate(nrm)),
            uvs=jnp.asarray(np.concatenate(uv)),
            indices=jnp.asarray(np.concatenate(idx)),
            tri_material=jnp.asarray(np.concatenate(mat)),
            tri_subinstance=jnp.asarray(np.concatenate(sub)),
        )
        mats = self.materials if self.materials is not None else Materials.create(1)
        lights = (self.analytic_lights if self.analytic_lights is not None
                  else AnalyticLights.empty())
        return SceneData(geometry=geometry, materials=mats,
                         analytic_lights=lights)
