"""Surface loading: hit -> interpolated shading data + BSDF parameters.

Analog of Bridge::loadSurface (reference: PathTracerBridgeDonut.hlsli:
612-680 — barycentric interpolation from bindless vertex buffers, material
decode, BSDF build; ShadingData.hlsli). All gathers over HBM-resident flat
scene arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from rtxpt_tpu.accel.traverse import Hit
from rtxpt_tpu.pt.bsdf import BSDFData, make_bsdf_data
from rtxpt_tpu.scene.scene import SceneData
from rtxpt_tpu.utils import math as m


@struct.dataclass
class Surface:
    pos: jnp.ndarray        # [N,3] hit position (world)
    geo_n: jnp.ndarray      # [N,3] geometric normal, oriented toward wo
    sh_n: jnp.ndarray       # [N,3] shading normal, oriented toward wo
    uv: jnp.ndarray         # [N,2]
    front: jnp.ndarray      # [N] bool: ray arrived on the CCW front side
    mat_id: jnp.ndarray     # [N] i32
    emissive: jnp.ndarray   # [N,3] (zero on back face)
    bsdf: BSDFData
    mip_level: jnp.ndarray  # [N] texture LOD from ray cones


def load_surface(scene: SceneData, hit: Hit, ray_o, ray_d,
                 cone_width, cur_ior=None, below_ior=None,
                 stf_u=None) -> Surface:
    """Build shading data for (masked) hits. Lanes with hit.miss hold
    garbage-but-finite values; callers mask with ~hit.miss."""
    geo = scene.geometry
    prim = jnp.maximum(hit.prim, 0)
    if scene.tri_pack is not None:
        # fused per-triangle row: ONE gather instead of 10 (TPU gathers
        # dominate; see accel/brute.py and docs/PERF_NOTES.md)
        g = jnp.take(scene.tri_pack, prim, axis=0)         # [N,25]
        v0, v1, v2 = g[:, 0:3], g[:, 3:6], g[:, 6:9]
        n0, n1, n2 = g[:, 9:12], g[:, 12:15], g[:, 15:18]
        t0, t1, t2 = g[:, 18:20], g[:, 20:22], g[:, 22:24]
        mid = g[:, 24].astype(jnp.int32)
    else:
        tri = jnp.take(geo.indices, prim, axis=0)          # [N,3]
        v0 = jnp.take(geo.positions, tri[..., 0], axis=0)
        v1 = jnp.take(geo.positions, tri[..., 1], axis=0)
        v2 = jnp.take(geo.positions, tri[..., 2], axis=0)
        n0 = jnp.take(geo.normals, tri[..., 0], axis=0)
        n1 = jnp.take(geo.normals, tri[..., 1], axis=0)
        n2 = jnp.take(geo.normals, tri[..., 2], axis=0)
        t0 = jnp.take(geo.uvs, tri[..., 0], axis=0)
        t1 = jnp.take(geo.uvs, tri[..., 1], axis=0)
        t2 = jnp.take(geo.uvs, tri[..., 2], axis=0)
        mid = jnp.take(geo.tri_material, prim)

    if scene.tlas is not None and hit.inst is not None:
        # Two-level scenes: the pack row is OBJECT space — bring it to
        # world via the hit instance's transform (one [N,21] gather +
        # ~60 flops; the per-step traversal stayed gather-minimal).
        T = jnp.take(scene.tlas.inst_pack,
                     jnp.maximum(hit.inst, 0), axis=0)
        R = T[:, 0:9].reshape(-1, 3, 3)      # object->world
        tr = T[:, 9:12]
        NM = T[:, 12:21].reshape(-1, 3, 3)   # normal matrix
        w = lambda p: jnp.einsum("nij,nj->ni", R, p) + tr
        v0, v1, v2 = w(v0), w(v1), w(v2)
        nw = lambda x: jnp.einsum("nij,nj->ni", NM, x)
        n0, n1, n2 = nw(n0), nw(n1), nw(n2)

    u = hit.bary[..., 0:1]
    v = hit.bary[..., 1:2]
    w = 1.0 - u - v
    pos = w * v0 + u * v1 + v * v2
    sh_n = m.normalize(w * n0 + u * n1 + v * n2)
    uv = w * t0 + u * t1 + v * t2

    e1 = v1 - v0
    e2 = v2 - v0
    geo_n = m.normalize(jnp.cross(e1, e2))
    # Orient both normals toward the incoming ray (wo side).
    toward = m.dot(geo_n, -ray_d) > 0.0
    front = toward[..., 0]
    geo_n = jnp.where(toward, geo_n, -geo_n)
    sh_n = jnp.where(m.dot(sh_n, geo_n) > 0.0, sh_n, -sh_n)

    mats = scene.materials
    if scene.mat_pack is not None:
        mp = jnp.take(scene.mat_pack, mid, axis=0)         # [N,17]
        base_color = mp[:, 0:3]
        metallic = mp[:, 3]
        roughness = mp[:, 4]
        ior = mp[:, 5]
        transmission = mp[:, 6]
        diffuse_transmission = mp[:, 7]
        emissive = mp[:, 8:11]
        specular_scale = mp[:, 11]
        anisotropy = mp[:, 17]
    else:
        base_color = jnp.take(mats.base_color, mid, axis=0)
        metallic = jnp.take(mats.metallic, mid)
        roughness = jnp.take(mats.roughness, mid)
        ior = jnp.take(mats.ior, mid)
        transmission = jnp.take(mats.transmission, mid)
        diffuse_transmission = jnp.take(mats.diffuse_transmission, mid)
        specular_scale = jnp.take(mats.specular_f0_scale, mid)
        emissive = jnp.take(mats.emissive, mid, axis=0)
        anisotropy = jnp.take(mats.anisotropy, mid)

    # Texture lookups (atlas) hook in here; ray-cone LOD:
    # lod ~ log2(cone_width / sqrt(tri_area_uv/tri_area_world)); textures are
    # wired through scene.textures (scene/textures.py) when present.
    tri_area2 = jnp.maximum(m.length(jnp.cross(e1, e2), False), 1e-20)
    mip = 0.5 * jnp.log2(jnp.maximum(cone_width * cone_width, 1e-30)
                         / tri_area2)

    if scene.textures is not None:
        from rtxpt_tpu.scene.textures import (sample_texture,
                                              sample_texture_stochastic)
        if stf_u is not None:
            # RTXTF stochastic filtering: one jittered texel per lookup
            def sample_texture(atlas, tid, uv_, mip_,
                               _u=stf_u):        # noqa: F811
                return sample_texture_stochastic(atlas, tid, uv_, mip_, _u)
        mats_bt = jnp.take(mats.base_color_tex, mid)
        tex_rgba = sample_texture(scene.textures, mats_bt, uv, mip)
        has_tex = (mats_bt >= 0)[..., None]
        base_color = jnp.where(has_tex, base_color * tex_rgba[..., :3],
                               base_color)
        mats_et = jnp.take(mats.emissive_tex, mid)
        etex = sample_texture(scene.textures, mats_et, uv, mip)
        emissive = jnp.where((mats_et >= 0)[..., None],
                             emissive * etex[..., :3], emissive)
        mats_mr = jnp.take(mats.metal_rough_tex, mid)
        mrtex = sample_texture(scene.textures, mats_mr, uv, mip)
        has_mr = mats_mr >= 0
        # glTF convention: B = metallic, G = roughness
        metallic = jnp.where(has_mr, metallic * mrtex[..., 2], metallic)
        roughness = jnp.where(has_mr, roughness * mrtex[..., 1], roughness)

        # Tangent-space normal mapping (reference: material decode at
        # PathTracerBridgeDonut.hlsli:612-680 / Scene/Material shading
        # normal path). The tangent frame comes from the triangle's UV
        # parameterisation; degenerate UV mappings fall back to the
        # interpolated normal.
        mats_nt = jnp.take(mats.normal_tex, mid)
        has_nt = mats_nt >= 0
        ntex = sample_texture(scene.textures, mats_nt, uv, mip)
        n_ts = ntex[..., :3] * 2.0 - 1.0               # [-1,1] tangent space
        duv1 = t1 - t0
        duv2 = t2 - t0
        det_uv = duv1[..., 0] * duv2[..., 1] - duv1[..., 1] * duv2[..., 0]
        ok_uv = jnp.abs(det_uv) > 1e-12
        r = jnp.where(ok_uv, 1.0 / jnp.where(ok_uv, det_uv, 1.0), 0.0)
        tang = (duv2[..., 1:2] * e1 - duv1[..., 1:2] * e2) * r[..., None]
        # Gram-Schmidt against the interpolated shading normal
        tang = tang - sh_n * m.dot(tang, sh_n)
        tlen = m.length(tang, False)
        ok = ok_uv & (tlen > 1e-8)
        tang = tang / jnp.maximum(tlen, 1e-8)[..., None]
        bitan = jnp.cross(sh_n, tang) * jnp.sign(det_uv)[..., None]
        n_pert = m.normalize(n_ts[..., 0:1] * tang
                             + n_ts[..., 1:2] * bitan
                             + jnp.maximum(n_ts[..., 2:3], 0.05) * sh_n)
        # keep the perturbed normal in the geometric hemisphere
        n_pert = jnp.where(m.dot(n_pert, geo_n) > 0.0, n_pert, sh_n)
        sh_n = jnp.where((has_nt & ok)[..., None], n_pert, sh_n)

    # One-sided emission: front face only (PolymorphicLight kTriangle).
    emissive = jnp.where(front[..., None], emissive, 0.0)

    bsdf = make_bsdf_data(base_color, metallic, roughness, ior, transmission,
                          diffuse_transmission, specular_scale, front,
                          cur_ior=cur_ior, below_ior=below_ior,
                          anisotropy=anisotropy)
    return Surface(pos=pos, geo_n=geo_n, sh_n=sh_n, uv=uv, front=front,
                   mat_id=mid, emissive=emissive, bsdf=bsdf, mip_level=mip)


def ray_offset(pos, geo_n, direction):
    """Self-intersection-robust ray origin offset along the geometric
    normal (sign chosen by travel side)."""
    scale = jnp.maximum(1.0, m.length(pos, False)) * 3e-5
    side = jnp.where(m.dot(direction, geo_n, False) >= 0.0, 1.0, -1.0)
    return pos + geo_n * (side * scale)[..., None]
