"""Fused per-bounce Pallas TPU kernel: intersect + shade + NEE + scatter.

THE hot-path kernel of the framework (replaces the reference's megakernel
loop body, Rtxpt/Shaders/PathTracerSample.hlsl:222-227 + PathTracer.hlsli
HandleHit/HandleNEE/GenerateScatterRay). Round-1 profiling
(docs/PERF_NOTES.md) showed the XLA wavefront spends most of its time in
unfavorable fusion/materialization across the bounce program, and that a
Pallas kernel only pays off when it carries a WHOLE bounce per launch —
this kernel does exactly that:

  * closest-hit: the matmul-factored Möller-Trumbore of accel/brute.py as
    one [4T,128]@[128,128] MXU pass per 128-ray group, chunked over
    triangles, winner tracked in VMEM;
  * surface fetch: the winner one-hot [T,128] IS the gather matrix — one
    [16,T]@[T,128] matmul fetches all triangle attributes (normals,
    geometric normal, material id, baked light pdf/area) with ZERO HBM
    gathers;
  * material/light fetch: <=128-entry tables live as [rows,128] VMEM
    lanes, fetched by in-register lane shuffles (take_along_axis);
  * shading: BSDF eval/pdf/sample + light sampling from pt/wide.py on
    dense [R,128] VPU tiles;
  * NEE shadow ray: second (occlusion-only) matmul pass in the same
    kernel — no extra launch;
  * RNG: the same stateless Owen-scrambled Sobol' chains (utils/rng.py),
    elementwise in-kernel.

Data layout: the wavefront state rides in two stacked SoA arrays,
fs [NF, Rtot, 128] f32 and is_ [NI, Rtot, 128] i32 — every per-ray scalar
is a dense (8,128)-tileable VPU operand. The grid walks blocks of
R*128 = 1024 rays; scene tables use constant index maps so Mosaic keeps
them VMEM-resident across the grid.

Runtime-safety rules (docs/PERF_NOTES.md "TPU runtime fragility"): no
in-kernel while_loop, python-unrolled chunk loops, all slicing static,
2D-shaped integer ops only. Validate with interpret=True before any TPU
compile.

Round 3 additions (VERDICT r2 "next round" #2): in-kernel ENV lighting
(miss eval, MIS pdf, NEE importance sampling over a baked [64,128]
equirect table — one-hot MXU matmul gathers + in-register two-level CDF
inversion; parity-exact with lighting/envmap.py which shares the same
bake) and in-kernel TEXTURES (stochastic texture filtering over a
transposed VMEM atlas <=64k texels; mirrors
scene/textures.sample_texture_stochastic bit-for-bit).

Eligibility (everything else falls back to the XLA wavefront in
pt/integrator.py): <= PALLAS_MAX_TRIS triangles, <=128 lights, <=128
materials, pow2 textures within the atlas cap (with STF enabled), NEE
in {OFF, UNIFORM, POWER} with 1 candidate; see pt/dispatch.py.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtxpt_tpu.pt import wide as W
from rtxpt_tpu.utils import rng

# Geometry/table capacities
PALLAS_MAX_TRIS = 2048
MAX_LIGHTS = 128
MAX_MATERIALS = 128
# Ray rows per block (R*128 rays per grid step). Env-gated for tile-depth
# experiments (docs/PERF_NOTES.md round-4b lever 3: deeper R tiles give
# Mosaic more independent work to software-pipeline across the serial
# shading chain); 8 = one (8,128) f32 register per state row.
_R = int(os.environ.get("RTXPT_TPU_FUSED_R", "8"))
_BIG = 1e30

# fs (f32 state) channel map
FS_O = 0                # 0:3 ray origin
FS_D = 3                # 3:6 ray direction
FS_THP = 6              # 6:9 throughput
FS_L = 9                # 9:12 accumulated radiance
FS_PREVPDF = 12
FS_CONE = 13            # ray-cone width accumulated so far
FS_SPREAD = 14          # ray-cone spread angle
NF = 15

# is_ (i32 state) channel map
IS_ACTIVE = 0
IS_PREVDELTA = 1
IS_MED0 = 2
IS_MED1 = 3
IS_PX = 4
IS_PY = 5
IS_BUDGET = 6           # per-lane remaining-bounce budget (stable planes)
IS_LBOUNCE = 7          # per-lane LOGICAL bounce index: pass-through
                        # iterations (alpha-reject / nested-priority false
                        # hits) do not advance it (integrator retrace analog)
NI = 8

_NO_BUDGET = 0x3FFFFFFF  # sentinel: effectively unlimited bounces

# attr table rows (one column per triangle)
AT_N0 = 0               # 0:3 shading normal v0
AT_N1 = 3
AT_N2 = 6
AT_GN = 9               # 9:12 unit geometric normal
AT_MID = 12
AT_LPDF = 13            # baked power-CDF selection pdf of this tri's light
AT_LAREA = 14
AT_ISLIGHT = 15
AT_UV0 = 16             # 16:18 texture uv at v0
AT_UV1 = 18
AT_UV2 = 20
AT_LODB = 22            # -0.5*log2(tri_area2): ray-cone LOD bias
AT_LID = 23             # light id of this tri's light (-1 = not a light)
AT_TANG = 24            # 24:27 UV-space tangent premultiplied by 1/det_uv
AT_TSGN = 27            # sign(det_uv); 0 = degenerate UV mapping
AT_ROWS = 28

# material table rows (one column per material)
MT_BASE = 0             # 0:3
MT_METAL = 3
MT_ROUGH = 4
MT_IOR = 5
MT_TRANS = 6
MT_DTRANS = 7
MT_EMISSIVE = 8         # 8:11
MT_SPEC = 11
MT_THIN = 12
MT_VOLABS = 13          # 13:16
# Kulla-Conty energy fit: per-material polynomial coefficients of
# E(mu) in the sqrt(mu) basis (degree 5, bsdf.bake_e_poly_np) + E_avg —
# 5 in-kernel FMAs per lookup (a 32-bin table lerp costs ~24% of the
# whole bounce kernel; the XLA path keeps the exact table).
MT_EPOLY = 16           # 16:22
MT_EAVG = 22
MT_BTEX = 23            # base-color texture id (-1 none)
MT_MRTEX = 24           # metal-rough texture id
MT_ETEX = 25            # emissive texture id
MT_NTEX = 26            # tangent-space normal texture id
MT_ACUT = 27            # alpha-test cutoff (-1 = not alpha tested)
MT_PRIO = 28            # nested-dielectric priority (0 = none)
MT_ROWS = 29

# --- environment table (in-kernel env eval/sampling; EnvMap analog of
# Shaders/PathTracer/Lighting/EnvMap.hlsli evaluated inside the
# megakernel). Fixed kernel resolution ENV_H x ENV_W equirect baked by
# prepare(); the XLA path shares the SAME EnvMap so both tiers sample the
# same texels from the same uniforms. Stored transposed (x-major rows,
# y lanes) so the winner row one-hot works as a matmul gather without an
# in-kernel transpose.
ENV_H = 64
ENV_W = 128
EV_CT = 0         # 4 planes (R,G,B,texel_pdf) x 128 rows(x), lane = y
EV_CONDT = 512    # [128 rows(x), lane y] conditional CDF transposed
EV_COL = 640      # [128,128] row-marginal CDF replicated across lanes
EV_COSB = 768     # [128,128] cos row-boundaries replicated (-2 pads)
EV_AUX = 896      # aux lane rows below
EV_ROWS = 904
EVA_ROWCDF = 0    # row_cdf as lane row (lane = y)
EVA_SA = 1        # per-row texel solid angle (lane = y)
EVA_COS = 2       # cos(rotation) replicated
EVA_SIN = 3       # sin(rotation) replicated
EVA_SELPDF = 4    # power-mode selection pmf of the env light (replicated)

# --- texture atlas tables (in-kernel stochastic texture filtering; the
# RTXTF analog run INSIDE the bounce kernel — reference samples bindless
# MIP textures in-kernel at PathTracerBridgeDonut.hlsli:270-285).
TEX_MAX_ROWS = 512          # atlas cap: 512*128 = 64k texels (all MIPs)
TXM_W = 0                   # texture meta lane table (lane = texture id)
TXM_H = 1
TXM_NMIPS = 2
TXM_OFF = 3                 # 3:17 per-MIP start texel
TXM_POW = 17                # lanes k hold 2^-k (shared; not per-texture)
TXM_ROWS = 18

# --- external-NEE surface export rows (kernel -> XLA; the hot-tier
# route for NEE-AT / >128 lights / WRS K>1: light SELECTION and MIS run
# in XLA on the kernel-exported surface, the kernel keeps intersect +
# scatter + textures and the shadow kernel resolves occlusion — see
# pt/nee_external.py). Reference split: LightSampler.hlsli SampleLocal/
# SampleGlobal read baked per-tile buffers the host maintains
# (LightsBaker.cpp:1331-1408); here the per-tile state stays an XLA-side
# structure instead of a VMEM table (32k tiles x 2k lights >> VMEM).
SF_POS = 0              # 0:3 shading position
SF_SHN = 3              # 3:6 shading normal
SF_GN = 6               # 6:9 geometric normal (ray-facing)
SF_MID = 9              # material id
SF_BASE = 10            # 10:13 textured base color
SF_METAL = 13           # textured metallic
SF_ROUGH = 14           # textured roughness
SF_ETA = 15             # relative IoR at this crossing
SF_THP = 16             # 16:19 throughput at the surface (post-volume)
SF_EMIT = 19            # 19:22 unweighted emissive contribution thp*Le
SF_PGEO = 22            # area->solid-angle jacobian t^2/(A*cos) of the hit
SF_LID = 23             # hit triangle's light id (-1 none)
SF_ROWS = 24

# Effect seeds — must match pt/integrator.py
EFFECT_SCATTER = 29
EFFECT_NEE = 31
EFFECT_RR = 37
EFFECT_STF = 41
EFFECT_ALPHA = 43


@struct.dataclass
class BounceTables:
    """Scene tables for the fused bounce kernel (built at scene prep)."""

    tri_rows: jnp.ndarray    # [4*Tpad, 128] intersection operand rows
    attr_rows: jnp.ndarray   # [AT_ROWS, Tpad]
    mat_rows: jnp.ndarray    # [MT_ROWS, 128]
    light_rows: jnp.ndarray  # [W.LROWS, 128]
    env_rows: Optional[jnp.ndarray] = None   # [EV_ROWS, 128]
    tex_ct: Optional[jnp.ndarray] = None     # [4*128, TR] transposed atlas
    tex_meta: Optional[jnp.ndarray] = None   # [TXM_ROWS, 128]
    tc: int = struct.field(pytree_node=False, default=128)
    n_chunks: int = struct.field(pytree_node=False, default=1)
    n_lights: int = struct.field(pytree_node=False, default=0)
    n_tris: int = struct.field(pytree_node=False, default=0)
    tr: int = struct.field(pytree_node=False, default=0)
    # static: which maps any material binds (base, metal_rough, emissive)
    tex_maps: tuple = struct.field(pytree_node=False, default=(1, 0, 0, 0))
    # static: tri_rows carry opacity-micromap row groups (6 groups/chunk
    # instead of 4) and the kernels run the alpha/OMM path (scene/omm.py
    # level-2 bake resolved IN the intersection loop — OmmBaker analog)
    omm: bool = struct.field(pytree_node=False, default=False)
    # static: any material has nested_priority != 0 (the kernel runs the
    # pass-through false-hit rejection, PathTracerNestedDielectrics analog)
    prio: bool = struct.field(pytree_node=False, default=False)

    @property
    def tex_rows(self):
        """Non-None when the in-kernel texture path is available
        (pt/dispatch.py structural eligibility)."""
        return self.tex_ct


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_materials(materials) -> np.ndarray:
    """[MT_ROWS, 128] lane table: one column per material."""
    n_mats = len(np.asarray(materials.base_color))
    mat = np.zeros((MT_ROWS, 128), np.float32)
    mat[MT_BASE:MT_BASE + 3, :n_mats] = np.asarray(materials.base_color).T
    mat[MT_METAL, :n_mats] = np.asarray(materials.metallic)
    mat[MT_ROUGH, :n_mats] = np.asarray(materials.roughness)
    mat[MT_IOR, :n_mats] = np.asarray(materials.ior)
    mat[MT_TRANS, :n_mats] = np.asarray(materials.transmission)
    mat[MT_DTRANS, :n_mats] = np.asarray(materials.diffuse_transmission)
    mat[MT_EMISSIVE:MT_EMISSIVE + 3, :n_mats] = \
        np.asarray(materials.emissive).T
    mat[MT_SPEC, :n_mats] = np.asarray(materials.specular_f0_scale)
    mat[MT_THIN, :n_mats] = np.asarray(materials.thin)
    mat[MT_VOLABS:MT_VOLABS + 3, :n_mats] = \
        np.asarray(materials.volume_absorption).T
    from rtxpt_tpu.pt.bsdf import bake_e_poly_np
    r = np.asarray(materials.roughness, np.float64)
    e_poly, e_avg = bake_e_poly_np(np.clip(r * r, 0.0, 1.0))
    mat[MT_EPOLY:MT_EPOLY + 6, :n_mats] = e_poly
    mat[MT_EAVG, :n_mats] = e_avg
    mat[MT_BTEX, :] = -1.0
    mat[MT_MRTEX, :] = -1.0
    mat[MT_ETEX, :] = -1.0
    mat[MT_NTEX, :] = -1.0
    mat[MT_ACUT, :] = -1.0
    arr = getattr(materials, "alpha_cutoff", None)
    if arr is not None:
        mat[MT_ACUT, :n_mats] = np.asarray(arr, np.float32)
    arr = getattr(materials, "nested_priority", None)
    if arr is not None:
        mat[MT_PRIO, :n_mats] = np.asarray(arr, np.float32)
    for row, field in ((MT_BTEX, "base_color_tex"),
                       (MT_MRTEX, "metal_rough_tex"),
                       (MT_ETEX, "emissive_tex"),
                       (MT_NTEX, "normal_tex")):
        arr = getattr(materials, field, None)
        if arr is not None:
            mat[row, :n_mats] = np.asarray(arr, np.float32)
    return mat


def _tex_maps_of(materials) -> tuple:
    """Static (base, metal_rough, emissive, normal) map-presence flags."""
    def has(field):
        arr = getattr(materials, field, None)
        return int(arr is not None and int(np.max(np.asarray(arr))) >= 0)
    return (has("base_color_tex"), has("metal_rough_tex"),
            has("emissive_tex"), has("normal_tex"))


def build_env_rows(envmap) -> Optional[np.ndarray]:
    """Bake the [EV_ROWS,128] in-kernel environment table from an EnvMap
    baked at exactly (ENV_H, ENV_W); returns None otherwise."""
    img = np.asarray(envmap.image)
    if img.shape[:2] != (ENV_H, ENV_W):
        return None
    rows = np.zeros((EV_ROWS, 128), np.float32)
    pdf = np.asarray(envmap.texel_pdf)                     # [64,128]
    # transposed planes: row = plane*128 + x, lane = y
    for c in range(3):
        rows[EV_CT + c * 128:EV_CT + (c + 1) * 128, :ENV_H] = img[..., c].T
    rows[EV_CT + 3 * 128:EV_CT + 4 * 128, :ENV_H] = pdf.T
    rows[EV_CONDT:EV_CONDT + 128, :ENV_H] = \
        np.asarray(envmap.cond_cdf).T                      # [128(x),64(y)]
    # row-marginal CDF replicated across lanes; pad rows never satisfy <=u
    col = np.full((128, 128), 2.0, np.float32)
    col[:ENV_H, :] = np.asarray(envmap.row_cdf)[:, None]
    rows[EV_COL:EV_COL + 128] = col
    # cos boundaries: row i holds cos(pi*i/ENV_H) for 1<=i<ENV_H; yi =
    # #{i: d_y <= cosb_i}; pads are -2 (never satisfied)
    cosb = np.full((128, 128), -2.0, np.float32)
    for i in range(1, ENV_H):
        cosb[i, :] = np.cos(np.pi * i / ENV_H)
    rows[EV_COSB:EV_COSB + 128] = cosb
    theta = (np.arange(ENV_H) + 0.5) / ENV_H * np.pi
    sa = (2.0 * np.pi / ENV_W) * (np.pi / ENV_H) * np.maximum(
        np.sin(theta), 1e-6)
    rows[EV_AUX + EVA_ROWCDF, :ENV_H] = np.asarray(envmap.row_cdf)
    rows[EV_AUX + EVA_ROWCDF, ENV_H:] = 1.0
    rows[EV_AUX + EVA_SA, :ENV_H] = sa
    rows[EV_AUX + EVA_SA, ENV_H:] = 1.0
    rows[EV_AUX + EVA_COS, :] = float(np.asarray(envmap.cos_rot))
    rows[EV_AUX + EVA_SIN, :] = float(np.asarray(envmap.sin_rot))
    return rows


def build_tex_tables(atlas, materials):
    """Bake (tex_ct [4*128,TR], tex_meta [TXM_ROWS,128], tr) for in-kernel
    stochastic texture filtering; None when the atlas exceeds the VMEM
    budget, has >128 textures, >14 MIPs, or non-power-of-two dims."""
    if atlas is None:
        return None
    data = np.asarray(atlas.data, np.float32)              # [texels,4]
    texels = data.shape[0]
    tr = _round_up(max(texels, 128), 128) // 128
    tr = _round_up(tr, 8)
    if tr > TEX_MAX_ROWS:
        return None
    widths = np.asarray(atlas.width)
    heights = np.asarray(atlas.height)
    nmips = np.asarray(atlas.n_mips)
    if atlas.count > 128 or int(nmips.max(initial=0)) > 14:
        return None
    if np.any(widths & (widths - 1)) or np.any(heights & (heights - 1)):
        return None                 # kernel uses exact pow2 MIP halving
    pad = np.zeros((tr * 128 - texels, 4), np.float32)
    flat = np.concatenate([data, pad], axis=0)             # [tr*128,4]
    # tex_ct[plane*128 + l, q] = flat[q*128 + l, plane]
    cube = flat.reshape(tr, 128, 4)                        # [q,l,plane]
    tex_ct = np.transpose(cube, (2, 1, 0)).reshape(4 * 128, tr)
    meta = np.zeros((TXM_ROWS, 128), np.float32)
    n = atlas.count
    meta[TXM_W, :n] = widths
    meta[TXM_H, :n] = heights
    meta[TXM_NMIPS, :n] = nmips
    off = np.asarray(atlas.mip_offset)                     # [T, MAX_MIPS]
    for k in range(min(14, off.shape[1])):
        meta[TXM_OFF + k, :n] = off[:, k]
    meta[TXM_POW, :15] = 2.0 ** -np.arange(15)
    return (jnp.asarray(np.ascontiguousarray(tex_ct), jnp.float32),
            jnp.asarray(meta), tr)


def pack_lights(lights) -> np.ndarray:
    """[W.LROWS, 128] lane table: one column per light (first 128 —
    scenes with more ride the external-NEE mode and never select from
    this table)."""
    n_lights = min(int(np.asarray(lights.num)), 128)
    lt = np.zeros((W.LROWS, 128), np.float32)
    lt[W.LROW_CDF, :] = 1.0
    lt[W.LROW_KIND, :n_lights] = np.asarray(lights.kind)[:n_lights]
    lt[W.LROW_P0:W.LROW_P0 + 3, :n_lights] = \
        np.asarray(lights.p0)[:n_lights].T
    lt[W.LROW_P1:W.LROW_P1 + 3, :n_lights] = \
        np.asarray(lights.p1)[:n_lights].T
    lt[W.LROW_P2:W.LROW_P2 + 3, :n_lights] = \
        np.asarray(lights.p2)[:n_lights].T
    lt[W.LROW_EM:W.LROW_EM + 3, :n_lights] = \
        np.asarray(lights.emission)[:n_lights].T
    lt[W.LROW_EXTRA:W.LROW_EXTRA + 4, :n_lights] = \
        np.asarray(lights.extra)[:n_lights].T
    lt[W.LROW_NORMAL:W.LROW_NORMAL + 3, :n_lights] = \
        np.asarray(lights.normal)[:n_lights].T
    lt[W.LROW_POWER, :n_lights] = np.asarray(lights.power)[:n_lights]
    lt[W.LROW_CDF, :n_lights] = np.asarray(lights.cdf)[:n_lights]
    return lt


def _tangent_rows(uvs, indices, e1, e2):
    """Per-triangle UV-parameterisation tangent (premultiplied by the
    signed 1/det_uv) + sign(det_uv) — the host half of the tangent-space
    normal mapping in pt/surface.py:145-171 (same math, baked per tri so
    the kernel only does the Gram-Schmidt + perturbation)."""
    t0 = uvs[indices[:, 0]]
    t1 = uvs[indices[:, 1]]
    t2 = uvs[indices[:, 2]]
    duv1 = t1 - t0
    duv2 = t2 - t0
    det_uv = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    ok = np.abs(det_uv) > 1e-12
    r = np.where(ok, 1.0 / np.where(ok, det_uv, 1.0), 0.0)
    tang = (duv2[:, 1:2] * e1 - duv1[:, 1:2] * e2) * r[:, None]
    tsgn = np.where(ok, np.sign(det_uv), 0.0)
    return tang.astype(np.float32), tsgn.astype(np.float32)


def build_bounce_tables(positions, normals, indices, tri_material,
                        materials, lights, uvs=None, envmap=None,
                        textures=None,
                        tri_micromap=None,
                        tri_cover=None) -> Optional[BounceTables]:
    """Host-side table bake; returns None when the scene is ineligible.

    tri_micromap: optional [T] uint32 level-2 opacity micromaps
    (scene/omm.py bake, fully-TRANSPARENT tris already dropped) — adds
    two intersection row groups so the kernels resolve alpha inside the
    candidate loop (OmmBaker analog, OmmBuildQueue.h:31-142)."""
    if getattr(materials, "anisotropy", None) is not None and \
            float(np.max(np.asarray(materials.anisotropy))) > 0.0:
        return None      # anisotropic GGX runs on the XLA path
    from rtxpt_tpu.lighting.lights_baker import KIND_ENVQUAD, KIND_SPHERE
    if int(np.asarray(lights.num)) and \
            bool(np.any(np.isin(np.asarray(lights.kind),
                                [KIND_SPHERE, KIND_ENVQUAD]))):
        return None      # sphere/env-quad sampling is XLA-only
    positions = np.asarray(positions, np.float32)
    normals = np.asarray(normals, np.float32)
    indices = np.asarray(indices, np.int32)
    tri_material = np.asarray(tri_material, np.int32)
    t = len(indices)
    n_mats = len(np.asarray(materials.base_color))
    n_lights = int(np.asarray(lights.num))
    # n_lights > MAX_LIGHTS is allowed: the in-kernel light table only
    # holds the first 128 columns and pt/dispatch.py routes such scenes
    # to the EXTERNAL-NEE mode (XLA-side selection, any light count).
    if t == 0 or t > PALLAS_MAX_TRIS or n_mats > MAX_MATERIALS:
        return None
    env_rows = None
    if int(np.asarray(lights.env_light)) >= 0:
        # env light in the sampler: needs the in-kernel env table, which
        # demands the (ENV_H, ENV_W) kernel-resolution bake (prepare()'s
        # default when an envmap source is present).
        env_rows = build_env_rows(envmap) if envmap is not None else None
        if env_rows is None:
            return None
        sel = float(np.asarray(lights.power)[int(np.asarray(
            lights.env_light))])
        env_rows[EV_AUX + EVA_SELPDF, :] = sel
    tex = None
    if textures is not None:
        tex = build_tex_tables(textures, materials)
        if tex is None:
            return None

    v0 = positions[indices[:, 0]]
    v1 = positions[indices[:, 1]]
    v2 = positions[indices[:, 2]]
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)

    mat = pack_materials(materials)
    lt = pack_lights(lights)

    # Chunk depth: t sublane-rows per intersection group. Small scenes
    # round to the 8-sublane f32 tile, NOT to 128 — at Cornell's 36 tris a
    # 128 floor would make the valid/winner selection on [tc,128] tiles
    # (the kernel's hottest VPU block) ~70% padding work.
    tc = min(512, _round_up(t, 8))
    tpad = _round_up(t, tc)
    n_chunks = tpad // tc

    # ---- intersection rows: per chunk c, row groups [det|u|v|t] x tc ----
    # det = d.(-n); u = d.(v0xe2) + oxd.e2; v = d.(-v0xe1) + oxd.(-e1);
    # t = o.n + 1*(-v0n)     (ray column = [d|oxd|o|1] rows 0..9)
    # With opacity micromaps two extra groups [wlo|whi] ride the same
    # matmul: their only nonzero coefficient sits at the constant-1 ray
    # slot (col 9), broadcasting each tri's 16-bit micromap halves across
    # all rays of the pass (exact in f32; HIGHEST precision matmul).
    omm = tri_micromap is not None
    n_groups_t = 7 if omm else 4
    tri_rows = np.zeros((n_groups_t * tpad, 128), np.float32)
    v0xe2 = np.cross(v0, e2)
    v0xe1 = np.cross(v0, e1)
    v0n = np.einsum("tj,tj->t", v0, n)
    if omm:
        mm_w = np.asarray(tri_micromap).astype(np.uint32)
        mm_lo = (mm_w & np.uint32(0xFFFF)).astype(np.float32)
        mm_hi = (mm_w >> np.uint32(16)).astype(np.float32)
        mm_cov = (np.asarray(tri_cover, np.float32)
                  if tri_cover is not None else np.ones((t,), np.float32))
    for c in range(n_chunks):
        lo = c * tc
        hi = min(lo + tc, t)
        w = hi - lo
        if w <= 0:
            continue
        base = n_groups_t * c * tc
        tri_rows[base:base + w, 0:3] = -n[lo:hi]
        tri_rows[base + tc:base + tc + w, 0:3] = v0xe2[lo:hi]
        tri_rows[base + tc:base + tc + w, 3:6] = e2[lo:hi]
        tri_rows[base + 2 * tc:base + 2 * tc + w, 0:3] = -v0xe1[lo:hi]
        tri_rows[base + 2 * tc:base + 2 * tc + w, 3:6] = -e1[lo:hi]
        tri_rows[base + 3 * tc:base + 3 * tc + w, 6:9] = n[lo:hi]
        tri_rows[base + 3 * tc:base + 3 * tc + w, 9] = -v0n[lo:hi]
        if omm:
            tri_rows[base + 4 * tc:base + 4 * tc + w, 9] = mm_lo[lo:hi]
            tri_rows[base + 5 * tc:base + 5 * tc + w, 9] = mm_hi[lo:hi]
            tri_rows[base + 6 * tc:base + 6 * tc + w, 9] = mm_cov[lo:hi]

    # ---- attribute rows ----
    gn = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    attr = np.zeros((AT_ROWS, tpad), np.float32)
    attr[AT_N0:AT_N0 + 3, :t] = normals[indices[:, 0]].T
    attr[AT_N1:AT_N1 + 3, :t] = normals[indices[:, 1]].T
    attr[AT_N2:AT_N2 + 3, :t] = normals[indices[:, 2]].T
    attr[AT_GN:AT_GN + 3, :t] = gn.T
    attr[AT_MID, :t] = tri_material.astype(np.float32)
    tri_light = np.asarray(lights.tri_light)
    has_l = tri_light[:t] >= 0
    li = np.maximum(tri_light[:t], 0)
    attr[AT_LPDF, :t] = np.where(has_l, np.asarray(lights.power)[li], 0.0)
    attr[AT_LAREA, :t] = np.where(
        has_l, np.asarray(lights.extra)[li, 0], 1.0)
    attr[AT_ISLIGHT, :t] = has_l.astype(np.float32)
    attr[AT_LID, :t] = tri_light[:t].astype(np.float32)
    if uvs is not None:
        uvs = np.asarray(uvs, np.float32)
        attr[AT_UV0:AT_UV0 + 2, :t] = uvs[indices[:, 0]].T
        attr[AT_UV1:AT_UV1 + 2, :t] = uvs[indices[:, 1]].T
        attr[AT_UV2:AT_UV2 + 2, :t] = uvs[indices[:, 2]].T
        tang, tsgn = _tangent_rows(uvs, indices, e1, e2)
        attr[AT_TANG:AT_TANG + 3, :t] = tang.T
        attr[AT_TSGN, :t] = tsgn
    tri_area2 = np.linalg.norm(n, axis=-1)
    attr[AT_LODB, :t] = -0.5 * np.log2(np.maximum(tri_area2, 1e-20))

    return BounceTables(
        tri_rows=jnp.asarray(tri_rows), attr_rows=jnp.asarray(attr),
        mat_rows=jnp.asarray(mat), light_rows=jnp.asarray(lt),
        env_rows=(jnp.asarray(env_rows) if env_rows is not None else None),
        tex_ct=(tex[0] if tex is not None else None),
        tex_meta=(tex[1] if tex is not None else None),
        tc=tc, n_chunks=n_chunks, n_lights=n_lights, n_tris=t,
        tr=(tex[2] if tex is not None else 0),
        tex_maps=_tex_maps_of(materials),
        omm=omm,
        prio=bool(getattr(materials, "nested_priority", None) is not None
                  and np.any(np.asarray(materials.nested_priority) != 0)))


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _gather128(row, idx):
    """Fetch row[idx] where row is [1,128] table lanes, idx [R,128] i32."""
    tbl = jnp.broadcast_to(row, idx.shape)
    return jnp.take_along_axis(tbl, idx, axis=1)


def _ray_cols(o, d, g):
    """Build the [128,128] ray-column operand for group g from SoA rows."""
    oxd = W.cross3(o, d)
    rows = [d[0][g:g + 1], d[1][g:g + 1], d[2][g:g + 1],
            oxd[0][g:g + 1], oxd[1][g:g + 1], oxd[2][g:g + 1],
            o[0][g:g + 1], o[1][g:g + 1], o[2][g:g + 1],
            jnp.ones((1, 128), jnp.float32)]
    pad = jnp.zeros((118, 128), jnp.float32)
    return jnp.concatenate(rows + [pad], axis=0)


MICRO_OPAQUE, MICRO_UNKNOWN, MICRO_TRANSPARENT = 0, 1, 2  # scene/omm.py


def _micro_state(wlo, whi, u, v):
    """Level-2 opacity-micromap state at barycentric (u, v): decodes the
    16x2-bit word carried as two exact-f32 16-bit halves (scene/omm.py
    micro_index order, S = 4)."""
    uu = u * 4.0
    vv = v * 4.0
    a = jnp.minimum(jnp.floor(uu), 3.0)
    b = jnp.minimum(jnp.floor(vv), 3.0)
    inv = (uu - a) + (vv - b) > 1.0 + 1e-7
    a = jnp.minimum(a, 3.0 - b)
    mi = (b * (8.0 - b) + 2.0 * a
          + jnp.where(inv & (a + b < 3.0), 1.0, 0.0)).astype(jnp.int32)
    word = jnp.where(mi < 8, wlo, whi).astype(jnp.int32)
    sh = 2 * jnp.where(mi < 8, mi, mi - 8)
    return jax.lax.shift_right_logical(word, sh) & 3


def _intersect_group(tri_ref, attr_ref, cols, tmin_g, tmax_g, tc, n_chunks,
                     omm=False):
    """Closest hit for one 128-ray group. Returns per-ray [1,128] rows:
    (t, prim_f, u, v, det_pick, unk) and attrs [AT_ROWS,128]. With omm,
    micro-TRANSPARENT candidates are rejected inside the loop (the
    anyhit-free OMM fast path) and `unk` flags winners whose micro state
    is UNKNOWN (texture alpha test at shade time)."""
    ng = 7 if omm else 4
    best_t = jnp.full((1, 128), _BIG, jnp.float32)
    best_attr = jnp.zeros((AT_ROWS, 128), jnp.float32)
    best_u = jnp.zeros((1, 128), jnp.float32)
    best_v = jnp.zeros((1, 128), jnp.float32)
    best_det = jnp.zeros((1, 128), jnp.float32)
    best_prim = jnp.full((1, 128), -1.0, jnp.float32)
    best_unk = jnp.zeros((1, 128), jnp.float32)
    for c in range(n_chunks):
        base = ng * c * tc
        g = _mm(tri_ref[base:base + ng * tc, :], cols)    # [ng*tc,128]
        det = g[0:tc]
        u_num = g[tc:2 * tc]
        v_num = g[2 * tc:3 * tc]
        t_num = g[3 * tc:4 * tc]
        ok = jnp.abs(det) > 1e-12
        inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        u = u_num * inv
        v = v_num * inv
        t = t_num * inv
        valid = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                 & (t > tmin_g) & (t < tmax_g) & (t < best_t))
        if omm:
            st = _micro_state(g[4 * tc:5 * tc], g[5 * tc:6 * tc], u, v)
            valid = valid & (st != MICRO_TRANSPARENT)
            unk_c = (st == MICRO_UNKNOWN).astype(jnp.float32)
        t_m = jnp.where(valid, t, _BIG)
        t_c = jnp.min(t_m, axis=0, keepdims=True)
        hit_c = t_c < best_t
        iota = jax.lax.broadcasted_iota(jnp.int32, (tc, 128), 0)
        j = jnp.min(jnp.where(t_m <= t_c, iota, tc), axis=0, keepdims=True)
        sel = (iota == j).astype(jnp.float32)
        attr_c = _mm(attr_ref[:, c * tc:(c + 1) * tc], sel)  # [AT_ROWS,128]

        def pick(x):
            return jnp.sum(sel * x, axis=0, keepdims=True)

        best_attr = jnp.where(hit_c, attr_c, best_attr)
        best_u = jnp.where(hit_c, pick(u), best_u)
        best_v = jnp.where(hit_c, pick(v), best_v)
        best_det = jnp.where(hit_c, pick(det), best_det)
        best_prim = jnp.where(hit_c, (j + c * tc).astype(jnp.float32),
                              best_prim)
        if omm:
            best_unk = jnp.where(hit_c, pick(unk_c), best_unk)
        best_t = jnp.where(hit_c, t_c, best_t)
    return (best_t, best_prim, best_u, best_v, best_det, best_attr,
            best_unk)


def _occluded_group(tri_ref, cols, tmax_g, tc, n_chunks, omm=False,
                    u_alpha=None):
    """Any-hit in (0, tmax_g) for one 128-ray group -> f32 0/1 [1,128]
    (f32, not bool: Mosaic can't concatenate i1 tiles across groups).
    With omm, micro-TRANSPARENT candidates never occlude; UNKNOWN ones
    occlude STOCHASTICALLY against the baked unknown-cell coverage
    (u_alpha [1,128] per-ray uniform; the XLA path resolves them by
    texture retrace — scene/omm.intersect_any_alpha)."""
    ng = 7 if omm else 4
    occ = jnp.zeros((1, 128), jnp.float32)
    for c in range(n_chunks):
        base = ng * c * tc
        g = _mm(tri_ref[base:base + ng * tc, :], cols)
        det = g[0:tc]
        u_num = g[tc:2 * tc]
        v_num = g[2 * tc:3 * tc]
        t_num = g[3 * tc:4 * tc]
        ok = jnp.abs(det) > 1e-12
        inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        u = u_num * inv
        v = v_num * inv
        t = t_num * inv
        valid = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                 & (t > 0.0) & (t < tmax_g))
        if omm:
            st = _micro_state(g[4 * tc:5 * tc], g[5 * tc:6 * tc], u, v)
            valid = valid & (st != MICRO_TRANSPARENT)
            if u_alpha is not None:
                cover = g[6 * tc:7 * tc]
                valid = valid & ((st != MICRO_UNKNOWN)
                                 | (u_alpha < cover))
        occ = jnp.maximum(
            occ, jnp.max(valid.astype(jnp.float32), axis=0, keepdims=True))
    return occ


def _searchsorted128(cdf_row, u):
    """First index with cdf[i] >= u over a 128-lane CDF row; u [R,128]."""
    lo = jnp.zeros(u.shape, jnp.int32)
    for bit in (64, 32, 16, 8, 4, 2, 1):
        probe = lo + bit - 1
        c = _gather128(cdf_row, jnp.clip(probe, 0, 127))
        lo = lo + bit * (c < u).astype(jnp.int32)
    return jnp.clip(lo, 0, 127)


def _stack_groups(parts):
    """R x [1,128] -> [R,128]."""
    return jnp.concatenate(parts, axis=0)


def _onehot_rows(idx, nrows):
    """[1,128] i32 -> [nrows,128] f32 one-hot over the sublane axis."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (nrows, 128), 0)
    return (iota == idx).astype(jnp.float32)


def _atan2_w(z, x):
    """atan2(z, x) in (-pi, pi] — minimax polynomial (|err| < 2e-5 rad;
    Mosaic has no atan2 primitive). Only used for env texel lookup of an
    arbitrary direction; the env SAMPLER inverts CDFs and never calls
    this, so sampling parity with the XLA path is exact."""
    ax = jnp.abs(x)
    az = jnp.abs(z)
    mx = jnp.maximum(ax, az)
    mn = jnp.minimum(ax, az)
    t = mn / jnp.maximum(mx, 1e-30)
    t2 = t * t
    p = t * (0.99997726 + t2 * (-0.33262347 + t2 * (
        0.19354346 + t2 * (-0.11643287 + t2 * (
            0.05265332 - t2 * 0.01172120)))))
    p = jnp.where(az > ax, 0.5 * jnp.pi - p, p)
    p = jnp.where(x < 0.0, jnp.pi - p, p)
    return jnp.where(z < 0.0, -p, p)


# --------------------------- in-kernel environment -------------------------


def _env_rotate(env_ref, dx, dz):
    c = env_ref[EV_AUX + EVA_COS:EV_AUX + EVA_COS + 1, :]
    s = env_ref[EV_AUX + EVA_SIN:EV_AUX + EVA_SIN + 1, :]
    return c * dx + s * dz, -s * dx + c * dz


def _env_idx_of_dir(env_ref, d3):
    """Direction rows [3,R,128] -> (yi, xi) texel indices [R,128]."""
    rr = d3.shape[1]
    cosb = env_ref[EV_COSB:EV_COSB + 128, :]
    yis, xis = [], []
    for r in range(rr):
        dy = d3[1, r:r + 1]
        cnt = jnp.sum((dy <= cosb).astype(jnp.float32), axis=0,
                      keepdims=True)
        yis.append(jnp.clip(cnt.astype(jnp.int32), 0, ENV_H - 1))
        xr, zr = _env_rotate(env_ref, d3[0, r:r + 1], d3[2, r:r + 1])
        u = _atan2_w(zr, xr) * (1.0 / (2.0 * jnp.pi))
        u = u - jnp.floor(u)
        xis.append(jnp.clip((u * ENV_W).astype(jnp.int32), 0, ENV_W - 1))
    return _stack_groups(yis), _stack_groups(xis)


def _env_fetch_row(env_ref, yi_r, xi_r):
    """(yi, xi) [1,128] -> (r, g, b, texel_pdf) each [1,128] via one-hot
    matmul gathers of the transposed planes."""
    yoh = _onehot_rows(yi_r, 128)
    D = _mm(env_ref[EV_CT:EV_CT + 512, :], yoh)            # [512,128]
    xoh = _onehot_rows(xi_r, 128)

    def pick(c):
        return jnp.sum(D[c * 128:(c + 1) * 128] * xoh, axis=0,
                       keepdims=True)

    return pick(0), pick(1), pick(2), pick(3)


def _env_eval_pdf(env_ref, d3, nee_uniform, n_lights, with_pdf=True):
    """Radiance (+ solid-angle selection*source pdf) of directions d3
    [3,R,128]. Mirrors envmap.env_eval / env_pdf * env_select_pdf.
    Lane-gathers run batched at [R,128] — Mosaic's gather lowering
    rejects single-sublane [1,128] take_along_axis."""
    yi, xi = _env_idx_of_dir(env_ref, d3)
    rr = yi.shape[0]
    Ls, pts = [], []
    for r in range(rr):
        er, eg, eb, pt = _env_fetch_row(env_ref, yi[r:r + 1], xi[r:r + 1])
        Ls.append((er, eg, eb))
        pts.append(pt)
    L3 = jnp.stack([_stack_groups([t_[c] for t_ in Ls])
                    for c in range(3)], axis=0)
    if not with_pdf:
        return L3, None
    sa_row = env_ref[EV_AUX + EVA_SA:EV_AUX + EVA_SA + 1, :]
    sa = _gather128(sa_row, yi)                            # [R,128]
    if nee_uniform:
        sel = jnp.full(yi.shape, 1.0 / float(max(n_lights, 1)),
                       jnp.float32)
    else:
        sel = jnp.broadcast_to(
            env_ref[EV_AUX + EVA_SELPDF:EV_AUX + EVA_SELPDF + 1, :],
            yi.shape)
    return L3, sel * _stack_groups(pts) / sa


def _env_sample_w(env_ref, u1, u2):
    """In-kernel env importance sample, [R,128] uniforms. Exactly the
    two-level inversion of envmap.env_sample (same uniforms -> same texel
    -> same sub-texel jitter), so fused/XLA tiers stay in parity.
    Returns (wi [3,R,128], Li [3,R,128], pdf_src [R,128])."""
    rr = u1.shape[0]
    col = env_ref[EV_COL:EV_COL + 128, :]
    rowcdf = env_ref[EV_AUX + EVA_ROWCDF:EV_AUX + EVA_ROWCDF + 1, :]
    sa_row = env_ref[EV_AUX + EVA_SA:EV_AUX + EVA_SA + 1, :]
    u1 = jnp.clip(u1, 0.0, 1.0 - 1e-7)
    u2 = jnp.clip(u2, 0.0, 1.0 - 1e-7)
    # Pass 1: row selection for every ray row, then BATCHED [R,128]
    # rescale gathers (Mosaic rejects [1,128] take_along_axis).
    yis = []
    for r in range(rr):
        cnt = jnp.sum((col <= u1[r:r + 1]).astype(jnp.float32), axis=0,
                      keepdims=True)
        yis.append(jnp.clip(cnt.astype(jnp.int32), 0, ENV_H - 1))
    yi_all = _stack_groups(yis)                            # [R,128]
    c_lo_all = jnp.where(
        yi_all > 0, _gather128(rowcdf, jnp.maximum(yi_all - 1, 0)), 0.0)
    c_hi_all = _gather128(rowcdf, yi_all)
    jv_all = jnp.clip((u1 - c_lo_all)
                      / jnp.maximum(c_hi_all - c_lo_all, 1e-12),
                      0.0, 1.0 - 1e-6)
    sa_all = _gather128(sa_row, yi_all)
    wis, lis, pdfs = [], [], []
    for r in range(rr):
        a = u1[r:r + 1]
        b = u2[r:r + 1]
        yi = yi_all[r:r + 1]
        jv = jv_all[r:r + 1]
        yoh = _onehot_rows(yi, 128)
        C = _mm(env_ref[EV_CONDT:EV_CONDT + 128, :], yoh)   # [128(x),128]
        xcnt = jnp.sum((C <= b).astype(jnp.float32), axis=0, keepdims=True)
        xi = jnp.clip(xcnt.astype(jnp.int32), 0, ENV_W - 1)
        d_lo = jnp.where(
            xi > 0,
            jnp.sum(C * _onehot_rows(jnp.maximum(xi - 1, 0), 128),
                    axis=0, keepdims=True), 0.0)
        d_hi = jnp.sum(C * _onehot_rows(xi, 128), axis=0, keepdims=True)
        ju = jnp.clip((b - d_lo) / jnp.maximum(d_hi - d_lo, 1e-12),
                      0.0, 1.0 - 1e-6)
        u = (xi.astype(jnp.float32) + ju) * (1.0 / ENV_W)
        v = (yi.astype(jnp.float32) + jv) * (1.0 / ENV_H)
        phi = u * (2.0 * jnp.pi)
        theta = v * jnp.pi
        st = jnp.sin(theta)
        x = st * jnp.cos(phi)
        z = st * jnp.sin(phi)
        y = jnp.cos(theta)
        c = env_ref[EV_AUX + EVA_COS:EV_AUX + EVA_COS + 1, :]
        s = env_ref[EV_AUX + EVA_SIN:EV_AUX + EVA_SIN + 1, :]
        wis.append((c * x - s * z, y, s * x + c * z))
        er, eg, eb, pt = _env_fetch_row(env_ref, yi, xi)
        lis.append((er, eg, eb))
        pdfs.append(pt / sa_all[r:r + 1])
    wi3 = jnp.stack([_stack_groups([t_[c] for t_ in wis])
                     for c in range(3)], axis=0)
    li3 = jnp.stack([_stack_groups([t_[c] for t_ in lis])
                     for c in range(3)], axis=0)
    return wi3, li3, _stack_groups(pdfs)


# ----------------------------- in-kernel textures --------------------------


def _tex_fetch_w(tex_ct_ref, tex_meta_ref, tr, tid, uv_u, uv_v, mip,
                 ju0, ju1):
    """Stochastic-filtered texel fetch, [R,128] operands. Mirrors
    scene/textures.py sample_texture_stochastic exactly (same jitter
    uses) for pow2 textures. Returns rgba as 4 x [R,128]; lanes with
    tid < 0 return white."""
    rr = tid.shape[0]
    tid_c = jnp.clip(tid, 0, 127)
    nm = _gather128(tex_meta_ref[TXM_NMIPS:TXM_NMIPS + 1, :],
                    tid_c).astype(jnp.int32)
    level = jnp.clip(jnp.floor(mip + ju0).astype(jnp.int32), 0, nm - 1)
    p2 = _gather128(tex_meta_ref[TXM_POW:TXM_POW + 1, :],
                    jnp.clip(level, 0, 14))
    w0 = _gather128(tex_meta_ref[TXM_W:TXM_W + 1, :], tid_c)
    h0 = _gather128(tex_meta_ref[TXM_H:TXM_H + 1, :], tid_c)
    wl = jnp.maximum(jnp.floor(w0 * p2 + 0.5), 1.0)        # == w0 >> level
    hl = jnp.maximum(jnp.floor(h0 * p2 + 0.5), 1.0)
    off = jnp.zeros(tid.shape, jnp.float32)
    for k in range(14):
        off_k = _gather128(tex_meta_ref[TXM_OFF + k:TXM_OFF + k + 1, :],
                           tid_c)
        off = off + jnp.where(level == k, off_k, 0.0)
    u = uv_u + (ju0 - 0.5) / wl
    v = uv_v + (ju1 - 0.5) / hl
    u = u - jnp.floor(u)
    v = v - jnp.floor(v)
    xi = jnp.clip((u * wl).astype(jnp.int32), 0, wl.astype(jnp.int32) - 1)
    yi = jnp.clip((v * hl).astype(jnp.int32), 0, hl.astype(jnp.int32) - 1)
    idx = off.astype(jnp.int32) + yi * wl.astype(jnp.int32) + xi
    q = jax.lax.shift_right_logical(idx, 7)
    lane = jax.lax.bitwise_and(idx, 127)
    outs = []
    for r in range(rr):
        qoh = _onehot_rows(q[r:r + 1], tr)                 # [TR,128]
        D = _mm(tex_ct_ref[:, :], qoh)                     # [512,128]
        loh = _onehot_rows(lane[r:r + 1], 128)
        outs.append(tuple(
            jnp.sum(D[c * 128:(c + 1) * 128] * loh, axis=0, keepdims=True)
            for c in range(4)))
    white = tid < 0
    return tuple(
        jnp.where(white, 1.0, _stack_groups([o[c] for o in outs]))
        for c in range(4))


def _ray_offset_w(pos, gn, direction):
    mag = jnp.sqrt(jnp.maximum(W.dot3(pos, pos), 0.0))
    scale = jnp.maximum(1.0, mag) * 3e-5
    side = jnp.where(W.dot3(direction, gn) >= 0.0, 1.0, -1.0)
    return pos + gn * (side * scale)


def surface_and_shade(*, o, d, t, hit, front, bu, bv, attr,
                      thp, L, prev_pdf, active, prev_delta, med0, med1,
                      px, py, sample_idx, bounce, mat_ref, light_ref,
                      cfg_key, n_lights, first_emissive,
                      env_ref=None, tex_refs=None, tex_maps=(1, 0, 0, 0),
                      cone=None, spread=None, budget=None,
                      ld=None, ls=None, fspec=None,
                      lbounce=None, maxb=None, omm_unknown=None,
                      prio=False, first_direct=True):
    """Shared post-intersection bounce body: surface fetch, volume
    absorption, emissive-hit MIS, NEE light sample + BSDF eval (shadow ray
    RETURNED, not resolved), BSDF scatter sample, medium stack, RR.

    `attr(i, k=1)` fetches per-ray winner attribute rows ([R,128] /
    [k,R,128]). Returns a dict with the updated wavefront state and the
    pending NEE request (caller resolves occlusion and adds `contrib`).

    Reference: the megakernel loop body after the TraceRay call —
    Rtxpt/Shaders/PathTracer/PathTracer.hlsli HandleHit / HandleNEE /
    GenerateScatterRay (see module docstring)."""
    (nee_mode, enable_mis, firefly, rr_enable, min_rr, max_travel,
     low_discrepancy, energy_comp, noprune, split_ch) = cfg_key
    f32 = jnp.float32

    def lds(seed, dims):
        if low_discrepancy:
            return rng.ld_samples(sample_idx, seed, dims)
        return tuple(rng.uniform_sample(
            seed, rng.hash_combine(sample_idx, dd)) for dd in dims)

    # nee_mode: 0 off | 1 uniform | 2 power (in-kernel selection) |
    # 3 NEE-AT | 4 uniform-ext | 5 power-ext (external selection:
    # the kernel exports the surface and XLA runs NEE — pt/nee_external).
    ext_nee = nee_mode in (3, 4, 5) and n_lights > 0
    use_nee = nee_mode in (1, 2) and n_lights > 0
    nee_uniform = nee_mode in (1, 4)
    # emissive-hit MIS with the baked per-tri selection pdf works
    # in-kernel for every mode except NEE-AT (mixture needs the XLA-side
    # per-tile state: exported as p_geo + light id instead).
    em_mis_inkernel = nee_mode in (1, 2, 4, 5) and n_lights > 0
    # Logical bounce: with pass-through iterations (alpha/priority false
    # hits) the loop index `bounce` overcounts — every bounce-SEMANTIC
    # gate below uses the per-lane lb instead; RNG seeds keep the global
    # index (each iteration must draw fresh randoms).
    lb = lbounce if lbounce is not None else \
        jnp.full(t.shape, bounce, jnp.int32)
    # shared pixel_seed prefix: pixel_seed(px,py,lb,e) ==
    # hash_combine(hash_combine(hash_combine(px,py),lb), e) — hoist the
    # (px,py,lb) part once per bounce instead of once per effect (exact).
    seed_base = rng.hash_combine(rng.hash_combine(px, py), lb)

    def eff_seed(effect):
        return rng.hash_combine(seed_base, effect)
    em_gate = jnp.asarray(first_emissive, bool) | (lb > 0)
    # first_direct=False (stable-planes FILL under external ReSTIR DI):
    # the caller shades ALL primary direct light externally — suppress
    # BSDF-sampled emissive/env arriving at lb==1 and NEE at lb==0
    # (integrator.py:273,376,405 gates, per-lane; RtxdiPass.cpp:544-550)
    if not first_direct:
        em_gate = em_gate & (lb != 1)
    # diffuse/specular radiance split for per-channel denoising
    # (integrator.py:132-135 semantics; NrdConfig.cpp:25-27)
    split = bool(split_ch) and ld is not None

    hit_mask = active & hit
    # ----- HandleMiss: environment (PathTracer.hlsli:407-503) -----
    if env_ref is not None:
        miss_mask = active & ~hit
        env_L, p_env = _env_eval_pdf(
            env_ref, d, nee_uniform, n_lights,
            with_pdf=(use_nee or ext_nee) and bool(enable_mis))
        if (use_nee or ext_nee) and enable_mis:
            w_env = jnp.where(prev_delta | (lb == 0), 1.0,
                              W.power_heuristic(prev_pdf, p_env))
        else:
            w_env = jnp.ones_like(t)
        c_env = jnp.where(miss_mask & em_gate, thp * env_L * w_env, 0.0)
        L = L + c_env
        if split:
            cd = jnp.where(fspec > 0.5, 0.0, c_env)
            ld = ld + cd
            ls = ls + (c_env - cd)
    active = active & hit                     # miss terminates
    # ----- per-lane bounce budget (stable-planes FILL: the BUILD chain
    # already consumed path vertices; integrator.py:308-309 order —
    # env-on-miss above is still paid at the expiry bounce, surface
    # shading below is not). With pass-through iterations the per-lane
    # LOGICAL limit also covers cfg.max_bounces (the loop runs extra
    # iterations; a lane stops shading once lb reaches its limit). -----
    if budget is not None:
        not_expired = lb < budget
        if maxb is not None:
            not_expired = not_expired & (lb < maxb)
        active = active & not_expired
        hit_mask = hit_mask & not_expired

    # ----- surface (load_surface analog; zero HBM gathers) -----
    pos = o + t * d
    gn = attr(AT_GN, 3)
    gn = jnp.where(front, gn, -gn)            # orient toward the ray
    n0 = attr(AT_N0, 3)
    n1 = attr(AT_N1, 3)
    n2 = attr(AT_N2, 3)
    bw = 1.0 - bu - bv
    sh_n = W.normalize3(bw * n0 + bu * n1 + bv * n2)
    sh_n = jnp.where(W.dot3(sh_n, gn) > 0.0, sh_n, -sh_n)
    mid = jnp.clip(attr(AT_MID).astype(jnp.int32), 0, 127)

    def mrow(i):
        return _gather128(mat_ref[i:i + 1, :], mid)

    def mrow3(i):
        return jnp.stack([mrow(i), mrow(i + 1), mrow(i + 2)], axis=0)

    base_color = mrow3(MT_BASE)
    metallic = mrow(MT_METAL)
    roughness = mrow(MT_ROUGH)
    transmission = mrow(MT_TRANS)
    dtrans = mrow(MT_DTRANS)
    emissive = mrow3(MT_EMISSIVE)
    spec_scale = mrow(MT_SPEC)
    thin = mrow(MT_THIN) > 0.5
    ior = mrow(MT_IOR)

    # ----- ray-cone width + in-kernel stochastic texturing (RTXTF) -----
    # (reference: in-megakernel bindless MIP sampling,
    # PathTracerBridgeDonut.hlsli:270-285; STF per Config.h:95)
    if cone is not None:
        cone = cone + spread * jnp.where(hit, t, 0.0)
    if tex_refs is not None:
        tex_ct_ref, tex_meta_ref, tr = tex_refs
        uv0u = attr(AT_UV0)
        uv0v = attr(AT_UV0 + 1)
        uv1u = attr(AT_UV1)
        uv1v = attr(AT_UV1 + 1)
        uv2u = attr(AT_UV2)
        uv2v = attr(AT_UV2 + 1)
        bw_ = 1.0 - bu - bv
        uv_u = bw_ * uv0u + bu * uv1u + bv * uv2u
        uv_v = bw_ * uv0v + bu * uv1v + bv * uv2v
        mip = 0.5 * jnp.log2(jnp.maximum(cone * cone, 1e-30))             + attr(AT_LODB)
        seed_tx = eff_seed(EFFECT_STF)
        ju0, ju1 = lds(seed_tx, (0, 1))

        def tfetch(row):
            tid = mrow(row).astype(jnp.int32)
            rgba = _tex_fetch_w(tex_ct_ref, tex_meta_ref, tr, tid,
                                uv_u, uv_v, mip, ju0, ju1)
            return tid >= 0, rgba

        if tex_maps[0]:
            has_b, brgba = tfetch(MT_BTEX)
            base_color = jnp.where(has_b,
                                   base_color * jnp.stack(brgba[:3], 0),
                                   base_color)
            base_alpha = jnp.where(has_b, brgba[3], 1.0)
            if omm_unknown is not None:
                # Alpha TEST fetch at MIP 0: the micromap bake classifies
                # cells against level-0 alpha (scene/omm.py alpha_at), so
                # the UNKNOWN-cell resolve must test the same signal —
                # the ray-cone MIP average of a 0/1 cutout never crosses
                # the cutoff (filtered alpha -> ~coverage >= cutoff) and
                # pass-through would silently never fire. Matches the
                # XLA retrace (omm.py intersect_closest_alpha, level 0)
                # and the reference's SampleLevel(0) anyhit alpha test.
                tid_b = mrow(MT_BTEX).astype(jnp.int32)
                brgba0 = _tex_fetch_w(
                    tex_ct_ref, tex_meta_ref, tr, tid_b, uv_u, uv_v,
                    jnp.full_like(uv_u, -100.0), ju0, ju1)
                base_alpha0 = jnp.where(has_b, brgba0[3], 1.0)
        if tex_maps[1]:
            has_m, mrgba = tfetch(MT_MRTEX)
            # glTF convention: B = metallic, G = roughness
            metallic = jnp.where(has_m, metallic * mrgba[2], metallic)
            roughness = jnp.where(has_m, roughness * mrgba[1], roughness)
        if tex_maps[2]:
            has_e, ergba = tfetch(MT_ETEX)
            emissive = jnp.where(has_e,
                                 emissive * jnp.stack(ergba[:3], 0),
                                 emissive)
        if len(tex_maps) > 3 and tex_maps[3]:
            # tangent-space normal mapping (pt/surface.py:145-171 on
            # tiles; tangent baked per tri in AT_TANG/AT_TSGN —
            # reference: PathTracerBridgeDonut.hlsli:612-680 shading-
            # normal decode)
            has_n, nrgba = tfetch(MT_NTEX)
            n_ts = [c * 2.0 - 1.0 for c in nrgba[:3]]
            tang_raw = attr(AT_TANG, 3)
            tsgn = attr(AT_TSGN)
            t_gs = tang_raw - sh_n * W.dot3(tang_raw, sh_n)
            tlen = jnp.sqrt(W.dot3(t_gs, t_gs))
            ok_t = (tsgn != 0.0) & (tlen > 1e-8)
            tang = t_gs / jnp.maximum(tlen, 1e-8)
            bitan = W.cross3(sh_n, tang) * tsgn
            n_pert = W.normalize3(n_ts[0] * tang + n_ts[1] * bitan
                                  + jnp.maximum(n_ts[2], 0.05) * sh_n)
            n_pert = jnp.where(W.dot3(n_pert, gn) > 0.0, n_pert, sh_n)
            sh_n = jnp.where(has_n & ok_t, n_pert, sh_n)

    # ----- pass-through rejection (alpha-test fail / nested-priority
    # false hit): the lane re-traces from just past this surface on the
    # NEXT wavefront iteration without consuming a logical bounce —
    # amortized analog of the XLA bounded retrace (scene/omm.py
    # intersect_closest_alpha; integrator.py:220-256 false-hit skip;
    # reference: PathTracerNestedDielectrics.hlsli:48,118 + anyhit) -----
    passthru = jnp.zeros(t.shape, bool)
    if omm_unknown is not None and tex_refs is not None and tex_maps[0]:
        acut = mrow(MT_ACUT)
        alpha_fail = ((omm_unknown > 0.5) & (acut >= 0.0)
                      & (base_alpha0 < acut))
        passthru = passthru | (hit_mask & alpha_fail)
    if prio:
        def prow(med):
            v = _gather128(mat_ref[MT_PRIO:MT_PRIO + 1, :],
                           jnp.clip(med, 0, 127))
            return jnp.where(med >= 0, v, -1.0)

        p_hit = mrow(MT_PRIO)
        boundary = ~thin & (transmission > 0.0)
        false_enter = boundary & front & (p_hit < prow(med0))
        false_exit = boundary & ~front & (mid != med0)
        prio_fh = hit_mask & (false_enter | false_exit)
        # interior-list bookkeeping for the skipped boundary
        # (InteriorList.hlsli:26-32 semantics, integrator.py:244-249)
        p_m1 = prow(med1)
        med1 = jnp.where(
            prio_fh & false_enter & ((med1 < 0) | (p_hit > p_m1)), mid,
            jnp.where(prio_fh & false_exit & (mid == med1), -1, med1))
        passthru = passthru | prio_fh
    hit_shade = hit_mask & ~passthru
    u_alpha = None
    if omm_unknown is not None:
        seed_sa = eff_seed(EFFECT_ALPHA)
        (u_alpha,) = lds(seed_sa, (0,))

    # medium stack IoRs (ior row indexed by medium material id)
    def med_ior(med):
        i = jnp.clip(med, 0, 127)
        v = _gather128(mat_ref[MT_IOR:MT_IOR + 1, :], i)
        return jnp.where(med >= 0, v, 1.0)

    cur_ior = med_ior(med0)
    below_ior = med_ior(med1)
    in_medium = med0 >= 0
    med_i = jnp.clip(med0, 0, 127)
    sigma = jnp.stack([
        _gather128(mat_ref[MT_VOLABS + j:MT_VOLABS + j + 1, :], med_i)
        for j in range(3)], axis=0)
    thp = thp * jnp.where(in_medium, jnp.exp(-sigma * t), 1.0)

    if not energy_comp:
        e_poly = None
        e_avg = None
    else:
        e_poly = jnp.stack([mrow(MT_EPOLY + k) for k in range(6)], axis=0)
        e_avg = mrow(MT_EAVG)
    bsdf = W.make_bsdf_w(base_color, metallic, roughness, ior, transmission,
                         dtrans, spec_scale, front, cur_ior, below_ior,
                         e_poly=e_poly, e_avg=e_avg)
    emissive = jnp.where(front, emissive, 0.0)

    # ----- emissive hit + MIS (baked per-tri light pdf/area) -----
    cos_l = jnp.abs(W.dot3(-d, gn))
    area = jnp.maximum(attr(AT_LAREA), 1e-12)
    p_geo = t * t / jnp.maximum(area * jnp.maximum(cos_l, 1e-9), 1e-12)
    if em_mis_inkernel and enable_mis:
        if nee_uniform:
            sel_pdf_hit = attr(AT_ISLIGHT) / float(max(n_lights, 1))
        else:
            sel_pdf_hit = attr(AT_LPDF)
        p_light = sel_pdf_hit * p_geo
        p_light = jnp.where(attr(AT_ISLIGHT) > 0.5, p_light, 0.0)
        w_em = jnp.where(prev_delta | (lb == 0), 1.0,
                         W.power_heuristic(prev_pdf, p_light))
    else:
        w_em = jnp.ones_like(t)
    if nee_mode == 3:
        # NEE-AT: the mixture selection pmf lives in the XLA-side tile
        # state — export the unweighted contribution + jacobian + light
        # id; pt/nee_external applies the exact mixture MIS weight.
        em3 = jnp.where(hit_shade & em_gate, thp * emissive, 0.0)
    else:
        em_c = jnp.where(hit_shade & em_gate, thp * emissive * w_em, 0.0)
        L = L + em_c
        if split:
            em_c = jnp.where(lb > 0, em_c, 0.0)  # primary em excluded
            cd = jnp.where(fspec > 0.5, 0.0, em_c)
            ld = ld + cd
            ls = ls + (em_c - cd)
        em3 = jnp.zeros_like(thp)

    wo = W.to_local3(-d, sh_n)
    if ext_nee:
        surf_rows = jnp.concatenate([
            pos, sh_n, gn, mid.astype(f32)[None],
            base_color, metallic[None], roughness[None],
            bsdf.eta[None], thp, em3,
            jnp.where(attr(AT_ISLIGHT) > 0.5, p_geo, 0.0)[None],
            attr(AT_LID)[None]], axis=0)
    else:
        surf_rows = None

    # ----- NEE (1 candidate; HandleNEE analog) -----
    do_nee = jnp.zeros(t.shape, bool)
    if use_nee:
        seed_nee = eff_seed(EFFECT_NEE)
        u_sel, u1, u2 = lds(seed_nee, (0, 2, 3))
        u_sel = jnp.clip(u_sel, 0.0, 1.0 - 1e-7)
        if nee_uniform:
            li = jnp.clip((u_sel * float(n_lights)).astype(jnp.int32),
                          0, n_lights - 1)
            sel_pdf = jnp.full(u_sel.shape, 1.0 / float(n_lights), f32)
        else:
            li = jnp.clip(_searchsorted128(
                light_ref[W.LROW_CDF:W.LROW_CDF + 1, :], u_sel),
                0, n_lights - 1)
            sel_pdf = _gather128(
                light_ref[W.LROW_POWER:W.LROW_POWER + 1, :], li)

        def lrow(i):
            return _gather128(light_ref[i:i + 1, :], li)

        def lrow3(i):
            return jnp.stack([lrow(i), lrow(i + 1), lrow(i + 2)], axis=0)

        lf = W.LightFieldsW(
            kind=lrow(W.LROW_KIND).astype(jnp.int32),
            p0=lrow3(W.LROW_P0), p1=lrow3(W.LROW_P1), p2=lrow3(W.LROW_P2),
            em=lrow3(W.LROW_EM),
            extra=jnp.stack([lrow(W.LROW_EXTRA + j) for j in range(4)],
                            axis=0),
            normal=lrow3(W.LROW_NORMAL), power=sel_pdf)
        env_s = None
        if env_ref is not None:
            env_s = _env_sample_w(env_ref, u1, u2)
        lsmp = W.sample_light_fields_w(lf, sel_pdf, pos, u1, u2, env=env_s)
        wi_l = W.to_local3(lsmp["wi"], sh_n)
        f_l = W.bsdf_eval_w(bsdf, wo, wi_l)
        pdf_b = W.bsdf_pdf_w(bsdf, wo, wi_l)
        do_nee = hit_shade & lsmp["valid"] & (W.luminance3(f_l) > 0.0)
        if not first_direct:
            do_nee = do_nee & (lb > 0)   # primary NEE shaded externally
        shadow_o = _ray_offset_w(pos, gn, lsmp["wi"])
        if enable_mis:
            w_nee = jnp.where(lsmp["is_delta"], 1.0,
                              W.power_heuristic(lsmp["pdf"], pdf_b))
        else:
            w_nee = jnp.ones_like(t)
        contrib = thp * f_l * lsmp["Li"] * (
            w_nee / jnp.maximum(lsmp["pdf"], 1e-12))
        if firefly > 0.0:
            lum = W.luminance3(contrib)
            contrib = contrib * jnp.minimum(
                1.0, firefly / jnp.maximum(lum, 1e-12))
        if split:
            f_dp, _f_sp = W.bsdf_eval_split_w(bsdf, wo, wi_l)
            ratio = f_dp / jnp.maximum(f_l, 1e-12)
            cdiff = jnp.where(lb == 0, contrib * ratio,
                              jnp.where(fspec > 0.5, 0.0, contrib))
        else:
            cdiff = jnp.zeros_like(thp)
        # offset-aware occlusion distance (see integrator.py NEE note)
        dist_eff = lsmp["dist"] - W.dot3(shadow_o - pos, lsmp["wi"])
        sdist = jnp.where(do_nee, dist_eff * (1.0 - 1e-4), 0.0)
        shadow_d = lsmp["wi"]
    else:
        do_nee = jnp.zeros(t.shape, bool)
        shadow_o = pos
        shadow_d = d
        sdist = jnp.zeros_like(t)
        contrib = jnp.zeros_like(thp)
        cdiff = jnp.zeros_like(thp)

    # ----- scatter (GenerateScatterRay analog) -----
    # snapshot pre-scatter state for pass-through lanes (they keep it)
    thp_ns, pdf_ns, delta_ns = thp, prev_pdf, prev_delta
    med0_ns, med1_ns = med0, med1
    spread_ns = spread
    seed_sc = eff_seed(EFFECT_SCATTER)
    u_lobe, su1, su2 = lds(seed_sc, (0, 2, 3))
    bs = W.bsdf_sample_w(bsdf, wo, u_lobe, su1, su2)
    wi_world = W.to_world3(bs["wi"], sh_n)
    if split:
        is_spec = ((bs["lobe"] == W.LOBE_SPECULAR_REFL)
                   | (bs["lobe"] == W.LOBE_SPECULAR_TRANS))
        fspec = jnp.where((lb == 0) & hit_shade,
                          is_spec.astype(f32), fspec)
    same_side_sh = bs["wi"][2] > 0.0
    same_side_geo = W.dot3(wi_world, gn) > 0.0
    leak = same_side_sh != same_side_geo
    active = active & (passthru | (bs["valid"] & ~leak
                                   & (W.luminance3(bs["weight"]) > 0.0)))

    thp = thp * bs["weight"]
    prev_pdf = bs["pdf"]
    prev_delta = bs["is_delta"]

    transmitted = bs["wi"][2] < 0.0
    entering = transmitted & front & ~thin
    exiting = transmitted & ~front & ~thin
    new_med0 = jnp.where(entering, mid, jnp.where(exiting, med1, med0))
    new_med1 = jnp.where(entering, med0, jnp.where(exiting, -1, med1))
    med0, med1 = new_med0, new_med1

    if rr_enable:
        seed_rr = eff_seed(EFFECT_RR)
        (u_rr,) = lds(seed_rr, (0,))
        p_cont = jnp.clip(
            jnp.maximum(jnp.maximum(thp[0], thp[1]), thp[2]), 0.05, 1.0)
        rr_on = (lb >= min_rr) & ~passthru
        kill = rr_on & (u_rr >= p_cont)
        active = active & ~kill
        thp = thp / jnp.where(rr_on, p_cont, 1.0)

    o_new = _ray_offset_w(pos, gn, wi_world)

    # Ray-cone spread growth by lobe roughness (TexLODHelpers.hlsli use at
    # PathTracer.hlsli:284-293) — mirrors integrator.py.
    if spread is not None:
        spread = spread + jnp.sqrt(bsdf.alpha) * 0.25 \
            * (1.0 - bs["is_delta"].astype(f32))

    # ----- pass-through lane overrides: continue the SAME ray from just
    # past the rejected surface; no scatter state advances -----
    lb_out = lb + hit_shade.astype(jnp.int32)
    has_pass = (omm_unknown is not None and tex_refs is not None
                and tex_maps[0]) or prio
    if has_pass:
        t_adv = t * (1.0 + 1e-4) + 1e-5
        o_new = jnp.where(passthru, o + d * t_adv, o_new)
        wi_world = jnp.where(passthru, d, wi_world)
        thp = jnp.where(passthru, thp_ns, thp)
        prev_pdf = jnp.where(passthru, pdf_ns, prev_pdf)
        prev_delta = jnp.where(passthru, delta_ns, prev_delta)
        med0 = jnp.where(passthru, med0_ns, med0)
        med1 = jnp.where(passthru, med1_ns, med1)
        if spread is not None:
            spread = jnp.where(passthru, spread_ns, spread)

    return dict(
        o_new=o_new, wi_world=wi_world, thp=thp, L=L, prev_pdf=prev_pdf,
        active=active, prev_delta=prev_delta, med0=med0, med1=med1,
        do_nee=do_nee, shadow_o=shadow_o, shadow_d=shadow_d, sdist=sdist,
        contrib=contrib, cone=cone, spread=spread, surf=surf_rows,
        ld=ld, ls=ls, fspec=fspec, cdiff=cdiff,
        lbounce=lb_out, shaded=hit_shade, u_alpha=u_alpha)


def _attrs_from_prim(attr_ref, prim_g, tc, n_chunks):
    """Winner-attribute rows for a KNOWN prim id (V-buffer injection):
    one one-hot MXU pass per chunk, same cost as the intersect loop's
    attr pick. prim_g f32 [1,128] (-1 = miss) -> [AT_ROWS,128]."""
    acc = jnp.zeros((attr_ref.shape[0], 128), jnp.float32)
    for c in range(n_chunks):
        iota = jax.lax.broadcasted_iota(jnp.int32, (tc, 128), 0)
        rel = prim_g - float(c * tc)
        sel = ((iota.astype(jnp.float32) == rel)
               & (rel >= 0.0) & (rel < float(tc))).astype(jnp.float32)
        acc = acc + _mm(attr_ref[:, c * tc:(c + 1) * tc], sel)
    return acc


def _bounce_kernel(*refs,
                   cfg_key, tc, n_chunks, n_lights, tr, first_emissive,
                   has_env, has_tex, tex_maps, final_env=False,
                   inject=False, omm=False, prio=False, maxb=None,
                   first_direct=True):
    (nee_mode, enable_mis, firefly, rr_enable, min_rr, max_travel,
     low_discrepancy, energy_comp, noprune, split_ch) = cfg_key
    f32 = jnp.float32
    split_ch_k = cfg_key[9]
    it = iter(refs)
    scal_ref = next(it)
    fs_ref = next(it)
    is_ref = next(it)
    fs2_ref = next(it) if split_ch_k else None
    inj_ref = next(it) if inject else None
    tri_ref = next(it)
    attr_ref = next(it)
    mat_ref = next(it)
    light_ref = next(it)
    env_ref = next(it) if has_env else None
    tex_ct_ref = next(it) if has_tex else None
    tex_meta_ref = next(it) if has_tex else None
    fs_out = next(it)
    is_out = next(it)
    hit_out = next(it)
    ext_nee = cfg_key[0] in (3, 4, 5) and n_lights > 0 and not final_env
    surf_out = next(it) if ext_nee else None
    fs2_out = next(it) if split_ch_k else None
    sample_idx = scal_ref[0, 0]
    bounce = scal_ref[0, 1].astype(jnp.int32)

    fs = fs_ref[:]
    is_ = is_ref[:]
    fs2 = fs2_ref[:] if split_ch_k else None
    o = fs[FS_O:FS_O + 3]
    d = fs[FS_D:FS_D + 3]

    # ----- closest hit (per 128-ray group) -----
    if inject:
        # V-buffer restart (FirstHitFromVBuffer, PathTracerSample.hlsl:
        # 34-94): bounce 0's traversal was prepaid by the BUILD pass —
        # take (t, prim, u, v, front) from the injected rows and fetch
        # winner attributes by one-hot matmul.
        inj = inj_ref[:]
        prim_f = inj[1]
        miss_i = prim_f < 0.0
        t = jnp.where(miss_i, _BIG, inj[0])
        bu = inj[2]
        bv = inj[3]
        det_pick = jnp.where(inj[4] > 0.5, 1.0, -1.0)
        attrs_g = [_attrs_from_prim(attr_ref, prim_f[g:g + 1], tc,
                                    n_chunks) for g in range(_R)]
        # injected V-buffer hits were alpha-resolved by the BUILD pass
        unk = jnp.zeros_like(t)
    else:
        tmin = jnp.zeros((1, 128), f32)
        ts, prims, us, vs, dets, unks = [], [], [], [], [], []
        attrs_g = []
        for g in range(_R):
            cols = _ray_cols(o, d, g)
            tmax_g = jnp.full((1, 128), max_travel, f32)
            t_g, p_g, u_g, v_g, det_g, attr_g, unk_g = _intersect_group(
                tri_ref, attr_ref, cols, tmin, tmax_g, tc, n_chunks,
                omm=omm)
            ts.append(t_g); prims.append(p_g); us.append(u_g)
            vs.append(v_g); dets.append(det_g); attrs_g.append(attr_g)
            unks.append(unk_g)
        t = _stack_groups(ts)
        prim_f = _stack_groups(prims)
        bu = _stack_groups(us)
        bv = _stack_groups(vs)
        det_pick = _stack_groups(dets)
        unk = _stack_groups(unks)

    def attr(i, k=1):
        if k == 1:
            return _stack_groups([a[i:i + 1] for a in attrs_g])
        return jnp.stack(
            [_stack_groups([a[i + j:i + j + 1] for a in attrs_g])
             for j in range(k)], axis=0)

    hit = t < _BIG
    front = det_pick > 0.0

    if final_env:
        # Final wavefront iteration (bounce == max_bounces): the XLA loop
        # runs one extra round that ONLY adds env radiance for escaping
        # rays (integrator.py: break after HandleMiss) — mirror it with
        # an intersect+env-only pass.
        (nee_mode_, enable_mis_, *_rest) = cfg_key
        use_nee_ = nee_mode_ in (1, 2, 4, 5) and n_lights > 0
        active_in = is_[IS_ACTIVE] > 0
        prev_delta_in = is_[IS_PREVDELTA] > 0
        miss_mask = active_in & ~hit
        L = fs[FS_L:FS_L + 3]
        env_L, p_env = _env_eval_pdf(
            env_ref, d, nee_mode_ == 1, n_lights,
            with_pdf=use_nee_ and bool(enable_mis_))
        if use_nee_ and enable_mis_:
            w_env = jnp.where(prev_delta_in, 1.0,
                              W.power_heuristic(fs[FS_PREVPDF], p_env))
        else:
            w_env = jnp.ones_like(t)
        c_env = jnp.where(miss_mask, fs[FS_THP:FS_THP + 3] * env_L * w_env,
                          0.0)
        L = L + c_env
        fs_out[:] = jnp.concatenate([fs[:FS_L], L, fs[FS_L + 3:]], axis=0)
        is_out[:] = jnp.concatenate(
            [jnp.zeros((1, _R, 128), jnp.int32), is_[1:]], axis=0)
        hit_out[:] = jnp.stack(
            [jnp.where(hit, t, 0.0), prim_f, bu, bv,
             front.astype(f32), jnp.zeros_like(t)], axis=0)
        if split_ch_k:
            cd = jnp.where(fs2[6:7] > 0.5, 0.0, c_env)
            fs2_out[:] = jnp.concatenate(
                [fs2[0:3] + cd, fs2[3:6] + (c_env - cd), fs2[6:7]], axis=0)
        return

    s = surface_and_shade(
        o=o, d=d, t=t, hit=hit, front=front, bu=bu, bv=bv, attr=attr,
        thp=fs[FS_THP:FS_THP + 3], L=fs[FS_L:FS_L + 3],
        prev_pdf=fs[FS_PREVPDF], active=is_[IS_ACTIVE] > 0,
        prev_delta=is_[IS_PREVDELTA] > 0,
        med0=is_[IS_MED0], med1=is_[IS_MED1],
        px=is_[IS_PX], py=is_[IS_PY], sample_idx=sample_idx, bounce=bounce,
        mat_ref=mat_ref, light_ref=light_ref, cfg_key=cfg_key,
        n_lights=n_lights, first_emissive=first_emissive,
        env_ref=env_ref,
        tex_refs=((tex_ct_ref, tex_meta_ref, tr) if has_tex else None),
        tex_maps=tex_maps,
        cone=fs[FS_CONE], spread=fs[FS_SPREAD],
        budget=is_[IS_BUDGET],
        ld=(fs2[0:3] if split_ch_k else None),
        ls=(fs2[3:6] if split_ch_k else None),
        fspec=(fs2[6] if split_ch_k else None),
        lbounce=is_[IS_LBOUNCE], maxb=maxb,
        omm_unknown=(unk if omm else None), prio=prio,
        first_direct=first_direct)

    # ----- NEE shadow occlusion (in-kernel second matmul pass) -----
    L = s["L"]
    do_nee = s["do_nee"]
    ld_k = s["ld"]
    ls_k = s["ls"]
    if not ext_nee:
        occs = []
        for g in range(_R):
            cols = _ray_cols(s["shadow_o"], s["shadow_d"], g)
            occs.append(_occluded_group(
                tri_ref, cols, s["sdist"][g:g + 1], tc, n_chunks, omm=omm,
                u_alpha=(s["u_alpha"][g:g + 1] if omm else None)))
        occluded = _stack_groups(occs) > 0.5
        ok_nee = do_nee & ~occluded
        L = L + jnp.where(ok_nee, s["contrib"], 0.0)
        if split_ch_k:
            cd = jnp.where(ok_nee, s["cdiff"], 0.0)
            ld_k = ld_k + cd
            ls_k = ls_k + jnp.where(ok_nee, s["contrib"], 0.0) - cd

    fs_out[:] = jnp.concatenate(
        [s["o_new"], s["wi_world"], s["thp"], L, s["prev_pdf"][None],
         s["cone"][None], s["spread"][None]],
        axis=0)
    is_out[:] = jnp.stack(
        [s["active"].astype(jnp.int32), s["prev_delta"].astype(jnp.int32),
         s["med0"], s["med1"], is_[IS_PX], is_[IS_PY],
         is_[IS_BUDGET], s["lbounce"]], axis=0)
    # flag row: 0 = none; 1 = shaded at lb==0; 2 = shaded at lb>0
    # (ext-NEE consumes it; the in-kernel NEE path reads do_nee)
    if ext_nee:
        flag = s["shaded"].astype(f32) \
            * (1.0 + (is_[IS_LBOUNCE] > 0).astype(f32))
    else:
        flag = do_nee.astype(f32)
    hit_out[:] = jnp.stack(
        [jnp.where(hit, t, 0.0), prim_f, bu, bv,
         front.astype(f32), flag], axis=0)
    if ext_nee:
        surf_out[:] = s["surf"]
    if split_ch_k:
        fs2_out[:] = jnp.concatenate(
            [ld_k, ls_k, s["fspec"][None]], axis=0)


def _shadow_kernel(sh_ref, tri_ref, occ_out, *, tc, n_chunks, omm=False):
    """Occlusion-only pass for XLA-built shadow requests (external NEE).
    sh rows follow bounce_clustered.SH_* (o 0:3, d 3:6, dist 6, do 10;
    row 7 carries the per-ray stochastic-alpha uniform when omm)."""
    sh = sh_ref[:]
    occs = []
    for g in range(_R):
        cols = _ray_cols(sh[0:3], sh[3:6], g)
        occs.append(_occluded_group(
            tri_ref, cols, sh[6][g:g + 1], tc, n_chunks, omm=omm,
            u_alpha=(sh[7][g:g + 1] if omm else None)))
    occ = _stack_groups(occs)
    occ_out[:] = jnp.where(sh[10] > 0.5, occ, 1.0)


@functools.partial(jax.jit,
                   static_argnames=("tc", "n_chunks", "interpret", "omm"))
def shadow_occlusion_call(sh, tri_rows, tc, n_chunks, interpret=False,
                          omm=False):
    """sh [11, nrows, 128] -> occ [nrows, 128] (1 = occluded/no-request)."""
    nrows = sh.shape[1]
    grid = nrows // _R
    kern = functools.partial(_shadow_kernel, tc=tc, n_chunks=n_chunks,
                             omm=omm)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((sh.shape[0], _R, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tri_rows.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_R, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows, 128), jnp.float32),
        interpret=interpret,
    )(sh, tri_rows)


# ---------------------------------------------------------------------------
# Host-side driver
# ---------------------------------------------------------------------------


def _interpret(cfg=None) -> bool:
    """Interpret-mode resolution. Prefer the concrete cfg.pallas_interpret
    (set by pt/dispatch.resolve outside jit); env/backend reads remain
    only as an eager-caller fallback."""
    if cfg is not None and cfg.pallas_interpret is not None:
        return bool(cfg.pallas_interpret)
    if os.environ.get("RTXPT_TPU_PALLAS_INTERPRET") == "1":
        return True
    try:
        return jax.default_backend() in ("cpu",)
    except Exception:
        return True


@functools.partial(
    jax.jit,
    static_argnames=("cfg_key", "tc", "n_chunks", "n_lights", "tr",
                     "first_emissive", "tex_maps", "final_env",
                     "interpret", "omm", "prio", "maxb", "first_direct"))
def _bounce_call(scal, fs, is_, tri_rows, attr_rows, mat_rows, light_rows,
                 env_rows, tex_ct, tex_meta,
                 cfg_key, tc, n_chunks, n_lights, tr, first_emissive,
                 tex_maps=(1, 0, 0, 0), final_env=False, interpret=False,
                 inj=None, fs2=None, omm=False, prio=False, maxb=None,
                 first_direct=True):
    nrows = fs.shape[1]
    grid = nrows // _R
    has_env = env_rows is not None
    has_tex = tex_ct is not None
    inject = inj is not None
    split_ch = bool(cfg_key[9])
    assert (fs2 is not None) == split_ch
    kern = functools.partial(
        _bounce_kernel, cfg_key=cfg_key, tc=tc, n_chunks=n_chunks,
        n_lights=n_lights, tr=tr, first_emissive=first_emissive,
        omm=omm, prio=prio, maxb=maxb, first_direct=first_direct,
        has_env=has_env, has_tex=has_tex, tex_maps=tex_maps,
        final_env=final_env, inject=inject)
    const = lambda b: (0, 0)
    in_specs = [
        pl.BlockSpec((1, 2), const, memory_space=pltpu.SMEM),
        pl.BlockSpec((NF, _R, 128), lambda b: (0, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NI, _R, 128), lambda b: (0, b, 0),
                     memory_space=pltpu.VMEM),
    ]
    if split_ch:
        in_specs.append(pl.BlockSpec((7, _R, 128), lambda b: (0, b, 0),
                                     memory_space=pltpu.VMEM))
    if inject:
        in_specs.append(pl.BlockSpec((5, _R, 128), lambda b: (0, b, 0),
                                     memory_space=pltpu.VMEM))
    in_specs += [
        pl.BlockSpec(tri_rows.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec(attr_rows.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec(mat_rows.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec(light_rows.shape, const, memory_space=pltpu.VMEM),
    ]
    inputs = [scal, fs, is_] + ([fs2] if split_ch else []) \
        + ([inj] if inject else []) \
        + [tri_rows, attr_rows, mat_rows, light_rows]
    if has_env:
        in_specs.append(pl.BlockSpec(env_rows.shape, const,
                                     memory_space=pltpu.VMEM))
        inputs.append(env_rows)
    if has_tex:
        in_specs.append(pl.BlockSpec(tex_ct.shape, const,
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(tex_meta.shape, const,
                                     memory_space=pltpu.VMEM))
        inputs.extend([tex_ct, tex_meta])
    out_specs = [
        pl.BlockSpec((NF, _R, 128), lambda b: (0, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NI, _R, 128), lambda b: (0, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((6, _R, 128), lambda b: (0, b, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((NF, nrows, 128), jnp.float32),
        jax.ShapeDtypeStruct((NI, nrows, 128), jnp.int32),
        jax.ShapeDtypeStruct((6, nrows, 128), jnp.float32),
    ]
    ext_nee = cfg_key[0] in (3, 4, 5) and n_lights > 0 and not final_env
    if ext_nee:
        out_specs.append(pl.BlockSpec((SF_ROWS, _R, 128),
                                      lambda b: (0, b, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((SF_ROWS, nrows, 128), jnp.float32))
    if split_ch:
        out_specs.append(pl.BlockSpec((7, _R, 128), lambda b: (0, b, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((7, nrows, 128), jnp.float32))
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*inputs)
    out = list(out)
    fs_o, is_o, hit_o = out[0], out[1], out[2]
    k = 3
    surf_o = None
    if ext_nee:
        surf_o = out[k]
        k += 1
    fs2_o = out[k] if split_ch else None
    return fs_o, is_o, hit_o, surf_o, fs2_o


def _cfg_key(cfg):
    """Static kernel-permutation key. Every flag that changes the traced
    kernel body MUST ride here (it is a static jit argname of
    _bounce_call) — never read env/process state inside the kernel.

    nee slot: 0 off | 1 uniform | 2 power (in-kernel) | 3 NEE-AT |
    4 uniform-external | 5 power-external (pt/nee_external.py)."""
    mode = int(cfg.nee.value)
    if getattr(cfg, "nee_external", False) and mode in (1, 2):
        mode += 3
    return (mode, bool(cfg.enable_mis),
            float(cfg.firefly_clamp), bool(cfg.enable_russian_roulette),
            int(cfg.min_bounces_before_rr), float(cfg.max_ray_travel),
            bool(cfg.low_discrepancy), bool(cfg.kernel_energy_comp),
            bool(cfg.cluster_noprune), bool(cfg.split_channels))


def eligible(scene, cfg, neeat_state) -> bool:
    """Back-compat structural eligibility (see pt/dispatch.py — tier
    resolution now happens there, outside jit)."""
    from rtxpt_tpu.pt.dispatch import fused_structural_ok
    return fused_structural_ok(scene, cfg, neeat_state)


def trace_paths_pallas(scene, cfg, o, d, cone_spread, px, py, sample_idx,
                       want_aux: bool = False, first_emissive: bool = True,
                       first_hit=None, bounce_budget=None,
                       neeat_state=None, first_direct: bool = True):
    """Fused-kernel wavefront: same contract as integrator.trace_paths.

    `first_hit` (accel Hit): V-buffer restart — bounce 0 skips the
    in-kernel intersect loop and shades the injected hit (stable-planes
    FILL; FirstHitFromVBuffer, PathTracerSample.hlsl:34-94).
    `bounce_budget` [N] i32: per-lane remaining bounces (see
    integrator.trace_paths). `neeat_state`: NEE-AT tile state — routes
    NEE through the external XLA block (pt/nee_external.py)."""
    tbl: BounceTables = scene.bounce_tables
    n = o.shape[0]
    f32 = jnp.float32
    lanes = _R * 128
    npad = _round_up(max(n, lanes), lanes)
    nrows = npad // 128

    def pad1(x, fill=0.0):
        if npad == n:
            return x
        return jnp.concatenate(
            [x, jnp.full((npad - n, *x.shape[1:]), fill, x.dtype)])

    def rows3(x, fill=0.0):
        """[N,3] -> [3, nrows, 128]."""
        return pad1(x, fill).T.reshape(3, nrows, 128)

    def rows1(x, fill=0.0):
        return pad1(x, fill).reshape(nrows, 128)

    fs = jnp.concatenate([
        rows3(o), rows3(d, 1.0),
        jnp.ones((3, nrows, 128), f32),          # thp
        jnp.zeros((3, nrows, 128), f32),         # L
        jnp.zeros((1, nrows, 128), f32),         # prev_pdf
        jnp.zeros((1, nrows, 128), f32),         # cone width
        rows1(cone_spread)[None],                # cone spread
    ], axis=0)
    ones_mask = pad1(jnp.ones((n,), jnp.int32)).reshape(1, nrows, 128)
    if bounce_budget is None:
        budget_rows = jnp.full((1, nrows, 128), _NO_BUDGET, jnp.int32)
    else:
        budget_rows = rows1(jnp.asarray(bounce_budget,
                                        jnp.int32))[None]
    is_ = jnp.concatenate([
        ones_mask,                                # active (pad lanes off)
        jnp.ones((1, nrows, 128), jnp.int32),     # prev_delta (camera)
        jnp.full((2, nrows, 128), -1, jnp.int32),  # med0, med1
        rows1(px).astype(jnp.int32)[None],
        rows1(py).astype(jnp.int32)[None],
        budget_rows,
        jnp.zeros((1, nrows, 128), jnp.int32),    # logical bounce
    ], axis=0)

    inj0 = None
    if first_hit is not None:
        # pack (t, prim, u, v, front) as [5, nrows, 128]; pad lanes miss
        inj0 = jnp.stack([
            rows1(first_hit.t.astype(f32)),
            rows1(first_hit.prim.astype(f32), fill=-1.0),
            rows1(first_hit.bary[:, 0].astype(f32)),
            rows1(first_hit.bary[:, 1].astype(f32)),
            rows1(first_hit.front.astype(f32)),
        ], axis=0)

    sample_idx = jnp.asarray(sample_idx).astype(jnp.uint32)
    key = _cfg_key(cfg)
    interp = _interpret(cfg)
    use_tex = tbl.tex_ct is not None and \
        bool(cfg.stochastic_texture_filtering)
    tex_maps = tbl.tex_maps if use_tex else (1, 0, 0, 0)
    ext_nee = key[0] in (3, 4, 5) and tbl.n_lights > 0
    split_ch = bool(key[9])
    fs2 = jnp.zeros((7, nrows, 128), f32) if split_ch else None
    neeat_hist = None
    if ext_nee:
        from rtxpt_tpu.lighting import neeat as na
        from rtxpt_tpu.pt.nee_external import external_nee
        if key[0] == 3 and neeat_state is not None:
            neeat_hist = na.zero_hist(neeat_state)

    ray_count = jnp.zeros((), jnp.int32)
    occupancy = []
    hit0 = None
    # pass-through iterations (alpha-reject / priority false hits) do not
    # advance the logical bounce — run extra iterations so rejected lanes
    # still reach their full depth (XLA analog: MAX_ALPHA_RETRACE /
    # MAX_FALSE_HIT_SKIPS bounded retrace per bounce)
    extra = int(getattr(cfg, "passthrough_extra_iters", 2)) \
        if (tbl.omm or tbl.prio) else 0
    for bounce in range(cfg.max_bounces + extra):
        active_in = is_[IS_ACTIVE]
        occupancy.append(jnp.sum(active_in))
        scal = jnp.stack(
            [sample_idx, jnp.uint32(bounce)]).reshape(1, 2)
        d_in = fs[FS_D:FS_D + 3]
        prev_pdf_in = fs[FS_PREVPDF]
        prev_delta_in = is_[IS_PREVDELTA]
        lb_in = is_[IS_LBOUNCE]
        fs, is_, hit, surf, fs2 = _bounce_call(
            scal, fs, is_, tbl.tri_rows, tbl.attr_rows, tbl.mat_rows,
            tbl.light_rows, tbl.env_rows,
            tbl.tex_ct if use_tex else None,
            tbl.tex_meta if use_tex else None,
            key, tbl.tc, tbl.n_chunks, tbl.n_lights, tbl.tr,
            first_emissive, tex_maps=tex_maps, interpret=interp,
            inj=inj0 if bounce == 0 else None, fs2=fs2,
            omm=tbl.omm, prio=tbl.prio, maxb=cfg.max_bounces,
            first_direct=first_direct)
        if ext_nee:
            # hit[5]: 0 = not shaded, 1 = shaded at lb==0, 2 = at lb>0
            hitm = (hit[5] > 0.5).reshape(npad)
            lb0 = (hit[5] < 1.5).reshape(npad)
            res = external_nee(
                scene, cfg, neeat_state, surf.reshape(SF_ROWS, npad),
                d_in.reshape(3, npad), hitm,
                prev_pdf_in.reshape(npad),
                prev_delta_in.reshape(npad) > 0,
                is_[IS_PX].reshape(npad), is_[IS_PY].reshape(npad),
                sample_idx, bounce, first_emissive,
                first_spec=(fs2[6].reshape(npad) > 0.5 if split_ch
                            else None),
                lb=(lb_in.reshape(npad) if (tbl.omm or tbl.prio)
                    else None),
                first_direct=first_direct)
            if tbl.omm:
                seed_sa = rng.pixel_seed(
                    is_[IS_PX].reshape(npad), is_[IS_PY].reshape(npad),
                    lb_in.reshape(npad), EFFECT_ALPHA)
                if cfg.low_discrepancy:
                    (ua,) = rng.ld_samples(sample_idx, seed_sa, (0,))
                else:
                    ua = rng.uniform_sample(
                        seed_sa, rng.hash_combine(sample_idx,
                                                  jnp.uint32(0)))
                ua_row = ua.reshape(1, npad)
            else:
                ua_row = jnp.zeros((1, npad), jnp.float32)
            sh_rows = jnp.concatenate([
                res["shadow_o"].T, res["shadow_d"].T,
                res["sdist"][None],
                ua_row, jnp.zeros((2, npad), jnp.float32),
                res["do_nee"].astype(jnp.float32)[None],
            ], axis=0).reshape(11, nrows, 128)
            occ = shadow_occlusion_call(sh_rows, tbl.tri_rows, tbl.tc,
                                        tbl.n_chunks, interpret=interp,
                                        omm=tbl.omm)
            ok = res["do_nee"] & (occ.reshape(npad) < 0.5)
            add = res["em_add"] + jnp.where(ok[:, None],
                                            res["contrib"], 0.0)
            L = fs[FS_L:FS_L + 3] + add.T.reshape(3, nrows, 128)
            fs = jnp.concatenate([fs[:FS_L], L, fs[FS_L + 3:]], axis=0)
            if split_ch:
                # NEE + deferred-emissive split (the kernel handled only
                # env/em for modes != 3; mode 3 em rides em_add here)
                fspec_f = fs2[6].reshape(npad) > 0.5
                em_s = res["em_add"] if key[0] == 3 \
                    else jnp.zeros((npad, 3), f32)
                em_s = jnp.where(lb0[:, None], jnp.zeros_like(em_s),
                                 em_s)     # primary emission excluded
                nee_s = jnp.where(ok[:, None], res["contrib"], 0.0)
                cd = jnp.where(ok[:, None], res["cdiff"], 0.0) \
                    + jnp.where(fspec_f[:, None], 0.0, em_s)
                tot = nee_s + em_s
                ld2 = fs2[0:3] + cd.T.reshape(3, nrows, 128)
                ls2 = fs2[3:6] + (tot - cd).T.reshape(3, nrows, 128)
                fs2 = jnp.concatenate([ld2, ls2, fs2[6:7]], axis=0)
            ray_count = ray_count + jnp.sum(res["do_nee"].astype(
                jnp.int32))
            if neeat_hist is not None:
                neeat_hist = na.accumulate_feedback(
                    neeat_state, neeat_hist, res["tile"], res["li"],
                    jnp.maximum(res["contrib"][:, 0] * 0.2126
                                + res["contrib"][:, 1] * 0.7152
                                + res["contrib"][:, 2] * 0.0722, 0.0),
                    ok)
        ray_count = ray_count + jnp.sum(active_in) \
            + (0 if ext_nee else jnp.sum((hit[5] > 0.5).astype(jnp.int32)))
        if bounce == 0:
            hit0 = hit
    if tbl.env_rows is not None:
        # final env-only round (see _bounce_kernel final_env)
        active_in = is_[IS_ACTIVE]
        scal = jnp.stack(
            [sample_idx, jnp.uint32(cfg.max_bounces)]).reshape(1, 2)
        fs, is_, _hitf, _surf, fs2 = _bounce_call(
            scal, fs, is_, tbl.tri_rows, tbl.attr_rows, tbl.mat_rows,
            tbl.light_rows, tbl.env_rows, None, None,
            key, tbl.tc, tbl.n_chunks, tbl.n_lights, tbl.tr,
            first_emissive, final_env=True, interpret=interp, fs2=fs2)
        ray_count = ray_count + jnp.sum(active_in)
    occupancy.append(jnp.sum(is_[IS_ACTIVE]))

    L = fs[FS_L:FS_L + 3].reshape(3, npad).T[:n]
    out = dict(L=L, ray_count=ray_count, occupancy=jnp.stack(occupancy))
    if split_ch:
        out["L_diff"] = fs2[0:3].reshape(3, npad).T[:n]
        out["L_spec"] = fs2[3:6].reshape(3, npad).T[:n]
    if neeat_hist is not None:
        out["neeat_hist"] = neeat_hist

    if want_aux:
        from rtxpt_tpu.accel.traverse import Hit
        from rtxpt_tpu.pt.surface import load_surface
        t0 = hit0[0].reshape(npad)[:n]
        prim0 = hit0[1].reshape(npad)[:n].astype(jnp.int32)
        uv0 = jnp.stack([hit0[2].reshape(npad)[:n],
                         hit0[3].reshape(npad)[:n]], axis=-1)
        front0 = hit0[4].reshape(npad)[:n] > 0.5
        hit_s = Hit(t=jnp.where(prim0 >= 0, t0, cfg.max_ray_travel),
                    prim=prim0, bary=uv0, front=front0)
        hm = prim0 >= 0
        surf = load_surface(scene, hit_s, o, d,
                            cone_spread * jnp.maximum(t0, 0.0))
        alb = surf.bsdf.diffuse + surf.bsdf.specular_f0
        out["albedo"] = jnp.where(hm[..., None], alb, 1.0)
        if split_ch:
            out["albedo_diff"] = jnp.where(
                hm[..., None], surf.bsdf.diffuse, 1.0)
            out["albedo_spec"] = jnp.where(
                hm[..., None], surf.bsdf.specular_f0 + 0.04, 1.0)
        out["normal"] = jnp.where(hm[..., None], surf.sh_n, 0.0)
        out["depth"] = jnp.where(hm, t0, 0.0)
        out["wpos"] = jnp.where(hm[..., None], surf.pos, 0.0)
        out["emission"] = jnp.where(hm[..., None], surf.emissive, 0.0)
    return out
