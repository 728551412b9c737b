"""Two-level clustered acceleration structure for large scenes (host build).

The TPU-native replacement for DXR TLAS/BLAS traversal at Bistro scale
(reference: Rtxpt/Shaders/PathTracerBridgeDonut.hlsli:996 traceScatterRay /
:1034 traceVisibilityRay behind a hardware BVH). Instead of a per-ray
pointer-chasing tree — hostile to the TPU's dense-tile execution model —
the scene becomes a flat array of Morton-ordered triangle *clusters*:

  * triangles are sorted by the Morton code of their centroid (done in
    prepare(); all per-triangle arrays share the permutation), then cut
    into variable-length contiguous clusters of <= CT=128 triangles at
    the subtree boundaries of the implicit Karras radix tree
    (radix_cut_offsets) — geometry-respecting treelets whose AABBs are
    ~2.6x tighter (total surface area) than fixed CT runs;
  * each cluster gets an AABB (culled against per-ray-group conservative
    frustums in accel/cull.py, pure XLA) and one 64 KB operand block that
    the bounce kernel DMAs from HBM on demand (pt/bounce_clustered.py);
  * within a visited cluster, intersection is the matmul-factored
    Möller-Trumbore of accel/brute.py: ONE [16,4*CT] x [16,128] MXU pass
    per 128-ray row yields det|u|v|t for all (ray, triangle) pairs.

Numerical design: the matmul runs at DEFAULT (bf16-pass) precision for
speed — 3.3x faster than HIGHEST on v5e — which is only safe because all
positional coefficients are built in CLUSTER-LOCAL coordinates (origin at
the cluster AABB center), so rounding error scales with the cluster
extent, not the scene extent. The bf16 pass only *selects* the winning
triangle (with conservative edge margins); the kernel then re-derives
exact t/u/v/normal per ray from the winner's f32 v0/e1/e2 rows carried in
the same block ("exact refit" — see bounce_clustered._refit_row).

Even in cluster-local coordinates a single bf16 pass is not enough: the
coefficient products are O(cluster extent) but cancel to O(triangle
extent), amplifying bf16's 2^-8 rounding into percent-level u/v error
(verified on TPU: ~4% of primary hits lost). The fix is a SPLIT-bf16
matmul at zero extra MXU cost: every coefficient c is stored as
c_hi + c_lo (bf16 hi word + bf16-rounded residual) and the kernel stacks
the K=32 contraction [c_hi; c_hi; c_lo] x [r_hi; r_lo; r_hi] — still one
MXU pass (K=32 <= 128), but the three partial products accumulate in f32,
leaving ~2^-17 relative error (the dropped c_lo*r_lo term is ~2^-18).

Cluster block layout [BLK_ROWS=32, 4*CT=512] f32 (one DMA per visit):
  rows 0..9   coefficient HI rows k (bf16-exact): lane q*CT+j holds
              coefficient k of quantity q in (det,u,v,t) for triangle j;
              the ray operand is [d | o'xd | o' | 1] with o' = o - center
  rows 10..19 coefficient LO rows (bf16(c - c_hi))
  row 20      cluster center broadcast: lanes [0:CT)=cx [CT:2CT)=cy
              [2CT:3CT)=cz
  rows 21..28 packed attributes: logical attr row i lives at
              [21 + i//4, (i%4)*CT : (i%4+1)*CT]
  rows 29..31 zero pad

Logical attribute rows (AT_* constants below; positions cluster-local).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

# Cluster size (triangles per cluster). Larger clusters would mean fewer
# DMAs/visits per ray, BUT the split-bf16 selection error grows with the
# cluster extent (coefficient products ~extent^2 vs det ~tri area): at
# CT=256 on the 340k city the 2^-16 residual crosses the 2e-3*|det|
# admission margin, false winners shadow true hits and the refit rejects
# them (hit frac 1.0 -> 0.13). CT=128 is the calibrated operating point;
# raising CT requires error-bound margins (|c| @ |r| matmul) first.
import os as _os

CT = int(_os.environ.get("RTXPT_TPU_CLUSTER_CT", "128"))
BLK_ROWS = 32
CENTER_ROW = 20
ATTR_BASE = 21
LANES = 4 * CT
# HBM block-budget cap (~512MB of cluster blocks -> ~1M triangles)
MAX_CLUSTERS = (1 << 29) // (BLK_ROWS * LANES * 4)

# Logical attribute-row map (packed 4-per-physical-row at rows 17..24)
AT_V0 = 0                # 0:3  v0 (cluster-local)
AT_E1 = 3                # 3:6
AT_E2 = 6                # 6:9
AT_GN = 9                # 9:12 unit geometric normal
AT_N0 = 12               # 12:15 shading normal v0
AT_N1 = 15
AT_N2 = 18
AT_MID = 21              # material id
AT_LPDF = 22             # baked light-selection pdf of this tri's light
AT_LAREA = 23            # light area
AT_ISLIGHT = 24
AT_GIDX = 25             # global (prepared-order) triangle index
AT_VALID = 26            # 1 for real triangles, 0 for padding
AT_UV0 = 27              # 27:29 texture uv at v0
AT_UV1 = 29
AT_UV2 = 31
AT_LODB = 33             # -0.5*log2(tri_area2): ray-cone LOD bias
AT_LID = 34              # light id of this tri's light (-1 = not a light)
AT_TANG = 35             # 35:38 UV tangent premultiplied by 1/det_uv
AT_TSGN = 38             # sign(det_uv); 0 = degenerate UV mapping
AT_ROWS = 39

# Opacity-micromap scenes widen the blocks to 7 quantity slots
# (det,u,v,t,mm_lo,mm_hi,cov): the micromap word rides the intersection
# matmul itself — its "coefficient" sits in the constant-1 operand slot,
# so the [CT]-per-tri values arrive transposed to sublanes for free.
# The word halves are 16-bit INTEGERS, for which the generic bf16 split
# is exact (hi lands on the bf16 grid; the residual is an integer <=
# half-ulp <= 2^8, itself bf16-exact), so the r_hi=1/r_lo=0 contraction
# recovers them EXACTLY in the f32 accumulator. Coverage must ride its
# OWN slot: packing it into a word half's fraction needs ~17 significand
# bits across the split and corrupts the integer by +-1 (flipped
# micromap bits — measured as a 29% darkening on the curtain test).
# Non-OMM scenes keep the 4-slot layout (less DMA).
OMM_SLOTS = 7


@struct.dataclass
class ClusterTables:
    """Device tables for the clustered bounce kernels."""

    blocks: jnp.ndarray     # [C, BLK_ROWS, LANES] f32
    aabb_lo: jnp.ndarray    # [C, 3] f32
    aabb_hi: jnp.ndarray    # [C, 3] f32
    mat_rows: jnp.ndarray   # [MT_ROWS, 128]
    light_rows: jnp.ndarray  # [LROWS, 128]
    env_rows: Optional[jnp.ndarray] = None   # [EV_ROWS, 128]
    offsets: Optional[jnp.ndarray] = None  # [C+1] i32 tri range per cluster
    tex_ct: Optional[jnp.ndarray] = None     # [4*128, TR]
    tex_meta: Optional[jnp.ndarray] = None   # [TXM_ROWS, 128]
    n_clusters: int = struct.field(pytree_node=False, default=0)
    n_tris: int = struct.field(pytree_node=False, default=0)
    n_lights: int = struct.field(pytree_node=False, default=0)
    tr: int = struct.field(pytree_node=False, default=0)
    tex_maps: tuple = struct.field(pytree_node=False, default=(1, 0, 0, 0))
    # static: blocks carry micromap quantity slots (OMM_SLOTS lanes) and
    # the kernels resolve alpha/OMM inside traversal (scene/omm.py bake;
    # reference: OmmBuildQueue.h OMM-in-traversal for foliage)
    omm: bool = struct.field(pytree_node=False, default=False)
    # ---- instanced tier (build_cluster_tables_instanced) ----------------
    # Blocks are per-PROTOTYPE in object space (BLAS-reuse memory model,
    # Sample.cpp:1088-1242); the cull runs over the expanded
    # (instance x prototype-cluster) WORLD candidate list:
    #   aabb_lo/hi [Cw,3]  world AABBs of each (instance, cluster) pair
    #   wc_block   [Cw]    pool block id the candidate streams
    #   wc_inst    [Cw]    instance id (indexes xf / inst_post)
    #   xf         [I,16,128] per-instance ray-operand transform tile,
    #              DMA'd per visit: X[i,j] = M10[j,i] where M10 is the
    #              10x10 linear map (world [d, oxd, o, 1] -> object) —
    #              cross products transform as (Ax)x(Ay) = det(A)A^-T(xy)
    #   inst_post  [I,19]  o2w linear (9) | normal matrix (9) | LOD bias
    #              offset (1) for the XLA attr post-transform
    instanced: bool = struct.field(pytree_node=False, default=False)
    wc_block: Optional[jnp.ndarray] = None
    wc_inst: Optional[jnp.ndarray] = None
    xf: Optional[jnp.ndarray] = None
    inst_post: Optional[jnp.ndarray] = None

    @property
    def tex_rows(self):
        """Non-None when the in-kernel texture path is available
        (pt/dispatch.py structural eligibility)."""
        return self.tex_ct


def bf16_round(x: np.ndarray) -> np.ndarray:
    """Round-to-nearest-even f32 -> bf16 -> f32 (numpy emulation)."""
    u = np.ascontiguousarray(x, np.float32).view(np.uint32)
    rounded = (u + 0x7FFF + ((u >> 16) & 1)) & 0xFFFF0000
    return rounded.astype(np.uint32).view(np.float32)


def morton_codes(x: np.ndarray) -> np.ndarray:
    """30-bit Morton codes for points x [N,3] (10 bits/axis)."""
    lo = x.min(0)
    ext = np.maximum(x.max(0) - lo, 1e-12)
    q = np.clip(((x - lo) / ext) * 1023.0, 0, 1023).astype(np.uint32)

    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])


def morton_permutation(positions: np.ndarray, indices: np.ndarray
                       ) -> np.ndarray:
    """Triangle permutation sorting centroids along the Morton curve."""
    v0 = positions[indices[:, 0]]
    v1 = positions[indices[:, 1]]
    v2 = positions[indices[:, 2]]
    cen = (v0 + v1 + v2) / 3.0
    return np.argsort(morton_codes(cen), kind="stable").astype(np.int64)


def radix_cut_offsets(codes: np.ndarray, max_size: int) -> np.ndarray:
    """Cut the implicit Karras radix tree over SORTED Morton codes into
    maximal subtrees of <= max_size leaves; returns [K+1] range offsets.

    Fixed-length CT runs straddle geometric boundaries (the tail of one
    building fused with the next street), producing elongated AABBs; a
    radix-tree cut respects the spatial hierarchy implied by the codes —
    on the 340k-tri city it cuts total cluster surface area 2.6x and the
    cull's mean candidates/group 34.9 -> 17.9 (scripts/
    exp_treelet_clusters.py). Subtrees of a radix tree are contiguous
    ranges, so the block machinery is unchanged. The reference leans on
    the driver's BVH builder for the same locality (DXR BLAS build,
    Sample.cpp:1088-1242); this is its explicit TPU-side analog."""
    n = len(codes)
    cuts = []
    stack = [(0, n, 29)]
    while stack:
        lo, hi, bit = stack.pop()
        if hi - lo <= max_size:
            cuts.append(lo)
            continue
        if bit < 0:
            cuts.extend(range(lo, hi, max_size))
            continue
        mid = lo + int(np.searchsorted(
            (codes[lo:hi] >> np.uint32(bit)) & 1, 1, side="left"))
        if mid == lo or mid == hi:
            stack.append((lo, hi, bit - 1))
        else:
            stack.append((mid, hi, bit - 1))
            stack.append((lo, mid, bit - 1))
    cuts.sort()
    return np.array(cuts + [n], np.int64)


def refresh_cluster_tables(tbl: ClusterTables, positions, normals,
                           indices, lights=None,
                           uvs=None) -> ClusterTables:
    """Device-side geometry refresh of the cluster blocks for ANIMATED
    frames (VERDICT r2 #9: keep animation on the hot path). Treelet
    structure (offsets, slot->tri map, materials, uvs, light ids) is
    topology — unchanged; only the geometry-derived rows are recomputed
    from the updated world positions/normals: split-bf16 intersection
    coefficients (rows 0..19), cluster centers/AABBs, and the V0/E1/E2/
    GN/N0..N2/LODB attribute rows. One fused jnp pass, O(T) gathers —
    the clustered tier's analog of the BLAS refit at Sample.cpp:1170-1198.
    With `lights`, the moved emissive-triangle rows of the in-kernel
    light table are refreshed too (power/CDF kept, same approximation as
    scene/animation.py's light-vertex scatter)."""
    import jax
    import jax.numpy as jnp

    assert not tbl.omm, \
        "device refresh of OMM blocks not supported (attrs pack 6/row " \
        "and micromap quantity lanes would need re-bake); animated OMM " \
        "scenes rebuild tables on host"
    assert not getattr(tbl, "instanced", False), \
        "instanced tables refresh via transforms (re-run " \
        "build_cluster_tables_instanced world-candidate assembly), " \
        "not the flatten-order geometry scatter"
    f32 = jnp.float32
    C = tbl.n_clusters
    off = tbl.offsets
    sizes = off[1:] - off[:-1]
    slot = off[:-1, None] + jnp.arange(CT, dtype=off.dtype)[None, :]
    validm = jnp.arange(CT)[None, :] < sizes[:, None]
    slot = jnp.where(validm, slot, 0).reshape(-1)
    vmask = validm.reshape(-1).astype(f32)[:, None]

    tri = jnp.take(indices, slot, axis=0)
    v0 = jnp.take(positions, tri[:, 0], axis=0) * vmask
    v1 = jnp.take(positions, tri[:, 1], axis=0)
    v2 = jnp.take(positions, tri[:, 2], axis=0)
    e1 = (v1 - jnp.take(positions, tri[:, 0], axis=0)) * vmask
    e2 = (v2 - jnp.take(positions, tri[:, 0], axis=0)) * vmask
    n = jnp.cross(e1, e2)
    nlen = jnp.linalg.norm(n, axis=-1, keepdims=True)
    gn = n / jnp.maximum(nlen, 1e-20) * vmask
    n0 = jnp.take(normals, tri[:, 0], axis=0) * vmask
    n1 = jnp.take(normals, tri[:, 1], axis=0) * vmask
    n2 = jnp.take(normals, tri[:, 2], axis=0) * vmask

    vs = jnp.stack([v0, v0 + e1, v0 + e2], axis=1).reshape(C, CT * 3, 3)
    m3 = jnp.repeat(validm[:, :, None], 3, axis=2).reshape(C, CT * 3, 1)
    big = f32(1e30)
    lo = jnp.where(m3, vs, big).min(axis=1)
    hi = jnp.where(m3, vs, -big).max(axis=1)
    center = (lo + hi) * 0.5

    cen_tri = jnp.repeat(center, CT, axis=0)
    v0l = v0 - cen_tri * vmask
    v0xe2 = jnp.cross(v0l, e2)
    v0xe1 = jnp.cross(v0l, e1)
    v0n = jnp.sum(v0l * n, axis=-1)

    def r3(a):                                 # [tpad,3] -> [C,3,CT]
        return a.reshape(C, CT, 3).transpose(0, 2, 1)

    def r1(a):                                 # [tpad] -> [C,1,CT]
        return a.reshape(C, 1, CT)

    z = lambda k: jnp.zeros((C, k, CT), f32)
    c0 = jnp.concatenate([r3(-n), z(7)], axis=1)
    c1 = jnp.concatenate([r3(v0xe2), r3(e2), z(4)], axis=1)
    c2 = jnp.concatenate([r3(-v0xe1), r3(-e1), z(4)], axis=1)
    c3 = jnp.concatenate([z(6), r3(n), r1(-v0n)], axis=1)
    c_full = jnp.concatenate([c0, c1, c2, c3], axis=2)     # [C,10,LANES]
    c_hi = c_full.astype(jnp.bfloat16).astype(f32)
    c_lo = (c_full - c_hi).astype(jnp.bfloat16).astype(f32)

    blocks = tbl.blocks
    blocks = blocks.at[:, 0:10, :].set(c_hi)
    blocks = blocks.at[:, 10:20, :].set(c_lo)
    blocks = blocks.at[:, CENTER_ROW, 0:3 * CT].set(
        jnp.repeat(center, CT, axis=1).reshape(C, 3 * CT))

    def put3(b, i, arr):
        a = r3(arr)
        for k in range(3):
            li = i + k
            b = b.at[:, ATTR_BASE + li // 4,
                     (li % 4) * CT:(li % 4 + 1) * CT].set(a[:, k])
        return b

    def put1(b, i, arr):
        return b.at[:, ATTR_BASE + i // 4,
                    (i % 4) * CT:(i % 4 + 1) * CT].set(
            arr.reshape(C, CT))

    blocks = put3(blocks, AT_V0, v0l)
    blocks = put3(blocks, AT_E1, e1)
    blocks = put3(blocks, AT_E2, e2)
    blocks = put3(blocks, AT_GN, gn)
    blocks = put3(blocks, AT_N0, n0)
    blocks = put3(blocks, AT_N1, n1)
    blocks = put3(blocks, AT_N2, n2)
    blocks = put1(blocks, AT_LODB,
                  -0.5 * jnp.log2(jnp.maximum(nlen[:, 0], 1e-20)))
    if uvs is not None:
        # UV deltas are topology, but the premultiplied tangent mixes in
        # the world edges — recompute it for deformed geometry
        t0 = jnp.take(uvs, tri[:, 0], axis=0)
        duv1 = jnp.take(uvs, tri[:, 1], axis=0) - t0
        duv2 = jnp.take(uvs, tri[:, 2], axis=0) - t0
        det_uv = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
        ok = jnp.abs(det_uv) > 1e-12
        r = jnp.where(ok, 1.0 / jnp.where(ok, det_uv, 1.0), 0.0)
        tang = (duv2[:, 1:2] * e1 - duv1[:, 1:2] * e2) * r[:, None]
        blocks = put3(blocks, AT_TANG, tang * vmask)
        blocks = put1(blocks, AT_TSGN,
                      jnp.where(ok, jnp.sign(det_uv), 0.0) * vmask[:, 0])

    light_rows = tbl.light_rows
    if lights is not None and int(np.asarray(lights.num)) > 0:
        from rtxpt_tpu.pt import wide as W
        nl = min(int(np.asarray(lights.num)), 128)
        light_rows = light_rows \
            .at[W.LROW_P0:W.LROW_P0 + 3, :nl].set(lights.p0[:nl].T) \
            .at[W.LROW_P1:W.LROW_P1 + 3, :nl].set(lights.p1[:nl].T) \
            .at[W.LROW_P2:W.LROW_P2 + 3, :nl].set(lights.p2[:nl].T) \
            .at[W.LROW_NORMAL:W.LROW_NORMAL + 3, :nl].set(
                lights.normal[:nl].T) \
            .at[W.LROW_EXTRA:W.LROW_EXTRA + 4, :nl].set(
                lights.extra[:nl].T)

    return tbl.replace(blocks=blocks, aabb_lo=lo, aabb_hi=hi,
                       light_rows=light_rows)


def build_cluster_tables(positions, normals, indices, tri_material,
                         materials, lights, uvs=None, envmap=None,
                         textures=None, tri_micromap=None,
                         tri_cover=None,
                         tri_gidx=None) -> Optional[ClusterTables]:
    """Bake cluster blocks. Triangles must already be Morton-ordered
    (prepare() applies morton_permutation to all per-tri arrays).
    Returns None when the scene is ineligible (see pt/bounce_clustered
    eligibility: table caps, env/texture table requirements).

    `tri_gidx` ([t] i32, optional) overrides the AT_GIDX attribute (the
    exported "global triangle index") — the instanced builder passes
    pool-order ids so prototype-local bakes stay globally unique."""
    from rtxpt_tpu.pt.bounce_pallas import (
        EV_AUX, EVA_SELPDF, MAX_LIGHTS, MAX_MATERIALS, _tex_maps_of,
        build_env_rows, build_tex_tables, pack_lights, pack_materials)

    positions = np.asarray(positions, np.float32)
    normals = np.asarray(normals, np.float32)
    indices = np.asarray(indices, np.int32)
    tri_material = np.asarray(tri_material, np.int32)
    t = len(indices)
    n_mats = len(np.asarray(materials.base_color))
    n_lights = int(np.asarray(lights.num))
    if getattr(materials, "anisotropy", None) is not None and \
            float(np.max(np.asarray(materials.anisotropy))) > 0.0:
        return None      # anisotropic GGX runs on the XLA path
    from rtxpt_tpu.lighting.lights_baker import KIND_ENVQUAD, KIND_SPHERE
    if n_lights and bool(np.any(np.isin(
            np.asarray(lights.kind), [KIND_SPHERE, KIND_ENVQUAD]))):
        return None      # sphere/env-quad sampling is XLA-only
    n_clusters = -(-t // CT)
    # n_lights > MAX_LIGHTS is allowed: such scenes ride the external-NEE
    # mode (pt/nee_external.py) and never select from the VMEM table.
    if t == 0 or n_clusters > MAX_CLUSTERS or n_mats > MAX_MATERIALS:
        return None
    env_rows = None
    if int(np.asarray(lights.env_light)) >= 0:
        env_rows = build_env_rows(envmap) if envmap is not None else None
        if env_rows is None:
            return None
        env_rows[EV_AUX + EVA_SELPDF, :] = float(
            np.asarray(lights.power)[int(np.asarray(lights.env_light))])
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
    gn = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)

    tri_light = np.asarray(lights.tri_light)[:t]
    if len(tri_light) < t:
        # no (or fewer) emissive-geometry entries than triangles — the
        # instanced per-prototype bakes hit this (tri_light indexes the
        # EXPANDED light list, and the v1 instanced tier has none)
        tri_light = np.concatenate(
            [tri_light,
             np.full((t - len(tri_light),), -1, tri_light.dtype
                     if tri_light.size else np.int64)])
    has_l = tri_light >= 0
    li = np.maximum(tri_light, 0)
    lpdf = np.where(has_l, np.asarray(lights.power)[li], 0.0)
    larea = np.where(has_l, np.asarray(lights.extra)[li, 0], 1.0)

    # Treelet clustering: variable-length contiguous Morton ranges from
    # the radix-tree cut (see radix_cut_offsets), laid out in fixed
    # CT-wide slots. slot_tri maps (cluster, lane) -> global triangle
    # index; invalid lanes get zeroed coefficients (det==0 -> the bf16
    # admission test can never select them) and AT_VALID 0.
    cen = (v0 + v1 + v2) / 3.0
    offsets = radix_cut_offsets(morton_codes(cen), CT)
    n_clusters = len(offsets) - 1
    if n_clusters > MAX_CLUSTERS:
        return None
    sizes = np.diff(offsets)
    slot_tri = offsets[:-1, None] + np.arange(CT)[None, :]    # [K,CT]
    slot_valid = (np.arange(CT)[None, :] < sizes[:, None])
    slot_tri = np.where(slot_valid, slot_tri, 0).reshape(-1)
    vmaskf = slot_valid.reshape(-1).astype(np.float32)

    def pp(x):
        y = x[slot_tri]
        return y * (vmaskf if y.ndim == 1
                    else vmaskf[:, None]).astype(x.dtype)

    v0p, e1p, e2p, np_, gnp = pp(v0), pp(e1), pp(e2), pp(n), pp(gn)
    n0p = pp(normals[indices[:, 0]])
    n1p = pp(normals[indices[:, 1]])
    n2p = pp(normals[indices[:, 2]])
    midp = pp(tri_material.astype(np.float32))
    lpdfp, lareap = pp(lpdf.astype(np.float32)), pp(larea.astype(np.float32))
    islp = pp(has_l.astype(np.float32))
    validp = pp(np.ones((t,), np.float32))

    # Per-cluster AABB over real triangles (padding contributes nothing).
    vs = np.stack([pp(v0), pp(v0 + e1), pp(v0 + e2)], axis=1)  # [tpad,3,3]
    vs = vs.reshape(n_clusters, CT * 3, 3)
    validc = validp.reshape(n_clusters, CT, 1)
    big = np.float32(1e30)
    vmask = np.repeat(validc, 3, axis=1) > 0.5
    lo = np.where(vmask, vs, big).min(axis=1)
    hi = np.where(vmask, vs, -big).max(axis=1)
    center = ((lo + hi) * 0.5).astype(np.float32)           # [C,3]

    cen_tri = np.repeat(center, CT, axis=0)                  # [tpad,3]
    v0l = v0p - cen_tri * validp[:, None]   # keep padding at 0
    v0xe2 = np.cross(v0l, e2p)
    v0xe1 = np.cross(v0l, e1p)
    v0n = np.einsum("tj,tj->t", v0l, np_)

    omm = tri_micromap is not None
    slots = OMM_SLOTS if omm else 4
    lanes = slots * CT
    if n_clusters > (1 << 29) // (BLK_ROWS * lanes * 4):
        return None                  # keep the HBM block budget
    blocks = np.zeros((n_clusters, BLK_ROWS, lanes), np.float32)

    def coef(q, k3, vals):
        """blocks[:, k3:k3+vals.shape[-1]-ish ...] for quantity q."""
        w = vals.shape[1] if vals.ndim == 2 else 1
        vv = vals.reshape(n_clusters, CT, -1)
        for k in range(vv.shape[2]):
            blocks[:, k3 + k, q * CT:(q + 1) * CT] = vv[:, :, k]

    coef(0, 0, -np_)                 # det: -n . d
    coef(1, 0, v0xe2)                # u:  (v0'xe2).d + e2.(o'xd)
    coef(1, 3, e2p)
    coef(2, 0, -v0xe1)               # v
    coef(2, 3, -e1p)
    coef(3, 6, np_)                  # t:  n.o' - v0'.n
    coef(3, 9, -v0n[:, None])
    if omm:
        # micromap word halves as quantities 4/5 and unknown-cell
        # coverage as quantity 6, all riding the 1-operand (coefficient
        # row 9); the halves are 16-bit ints -> exact through the split
        # (see OMM_SLOTS note), cov tolerates the ~2^-17 split error
        mm_w = np.asarray(tri_micromap).astype(np.uint32)
        mm_lo = (mm_w & np.uint32(0xFFFF)).astype(np.float32)
        mm_hi = (mm_w >> np.uint32(16)).astype(np.float32)
        cov = (np.asarray(tri_cover, np.float32)
               if tri_cover is not None else np.ones((t,), np.float32))
        coef(4, 9, pp(mm_lo)[:, None])
        coef(5, 9, pp(mm_hi)[:, None])
        coef(6, 9, pp(cov)[:, None])

    # split-bf16: rows 0..9 -> (hi, lo) with hi bf16-exact
    c_full = blocks[:, 0:10, :].copy()
    c_hi = bf16_round(c_full)
    blocks[:, 0:10, :] = c_hi
    blocks[:, 10:20, :] = bf16_round(c_full - c_hi)

    # center broadcast row
    for a in range(3):
        blocks[:, CENTER_ROW, a * CT:(a + 1) * CT] = center[:, a:a + 1]

    # rows 17..24: packed logical attribute rows
    attr = np.zeros((n_clusters, AT_ROWS, CT), np.float32)

    def put3(i, arr):
        attr[:, i:i + 3, :] = arr.reshape(
            n_clusters, CT, 3).transpose(0, 2, 1)

    def put1(i, arr):
        attr[:, i, :] = arr.reshape(n_clusters, CT)

    put3(AT_V0, v0l)
    put3(AT_E1, e1p)
    put3(AT_E2, e2p)
    put3(AT_GN, gnp)
    put3(AT_N0, n0p)
    put3(AT_N1, n1p)
    put3(AT_N2, n2p)
    put1(AT_MID, midp)
    put1(AT_LPDF, lpdfp)
    put1(AT_LAREA, lareap)
    put1(AT_ISLIGHT, islp)
    put1(AT_LID, pp(tri_light.astype(np.float32)))
    # global (prepared-order) triangle index — clusters are variable-
    # length ranges so the kernel cannot reconstruct it as cid*CT+j;
    # f32 is exact to 2^24, far above MAX_CLUSTERS*CT
    if tri_gidx is not None:
        put1(AT_GIDX, pp(np.asarray(tri_gidx, np.float32)))
    else:
        put1(AT_GIDX, slot_tri.astype(np.float32))
    put1(AT_VALID, validp)
    if uvs is not None:
        uvs = np.asarray(uvs, np.float32)
        for row, vi in ((AT_UV0, 0), (AT_UV1, 1), (AT_UV2, 2)):
            uvv = pp(uvs[indices[:, vi]])
            put1(row, uvv[:, 0])
            put1(row + 1, uvv[:, 1])
        from rtxpt_tpu.pt.bounce_pallas import _tangent_rows
        tang, tsgn = _tangent_rows(uvs, indices, e1, e2)
        put3(AT_TANG, pp(tang))
        put1(AT_TSGN, pp(tsgn))
    tri_area2 = np.linalg.norm(np_, axis=-1)
    put1(AT_LODB, (-0.5 * np.log2(np.maximum(tri_area2, 1e-20))
                   ).astype(np.float32))
    for i in range(AT_ROWS):
        blocks[:, ATTR_BASE + i // slots,
               (i % slots) * CT:(i % slots + 1) * CT] = attr[:, i, :]

    return ClusterTables(
        blocks=jnp.asarray(blocks),
        aabb_lo=jnp.asarray(lo), aabb_hi=jnp.asarray(hi),
        mat_rows=jnp.asarray(pack_materials(materials)),
        light_rows=jnp.asarray(pack_lights(lights)),
        env_rows=(jnp.asarray(env_rows) if env_rows is not None else None),
        offsets=jnp.asarray(offsets, jnp.int32),
        tex_ct=(tex[0] if tex is not None else None),
        tex_meta=(tex[1] if tex is not None else None),
        n_clusters=n_clusters, n_tris=t, n_lights=n_lights,
        tr=(tex[2] if tex is not None else 0),
        tex_maps=_tex_maps_of(materials), omm=omm)


def build_cluster_tables_instanced(built, host, materials, lights,
                                   envmap=None, textures=None,
                                   max_instances=65536
                                   ) -> Optional[ClusterTables]:
    """Instanced clustered tables: OBJECT-space prototype blocks shared
    across instances + an expanded (instance x cluster) world candidate
    list (VERDICT r4 missing #6 / next #9: "TLAS prototypes -> cluster
    tables over instances, so instanced big scenes don't re-flatten").

    Geometry memory is O(sum of prototype sizes) — the BLAS-reuse
    contract of the reference (Sample.cpp:1088-1242) — while the cull
    metadata (world AABBs + id maps) is O(instances x clusters), tiny by
    comparison. Per visit the kernels DMA the candidate's instance
    transform tile alongside its block and re-base the ray into object
    space with one [16,128]x[16,FL] MXU pass (pt/bounce_clustered.py
    `_xform_od`); the t parameter is preserved (object direction stays
    unnormalized), so winner selection across instances needs no
    rescaling.

    v1 restrictions (returns None; scene rides the XLA TLAS path):
      * no emissive materials on any pool triangle (per-(instance,tri)
        light ids cannot ride shared prototype attribute rows; analytic
        + environment lights are fine)
      * positive-determinant instance transforms (mirrored instances
        would flip the object-space facing test)
      * no alpha/OMM (build_two_level already rejects alpha textures)

    `built` is build_two_level's dict (+ tri_base/inst fields).
    """
    tl = built["tlas"]
    tri_base = np.asarray(built["tri_base"], np.int64)
    inst_mesh = np.asarray(tl.inst_mesh)           # [I] prototype id
    inst_pack = np.asarray(tl.inst_pack)           # [I,21] rot|trans|nmat
    n_inst = len(inst_mesh)
    n_proto = len(tri_base) - 1
    if n_inst == 0 or n_inst > max_instances:
        return None
    if getattr(materials, "anisotropy", None) is not None and \
            float(np.max(np.asarray(materials.anisotropy))) > 0.0:
        return None
    # no emissive pool triangles (v1): emission on a used material kills
    # eligibility
    mats_em = np.asarray(materials.emissive)
    used = np.unique(np.asarray(built["tri_material"], np.int64))
    if np.any(np.abs(mats_em[used]) > 0.0):
        return None

    pos = np.asarray(built["positions"], np.float32)
    nrm = np.asarray(built["normals"], np.float32)
    uv = np.asarray(built["uvs"], np.float32)
    idx = np.asarray(built["indices"], np.int32)
    mid = np.asarray(built["tri_material"], np.int32)

    # ---- per-prototype object-space bakes --------------------------------
    proto_tbl = []
    merged = None
    block_base = np.zeros(n_proto + 1, np.int64)
    for p in range(n_proto):
        t0, t1 = int(tri_base[p]), int(tri_base[p + 1])
        pidx = idx[t0:t1]
        perm = morton_permutation(pos, pidx)
        tbl = build_cluster_tables(
            pos, nrm, pidx[perm], mid[t0:t1][perm], materials, lights,
            uvs=uv, envmap=envmap, textures=textures,
            tri_gidx=(t0 + perm).astype(np.int32))
        if tbl is None:
            return None
        proto_tbl.append(tbl)
        block_base[p + 1] = block_base[p] + tbl.n_clusters
        if merged is None:
            merged = tbl                 # mat/light/env/tex rows shared
    blocks = jnp.concatenate([t_.blocks for t_ in proto_tbl], axis=0)

    # ---- expanded world candidate list -----------------------------------
    wc_lo, wc_hi, wc_block, wc_inst = [], [], [], []
    xf = np.zeros((n_inst, 16, 128), np.float32)
    inst_post = np.zeros((n_inst, 19), np.float32)
    for i in range(n_inst):
        p = int(inst_mesh[i])
        A = inst_pack[i, 0:9].reshape(3, 3)        # o2w linear
        t_w = inst_pack[i, 9:12]
        nmat = inst_pack[i, 12:21].reshape(3, 3)
        detA = float(np.linalg.det(A))
        if detA <= 1e-12:
            return None                            # mirrored/degenerate
        Ainv = np.linalg.inv(A)
        t_o = -Ainv @ t_w
        # world [d, oxd, o, 1] -> object: see ClusterTables.xf
        M = np.zeros((10, 10), np.float64)
        M[0:3, 0:3] = Ainv
        tx = np.array([[0, -t_o[2], t_o[1]],
                       [t_o[2], 0, -t_o[0]],
                       [-t_o[1], t_o[0], 0]])
        M[3:6, 0:3] = tx @ Ainv
        M[3:6, 3:6] = (1.0 / detA) * A.T           # det(Ainv) * Ainv^-T
        M[6:9, 6:9] = Ainv
        M[6:9, 9] = t_o
        M[9, 9] = 1.0
        xf[i, 0:10, 0:10] = M.T.astype(np.float32)
        inst_post[i, 0:9] = A.reshape(-1)
        inst_post[i, 9:18] = nmat.reshape(-1)
        # tri_area2 = |n| scales ~ det(A)^(4/3) under A (exact for
        # uniform scale); LODB = -0.5*log2(area2) shifts by the offset
        inst_post[i, 18] = np.float32(-(2.0 / 3.0) * np.log2(max(
            detA, 1e-12)))

        lo_p = np.asarray(proto_tbl[p].aabb_lo)    # [Cp,3] object
        hi_p = np.asarray(proto_tbl[p].aabb_hi)
        c = (lo_p + hi_p) * 0.5
        e = (hi_p - lo_p) * 0.5
        wc = c @ A.T + t_w
        we = e @ np.abs(A).T
        wc_lo.append((wc - we).astype(np.float32))
        wc_hi.append((wc + we).astype(np.float32))
        nb = proto_tbl[p].n_clusters
        wc_block.append(np.arange(nb, dtype=np.int32)
                        + np.int32(block_base[p]))
        wc_inst.append(np.full((nb,), i, np.int32))
    wc_lo = np.concatenate(wc_lo)
    n_cand = len(wc_lo)
    if n_cand > 4 * MAX_CLUSTERS:
        return None

    return merged.replace(
        blocks=blocks,
        aabb_lo=jnp.asarray(wc_lo),
        aabb_hi=jnp.asarray(np.concatenate(wc_hi)),
        offsets=None,
        n_clusters=n_cand,
        n_tris=int(tri_base[-1]),
        instanced=True,
        wc_block=jnp.asarray(np.concatenate(wc_block)),
        wc_inst=jnp.asarray(np.concatenate(wc_inst)),
        xf=jnp.asarray(xf),
        inst_post=jnp.asarray(inst_post))
