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

Eligibility (everything else falls back to the XLA wavefront in
pt/integrator.py): <= PALLAS_MAX_TRIS triangles, <=128 lights, <=128
materials, no envmap light, no textures/alpha, NEE in {OFF, UNIFORM,
POWER} with 1 candidate.
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
_R = 8                  # ray rows per block (R*128 = 1024 rays)
_BIG = 1e30

# fs (f32 state) channel map
FS_O = 0                # 0:3 ray origin
FS_D = 3                # 3:6 ray direction
FS_THP = 6              # 6:9 throughput
FS_L = 9                # 9:12 accumulated radiance
FS_PREVPDF = 12
NF = 13

# is_ (i32 state) channel map
IS_ACTIVE = 0
IS_PREVDELTA = 1
IS_MED0 = 2
IS_MED1 = 3
IS_PX = 4
IS_PY = 5
NI = 6

# attr table rows (one column per triangle)
AT_N0 = 0               # 0:3 shading normal v0
AT_N1 = 3
AT_N2 = 6
AT_GN = 9               # 9:12 unit geometric normal
AT_MID = 12
AT_LPDF = 13            # baked power-CDF selection pdf of this tri's light
AT_LAREA = 14
AT_ISLIGHT = 15
AT_ROWS = 16

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
MT_ROWS = 23

# Effect seeds — must match pt/integrator.py
EFFECT_SCATTER = 29
EFFECT_NEE = 31
EFFECT_RR = 37


@struct.dataclass
class BounceTables:
    """Scene tables for the fused bounce kernel (built at scene prep)."""

    tri_rows: jnp.ndarray    # [4*Tpad, 128] intersection operand rows
    attr_rows: jnp.ndarray   # [AT_ROWS, Tpad]
    mat_rows: jnp.ndarray    # [MT_ROWS, 128]
    light_rows: jnp.ndarray  # [W.LROWS, 128]
    tc: int = struct.field(pytree_node=False, default=128)
    n_chunks: int = struct.field(pytree_node=False, default=1)
    n_lights: int = struct.field(pytree_node=False, default=0)
    n_tris: int = struct.field(pytree_node=False, default=0)


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
    return mat


def pack_lights(lights) -> np.ndarray:
    """[W.LROWS, 128] lane table: one column per light."""
    n_lights = int(np.asarray(lights.num))
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


def build_bounce_tables(positions, normals, indices, tri_material,
                        materials, lights) -> Optional[BounceTables]:
    """Host-side table bake; returns None when the scene is ineligible."""
    if getattr(materials, "anisotropy", None) is not None and \
            float(np.max(np.asarray(materials.anisotropy))) > 0.0:
        return None      # anisotropic GGX runs on the XLA path
    positions = np.asarray(positions, np.float32)
    normals = np.asarray(normals, np.float32)
    indices = np.asarray(indices, np.int32)
    tri_material = np.asarray(tri_material, np.int32)
    t = len(indices)
    n_mats = len(np.asarray(materials.base_color))
    n_lights = int(np.asarray(lights.num))
    if (t == 0 or t > PALLAS_MAX_TRIS or n_mats > MAX_MATERIALS
            or n_lights > MAX_LIGHTS):
        return None
    if int(np.asarray(lights.env_light)) >= 0:
        return None

    v0 = positions[indices[:, 0]]
    v1 = positions[indices[:, 1]]
    v2 = positions[indices[:, 2]]
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)

    mat = pack_materials(materials)
    lt = pack_lights(lights)

    tc = min(512, _round_up(t, 128))
    tpad = _round_up(t, tc)
    n_chunks = tpad // tc

    # ---- intersection rows: per chunk c, row groups [det|u|v|t] x tc ----
    # det = d.(-n); u = d.(v0xe2) + oxd.e2; v = d.(-v0xe1) + oxd.(-e1);
    # t = o.n + 1*(-v0n)     (ray column = [d|oxd|o|1] rows 0..9)
    tri_rows = np.zeros((4 * tpad, 128), np.float32)
    v0xe2 = np.cross(v0, e2)
    v0xe1 = np.cross(v0, e1)
    v0n = np.einsum("tj,tj->t", v0, n)
    for c in range(n_chunks):
        lo = c * tc
        hi = min(lo + tc, t)
        w = hi - lo
        if w <= 0:
            continue
        base = 4 * c * tc
        tri_rows[base:base + w, 0:3] = -n[lo:hi]
        tri_rows[base + tc:base + tc + w, 0:3] = v0xe2[lo:hi]
        tri_rows[base + tc:base + tc + w, 3:6] = e2[lo:hi]
        tri_rows[base + 2 * tc:base + 2 * tc + w, 0:3] = -v0xe1[lo:hi]
        tri_rows[base + 2 * tc:base + 2 * tc + w, 3:6] = -e1[lo:hi]
        tri_rows[base + 3 * tc:base + 3 * tc + w, 6:9] = n[lo:hi]
        tri_rows[base + 3 * tc:base + 3 * tc + w, 9] = -v0n[lo:hi]

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

    return BounceTables(
        tri_rows=jnp.asarray(tri_rows), attr_rows=jnp.asarray(attr),
        mat_rows=jnp.asarray(mat), light_rows=jnp.asarray(lt),
        tc=tc, n_chunks=n_chunks, n_lights=n_lights, n_tris=t)


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


def _intersect_group(tri_ref, attr_ref, cols, tmin_g, tmax_g, tc, n_chunks):
    """Closest hit for one 128-ray group. Returns per-ray [1,128] rows:
    (t, prim_f, u, v, det_pick) and attrs [AT_ROWS,128]."""
    best_t = jnp.full((1, 128), _BIG, jnp.float32)
    best_attr = jnp.zeros((AT_ROWS, 128), jnp.float32)
    best_u = jnp.zeros((1, 128), jnp.float32)
    best_v = jnp.zeros((1, 128), jnp.float32)
    best_det = jnp.zeros((1, 128), jnp.float32)
    best_prim = jnp.full((1, 128), -1.0, jnp.float32)
    for c in range(n_chunks):
        base = 4 * c * tc
        g = _mm(tri_ref[base:base + 4 * tc, :], cols)     # [4tc,128]
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
        best_t = jnp.where(hit_c, t_c, best_t)
    return best_t, best_prim, best_u, best_v, best_det, best_attr


def _occluded_group(tri_ref, cols, tmax_g, tc, n_chunks):
    """Any-hit in (0, tmax_g) for one 128-ray group -> f32 0/1 [1,128]
    (f32, not bool: Mosaic can't concatenate i1 tiles across groups)."""
    occ = jnp.zeros((1, 128), jnp.float32)
    for c in range(n_chunks):
        base = 4 * c * tc
        g = _mm(tri_ref[base:base + 4 * tc, :], cols)
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


def _ray_offset_w(pos, gn, direction):
    mag = jnp.sqrt(jnp.maximum(W.dot3(pos, pos), 0.0))
    scale = jnp.maximum(1.0, mag) * 3e-5
    side = jnp.where(W.dot3(direction, gn) >= 0.0, 1.0, -1.0)
    return pos + gn * (side * scale)


def surface_and_shade(*, o, d, t, hit, front, bu, bv, attr,
                      thp, L, prev_pdf, active, prev_delta, med0, med1,
                      px, py, sample_idx, bounce, mat_ref, light_ref,
                      cfg_key, n_lights, first_emissive):
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
     low_discrepancy, energy_comp, noprune) = cfg_key
    f32 = jnp.float32

    def lds(seed, dims):
        if low_discrepancy:
            return rng.ld_samples(sample_idx, seed, dims)
        return tuple(rng.uniform_sample(
            seed, rng.hash_combine(sample_idx, dd)) for dd in dims)

    hit_mask = active & hit
    active = active & hit                     # miss terminates (no envmap)

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
    use_nee = nee_mode in (1, 2) and n_lights > 0
    nee_uniform = nee_mode == 1
    em_gate = jnp.asarray(first_emissive, bool) | (bounce > 0)
    if use_nee and enable_mis:
        cos_l = jnp.abs(W.dot3(-d, gn))
        if nee_uniform:
            sel_pdf_hit = attr(AT_ISLIGHT) / float(max(n_lights, 1))
        else:
            sel_pdf_hit = attr(AT_LPDF)
        area = jnp.maximum(attr(AT_LAREA), 1e-12)
        p_light = sel_pdf_hit * t * t / jnp.maximum(
            area * jnp.maximum(cos_l, 1e-9), 1e-12)
        p_light = jnp.where(attr(AT_ISLIGHT) > 0.5, p_light, 0.0)
        w_em = jnp.where(prev_delta | (bounce == 0), 1.0,
                         W.power_heuristic(prev_pdf, p_light))
    else:
        w_em = jnp.ones_like(t)
    L = L + jnp.where(hit_mask & em_gate, thp * emissive * w_em, 0.0)

    wo = W.to_local3(-d, sh_n)

    # ----- NEE (1 candidate; HandleNEE analog) -----
    do_nee = jnp.zeros(t.shape, bool)
    if use_nee:
        seed_nee = rng.pixel_seed(px, py, bounce, EFFECT_NEE)
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
        ls = W.sample_light_fields_w(lf, sel_pdf, pos, u1, u2)
        wi_l = W.to_local3(ls["wi"], sh_n)
        f_l = W.bsdf_eval_w(bsdf, wo, wi_l)
        pdf_b = W.bsdf_pdf_w(bsdf, wo, wi_l)
        do_nee = hit_mask & ls["valid"] & (W.luminance3(f_l) > 0.0)
        shadow_o = _ray_offset_w(pos, gn, ls["wi"])
        if enable_mis:
            w_nee = jnp.where(ls["is_delta"], 1.0,
                              W.power_heuristic(ls["pdf"], pdf_b))
        else:
            w_nee = jnp.ones_like(t)
        contrib = thp * f_l * ls["Li"] * (
            w_nee / jnp.maximum(ls["pdf"], 1e-12))
        if firefly > 0.0:
            lum = W.luminance3(contrib)
            contrib = contrib * jnp.minimum(
                1.0, firefly / jnp.maximum(lum, 1e-12))
        # offset-aware occlusion distance (see integrator.py NEE note)
        dist_eff = ls["dist"] - W.dot3(shadow_o - pos, ls["wi"])
        sdist = jnp.where(do_nee, dist_eff * (1.0 - 1e-4), 0.0)
        shadow_d = ls["wi"]
    else:
        do_nee = jnp.zeros(t.shape, bool)
        shadow_o = pos
        shadow_d = d
        sdist = jnp.zeros_like(t)
        contrib = jnp.zeros_like(thp)

    # ----- scatter (GenerateScatterRay analog) -----
    seed_sc = rng.pixel_seed(px, py, bounce, EFFECT_SCATTER)
    u_lobe, su1, su2 = lds(seed_sc, (0, 2, 3))
    bs = W.bsdf_sample_w(bsdf, wo, u_lobe, su1, su2)
    wi_world = W.to_world3(bs["wi"], sh_n)
    same_side_sh = bs["wi"][2] > 0.0
    same_side_geo = W.dot3(wi_world, gn) > 0.0
    leak = same_side_sh != same_side_geo
    active = active & bs["valid"] & ~leak & (W.luminance3(bs["weight"]) > 0.0)

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
        seed_rr = rng.pixel_seed(px, py, bounce, EFFECT_RR)
        (u_rr,) = lds(seed_rr, (0,))
        p_cont = jnp.clip(
            jnp.maximum(jnp.maximum(thp[0], thp[1]), thp[2]), 0.05, 1.0)
        rr_on = bounce >= min_rr
        kill = rr_on & (u_rr >= p_cont)
        active = active & ~kill
        thp = thp / jnp.where(rr_on, p_cont, 1.0)

    o_new = _ray_offset_w(pos, gn, wi_world)

    return dict(
        o_new=o_new, wi_world=wi_world, thp=thp, L=L, prev_pdf=prev_pdf,
        active=active, prev_delta=prev_delta, med0=med0, med1=med1,
        do_nee=do_nee, shadow_o=shadow_o, shadow_d=shadow_d, sdist=sdist,
        contrib=contrib)


def _bounce_kernel(scal_ref, fs_ref, is_ref, tri_ref, attr_ref, mat_ref,
                   light_ref, fs_out, is_out, hit_out, *,
                   cfg_key, tc, n_chunks, n_lights, first_emissive):
    (nee_mode, enable_mis, firefly, rr_enable, min_rr, max_travel,
     low_discrepancy, energy_comp, noprune) = cfg_key
    f32 = jnp.float32
    sample_idx = scal_ref[0, 0]
    bounce = scal_ref[0, 1].astype(jnp.int32)

    fs = fs_ref[:]
    is_ = is_ref[:]
    o = fs[FS_O:FS_O + 3]
    d = fs[FS_D:FS_D + 3]

    # ----- closest hit (per 128-ray group) -----
    tmin = jnp.zeros((1, 128), f32)
    ts, prims, us, vs, dets = [], [], [], [], []
    attrs_g = []
    for g in range(_R):
        cols = _ray_cols(o, d, g)
        tmax_g = jnp.full((1, 128), max_travel, f32)
        t_g, p_g, u_g, v_g, det_g, attr_g = _intersect_group(
            tri_ref, attr_ref, cols, tmin, tmax_g, tc, n_chunks)
        ts.append(t_g); prims.append(p_g); us.append(u_g); vs.append(v_g)
        dets.append(det_g); attrs_g.append(attr_g)
    t = _stack_groups(ts)
    prim_f = _stack_groups(prims)
    bu = _stack_groups(us)
    bv = _stack_groups(vs)
    det_pick = _stack_groups(dets)

    def attr(i, k=1):
        if k == 1:
            return _stack_groups([a[i:i + 1] for a in attrs_g])
        return jnp.stack(
            [_stack_groups([a[i + j:i + j + 1] for a in attrs_g])
             for j in range(k)], axis=0)

    hit = t < _BIG
    front = det_pick > 0.0

    s = surface_and_shade(
        o=o, d=d, t=t, hit=hit, front=front, bu=bu, bv=bv, attr=attr,
        thp=fs[FS_THP:FS_THP + 3], L=fs[FS_L:FS_L + 3],
        prev_pdf=fs[FS_PREVPDF], active=is_[IS_ACTIVE] > 0,
        prev_delta=is_[IS_PREVDELTA] > 0,
        med0=is_[IS_MED0], med1=is_[IS_MED1],
        px=is_[IS_PX], py=is_[IS_PY], sample_idx=sample_idx, bounce=bounce,
        mat_ref=mat_ref, light_ref=light_ref, cfg_key=cfg_key,
        n_lights=n_lights, first_emissive=first_emissive)

    # ----- NEE shadow occlusion (in-kernel second matmul pass) -----
    L = s["L"]
    do_nee = s["do_nee"]
    occs = []
    for g in range(_R):
        cols = _ray_cols(s["shadow_o"], s["shadow_d"], g)
        occs.append(_occluded_group(tri_ref, cols, s["sdist"][g:g + 1],
                                    tc, n_chunks))
    occluded = _stack_groups(occs) > 0.5
    L = L + jnp.where(do_nee & ~occluded, s["contrib"], 0.0)

    fs_out[:] = jnp.concatenate(
        [s["o_new"], s["wi_world"], s["thp"], L, s["prev_pdf"][None]],
        axis=0)
    is_out[:] = jnp.stack(
        [s["active"].astype(jnp.int32), s["prev_delta"].astype(jnp.int32),
         s["med0"], s["med1"], is_[IS_PX], is_[IS_PY]], axis=0)
    hit_out[:] = jnp.stack(
        [jnp.where(hit, t, 0.0), prim_f, bu, bv,
         front.astype(f32), do_nee.astype(f32)], axis=0)


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
    static_argnames=("cfg_key", "tc", "n_chunks", "n_lights",
                     "first_emissive", "interpret"))
def _bounce_call(scal, fs, is_, tri_rows, attr_rows, mat_rows, light_rows,
                 cfg_key, tc, n_chunks, n_lights, first_emissive,
                 interpret=False):
    nrows = fs.shape[1]
    grid = nrows // _R
    kern = functools.partial(
        _bounce_kernel, cfg_key=cfg_key, tc=tc, n_chunks=n_chunks,
        n_lights=n_lights, first_emissive=first_emissive)
    const = lambda b: (0, 0)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 2), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((NF, _R, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NI, _R, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tri_rows.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(attr_rows.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(mat_rows.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(light_rows.shape, const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((NF, _R, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NI, _R, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, _R, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NF, nrows, 128), jnp.float32),
            jax.ShapeDtypeStruct((NI, nrows, 128), jnp.int32),
            jax.ShapeDtypeStruct((6, nrows, 128), jnp.float32),
        ),
        interpret=interpret,
    )(scal, fs, is_, tri_rows, attr_rows, mat_rows, light_rows)


def _cfg_key(cfg):
    """Static kernel-permutation key. Every flag that changes the traced
    kernel body MUST ride here (it is a static jit argname of
    _bounce_call) — never read env/process state inside the kernel."""
    return (int(cfg.nee.value), bool(cfg.enable_mis),
            float(cfg.firefly_clamp), bool(cfg.enable_russian_roulette),
            int(cfg.min_bounces_before_rr), float(cfg.max_ray_travel),
            bool(cfg.low_discrepancy), bool(cfg.kernel_energy_comp),
            bool(cfg.cluster_noprune))


def eligible(scene, cfg, neeat_state) -> bool:
    """Back-compat structural eligibility (see pt/dispatch.py — tier
    resolution now happens there, outside jit)."""
    from rtxpt_tpu.pt.dispatch import fused_structural_ok
    return fused_structural_ok(scene, cfg, neeat_state)


def trace_paths_pallas(scene, cfg, o, d, cone_spread, px, py, sample_idx,
                       want_aux: bool = False, first_emissive: bool = True):
    """Fused-kernel wavefront: same contract as integrator.trace_paths."""
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
    ], axis=0)
    ones_mask = pad1(jnp.ones((n,), jnp.int32)).reshape(1, nrows, 128)
    is_ = jnp.concatenate([
        ones_mask,                                # active (pad lanes off)
        jnp.ones((1, nrows, 128), jnp.int32),     # prev_delta (camera)
        jnp.full((2, nrows, 128), -1, jnp.int32),  # med0, med1
        rows1(px).astype(jnp.int32)[None],
        rows1(py).astype(jnp.int32)[None],
    ], axis=0)

    sample_idx = jnp.asarray(sample_idx).astype(jnp.uint32)
    key = _cfg_key(cfg)
    interp = _interpret(cfg)

    ray_count = jnp.zeros((), jnp.int32)
    occupancy = []
    hit0 = None
    for bounce in range(cfg.max_bounces):
        active_in = is_[IS_ACTIVE]
        occupancy.append(jnp.sum(active_in))
        scal = jnp.stack(
            [sample_idx, jnp.uint32(bounce)]).reshape(1, 2)
        fs, is_, hit = _bounce_call(
            scal, fs, is_, tbl.tri_rows, tbl.attr_rows, tbl.mat_rows,
            tbl.light_rows, key, tbl.tc, tbl.n_chunks, tbl.n_lights,
            first_emissive, interpret=interp)
        ray_count = ray_count + jnp.sum(active_in) \
            + jnp.sum(hit[5].astype(jnp.int32))
        if bounce == 0:
            hit0 = hit
    occupancy.append(jnp.sum(is_[IS_ACTIVE]))

    L = fs[FS_L:FS_L + 3].reshape(3, npad).T[:n]
    out = dict(L=L, ray_count=ray_count, occupancy=jnp.stack(occupancy))

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
        out["normal"] = jnp.where(hm[..., None], surf.sh_n, 0.0)
        out["depth"] = jnp.where(hm, t0, 0.0)
        out["wpos"] = jnp.where(hm[..., None], surf.pos, 0.0)
        out["emission"] = jnp.where(hm[..., None], surf.emissive, 0.0)
    return out
