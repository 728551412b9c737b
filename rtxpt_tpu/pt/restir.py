"""ReSTIR DI: reservoir-based spatiotemporal importance resampling for
direct lighting.

TPU re-design of the RTXDI integration (reference: Rtxpt/RTXDI/** —
PrepareLightsPass converts the polymorphic light list to RTXDI's format,
RtxdiPass::Execute runs DI initial/temporal/spatial resampling + final
shade, RtxdiApplicationBridge.hlsli adapts surfaces; SURVEY.md §2.5).
Here the whole pipeline is image-space JAX over the primary-hit G-buffer:

  1. initial RIS: K candidates from the power-CDF light list, weighted by
     target pdf p_hat = lum(f * Li * G) (unshadowed)
  2. visibility: one shadow ray for the selected sample
  3. temporal reuse: reproject, validate (depth/normal), merge reservoirs
     with M clamping
  4. spatial reuse: n neighbors in a radius, geometric similarity gates
  5. final shade: f(y) * Li(y) * visibility-free W (visibility folded in 2)

Algorithms follow the public ReSTIR paper (Bitterli et al. 2020) and the
generalized RIS formulation; no reference source consulted.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rtxpt_tpu.accel.traverse import intersect_any
from rtxpt_tpu.lighting.envmap import EnvMap, env_eval
from rtxpt_tpu.lighting.lights_baker import (
    KIND_DIRECTIONAL, KIND_ENV, KIND_ENVQUAD, KIND_POINT, KIND_SPHERE,
    KIND_SPOT, KIND_TRIANGLE,
    LightList, _DELTA_DIST,
)
from rtxpt_tpu.pt import bsdf as B
from rtxpt_tpu.pt.surface import ray_offset
from rtxpt_tpu.utils import math as m
from rtxpt_tpu.utils import rng


class Reservoir(NamedTuple):
    """Per-pixel DI reservoir, SoA over flat pixels [N]."""

    y_light: jnp.ndarray   # [N] i32 selected light index (-1 empty)
    y_uv: jnp.ndarray      # [N,2] sample point parameters on the light
    w_sum: jnp.ndarray     # [N] RIS weight sum
    m_count: jnp.ndarray   # [N] candidate count
    w_out: jnp.ndarray     # [N] unbiased contribution weight W


def empty_reservoir(n: int) -> Reservoir:
    return Reservoir(
        y_light=jnp.full((n,), -1, jnp.int32),
        y_uv=jnp.zeros((n, 2), jnp.float32),
        w_sum=jnp.zeros((n,), jnp.float32),
        m_count=jnp.zeros((n,), jnp.float32),
        w_out=jnp.zeros((n,), jnp.float32),
    )


class GBuffer(NamedTuple):
    """Compact primary-surface data for resampling (RtxdiApplicationBridge
    surface adapter analog). Flat pixels [N]."""

    pos: jnp.ndarray        # [N,3]
    normal: jnp.ndarray     # [N,3]
    geo_normal: jnp.ndarray  # [N,3]
    view: jnp.ndarray       # [N,3] unit toward camera
    diffuse: jnp.ndarray    # [N,3]
    specular_f0: jnp.ndarray  # [N,3]
    roughness: jnp.ndarray  # [N]
    depth: jnp.ndarray      # [N] (0 = background)

    @property
    def valid(self):
        return self.depth > 0.0


def _surface_bsdf(gb: GBuffer) -> B.BSDFData:
    return B.BSDFData(
        diffuse=gb.diffuse,
        specular_f0=gb.specular_f0,
        alpha=jnp.clip(gb.roughness ** 2, 0.0, 1.0),
        transmission=jnp.zeros_like(gb.roughness),
        diffuse_transmission=jnp.zeros_like(gb.roughness),
        eta=jnp.full_like(gb.roughness, 1.0 / 1.5),
        transmission_color=jnp.ones_like(gb.diffuse),
    )


def eval_light_sample(lights: LightList, envmap: EnvMap, li, uv, shade_pos):
    """Re-evaluate a stored light sample (index + uv) at a shading point.

    Returns (wi [N,3], dist [N], Li [N,3], source_pdf [N] solid-angle).
    Mirrors lights_baker.sample_light but deterministic from (li, uv)."""
    lix = jnp.maximum(li, 0)
    kind = jnp.take(lights.kind, lix)
    p0 = jnp.take(lights.p0, lix, axis=0)
    p1 = jnp.take(lights.p1, lix, axis=0)
    p2 = jnp.take(lights.p2, lix, axis=0)
    em = jnp.take(lights.emission, lix, axis=0)
    ex = jnp.take(lights.extra, lix, axis=0)
    nl = jnp.take(lights.normal, lix, axis=0)
    sel_pdf = jnp.take(lights.power, lix)

    b0, b1, b2 = m.sample_triangle_barycentrics(uv[..., 0], uv[..., 1])
    lp = p0 + b1[..., None] * p1 + b2[..., None] * p2
    to_l = lp - shade_pos
    d2 = jnp.maximum(m.dot(to_l, to_l, False), 1e-12)
    dist_tri = jnp.sqrt(d2)
    wi_tri = to_l / dist_tri[..., None]
    cos_l = m.dot(-wi_tri, nl, False)
    area = jnp.maximum(ex[..., 0], 1e-12)
    pdf_tri = sel_pdf * d2 / jnp.maximum(area * jnp.maximum(cos_l, 1e-9),
                                         1e-12)
    li_tri = jnp.where((cos_l > 1e-6)[..., None], em, 0.0)

    to_p = p0 - shade_pos
    d2p = jnp.maximum(m.dot(to_p, to_p, False), 1e-12)
    dist_p = jnp.sqrt(d2p)
    wi_p = to_p / dist_p[..., None]
    li_point = em / d2p[..., None]
    cos_spot = m.dot(-wi_p, p1, False)
    spot_atten = jnp.clip((cos_spot - ex[..., 1])
                          / jnp.maximum(ex[..., 0] - ex[..., 1], 1e-6),
                          0.0, 1.0) ** 2

    wi_dir = -p1

    # sphere (kSphere): uv re-derives the cone sample deterministically
    r_sph = ex[..., 2]
    sin2_max = jnp.clip(r_sph * r_sph / d2p, 0.0, 1.0 - 1e-6)
    cos_max = jnp.sqrt(1.0 - sin2_max)
    cos_t = 1.0 - uv[..., 0] * (1.0 - cos_max)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi_s = 2.0 * jnp.pi * uv[..., 1]
    t_s, b_s = m.orthonormal_basis(wi_p)
    wi_sph = (t_s * (sin_t * jnp.cos(phi_s))[..., None]
              + b_s * (sin_t * jnp.sin(phi_s))[..., None]
              + wi_p * cos_t[..., None])
    disc = jnp.maximum(r_sph * r_sph - d2p * (1.0 - cos_t * cos_t), 0.0)
    dist_sph = jnp.maximum(dist_p * cos_t - jnp.sqrt(disc), 1e-5)
    pdf_sph = sel_pdf / jnp.maximum(2.0 * jnp.pi * (1.0 - cos_max), 1e-9)

    # env: uv parameterizes the equirect map UNIFORMLY here (candidate uv
    # is a uniform square sample, not a CDF draw), so the solid-angle
    # jacobian is 1/(2*pi^2*sin(theta)).
    from rtxpt_tpu.lighting.envmap import _uv_to_dir
    wi_env = _uv_to_dir(envmap, uv[..., 0], uv[..., 1])
    li_env = env_eval(envmap, wi_env)
    sin_t = jnp.maximum(jnp.sin(uv[..., 1] * jnp.pi), 1e-4)
    pdf_env = sel_pdf / (2.0 * jnp.pi * jnp.pi * sin_t)

    # env quad (kEnvironmentQuad): uv is local to the extra-rect
    uq = ex[..., 0] + uv[..., 0] * (ex[..., 2] - ex[..., 0])
    vq = ex[..., 1] + uv[..., 1] * (ex[..., 3] - ex[..., 1])
    wi_envq = _uv_to_dir(envmap, uq, vq)
    li_envq = env_eval(envmap, wi_envq)
    area_q = jnp.maximum((ex[..., 2] - ex[..., 0])
                         * (ex[..., 3] - ex[..., 1]), 1e-9)
    sin_q = jnp.maximum(jnp.sin(vq * jnp.pi), 1e-4)
    pdf_envq = sel_pdf / (area_q * 2.0 * jnp.pi * jnp.pi * sin_q)

    is_tri = kind == KIND_TRIANGLE
    is_point = kind == KIND_POINT
    is_spot = kind == KIND_SPOT
    is_dir = kind == KIND_DIRECTIONAL
    is_env = kind == KIND_ENV
    is_sph = kind == KIND_SPHERE
    is_envq = kind == KIND_ENVQUAD

    wi = jnp.where(is_tri[..., None], wi_tri,
         jnp.where((is_point | is_spot)[..., None], wi_p,
         jnp.where(is_sph[..., None], wi_sph,
         jnp.where(is_envq[..., None], wi_envq,
         jnp.where(is_dir[..., None], wi_dir, wi_env)))))
    dist = jnp.where(is_tri, dist_tri,
           jnp.where(is_point | is_spot, dist_p,
           jnp.where(is_sph, dist_sph, _DELTA_DIST)))
    Li = jnp.where(is_tri[..., None], li_tri,
         jnp.where(is_point[..., None], li_point,
         jnp.where(is_spot[..., None], li_point * spot_atten[..., None],
         jnp.where(is_sph[..., None],
                   jnp.where((d2p > r_sph * r_sph)[..., None], em, 0.0),
         jnp.where(is_envq[..., None], li_envq,
         jnp.where(is_dir[..., None], em, li_env))))))
    pdf = jnp.where(is_tri, pdf_tri,
          jnp.where(is_env, pdf_env,
          jnp.where(is_envq, pdf_envq,
          jnp.where(is_sph, pdf_sph, sel_pdf))))
    return wi, dist, Li, jnp.maximum(pdf, 1e-12)


def _target_pdf(gb: GBuffer, lights, envmap, li, uv):
    """p_hat = luminance of unshadowed contribution f*Li (incl. cosine).
    Returns (p_hat, wi, dist, src_pdf) from ONE light-sample evaluation."""
    wi, dist, Li, src = eval_light_sample(lights, envmap, li, uv, gb.pos)
    wo_l = m.to_local(gb.view, gb.normal)
    wi_l = m.to_local(wi, gb.normal)
    f = B.bsdf_eval(_surface_bsdf(gb), wo_l, wi_l)
    return m.luminance(f * Li), wi, dist, src


def _reservoir_update(res: Reservoir, cand_li, cand_uv, w, u_accept,
                      count=1.0):
    """Stream one weighted candidate into the reservoir."""
    w_sum = res.w_sum + w
    accept = (u_accept * jnp.maximum(w_sum, 1e-20)) < w
    return Reservoir(
        y_light=jnp.where(accept, cand_li, res.y_light),
        y_uv=jnp.where(accept[..., None], cand_uv, res.y_uv),
        w_sum=w_sum,
        m_count=res.m_count + count,
        w_out=res.w_out,
    )


def initial_candidates(gb: GBuffer, lights: LightList, envmap: EnvMap,
                       seed, sample_idx, n_candidates: int = 8,
                       regir_grid=None):
    """RIS over light candidates from the power CDF (initial resampling,
    RtxdiPass 'GenerateInitialSamples' analog). With `regir_grid`, the
    discrete candidate source is the shading point's ReGIR cell reservoirs
    instead of the global CDF (RtxdiPass local-light presampling mode) —
    the RIS source pdf swaps the global power pmf for the cell's effective
    selection density, keeping the estimator unbiased."""
    n = gb.pos.shape[0]
    res = empty_reservoir(n)
    if regir_grid is not None:
        from rtxpt_tpu.lighting.regir import cell_of
        cell = cell_of(regir_grid, gb.pos)
        pmf_rows = jnp.take(regir_grid.slot_pmf, cell, axis=0)   # [N,K]
        cdf_rows = jnp.cumsum(pmf_rows, -1)
        slots_rows = jnp.take(regir_grid.slots, cell, axis=0)
        w_rows = jnp.take(regir_grid.slot_w, cell, axis=0)
        kk = regir_grid.slots.shape[1]
    for k in range(n_candidates):
        u_sel = rng.uniform_sample(seed, jnp.uint32(4 * k + 0))
        u1 = rng.uniform_sample(seed, jnp.uint32(4 * k + 1))
        u2 = rng.uniform_sample(seed, jnp.uint32(4 * k + 2))
        u_acc = rng.uniform_sample(seed, jnp.uint32(4 * k + 3))
        if regir_grid is not None:
            slot = jnp.clip(jnp.sum(
                (cdf_rows < jnp.clip(u_sel, 0.0, 1.0 - 1e-7)[..., None])
                .astype(jnp.int32), -1), 0, kk - 1)
            li = jnp.take_along_axis(slots_rows, slot[..., None],
                                     axis=-1)[..., 0]
            w_slot = jnp.take_along_axis(w_rows, slot[..., None],
                                         axis=-1)[..., 0]
            pmf_slot = jnp.take_along_axis(pmf_rows, slot[..., None],
                                           axis=-1)[..., 0]
            sel_global = jnp.maximum(
                jnp.take(lights.power, jnp.maximum(li, 0)), 1e-12)
            sel_ratio = jnp.where(w_slot > 1e-12,
                                  kk * pmf_slot
                                  / jnp.maximum(w_slot, 1e-12)
                                  / sel_global, 0.0)
        else:
            li = jnp.clip(jnp.searchsorted(
                lights.cdf, jnp.clip(u_sel, 0.0, 1.0 - 1e-7)),
                0, lights.count - 1).astype(jnp.int32)
            sel_ratio = 1.0
        uv = jnp.stack([u1, u2], -1)
        # RIS weight = p_hat / p_source, with area/solid-angle jacobians
        # folded consistently via eval_light_sample's pdf.
        p_hat, _, _, src_pdf = _target_pdf(gb, lights, envmap, li, uv)
        src_pdf = src_pdf * sel_ratio
        w = jnp.where((src_pdf > 1e-11) & (li >= 0), p_hat / src_pdf, 0.0)
        res = _reservoir_update(res, jnp.maximum(li, 0), uv, w, u_acc)
    return _finalize(res, gb, lights, envmap)


def _finalize(res: Reservoir, gb, lights, envmap):
    p_hat_y, _, _, _ = _target_pdf(gb, lights, envmap,
                                   jnp.maximum(res.y_light, 0), res.y_uv)
    w_out = jnp.where((res.y_light >= 0) & (p_hat_y > 1e-11),
                      res.w_sum / (jnp.maximum(res.m_count, 1.0)
                                   * jnp.maximum(p_hat_y, 1e-11)),
                      0.0)
    return res._replace(w_out=w_out)


def visibility_filter(res: Reservoir, gb: GBuffer, lights, envmap, bvh):
    wi, dist, _Li, _ = eval_light_sample(lights, envmap,
                                         jnp.maximum(res.y_light, 0),
                                         res.y_uv, gb.pos)
    o = ray_offset(gb.pos, gb.geo_normal, wi)
    n = gb.pos.shape[0]
    do_test = gb.valid & (res.y_light >= 0) & (res.w_out > 0.0)
    occ = intersect_any(bvh, o, wi, jnp.zeros((n,), jnp.float32),
                        jnp.where(do_test, dist * (1.0 - 1e-4), 0.0))
    keep = ~occ
    return res._replace(w_out=jnp.where(keep, res.w_out, 0.0))


def _gather_gb(gb: GBuffer, qi) -> GBuffer:
    return GBuffer(*[jnp.take(f, qi, axis=0) for f in gb])


def _phat(gb, lights, envmap, res: Reservoir):
    """Target pdf of a reservoir's sample at surface gb (0 when empty)."""
    p, _, _, _ = _target_pdf(gb, lights, envmap,
                             jnp.maximum(res.y_light, 0), res.y_uv)
    return jnp.where(res.y_light >= 0, p, 0.0)


def _pairwise_combine(res_c: Reservoir, neighbors, gb, gbs_n, lights,
                      envmap, u_accepts):
    """Unbiased multi-reservoir combination at gb's surface with the
    exact Talbot balance heuristic over ALL participating strategies
    (canonical + k neighbors) — the bias-corrected combination of
    RtxdiPass.cpp:354-406. For each candidate sample X_s:

        m_s(X_s) = M_s p_hat_s(X_s) / sum_t M_t p_hat_t(X_s)
        w_s      = m_s(X_s) * p_hat_c(X_s) * W_s

    which is a partition of unity over strategies (samples a neighbor
    could not have produced, e.g. across geometric edges, are reweighted
    instead of biasing the estimate). Contribution weight
    W = w_sum / p_hat_c(y) — the MIS weights replace 1/M.

    neighbors: list of Reservoir (gathered + validity-masked);
    gbs_n: their OWN surfaces (each strategy's target-pdf domain)."""
    strategies = [(res_c, gb)] + list(zip(neighbors, gbs_n))
    counts = [jnp.where((r.y_light >= 0), jnp.maximum(r.m_count, 0.0), 0.0)
              for r, _ in strategies]

    out = empty_reservoir(res_c.y_light.shape[0])
    u_can = (u_accepts[-1] * 0.731 + 0.137) % 1.0
    accepts = [u_can] + list(u_accepts)
    for si, (r_s, _) in enumerate(strategies):
        # denominator: sum_t M_t * p_hat_t(X_s) over every strategy's own
        # surface, evaluated at THIS candidate
        den = jnp.zeros_like(r_s.w_out)
        phat_c_Xs = None
        for ti, (_, gb_t) in enumerate(strategies):
            p_t = _phat(gb_t, lights, envmap, r_s)
            if ti == 0:
                phat_c_Xs = p_t
            den = den + counts[ti] * p_t
        m_s = jnp.where(den > 0.0,
                        counts[si] * _phat(strategies[si][1], lights,
                                           envmap, r_s)
                        / jnp.maximum(den, 1e-20), 0.0)
        w_s = m_s * phat_c_Xs * r_s.w_out
        has = (r_s.y_light >= 0) & (counts[si] > 0.0)
        out = _reservoir_update(out, r_s.y_light, r_s.y_uv,
                                jnp.where(has, w_s, 0.0), accepts[si],
                                count=r_s.m_count)
    # contribution weight: MIS weights replace the 1/M normalization
    phat_y = _phat(gb, lights, envmap, out)
    w_out = jnp.where((out.y_light >= 0) & (phat_y > 1e-11),
                      out.w_sum / jnp.maximum(phat_y, 1e-11), 0.0)
    return out._replace(w_out=w_out)


def temporal_reuse(res: Reservoir, prev: Optional[Reservoir], gb: GBuffer,
                   prev_gb: Optional[GBuffer], lights, envmap, motion_flat,
                   width: int, height: int, seed, m_clamp: float = 20.0):
    """Reproject previous reservoirs and merge with pairwise (balance-
    heuristic) MIS (RtxdiPass temporal + bias correction)."""
    if prev is None or prev_gb is None:
        return res
    n = gb.pos.shape[0]
    px = jnp.arange(n, dtype=jnp.int32) % width
    py = jnp.arange(n, dtype=jnp.int32) // width
    qx = jnp.clip(jnp.round(px + motion_flat[..., 0]).astype(jnp.int32),
                  0, width - 1)
    qy = jnp.clip(jnp.round(py + motion_flat[..., 1]).astype(jnp.int32),
                  0, height - 1)
    qi = qy * width + qx
    prev_at = Reservoir(*[jnp.take(f, qi, axis=0) for f in prev])
    prev_gb_at = _gather_gb(prev_gb, qi)
    # geometric validation
    ok = (jnp.abs(prev_gb_at.depth - gb.depth)
          < 0.1 * jnp.maximum(gb.depth, 1e-3)) \
        & (jnp.sum(prev_gb_at.normal * gb.normal, -1) > 0.9) & gb.valid
    prev_at = prev_at._replace(
        y_light=jnp.where(ok, prev_at.y_light, -1),
        m_count=jnp.where(ok, jnp.minimum(prev_at.m_count, m_clamp), 0.0),
        w_out=jnp.where(ok, prev_at.w_out, 0.0))
    u = rng.uniform_sample(seed, jnp.uint32(101))
    return _pairwise_combine(res, [prev_at], gb, [prev_gb_at], lights,
                             envmap, [u])


def spatial_reuse(res: Reservoir, gb: GBuffer, lights, envmap, width: int,
                  height: int, seed, n_neighbors: int = 4,
                  radius: float = 16.0, m_clamp: float = 100.0):
    """Merge reservoirs from nearby similar pixels with pairwise MIS
    (RtxdiPass spatial + bias correction, RtxdiPass.cpp:354-406)."""
    n = gb.pos.shape[0]
    px = jnp.arange(n, dtype=jnp.int32) % width
    py = jnp.arange(n, dtype=jnp.int32) // width
    neighbors, gbs, us = [], [], []
    for k in range(n_neighbors):
        u1 = rng.uniform_sample(seed, jnp.uint32(200 + 3 * k))
        u2 = rng.uniform_sample(seed, jnp.uint32(201 + 3 * k))
        ua = rng.uniform_sample(seed, jnp.uint32(202 + 3 * k))
        r = radius * jnp.sqrt(u1)
        phi = 2.0 * jnp.pi * u2
        qx = jnp.clip(px + jnp.round(r * jnp.cos(phi)).astype(jnp.int32),
                      0, width - 1)
        qy = jnp.clip(py + jnp.round(r * jnp.sin(phi)).astype(jnp.int32),
                      0, height - 1)
        qi = qy * width + qx
        nb = Reservoir(*[jnp.take(f, qi, axis=0) for f in res])
        gb_q = _gather_gb(gb, qi)
        # similarity gates
        ok = (jnp.abs(gb_q.depth - gb.depth)
              < 0.1 * jnp.maximum(gb.depth, 1e-3)) \
            & (jnp.sum(gb_q.normal * gb.normal, -1) > 0.9) & gb.valid
        nb = nb._replace(
            y_light=jnp.where(ok, nb.y_light, -1),
            m_count=jnp.where(ok, jnp.minimum(nb.m_count, m_clamp), 0.0),
            w_out=jnp.where(ok, nb.w_out, 0.0))
        neighbors.append(nb)
        gbs.append(gb_q)
        us.append(ua)
    return _pairwise_combine(res, neighbors, gb, gbs, lights, envmap, us)



def final_shade(res: Reservoir, gb: GBuffer, lights, envmap, bvh,
                shadow: bool = True):
    """Shade with the surviving reservoir sample (fused DI final analog,
    RtxdiPass::ExecuteFusedDIGIFinal)."""
    li = jnp.maximum(res.y_light, 0)
    wi, dist, Li, _ = eval_light_sample(lights, envmap, li, res.y_uv, gb.pos)
    wo_l = m.to_local(gb.view, gb.normal)
    wi_l = m.to_local(wi, gb.normal)
    f = B.bsdf_eval(_surface_bsdf(gb), wo_l, wi_l)
    contrib = f * Li * res.w_out[..., None]
    ok = gb.valid & (res.y_light >= 0) & (res.w_out > 0.0)
    if shadow:
        o = ray_offset(gb.pos, gb.geo_normal, wi)
        n = gb.pos.shape[0]
        occ = intersect_any(bvh, o, wi, jnp.zeros((n,), jnp.float32),
                            jnp.where(ok, dist * (1.0 - 1e-4), 0.0))
        ok = ok & ~occ
    return jnp.where(ok[..., None], contrib, 0.0)


def gbuffer_from_hit(scene, o, d, hit):
    """Build the compact resampling G-buffer from an existing hit
    wavefront — e.g. a stable plane's V-buffer restart surface (the
    reference composes RTXDI over the stable-plane base surface,
    RtxdiPass.cpp:354,519). Returns (GBuffer, emissive [N,3])."""
    from rtxpt_tpu.pt.surface import load_surface

    n = o.shape[0]
    surf = load_surface(scene, hit, o, d, jnp.zeros((n,), jnp.float32))
    valid = ~hit.miss
    return GBuffer(
        pos=surf.pos,
        normal=surf.sh_n,
        geo_normal=surf.geo_n,
        view=-d,
        diffuse=surf.bsdf.diffuse,
        specular_f0=surf.bsdf.specular_f0,
        roughness=jnp.sqrt(surf.bsdf.alpha),
        depth=jnp.where(valid, hit.t, 0.0),
    ), surf.emissive


def gbuffer_from_primary(scene, cam, width: int, height: int,
                         jitter=(0.5, 0.5)):
    """Trace primary rays and build the compact resampling G-buffer."""
    from rtxpt_tpu.accel.traverse import intersect_closest
    from rtxpt_tpu.scene.camera import camera_ray

    px = jnp.tile(jnp.arange(width, dtype=jnp.int32)[None, :],
                  (height, 1)).reshape(-1)
    py = jnp.tile(jnp.arange(height, dtype=jnp.int32)[:, None],
                  (1, width)).reshape(-1)
    n = px.shape[0]
    o, d, _ = camera_ray(cam, px, py,
                         jnp.full((n,), jitter[0], jnp.float32),
                         jnp.full((n,), jitter[1], jnp.float32))
    hit = intersect_closest(scene.bvh, o, d, jnp.zeros((n,), jnp.float32),
                            jnp.full((n,), 1e30, jnp.float32))
    return gbuffer_from_hit(scene, o, d, hit)


class ReSTIRState(NamedTuple):
    reservoir: Optional[Reservoir]
    gbuffer: Optional[GBuffer]


def restir_di(gb: GBuffer, lights, envmap, bvh, width: int, height: int,
              frame_index, state: Optional[ReSTIRState] = None,
              n_candidates: int = 8, spatial_passes: int = 1,
              motion_flat=None, regir_grid=None):
    """Full DI pipeline for one frame over a flat G-buffer. Returns
    (direct_radiance [N,3], new_state). `motion_flat` [N,2] enables
    motion-aware temporal reprojection; `regir_grid` swaps the candidate
    source to ReGIR cell reservoirs."""
    n = gb.pos.shape[0]
    px = jnp.arange(n, dtype=jnp.uint32)
    seed = rng.hash_combine(px, rng.hash_combine(
        jnp.uint32(frame_index), jnp.uint32(0x9E3779B9)))

    res = initial_candidates(gb, lights, envmap, seed,
                             frame_index, n_candidates,
                             regir_grid=regir_grid)
    res = visibility_filter(res, gb, lights, envmap, bvh)
    if state is not None and state.reservoir is not None:
        motion = (jnp.zeros((n, 2), jnp.float32) if motion_flat is None
                  else motion_flat)
        res = temporal_reuse(res, state.reservoir, gb, state.gbuffer,
                             lights, envmap, motion, width, height, seed)
    for _ in range(spatial_passes):
        res = spatial_reuse(res, gb, lights, envmap, width, height, seed)
    color = final_shade(res, gb, lights, envmap, bvh)
    return color, ReSTIRState(reservoir=res, gbuffer=gb)
