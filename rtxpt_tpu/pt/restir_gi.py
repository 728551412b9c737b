"""ReSTIR GI: reservoir resampling of one-bounce indirect sample points.

TPU analog of the reference's RTXDI GI path (reference: RtxdiPass::
ExecuteGI — GI temporal + spatial resampling + final shade,
RtxdiPass.cpp:519-542; SURVEY.md §2.5), following the public ReSTIR GI
formulation (Ouyang et al. 2021): each pixel keeps a reservoir over
*secondary sample points* (position, normal, outgoing radiance). Reuse
across pixels converts the stored sample between solid-angle domains with
the reconnection Jacobian. Target function p_hat = luminance(L_s) (the
standard simplification; the BSDF is applied at final shade).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rtxpt_tpu.accel.traverse import intersect_any
from rtxpt_tpu.pt import bsdf as B
from rtxpt_tpu.pt.restir import GBuffer, _surface_bsdf
from rtxpt_tpu.pt.surface import ray_offset
from rtxpt_tpu.utils import math as m
from rtxpt_tpu.utils import rng


class GIReservoir(NamedTuple):
    pos: jnp.ndarray       # [N,3] sample point
    normal: jnp.ndarray    # [N,3] sample-point normal
    radiance: jnp.ndarray  # [N,3] outgoing radiance from the sample point
    w_sum: jnp.ndarray     # [N]
    m_count: jnp.ndarray   # [N]
    w_out: jnp.ndarray     # [N]
    valid: jnp.ndarray     # [N]


def _empty(n):
    z3 = jnp.zeros((n, 3), jnp.float32)
    z = jnp.zeros((n,), jnp.float32)
    return GIReservoir(pos=z3, normal=z3, radiance=z3, w_sum=z,
                       m_count=z, w_out=z, valid=jnp.zeros((n,), bool))


def _p_hat(radiance):
    return m.luminance(radiance)


def initial_samples(scene, gb: GBuffer, cfg, px, py, frame_index):
    """Trace one BSDF-sampled indirect path per pixel from the primary
    surface; its hit point + incoming radiance estimate seed the reservoir
    (RTXDI GI initial sampling)."""
    from rtxpt_tpu.accel.traverse import intersect_closest
    from rtxpt_tpu.pt.integrator import trace_paths
    from rtxpt_tpu.pt.surface import load_surface

    n = gb.pos.shape[0]
    seed = rng.pixel_seed(px, py, 101, 51)
    sidx = jnp.uint32(frame_index)
    u_l = rng.ld_sample(sidx, seed, 0)
    u1 = rng.ld_sample(sidx, seed, 2)
    u2 = rng.ld_sample(sidx, seed, 3)

    bsdf = _surface_bsdf(gb)
    wo_l = m.to_local(gb.view, gb.normal)
    bs = B.bsdf_sample(bsdf, wo_l, u_l, u1, u2)
    wi = m.to_world(bs["wi"], gb.normal)
    src_pdf = jnp.maximum(bs["pdf"], 1e-6)

    o = ray_offset(gb.pos, gb.geo_normal, wi)
    hit = intersect_closest(scene.bvh, o, wi, jnp.zeros((n,), jnp.float32),
                            jnp.full((n,), 1e30, jnp.float32))
    surf = load_surface(scene, hit, o, wi, jnp.zeros((n,), jnp.float32))
    found = gb.valid & ~hit.miss & ~bs["is_delta"] & bs["valid"]

    # Outgoing radiance from the sample point toward the primary surface:
    # continue the path from the sample point (short budget).
    # Exclude emission directly visible along wi (that is the DI pass's
    # domain at the primary surface — avoids DI+GI double counting).
    out = trace_paths(scene, cfg, o, wi,
                      jnp.zeros((n,), jnp.float32), px, py,
                      sidx + jnp.uint32(0x9E37), want_aux=False,
                      first_emissive=False)
    L_s = out["L"]   # radiance arriving at the primary surface along wi

    res = _empty(n)
    p = _p_hat(L_s)
    w = jnp.where(found & (src_pdf > 1e-6), p / src_pdf, 0.0)
    res = GIReservoir(pos=surf.pos, normal=surf.sh_n, radiance=L_s,
                      w_sum=w, m_count=jnp.where(found, 1.0, 0.0),
                      w_out=jnp.zeros((n,)), valid=found)
    return _finalize(res)


def _finalize(res: GIReservoir) -> GIReservoir:
    p = _p_hat(res.radiance)
    w_out = jnp.where(res.valid & (p > 1e-9) & (res.m_count > 0),
                      res.w_sum / (jnp.maximum(res.m_count, 1.0)
                                   * jnp.maximum(p, 1e-9)), 0.0)
    return res._replace(w_out=w_out)


def _reconnect_jacobian(gb_pos, res: GIReservoir, src_pos):
    """|J| for reusing a sample point stored at src_pos from gb_pos."""
    d_new = res.pos - gb_pos
    d_old = res.pos - src_pos
    r2_new = jnp.maximum(m.dot(d_new, d_new, False), 1e-9)
    r2_old = jnp.maximum(m.dot(d_old, d_old, False), 1e-9)
    cos_new = jnp.abs(m.dot(res.normal, -d_new / jnp.sqrt(r2_new)[..., None],
                            False))
    cos_old = jnp.abs(m.dot(res.normal, -d_old / jnp.sqrt(r2_old)[..., None],
                            False))
    return jnp.clip((cos_new * r2_old) / jnp.maximum(cos_old * r2_new,
                                                     1e-9), 0.0, 50.0)


def _merge(a: GIReservoir, b: GIReservoir, gb_pos, b_src_pos, u_accept,
           m_clamp: float):
    mb = jnp.minimum(b.m_count, m_clamp)
    jac = _reconnect_jacobian(gb_pos, b, b_src_pos)
    p_b = _p_hat(b.radiance) * jac
    w_b = jnp.where(b.valid, p_b * b.w_out * mb, 0.0)
    w_sum = a.w_sum + w_b
    accept = b.valid & ((u_accept * jnp.maximum(w_sum, 1e-20)) < w_b)
    merged = GIReservoir(
        pos=jnp.where(accept[:, None], b.pos, a.pos),
        normal=jnp.where(accept[:, None], b.normal, a.normal),
        radiance=jnp.where(accept[:, None], b.radiance, a.radiance),
        w_sum=w_sum,
        m_count=a.m_count + mb,
        w_out=a.w_out,
        valid=a.valid | b.valid,
    )
    return _finalize(merged)


def spatial_reuse(res: GIReservoir, gb: GBuffer, width, height, seed,
                  n_neighbors: int = 2, radius: float = 16.0,
                  m_clamp: float = 100.0):
    n = gb.pos.shape[0]
    px = jnp.arange(n, dtype=jnp.int32) % width
    py = jnp.arange(n, dtype=jnp.int32) // width
    out = res
    for k in range(n_neighbors):
        u1 = rng.uniform_sample(seed, jnp.uint32(300 + 3 * k))
        u2 = rng.uniform_sample(seed, jnp.uint32(301 + 3 * k))
        ua = rng.uniform_sample(seed, jnp.uint32(302 + 3 * k))
        r = radius * jnp.sqrt(u1)
        phi = 2.0 * jnp.pi * u2
        qx = jnp.clip(px + jnp.round(r * jnp.cos(phi)).astype(jnp.int32),
                      0, width - 1)
        qy = jnp.clip(py + jnp.round(r * jnp.sin(phi)).astype(jnp.int32),
                      0, height - 1)
        qi = qy * width + qx
        nb = GIReservoir(*[jnp.take(f, qi, axis=0) for f in out])
        qdepth = jnp.take(gb.depth, qi)
        qnormal = jnp.take(gb.normal, qi, axis=0)
        ok = (jnp.abs(qdepth - gb.depth) < 0.1 * jnp.maximum(gb.depth, 1e-3)) \
            & (jnp.sum(qnormal * gb.normal, -1) > 0.9) & gb.valid
        nb = nb._replace(valid=nb.valid & ok,
                         m_count=jnp.where(ok, nb.m_count, 0.0),
                         w_out=jnp.where(ok, nb.w_out, 0.0))
        out = _merge(out, nb, gb.pos, jnp.take(gb.pos, qi, axis=0), ua,
                     m_clamp)
    return out


def temporal_reuse(res: GIReservoir, prev: Optional[GIReservoir],
                   gb: GBuffer, prev_gb: Optional[GBuffer], seed,
                   m_clamp: float = 20.0, motion_flat=None,
                   width: int = 0, height: int = 0):
    """Motion-aware temporal reuse: reproject the previous reservoirs by
    the frame's motion vectors before validation/merge (RtxdiPass GI
    temporal; fixes the camera-static limitation of round 1)."""
    if prev is None or prev_gb is None:
        return res
    if motion_flat is not None and width > 0:
        n = gb.pos.shape[0]
        px = jnp.arange(n, dtype=jnp.int32) % width
        py = jnp.arange(n, dtype=jnp.int32) // width
        qx = jnp.clip(jnp.round(px + motion_flat[..., 0])
                      .astype(jnp.int32), 0, width - 1)
        qy = jnp.clip(jnp.round(py + motion_flat[..., 1])
                      .astype(jnp.int32), 0, height - 1)
        qi = qy * width + qx
        prev = GIReservoir(*[jnp.take(f, qi, axis=0) for f in prev])
        prev_gb = GBuffer(*[jnp.take(f, qi, axis=0) for f in prev_gb])
    ok = (jnp.abs(prev_gb.depth - gb.depth)
          < 0.1 * jnp.maximum(gb.depth, 1e-3)) \
        & (jnp.sum(prev_gb.normal * gb.normal, -1) > 0.9) & gb.valid
    prev = prev._replace(valid=prev.valid & ok,
                         m_count=jnp.where(ok, prev.m_count, 0.0),
                         w_out=jnp.where(ok, prev.w_out, 0.0))
    u = rng.uniform_sample(seed, jnp.uint32(401))
    return _merge(res, prev, gb.pos, prev_gb.pos, u, m_clamp)


def final_shade(res: GIReservoir, gb: GBuffer, bvh, shadow: bool = True):
    """Indirect radiance: f(wo, wi_s) * L_s * W with a reconnection
    visibility ray."""
    d = res.pos - gb.pos
    dist = jnp.sqrt(jnp.maximum(m.dot(d, d, False), 1e-12))
    wi = d / dist[..., None]
    bsdf = _surface_bsdf(gb)
    wo_l = m.to_local(gb.view, gb.normal)
    wi_l = m.to_local(wi, gb.normal)
    f = B.bsdf_eval(bsdf, wo_l, wi_l)
    contrib = f * res.radiance * res.w_out[..., None]
    ok = gb.valid & res.valid & (res.w_out > 0.0)
    if shadow:
        o = ray_offset(gb.pos, gb.geo_normal, wi)
        n = gb.pos.shape[0]
        occ = intersect_any(bvh, o, wi, jnp.zeros((n,), jnp.float32),
                            jnp.where(ok, dist * (1.0 - 1e-3), 0.0))
        ok = ok & ~occ
    return jnp.where(ok[:, None], contrib, 0.0)


class GIState(NamedTuple):
    reservoir: Optional[GIReservoir]
    gbuffer: Optional[GBuffer]


def restir_gi(scene, gb: GBuffer, cfg, width: int, height: int,
              frame_index, state: Optional[GIState] = None,
              spatial_passes: int = 1, motion_flat=None):
    """Full GI pipeline for one frame. Returns (indirect radiance [N,3],
    new state). `cfg` bounds the initial path's continuation budget;
    `motion_flat` [N,2] enables motion-aware temporal reprojection."""
    n = gb.pos.shape[0]
    px = jnp.arange(n, dtype=jnp.int32) % width
    py = jnp.arange(n, dtype=jnp.int32) // width
    seed = rng.hash_combine(jnp.arange(n, dtype=jnp.uint32),
                            jnp.uint32(frame_index) * jnp.uint32(2654435761))
    res = initial_samples(scene, gb, cfg, px, py, frame_index)
    if state is not None and state.reservoir is not None:
        res = temporal_reuse(res, state.reservoir, gb, state.gbuffer, seed,
                             motion_flat=motion_flat, width=width,
                             height=height)
    for _ in range(spatial_passes):
        res = spatial_reuse(res, gb, width, height, seed)
    color = final_shade(res, gb, scene.bvh)
    return color, GIState(reservoir=res, gbuffer=gb)
