"""Stable planes: path-space decomposition for denoising.

TPU re-design of the reference's stable-planes system (reference:
Shaders/PathTracer/StablePlanes.hlsli:31-80 — up to cStablePlaneCount=3
denoising layers per pixel keyed by a 4-ary stableBranchID; build/fill
handlers in PathTracerStablePlanes.hlsli; driven by PathTrace BUILD/FILL
dispatches, Sample.cpp:2456-2517; one NRD instance per plane Sample.h:327).

Decomposition (deterministic — no RNG — so planes are temporally stable):

  * The BUILD walk follows the DOMINANT delta lobe at each smooth
    (delta) vertex: transmission when (1-F) carries more luminance than
    the Fresnel reflection, else reflection. The walk ends at the first
    non-delta surface, which becomes PLANE 0's base.
  * At every delta fork along the way the NON-dominant lobe's restart
    ray is recorded; the two strongest forks (by throughput luminance)
    seed PLANES 1 and 2, each of which then runs its own dominant-lobe
    walk to a non-delta base — so e.g. glass-over-mirror yields
    [transmitted floor, mirror chain, inter-reflection] layers, each
    with REAL guide buffers from its own base surface.
  * Branch IDs use the reference's 4-ary code: id' = id*4 + (1+lobe)
    (lobe 0 = delta reflection, 1 = delta transmission), root id 1.
  * Each plane stores its base hit as a V-BUFFER (prim/bary/t/front);
    the FILL pass restarts `trace_paths(first_hit=...)` from it, paying
    zero re-traversal for the plane's first segment
    (PathTracerSample.hlsl:34-94 FirstHitFromVBuffer analog).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from rtxpt_tpu.accel.traverse import Hit, scene_closest
from rtxpt_tpu.pt import bsdf as B
from rtxpt_tpu.pt.surface import load_surface, ray_offset
from rtxpt_tpu.scene.scene import SceneData
from rtxpt_tpu.utils import math as m

MAX_PLANES = 3          # cStablePlaneCount (StablePlanes.hlsli:31)
MAX_DELTA_DEPTH = 3


class Plane(NamedTuple):
    o: jnp.ndarray        # [N,3] restart ray origin
    d: jnp.ndarray        # [N,3] restart ray direction
    thp: jnp.ndarray      # [N,3] throughput carried to this plane
    valid: jnp.ndarray    # [N] plane exists
    branch_id: jnp.ndarray  # [N] i32 4-ary stableBranchID of the chain
    # guide buffers at the plane's base surface (for its denoiser)
    pos: jnp.ndarray      # [N,3]
    normal: jnp.ndarray   # [N,3]
    albedo: jnp.ndarray   # [N,3]
    depth: jnp.ndarray    # [N] accumulated chain length
    nverts: jnp.ndarray   # [N] i32 path vertices consumed by the chain
    # V-buffer of the base hit (restart trace_paths with first_hit=...)
    vb_prim: jnp.ndarray  # [N] i32
    vb_bary: jnp.ndarray  # [N,2]
    vb_t: jnp.ndarray     # [N]
    vb_front: jnp.ndarray  # [N] bool

    def vbuffer(self, max_travel=1e30) -> Hit:
        return Hit(t=jnp.where(self.valid, self.vb_t, max_travel),
                   prim=jnp.where(self.valid, self.vb_prim, -1),
                   bary=self.vb_bary, front=self.vb_front)


class _Fork(NamedTuple):
    o: jnp.ndarray
    d: jnp.ndarray
    thp: jnp.ndarray
    valid: jnp.ndarray
    branch_id: jnp.ndarray
    nverts: jnp.ndarray


def _is_delta(surf):
    return (surf.bsdf.alpha < B.DELTA_ALPHA) & (
        (m.luminance(surf.bsdf.specular_f0) > 0.04)
        | (surf.bsdf.transmission > 0.5))


def _delta_lobes(surf, cur_d):
    """Delta reflection/transmission directions + Fresnel weights."""
    wo = m.to_local(-cur_d, surf.sh_n)
    woz = jnp.clip(wo[..., 2], 0.0, 1.0)
    f_mirror = B.fresnel_schlick(surf.bsdf.specular_f0, woz)
    Fd = B.fresnel_dielectric(woz, surf.bsdf.eta)
    has_trans = surf.bsdf.transmission > 0.5

    wi_r = m.reflect(m.normalize(-cur_d), surf.sh_n)
    cos_i = m.dot(-cur_d, surf.sh_n)
    eta = surf.bsdf.eta
    sin2t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i[..., 0] ** 2)
    tir = sin2t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2t))
    wi_t = m.normalize(eta[:, None] * cur_d
                       + (eta * cos_i[..., 0] - cos_t)[:, None]
                       * surf.sh_n)
    # lobe weights: dielectric surfaces split by exact Fresnel (TIR gives
    # full reflection); metals/mirrors reflect by Schlick.
    w_refl = jnp.where(has_trans[:, None],
                       jnp.where(tir[:, None], 1.0, Fd[:, None]),
                       jnp.maximum(f_mirror, 1e-3))
    w_trans = jnp.where((has_trans & ~tir)[:, None],
                        (1.0 - Fd)[:, None], 0.0)
    return wi_r, wi_t, w_refl, w_trans


def _walk(scene: SceneData, o, d, thp0, valid0, bid0, nv0, max_depth,
          collect_forks: bool):
    """Dominant-lobe delta walk. Returns (plane, forks[2], background)."""
    n = o.shape[0]
    f32 = jnp.float32
    zeros3 = jnp.zeros((n, 3), f32)
    zi = jnp.zeros((n,), jnp.int32)
    zb = jnp.zeros((n,), bool)

    cur_o, cur_d = o, d
    thp = thp0
    walking = valid0
    bid = bid0
    nverts = nv0
    chain_len = jnp.zeros((n,), f32)
    background = zb

    plane = None
    f1 = _Fork(zeros3, zeros3, zeros3, zb, zi, zi)
    f2 = _Fork(zeros3, zeros3, zeros3, zb, zi, zi)

    for depth in range(max_depth + 1):
        hit = scene_closest(scene, cur_o, cur_d,
                                jnp.zeros((n,), f32),
                                jnp.full((n,), 1e30, f32))
        surf = load_surface(scene, hit, cur_o, cur_d, jnp.zeros((n,), f32))
        miss = hit.miss & walking
        background = background | (miss & (chain_len == 0.0))
        walking = walking & ~hit.miss
        chain_len = chain_len + jnp.where(walking, hit.t, 0.0)

        delta = _is_delta(surf) & walking & (depth < max_depth)
        terminal = walking & ~delta

        albedo = surf.bsdf.diffuse + surf.bsdf.specular_f0
        if plane is None:
            plane = Plane(o=cur_o, d=cur_d, thp=thp, valid=terminal,
                          branch_id=bid, pos=surf.pos, normal=surf.sh_n,
                          albedo=albedo, depth=chain_len, nverts=nverts,
                          vb_prim=hit.prim, vb_bary=hit.bary, vb_t=hit.t,
                          vb_front=hit.front)
        else:
            new = terminal & ~plane.valid
            nw = new[:, None]
            plane = Plane(
                o=jnp.where(nw, cur_o, plane.o),
                d=jnp.where(nw, cur_d, plane.d),
                thp=jnp.where(nw, thp, plane.thp),
                valid=plane.valid | new,
                branch_id=jnp.where(new, bid, plane.branch_id),
                pos=jnp.where(nw, surf.pos, plane.pos),
                normal=jnp.where(nw, surf.sh_n, plane.normal),
                albedo=jnp.where(nw, albedo, plane.albedo),
                depth=jnp.where(new, chain_len, plane.depth),
                nverts=jnp.where(new, nverts, plane.nverts),
                vb_prim=jnp.where(new, hit.prim, plane.vb_prim),
                vb_bary=jnp.where(nw, hit.bary, plane.vb_bary),
                vb_t=jnp.where(new, hit.t, plane.vb_t),
                vb_front=jnp.where(new, hit.front, plane.vb_front),
            )

        wi_r, wi_t, w_refl, w_trans = _delta_lobes(surf, cur_d)
        lum_r = m.luminance(thp * w_refl)
        lum_t = m.luminance(thp * w_trans)
        dom_trans = delta & (lum_t > lum_r)

        if collect_forks:
            # record the NON-dominant lobe as a fork candidate; keep the
            # two strongest by throughput luminance
            fo = ray_offset(surf.pos, surf.geo_n,
                            jnp.where(dom_trans[:, None], wi_r, wi_t))
            fd = jnp.where(dom_trans[:, None], wi_r, wi_t)
            fthp = thp * jnp.where(dom_trans[:, None], w_refl, w_trans)
            fbid = bid * 4 + jnp.where(dom_trans, 1, 2)
            fnv = nverts + 1                 # the fork vertex is consumed
            flum = m.luminance(fthp)
            fvalid = delta & (flum > 1e-4)

            l1 = m.luminance(f1.thp)
            put1 = fvalid & (~f1.valid | (flum > l1))
            # demote the previous f1 into f2 where overwritten
            l2 = m.luminance(f2.thp)
            demote = put1 & f1.valid
            put2 = (fvalid & ~put1 & (~f2.valid
                                      | (flum > l2)))
            f2 = _Fork(
                o=jnp.where(demote[:, None], f1.o,
                            jnp.where(put2[:, None], fo, f2.o)),
                d=jnp.where(demote[:, None], f1.d,
                            jnp.where(put2[:, None], fd, f2.d)),
                thp=jnp.where(demote[:, None], f1.thp,
                              jnp.where(put2[:, None], fthp, f2.thp)),
                valid=jnp.where(demote, f1.valid, f2.valid | put2),
                branch_id=jnp.where(demote, f1.branch_id,
                                    jnp.where(put2, fbid, f2.branch_id)),
                nverts=jnp.where(demote, f1.nverts,
                                 jnp.where(put2, fnv, f2.nverts)))
            f1 = _Fork(
                o=jnp.where(put1[:, None], fo, f1.o),
                d=jnp.where(put1[:, None], fd, f1.d),
                thp=jnp.where(put1[:, None], fthp, f1.thp),
                valid=f1.valid | put1,
                branch_id=jnp.where(put1, fbid, f1.branch_id),
                nverts=jnp.where(put1, fnv, f1.nverts))

        # continue along the dominant lobe
        wi = jnp.where(dom_trans[:, None], wi_t, wi_r)
        thp = thp * jnp.where(delta[:, None],
                              jnp.where(dom_trans[:, None], w_trans,
                                        w_refl), 1.0)
        bid = jnp.where(delta, bid * 4 + jnp.where(dom_trans, 2, 1), bid)
        nverts = nverts + delta.astype(jnp.int32)
        cur_o = jnp.where(delta[:, None],
                          ray_offset(surf.pos, surf.geo_n, wi), cur_o)
        cur_d = jnp.where(delta[:, None], wi, cur_d)
        walking = delta

    return plane, (f1, f2), background


def decompose(scene: SceneData, o, d):
    """BUILD pass: deterministic delta-tree exploration from camera rays.

    Returns (planes: list[Plane] length MAX_PLANES, background mask)."""
    n = o.shape[0]
    ones3 = jnp.ones((n, 3), jnp.float32)
    root_id = jnp.ones((n,), jnp.int32)

    zi = jnp.zeros((n,), jnp.int32)
    plane0, (f1, f2), background = _walk(
        scene, o, d, ones3, jnp.ones((n,), bool), root_id, zi,
        MAX_DELTA_DEPTH, collect_forks=True)

    # planes 1 & 2: continue each fork's own dominant chain (batched as
    # two shorter walks; fork rays already sit past their fork vertex)
    plane1, _, _ = _walk(scene, f1.o, f1.d, f1.thp, f1.valid,
                         f1.branch_id, f1.nverts, MAX_DELTA_DEPTH - 1,
                         collect_forks=False)
    plane2, _, _ = _walk(scene, f2.o, f2.d, f2.thp, f2.valid,
                         f2.branch_id, f2.nverts, MAX_DELTA_DEPTH - 1,
                         collect_forks=False)
    return [plane0, plane1, plane2], background
