"""Stable planes: path-space decomposition for denoising.

TPU re-design of the reference's stable-planes system (reference:
Shaders/PathTracer/StablePlanes.hlsli — up to cStablePlaneCount=3 denoising
layers per pixel keyed by a delta-chain branch id; build/fill handlers in
PathTracerStablePlanes.hlsli; driven by PathTrace BUILD/FILL dispatches,
Sample.cpp:2456-2517).

Round-1 decomposition (the dominant practical cases):
  * plane 0 follows the camera ray through the *reflection* side of any
    delta chain (mirrors / smooth-metal / fresnel-reflection of glass) to
    its first non-delta surface,
  * plane 1 follows the *transmission* branch of the first smooth-glass
    surface (throughput-weighted by Fresnel),
  * each plane yields a restart ray (origin/direction/throughput) whose
    wavefront fill is just `trace_paths` from that segment, plus guide
    buffers for its own denoiser instance — mirroring how the reference
    runs one NRD instance per plane (Sample.h:327).

The deterministic BUILD walk uses no RNG — delta chains are unique — so
planes are temporally stable, which is the entire point.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from rtxpt_tpu.accel.traverse import intersect_closest
from rtxpt_tpu.pt import bsdf as B
from rtxpt_tpu.pt.surface import load_surface, ray_offset
from rtxpt_tpu.scene.scene import SceneData
from rtxpt_tpu.utils import math as m

MAX_PLANES = 2          # round 1: reflection chain + one transmission split
MAX_DELTA_DEPTH = 3


class Plane(NamedTuple):
    o: jnp.ndarray        # [N,3] restart ray origin
    d: jnp.ndarray        # [N,3] restart ray direction
    thp: jnp.ndarray      # [N,3] throughput carried to this plane
    valid: jnp.ndarray    # [N] plane exists
    # guide buffers at the plane's base surface (for its denoiser)
    pos: jnp.ndarray      # [N,3]
    normal: jnp.ndarray   # [N,3]
    albedo: jnp.ndarray   # [N,3]
    depth: jnp.ndarray    # [N] accumulated chain length


def _is_delta(surf):
    return (surf.bsdf.alpha < B.DELTA_ALPHA) & (
        (m.luminance(surf.bsdf.specular_f0) > 0.04)
        | (surf.bsdf.transmission > 0.5))


def decompose(scene: SceneData, o, d):
    """BUILD pass: deterministic delta-chain walk from camera rays.

    Returns (planes: list[Plane] length MAX_PLANES, background mask)."""
    n = o.shape[0]
    f32 = jnp.float32
    zeros3 = jnp.zeros((n, 3), f32)

    planes = []
    # state of the reflection-side walk
    cur_o, cur_d = o, d
    thp = jnp.ones((n, 3), f32)
    walking = jnp.ones((n,), bool)
    chain_len = jnp.zeros((n,), f32)
    background = jnp.zeros((n,), bool)

    trans_o = zeros3
    trans_d = zeros3
    trans_thp = zeros3
    trans_valid = jnp.zeros((n,), bool)

    plane0 = None
    for depth in range(MAX_DELTA_DEPTH + 1):
        hit = intersect_closest(scene.bvh, cur_o, cur_d,
                                jnp.zeros((n,), f32),
                                jnp.full((n,), 1e30, f32))
        surf = load_surface(scene, hit, cur_o, cur_d,
                            jnp.zeros((n,), f32))
        miss = hit.miss & walking
        background = background | (miss & (chain_len == 0.0))
        walking = walking & ~hit.miss
        chain_len = chain_len + jnp.where(walking, hit.t, 0.0)

        delta = _is_delta(surf) & walking & (depth < MAX_DELTA_DEPTH)

        # Terminal (non-delta or depth-capped) surfaces become plane 0
        terminal = walking & ~delta
        if plane0 is None:
            plane0 = Plane(o=cur_o, d=cur_d, thp=thp, valid=terminal,
                           pos=surf.pos, normal=surf.sh_n,
                           albedo=surf.bsdf.diffuse + surf.bsdf.specular_f0,
                           depth=chain_len)
        else:
            newly = terminal & ~plane0.valid
            plane0 = Plane(
                o=jnp.where(newly[:, None], cur_o, plane0.o),
                d=jnp.where(newly[:, None], cur_d, plane0.d),
                thp=jnp.where(newly[:, None], thp, plane0.thp),
                valid=plane0.valid | newly,
                pos=jnp.where(newly[:, None], surf.pos, plane0.pos),
                normal=jnp.where(newly[:, None], surf.sh_n, plane0.normal),
                albedo=jnp.where(newly[:, None],
                                 surf.bsdf.diffuse + surf.bsdf.specular_f0,
                                 plane0.albedo),
                depth=jnp.where(newly, chain_len, plane0.depth),
            )

        # Delta interaction: fresnel-split; reflection continues the walk,
        # the FIRST transmission branch is recorded as plane 1's restart.
        wo = m.to_local(-cur_d, surf.sh_n)
        woz = jnp.clip(wo[..., 2], 0.0, 1.0)
        f_mirror = B.fresnel_schlick(surf.bsdf.specular_f0, woz)
        Fd = B.fresnel_dielectric(woz, surf.bsdf.eta)
        has_trans = surf.bsdf.transmission > 0.5
        refl_w = jnp.where(has_trans[:, None], Fd[:, None],
                           jnp.maximum(f_mirror, 1e-3))
        # reflection direction
        wi_r = m.reflect(m.normalize(-cur_d), surf.sh_n)
        # refraction direction (delta)
        cos_i = m.dot(-cur_d, surf.sh_n)
        eta = surf.bsdf.eta
        sin2t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i[..., 0] ** 2)
        tir = sin2t >= 1.0
        cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2t))
        wi_t = m.normalize(eta[:, None] * cur_d
                           + (eta * cos_i[..., 0] - cos_t)[:, None]
                           * surf.sh_n)

        new_trans = delta & has_trans & ~tir & ~trans_valid
        trans_o = jnp.where(new_trans[:, None],
                            ray_offset(surf.pos, surf.geo_n, wi_t), trans_o)
        trans_d = jnp.where(new_trans[:, None], wi_t, trans_d)
        trans_thp = jnp.where(new_trans[:, None],
                              thp * (1.0 - Fd[:, None]), trans_thp)
        trans_valid = trans_valid | new_trans

        thp = jnp.where(delta[:, None], thp * refl_w, thp)
        nxt_o = ray_offset(surf.pos, surf.geo_n, wi_r)
        cur_o = jnp.where(delta[:, None], nxt_o, cur_o)
        cur_d = jnp.where(delta[:, None], wi_r, cur_d)
        walking = delta

    plane1 = Plane(o=trans_o, d=trans_d, thp=trans_thp, valid=trans_valid,
                   pos=trans_o, normal=zeros3, albedo=zeros3 + 1.0,
                   depth=jnp.zeros((n,), f32))
    return [plane0, plane1], background
