"""Lights baker: all scene lighting -> one polymorphic light list + CDF.

TPU-native analog of the reference's LightsBaker + PolymorphicLight
(reference: Lighting/LightsBaker.{h,cpp} — collects analytic lights on CPU,
bakes emissive triangles and the environment into one polymorphic light list
with power-proportional sampling structures; device decode/sampling in
Shaders/PathTracer/Lighting/PolymorphicLight.hlsli:515-720 and
LightSampler.hlsli). This module implements the *uniform* and *power*
samplers (NEEMode.UNIFORM/POWER); the feedback-adaptive NEE-AT tier layers
per-tile proxy caches on top (see lighting/neeat.py when present).

The bake runs on host numpy at scene-prepare time (static scenes); the
per-frame device re-bake for dynamic emissives mirrors this code in jnp.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from rtxpt_tpu.scene.scene import (
    SceneData, LIGHT_POINT, LIGHT_DIRECTIONAL, LIGHT_SPHERE, LIGHT_SPOT,
)
from rtxpt_tpu.lighting.envmap import EnvMap, env_eval, env_sample, env_pdf
from rtxpt_tpu.utils import math as m

# Polymorphic light kinds (PolymorphicLight.h:28-38 analog)
KIND_TRIANGLE = 0
KIND_POINT = 1
KIND_DIRECTIONAL = 2
KIND_SPOT = 3
KIND_ENV = 4
KIND_SPHERE = 5   # analytic sphere area light (PolymorphicLight.h kSphere);
#                   extra[2] = radius, emission = surface radiance. Sampled
#                   by cone toward the subtended cap; NEE-only (no scene
#                   geometry backs it), so it reports is_delta for MIS like
#                   the reference's non-raytraceable analytic lights.
KIND_ENVQUAD = 6  # environment-map region light (PolymorphicLight.h
#                   kEnvironmentQuad / LightsBaker env quad tree analog):
#                   extra = [u0, v0, u1, v1] equirect rect, sampled uniform
#                   in uv. Power-proportional selection over quads gives
#                   region-level importance; per-tile adaptive samplers
#                   (NEE-AT) can then favor bright env REGIONS instead of
#                   treating the whole sky as one light.

_DELTA_DIST = 1e8   # "infinite" distance for directional/env shadow rays


@struct.dataclass
class LightList:
    kind: jnp.ndarray       # [L] i32
    p0: jnp.ndarray         # [L,3] tri v0 / light position
    p1: jnp.ndarray         # [L,3] tri edge1 / spot direction
    p2: jnp.ndarray         # [L,3] tri edge2
    emission: jnp.ndarray   # [L,3] tri radiance / point-spot intensity /
    #                              directional radiance
    extra: jnp.ndarray      # [L,4] kind-specific: tri(area, nx,ny,nz packed
    #                              separately below), spot(cos_in, cos_out)
    normal: jnp.ndarray     # [L,3] tri geometric normal (emission side)
    power: jnp.ndarray      # [L] relative power for selection
    cdf: jnp.ndarray        # [L] inclusive normalized selection CDF
    tri_light: jnp.ndarray  # [T] i32 triangle id -> light index (-1 none)
    env_light: jnp.ndarray  # [] i32 index of env light (-1 none)
    num: jnp.ndarray        # [] i32
    # env quad mode: [GH,GW] light index per equirect uv cell (None when
    # the environment is a single kEnvironment light)
    env_quad_grid: jnp.ndarray = None

    @property
    def count(self) -> int:
        return self.kind.shape[0]


def _env_quad_decompose(img: np.ndarray, n_quads: int):
    """Greedy power-median subdivision of the equirect domain into
    n_quads rects (the LightsBaker env quad-tree analog: subdivide-base +
    boost passes, LightsBaker.hlsl env QT chain). Returns
    (rects [Q,4] u0v0u1v1, mass [Q] power fraction, mean [Q,3])."""
    h, w = img.shape[:2]
    lum = img @ np.asarray([0.2126, 0.7152, 0.0722])
    sin_t = np.sin((np.arange(h) + 0.5) / h * np.pi)[:, None]
    mass = lum * sin_t                                 # ∝ power per texel
    rects = [(0, 0, h, w)]                             # texel-space rects
    while len(rects) < n_quads:
        # split the most powerful rect along its longer axis at the
        # power median
        pw = [mass[y0:y1, x0:x1].sum() for (y0, x0, y1, x1) in rects]
        k = int(np.argmax(pw))
        y0, x0, y1, x1 = rects.pop(k)
        if (y1 - y0) * (x1 - x0) <= 1:
            rects.append((y0, x0, y1, x1))
            break
        if (x1 - x0) * 2 >= (y1 - y0):                 # equirect: u is 2x
            col = mass[y0:y1, x0:x1].sum(0).cumsum()
            s = int(np.searchsorted(col, col[-1] * 0.5)) + 1
            s = min(max(s, 1), x1 - x0 - 1)
            rects += [(y0, x0, y1, x0 + s), (y0, x0 + s, y1, x1)]
        else:
            row = mass[y0:y1, x0:x1].sum(1).cumsum()
            s = int(np.searchsorted(row, row[-1] * 0.5)) + 1
            s = min(max(s, 1), y1 - y0 - 1)
            rects += [(y0, x0, y0 + s, x1), (y0 + s, x0, y1, x1)]
    total = max(mass.sum(), 1e-12)
    out_r = np.asarray([(x0 / w, y0 / h, x1 / w, y1 / h)
                        for (y0, x0, y1, x1) in rects], np.float32)
    out_m = np.asarray([mass[y0:y1, x0:x1].sum() / total
                        for (y0, x0, y1, x1) in rects], np.float32)
    out_e = np.asarray([img[y0:y1, x0:x1].reshape(-1, 3).mean(0)
                        for (y0, x0, y1, x1) in rects], np.float32)
    return out_r, out_m, out_e


def bake_lights(scene: SceneData, envmap: EnvMap,
                scene_radius: float, env_quads: int = 0) -> LightList:
    """Collect emissive triangles + analytic lights + env into a LightList.

    env_quads > 0 replaces the single kEnvironment light with that many
    kEnvironmentQuad region lights (PolymorphicLight.h:28-38)."""
    geo = scene.geometry
    pos = np.asarray(geo.positions)
    idx = np.asarray(geo.indices)
    mat_id = np.asarray(geo.tri_material)
    emissive = np.asarray(scene.materials.emissive)

    kinds, p0s, p1s, p2s, ems, extras, normals, powers = \
        [], [], [], [], [], [], [], []

    ntri = len(idx)
    tri_light = np.full((ntri,), -1, np.int32)

    # --- emissive triangles (BakeEmissiveTriangles analog) ---
    tri_em = emissive[mat_id]                          # [T,3]
    lum = tri_em @ np.asarray([0.2126, 0.7152, 0.0722])
    sel = np.nonzero(lum > 0.0)[0]
    for t in sel:
        v0, v1, v2 = pos[idx[t, 0]], pos[idx[t, 1]], pos[idx[t, 2]]
        e1, e2 = v1 - v0, v2 - v0
        cr = np.cross(e1, e2)
        area = 0.5 * np.linalg.norm(cr)
        if area <= 1e-12:
            continue
        n = cr / (2.0 * area)
        tri_light[t] = len(kinds)
        kinds.append(KIND_TRIANGLE)
        p0s.append(v0); p1s.append(e1); p2s.append(e2)
        ems.append(tri_em[t])
        extras.append([area, 0.0, 0.0, 0.0])
        normals.append(n)
        powers.append(float(lum[t]) * area * np.pi)     # one-sided Lambert

    # --- analytic lights (CollectAnalyticLightsCPU analog) ---
    al = scene.analytic_lights
    akind = np.asarray(al.kind)
    for i in range(len(akind)):
        k = int(akind[i])
        inten = np.asarray(al.intensity[i])
        ilum = float(inten @ np.asarray([0.2126, 0.7152, 0.0722]))
        if k == LIGHT_POINT:
            kinds.append(KIND_POINT)
            powers.append(4.0 * np.pi * ilum)
        elif k == LIGHT_DIRECTIONAL:
            kinds.append(KIND_DIRECTIONAL)
            powers.append(np.pi * scene_radius * scene_radius * ilum)
        elif k == LIGHT_SPHERE:
            r = float(np.asarray(al.angular_size[i]))
            kinds.append(KIND_SPHERE)
            # Lambertian sphere power: L * pi * 4*pi*r^2
            powers.append(4.0 * np.pi * np.pi * r * r * ilum)
        else:
            kinds.append(KIND_SPOT)
            ci = float(np.asarray(al.cos_inner[i]))
            co = float(np.asarray(al.cos_outer[i]))
            powers.append(2.0 * np.pi * max(1.0 - co, 0.05) * ilum)
        p0s.append(np.asarray(al.position[i]))
        p1s.append(np.asarray(al.direction[i]))
        p2s.append(np.zeros(3))
        ems.append(inten)
        extras.append([float(np.asarray(al.cos_inner[i])),
                       float(np.asarray(al.cos_outer[i])),
                       float(np.asarray(al.angular_size[i])), 0.0])
        normals.append(np.asarray(al.direction[i]))

    # --- environment (kEnvironment / kEnvironmentQuad analog) ---
    env_light = -1
    env_quad_grid = None
    mean_lum = float(np.asarray(envmap.mean_radiance)
                     @ np.asarray([0.2126, 0.7152, 0.0722]))
    env_power = np.pi * scene_radius * scene_radius * mean_lum * np.pi
    if mean_lum > 0.0 and env_quads > 0:
        img = np.asarray(envmap.image)
        rects, massf, means = _env_quad_decompose(img, env_quads)
        gh, gw = 64, 128
        env_quad_grid = np.full((gh, gw), -1, np.int32)
        for q in range(len(rects)):
            u0, v0, u1, v1 = rects[q]
            kinds.append(KIND_ENVQUAD)
            p0s.append(np.zeros(3)); p1s.append(np.zeros(3))
            p2s.append(np.zeros(3))
            ems.append(means[q])
            extras.append([u0, v0, u1, v1])
            normals.append(np.asarray([0.0, 1.0, 0.0]))
            powers.append(env_power * float(massf[q]))
            x0 = int(round(u0 * gw)); x1 = max(int(round(u1 * gw)), x0 + 1)
            y0 = int(round(v0 * gh)); y1 = max(int(round(v1 * gh)), y0 + 1)
            env_quad_grid[y0:y1, x0:x1] = len(kinds) - 1
        assert (env_quad_grid >= 0).all()
    elif mean_lum > 0.0:
        env_light = len(kinds)
        kinds.append(KIND_ENV)
        p0s.append(np.zeros(3)); p1s.append(np.zeros(3)); p2s.append(np.zeros(3))
        ems.append(np.asarray(envmap.mean_radiance))
        extras.append([0.0] * 4)
        normals.append(np.asarray([0.0, 1.0, 0.0]))
        powers.append(env_power)

    n = len(kinds)
    if n == 0:
        # Keep one dummy zero-power light so shapes stay non-empty/static.
        kinds = [KIND_POINT]
        p0s = [np.zeros(3)]; p1s = [np.zeros(3)]; p2s = [np.zeros(3)]
        ems = [np.zeros(3)]; extras = [[0.0] * 4]
        normals = [np.asarray([0.0, 1.0, 0.0])]
        powers = [0.0]
        n = 1

    powers = np.asarray(powers, np.float64)
    total = powers.sum()
    pdf = powers / total if total > 0 else np.full(n, 1.0 / n)
    cdf = np.cumsum(pdf)
    cdf[-1] = 1.0

    return LightList(
        kind=jnp.asarray(np.asarray(kinds, np.int32)),
        p0=jnp.asarray(np.asarray(p0s, np.float32)),
        p1=jnp.asarray(np.asarray(p1s, np.float32)),
        p2=jnp.asarray(np.asarray(p2s, np.float32)),
        emission=jnp.asarray(np.asarray(ems, np.float32)),
        extra=jnp.asarray(np.asarray(extras, np.float32)),
        normal=jnp.asarray(np.asarray(normals, np.float32)),
        power=jnp.asarray(pdf.astype(np.float32)),      # normalized select pdf
        cdf=jnp.asarray(cdf.astype(np.float32)),
        tri_light=jnp.asarray(tri_light),
        env_light=jnp.int32(env_light),
        num=jnp.int32(n),
        env_quad_grid=(jnp.asarray(env_quad_grid)
                       if env_quad_grid is not None else None),
    )


# ---------------------------------------------------------------------------
# Device sampling (LightSampler.hlsli / PolymorphicLight::CalcSample analog)
# ---------------------------------------------------------------------------


def sample_light(lights: LightList, envmap: EnvMap, shade_pos, u_sel, u1, u2,
                 uniform: bool = False):
    """Light selection (power CDF, or uniform when `uniform`) + per-kind
    sample, over a wavefront.

    Returns dict(wi [N,3], dist [N], Li [N,3] unshadowed incident radiance,
    pdf [N] solid-angle pdf (delta lights fold the discrete select pdf in and
    report mis-incompatible `is_delta`), valid [N]).
    """
    u_sel = jnp.clip(u_sel, 0.0, 1.0 - 1e-7)
    if uniform:
        nf = lights.num.astype(jnp.float32)
        li = jnp.clip((u_sel * nf).astype(jnp.int32), 0, lights.count - 1)
        sel_pdf = jnp.full(u_sel.shape, 1.0, jnp.float32) / nf
    else:
        li = jnp.clip(jnp.searchsorted(lights.cdf, u_sel),
                      0, lights.count - 1).astype(jnp.int32)
        sel_pdf = jnp.take(lights.power, li)
    kind = jnp.take(lights.kind, li)
    p0 = jnp.take(lights.p0, li, axis=0)
    p1 = jnp.take(lights.p1, li, axis=0)
    p2 = jnp.take(lights.p2, li, axis=0)
    em = jnp.take(lights.emission, li, axis=0)
    ex = jnp.take(lights.extra, li, axis=0)
    nl = jnp.take(lights.normal, li, axis=0)

    # --- triangle area light ---
    b0, b1, b2 = m.sample_triangle_barycentrics(u1, u2)
    lp = p0 + b1[..., None] * p1 + b2[..., None] * p2
    to_l = lp - shade_pos
    d2 = jnp.maximum(m.dot(to_l, to_l, False), 1e-12)
    dist_tri = jnp.sqrt(d2)
    wi_tri = to_l / dist_tri[..., None]
    cos_l = m.dot(-wi_tri, nl, False)
    area = jnp.maximum(ex[..., 0], 1e-12)
    pdf_tri = sel_pdf * d2 / jnp.maximum(area * jnp.maximum(cos_l, 1e-9), 1e-12)
    li_tri = em
    valid_tri = cos_l > 1e-6

    # --- point / spot ---
    to_p = p0 - shade_pos
    d2p = jnp.maximum(m.dot(to_p, to_p, False), 1e-12)
    dist_p = jnp.sqrt(d2p)
    wi_p = to_p / dist_p[..., None]
    li_point = em / d2p[..., None]
    cos_spot = m.dot(-wi_p, p1, False)
    spot_atten = jnp.clip((cos_spot - ex[..., 1])
                          / jnp.maximum(ex[..., 0] - ex[..., 1], 1e-6),
                          0.0, 1.0)
    spot_atten = spot_atten * spot_atten

    # --- directional ---
    wi_dir = -p1
    li_dir = em

    # --- sphere (kSphere): uniform cone toward the subtended cap ---
    r_sph = ex[..., 2]
    sin2_max = jnp.clip(r_sph * r_sph / d2p, 0.0, 1.0 - 1e-6)
    cos_max = jnp.sqrt(1.0 - sin2_max)
    cos_t = 1.0 - u1 * (1.0 - cos_max)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi_s = 2.0 * jnp.pi * u2
    t_s, b_s = m.orthonormal_basis(wi_p)
    wi_sph = (t_s * (sin_t * jnp.cos(phi_s))[..., None]
              + b_s * (sin_t * jnp.sin(phi_s))[..., None]
              + wi_p * cos_t[..., None])
    # distance to the near sphere surface along wi
    disc = jnp.maximum(r_sph * r_sph - d2p * (1.0 - cos_t * cos_t), 0.0)
    dist_sph = jnp.maximum(dist_p * cos_t - jnp.sqrt(disc), 1e-5)
    pdf_sph = sel_pdf / jnp.maximum(
        2.0 * jnp.pi * (1.0 - cos_max), 1e-9)
    outside = d2p > r_sph * r_sph

    # --- environment ---
    wi_env, li_env, pdf_env = env_sample(envmap, u1, u2)
    pdf_env = sel_pdf * pdf_env

    # --- environment quad (kEnvironmentQuad): uniform uv in the rect ---
    from rtxpt_tpu.lighting.envmap import _uv_to_dir
    uq = ex[..., 0] + u1 * (ex[..., 2] - ex[..., 0])
    vq = ex[..., 1] + u2 * (ex[..., 3] - ex[..., 1])
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
         jnp.where(is_sph[..., None], em,
         jnp.where(is_envq[..., None], li_envq,
         jnp.where(is_dir[..., None], li_dir, li_env))))))
    # Delta lights: divide by discrete select pdf only.
    pdf = jnp.where(is_tri, pdf_tri,
          jnp.where(is_env, pdf_env,
          jnp.where(is_envq, pdf_envq,
          jnp.where(is_sph, pdf_sph, sel_pdf))))
    # Spheres report is_delta: no scene geometry backs them, so the BSDF
    # strategy can never hit one and NEE must carry full weight (the
    # reference treats non-raytraceable analytic lights the same way).
    is_delta = is_point | is_spot | is_dir | is_sph
    valid = jnp.where(is_tri, valid_tri,
                      jnp.where(is_sph, outside, jnp.ones_like(is_tri))) \
        & (pdf > 1e-12) & (sel_pdf > 0.0)
    return dict(wi=wi, dist=dist, Li=Li, pdf=pdf, is_delta=is_delta,
                valid=valid, light_index=li)


def emissive_prim_index(scene, prim, inst):
    """Map a hit (prim, inst) to the triangle id the light list was baked
    over. Flattened scenes bake per pool triangle (identity); instanced
    (TLAS v2) scenes bake the expanded (instance x emissive pool tri)
    list — the id is inst_light_base[inst] + em_rank[prim], -1 when the
    hit triangle is not emissive (accel/tlas.py v2 scope)."""
    tl = getattr(scene, "tlas", None)
    if tl is None or getattr(tl, "em_rank", None) is None or inst is None:
        return prim
    rank = jnp.take(tl.em_rank, jnp.maximum(prim, 0))
    base = jnp.take(tl.inst_light_base, jnp.maximum(inst, 0))
    ok = (prim >= 0) & (inst >= 0) & (rank >= 0)
    return jnp.where(ok, base + rank, -1)


def light_pdf_for_tri_hit(lights: LightList, prim, dist, cos_l,
                          uniform: bool = False):
    """Solid-angle NEE pdf of having sampled the emissive triangle that a
    BSDF ray just hit (for MIS at emissive hits — PathTracer.hlsli:592-674).
    prim: [N] original triangle id; cos_l: |cos| at the light."""
    li = jnp.take(lights.tri_light, jnp.maximum(prim, 0))
    has_light = (prim >= 0) & (li >= 0)
    lix = jnp.maximum(li, 0)
    if uniform:
        sel_pdf = 1.0 / lights.num.astype(jnp.float32)
    else:
        sel_pdf = jnp.take(lights.power, lix)
    area = jnp.maximum(jnp.take(lights.extra, lix, axis=0)[..., 0], 1e-12)
    pdf = sel_pdf * dist * dist / jnp.maximum(area * jnp.maximum(cos_l, 1e-9),
                                              1e-12)
    return jnp.where(has_light, pdf, 0.0)


def env_select_pdf(lights: LightList, uniform: bool = False):
    """Discrete probability of selecting the env light (scalar)."""
    has_env = lights.env_light >= 0
    if uniform:
        return jnp.where(has_env, 1.0 / lights.num.astype(jnp.float32), 0.0)
    return jnp.where(has_env,
                     jnp.take(lights.power, jnp.maximum(lights.env_light, 0)),
                     0.0)


def env_quad_of_dir(lights: LightList, envmap: EnvMap, d):
    """(light index, uv rect area, sin theta) of the env quad containing
    direction d [N,3] — for MIS at env misses in quad mode."""
    from rtxpt_tpu.lighting.envmap import _dir_to_uv
    u, v = _dir_to_uv(envmap, d)
    gh, gw = lights.env_quad_grid.shape
    yi = jnp.clip((v * gh).astype(jnp.int32), 0, gh - 1)
    xi = jnp.clip((u * gw).astype(jnp.int32), 0, gw - 1)
    li = lights.env_quad_grid[yi, xi]
    ex = jnp.take(lights.extra, jnp.maximum(li, 0), axis=0)
    area = jnp.maximum((ex[..., 2] - ex[..., 0])
                       * (ex[..., 3] - ex[..., 1]), 1e-9)
    sin_t = jnp.maximum(jnp.sin(v * jnp.pi), 1e-4)
    return li, area, sin_t


def env_dir_pdf(lights: LightList, envmap: EnvMap, d,
                uniform: bool = False):
    """Solid-angle pdf that the power/uniform NEE strategy samples
    direction d from the environment — the MIS counterpart used at env
    misses (PathTracer.hlsli:407-503 HandleMiss). Single-env mode:
    select pdf x texel-CDF pdf; quad mode: containing quad's select pdf
    x the uniform-rect jacobian."""
    if lights.env_quad_grid is None:
        return env_select_pdf(lights, uniform) * env_pdf(envmap, d)
    li, area, sin_t = env_quad_of_dir(lights, envmap, d)
    if uniform:
        sel = 1.0 / lights.num.astype(jnp.float32) + 0.0 * area
    else:
        sel = jnp.take(lights.power, jnp.maximum(li, 0))
    return sel / (area * 2.0 * jnp.pi * jnp.pi * sin_t)
