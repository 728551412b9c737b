"""Wide (structure-of-tiles) shading math for the fused Pallas bounce kernel.

TPU kernels want every per-ray scalar laid out as a dense [R, 128] VPU tile
(8x128 vector registers), NOT as the lane-starved [N, 3] / [N, 1] shapes the
XLA wavefront uses. This module re-expresses the shading core — BSDF
eval/pdf/sample (pt/bsdf.py), analytic/area light sampling
(lighting/lights_baker.py sample_light) and the supporting vector math
(utils/math.py) — over "wide" operands:

  * scalar: any-shaped jnp array (in-kernel: [R, 128] f32/i32/u32 tiles)
  * vec3:   [3, ...] stack of three scalars (component access v[0], v[1], v[2])

Every function here is pure jnp, so the exact same code runs (a) inside a
Pallas TPU kernel at full lane utilization, (b) under interpret mode, and
(c) as a plain XLA function for the parity tests in tests/test_wide.py
(which check equivalence against the [N,3]-shaped originals).

Reference semantics match pt/bsdf.py (itself re-implementing
Rtxpt/Shaders/PathTracer/Rendering/Materials/StandardBSDF.hlsli and
BxDF.hlsli) and lighting/lights_baker.py (PolymorphicLight.hlsli:515-720).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# Elementwise-scalar pieces of the BSDF are reused verbatim — they contain
# no [..., 3] vector math.
from rtxpt_tpu.pt.bsdf import (
    DELTA_ALPHA, MIN_COS,
    LOBE_DIFFUSE_REFL, LOBE_SPECULAR_REFL, LOBE_SPECULAR_TRANS,
    LOBE_DIFFUSE_TRANS,
    fresnel_dielectric, ggx_ndf, smith_g1, smith_g2,
)

EPS = 1e-8


# ---------------------------------------------------------------------------
# vec3-as-leading-axis math (utils/math.py ports)
# ---------------------------------------------------------------------------


def vec3(x, y, z):
    return jnp.stack([x, y, z], axis=0)


def splat3(s):
    return jnp.stack([s, s, s], axis=0)


def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross3(a, b):
    return vec3(a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])


def normalize3(v):
    inv = 1.0 / jnp.sqrt(jnp.maximum(dot3(v, v), EPS * EPS))
    return v * inv


def luminance3(c):
    return c[0] * 0.2126 + c[1] * 0.7152 + c[2] * 0.0722


def reflect3(wi, n):
    return 2.0 * dot3(wi, n) * n - wi


def onb3(n):
    """Branchless ONB (Duff et al. 2017); n unit vec3. Returns (t, b)."""
    z = n[2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[0] * n[1] * a
    t = vec3(1.0 + sign * n[0] * n[0] * a, sign * b, -sign * n[0])
    bt = vec3(b, sign + n[1] * n[1] * a, -n[1])
    return t, bt


def to_local3(v, n):
    t, b = onb3(n)
    return vec3(dot3(v, t), dot3(v, b), dot3(v, n))


def to_world3(v, n):
    t, b = onb3(n)
    return v[0] * t + v[1] * b + v[2] * n


def power_heuristic(pdf_a, pdf_b):
    a2 = pdf_a * pdf_a
    return jnp.where(pdf_a > 0.0,
                     a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-30), 0.0)


def sample_cosine_hemisphere3(u1, u2):
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def sample_triangle_barycentrics(u1, u2):
    """Heitz 2019 square-root-free mapping (matches utils/math.py)."""
    b0 = u1 * 0.5
    b1 = u2 * 0.5
    offset = b1 - b0
    b0 = jnp.where(offset > 0.0, b0, b0 - offset)
    b1 = jnp.where(offset > 0.0, b1 + offset, b1)
    return 1.0 - b0 - b1, b0, b1


# ---------------------------------------------------------------------------
# BSDF (pt/bsdf.py port over wide operands)
# ---------------------------------------------------------------------------


class BSDFW(NamedTuple):
    """Wide BSDFData: vec3 fields are [3,...], scalars [...]."""

    diffuse: jnp.ndarray            # vec3
    specular_f0: jnp.ndarray        # vec3
    alpha: jnp.ndarray
    transmission: jnp.ndarray
    diffuse_transmission: jnp.ndarray
    eta: jnp.ndarray
    transmission_color: jnp.ndarray  # vec3
    # Kulla-Conty energy fit (per-lane degree-5 sqrt(mu) polynomial of
    # E(mu) + E_avg), baked per material into the MT table
    # (bsdf.bake_e_poly_np). None -> the ms lobe is disabled.
    e_poly: jnp.ndarray = None       # [6, ...]
    e_avg: jnp.ndarray = None


def make_bsdf_w(base_color, metallic, roughness, ior, transmission,
                diffuse_transmission, specular_scale, front,
                cur_ior, below_ior, e_poly=None, e_avg=None) -> BSDFW:
    """make_bsdf_data port (pt/bsdf.py:380)."""
    f0_dielec = splat3(0.08 * specular_scale)
    specular_f0 = f0_dielec * (1.0 - metallic) + base_color * metallic
    diffuse = base_color * (1.0 - metallic)
    mat_ior = jnp.maximum(ior, 1.0 + 1e-4)
    eta = jnp.where(front, cur_ior / mat_ior,
                    cur_ior / jnp.maximum(below_ior, 1.0))
    alpha = jnp.clip(roughness * roughness, 0.0, 1.0)
    one = jnp.ones_like(base_color)
    return BSDFW(diffuse=diffuse, specular_f0=specular_f0, alpha=alpha,
                 transmission=transmission * (1.0 - metallic),
                 diffuse_transmission=diffuse_transmission * (1.0 - metallic),
                 eta=eta, transmission_color=one,
                 e_poly=e_poly, e_avg=e_avg)


def _pow5(x):
    x2 = x * x
    return x2 * x2 * x


def fresnel_schlick_scalar(f0, cos_h):
    """Scalar-f0 Schlick with the presence gate of bsdf.fresnel_schlick."""
    w = _pow5(jnp.clip(1.0 - cos_h, 0.0, 1.0))
    present = (f0 > 1e-6).astype(w.dtype)
    return f0 + (1.0 - f0) * w * present


def fresnel_schlick3(f0, cos_h):
    """vec3-f0 Schlick; presence gated on F0 luminance (bsdf.py:80-91)."""
    w = _pow5(jnp.clip(1.0 - cos_h, 0.0, 1.0))
    present = (luminance3(f0) > 1e-6).astype(w.dtype)
    return f0 + (1.0 - f0) * (w * present)


def sample_ggx_vndf3(wo, alpha, u1, u2):
    """Heitz 2018 visible-NDF sampling (bsdf.py:106)."""
    vh = normalize3(vec3(alpha * wo[0], alpha * wo[1], wo[2]))
    lensq = vh[0] * vh[0] + vh[1] * vh[1]
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    big = lensq > 1e-16
    t1 = vec3(jnp.where(big, -vh[1] * inv_len, 1.0),
              jnp.where(big, vh[0] * inv_len, 0.0),
              jnp.zeros_like(vh[0]))
    t2 = cross3(vh, t1)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1)) + s * p2
    nh = (p1 * t1 + p2 * t2
          + jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2)) * vh)
    h = vec3(alpha * nh[0], alpha * nh[1], jnp.maximum(nh[2], 0.0))
    return normalize3(h)


def ggx_vndf_pdf3(wo, h, alpha):
    woz = jnp.maximum(wo[2], MIN_COS)
    doth = jnp.maximum(dot3(wo, h), 0.0)
    return smith_g1(alpha, woz) * ggx_ndf(alpha, h[2]) * doth / woz


def _lobe_probs_w(data: BSDFW):
    f0_lum = luminance3(data.specular_f0)
    f_avg = jnp.where(f0_lum > 1e-6, jnp.clip(f0_lum + 0.04, 0.0, 1.0), 0.0)
    pd = luminance3(data.diffuse) * (1.0 - data.transmission) * \
        (1.0 - data.diffuse_transmission)
    if data.e_poly is not None:
        pd = pd + jnp.where(data.alpha >= DELTA_ALPHA,
                            luminance3(_ms_color_w(data))
                            * (1.0 - data.e_avg), 0.0)
    pdt = data.diffuse_transmission * luminance3(data.transmission_color)
    ps = f_avg
    pt = data.transmission * (1.0 - f_avg) * \
        luminance3(data.transmission_color)
    total = pd + ps + pt + pdt
    safe = jnp.maximum(total, 1e-9)
    pd = jnp.where(total > 1e-9, pd / safe, 1.0)
    ps = jnp.where(total > 1e-9, ps / safe, 0.0)
    pt = jnp.where(total > 1e-9, pt / safe, 0.0)
    pdt = jnp.where(total > 1e-9, pdt / safe, 0.0)
    return pd, ps, pt, pdt


def _eval_diffuse_w(data: BSDFW, wo, wi):
    woz, wiz = wo[2], wi[2]
    # DIFFUSE_MODEL == "lambert" (bsdf.py:172) + Fresnel energy coupling.
    f0_lum = jnp.clip(luminance3(data.specular_f0), 0.0, 1.0)
    fd = 1.0 - fresnel_schlick_scalar(f0_lum, jnp.clip(woz, 0.0, 1.0))
    f = data.diffuse / jnp.pi * (fd * jnp.maximum(wiz, 0.0))
    valid = (woz > MIN_COS) & (wiz > MIN_COS)
    return jnp.where(valid, f, 0.0)


def _eval_diffuse_trans_w(data: BSDFW, wo, wi):
    woz, wiz = wo[2], wi[2]
    f = (data.transmission_color * data.diffuse_transmission
         / jnp.pi * jnp.maximum(-wiz, 0.0))
    valid = (woz > MIN_COS) & (wiz < -MIN_COS)
    return jnp.where(valid, f, 0.0)


def _E_w(data: BSDFW, mu):
    """Per-lane polynomial E(mu) (degree-5 Horner in sqrt(mu))."""
    t = jnp.sqrt(jnp.clip(mu, 0.0, 1.0))
    c = data.e_poly
    acc = c[5]
    for k in (4, 3, 2, 1, 0):
        acc = acc * t + c[k]
    return jnp.clip(acc, 0.0, 1.0)


def _ms_color_w(data: BSDFW):
    e_avg = data.e_avg
    f_avg = data.specular_f0 + (1.0 - data.specular_f0) / 21.0
    return f_avg * f_avg * e_avg / jnp.maximum(
        1.0 - f_avg * (1.0 - e_avg), 1e-4)


def _eval_spec_ms_w(data: BSDFW, wo, wi):
    """Kulla-Conty compensation lobe * cos (mirror of bsdf._eval_spec_ms)."""
    woz, wiz = wo[2], wi[2]
    e_o = _E_w(data, woz)
    e_i = _E_w(data, wiz)
    f = ((1.0 - e_o) * (1.0 - e_i)
         / (jnp.pi * jnp.maximum(1.0 - data.e_avg, 1e-4)))
    f_cos = (f * jnp.maximum(wiz, 0.0)) * _ms_color_w(data)
    valid = (woz > MIN_COS) & (wiz > MIN_COS) & (data.alpha >= DELTA_ALPHA)
    return jnp.where(valid, f_cos, 0.0)


def _eval_spec_refl_w(data: BSDFW, wo, wi):
    woz, wiz = wo[2], wi[2]
    h = normalize3(wo + wi)
    doth = jnp.maximum(dot3(wo, h), 0.0)
    D = ggx_ndf(data.alpha, h[2])
    G = smith_g2(data.alpha, woz, wiz)
    F = fresnel_schlick3(data.specular_f0, doth)
    spec = F * (D * G / jnp.maximum(4.0 * woz, 1e-9))
    valid = (woz > MIN_COS) & (wiz > MIN_COS) & (data.alpha >= DELTA_ALPHA)
    return jnp.where(valid, spec, 0.0)


def _eval_spec_trans_w(data: BSDFW, wo, wi):
    woz, wiz = wo[2], wi[2]
    eta = data.eta
    h = normalize3(-(eta * wo + wi))
    h = h * jnp.where(h[2] < 0.0, -1.0, 1.0)
    dot_oh = dot3(wo, h)
    dot_ih = dot3(wi, h)
    F = fresnel_dielectric(jnp.abs(dot_oh), eta)
    D = ggx_ndf(data.alpha, h[2])
    G = smith_g2(data.alpha, woz, jnp.abs(wiz))
    denom = dot_oh * eta + dot_ih
    jac = jnp.abs(dot_ih) / jnp.maximum(denom * denom, 1e-9)
    f_cos = ((1.0 - F) * D * G * jac * jnp.abs(dot_oh)
             / jnp.maximum(jnp.abs(woz), MIN_COS))
    valid = ((woz > MIN_COS) & (wiz < -MIN_COS)
             & (data.alpha >= DELTA_ALPHA)
             & (dot_oh > 0.0) & (dot_ih < 0.0))
    f = data.transmission_color * (data.transmission * f_cos)
    return jnp.where(valid, f, 0.0)


def bsdf_eval_w(data: BSDFW, wo, wi):
    """Sum of non-delta lobes f(wo,wi)*|cos(wi)| (vec3)."""
    f = (_eval_diffuse_w(data, wo, wi)
         * (1.0 - data.transmission) * (1.0 - data.diffuse_transmission)
         + _eval_diffuse_trans_w(data, wo, wi)
         + _eval_spec_refl_w(data, wo, wi)
         + _eval_spec_trans_w(data, wo, wi))
    if data.e_poly is not None:
        f = f + _eval_spec_ms_w(data, wo, wi)
    return f


def bsdf_eval_split_w(data: BSDFW, wo, wi):
    """bsdf_eval_w partitioned into (diffuse-ish, specular-ish) —
    mirror of bsdf.bsdf_eval_split (NRD diffuse/specular channels;
    f_d + f_s == bsdf_eval_w exactly)."""
    f_d = (_eval_diffuse_w(data, wo, wi)
           * (1.0 - data.transmission) * (1.0 - data.diffuse_transmission)
           + _eval_diffuse_trans_w(data, wo, wi))
    f_s = (_eval_spec_refl_w(data, wo, wi)
           + _eval_spec_trans_w(data, wo, wi))
    if data.e_poly is not None:
        f_s = f_s + _eval_spec_ms_w(data, wo, wi)
    return f_d, f_s


def bsdf_pdf_w(data: BSDFW, wo, wi):
    pd, ps, pt, pdt = _lobe_probs_w(data)
    woz, wiz = wo[2], wi[2]
    smooth = data.alpha >= DELTA_ALPHA

    pdf_d = jnp.maximum(wiz, 0.0) / jnp.pi
    pdf_dt = jnp.maximum(-wiz, 0.0) / jnp.pi

    h_r = normalize3(wo + wi)
    pdf_s = ggx_vndf_pdf3(wo, h_r, data.alpha) / jnp.maximum(
        4.0 * jnp.abs(dot3(wo, h_r)), 1e-9)
    pdf_s = jnp.where(smooth & (wiz > MIN_COS) & (woz > MIN_COS), pdf_s, 0.0)

    eta = data.eta
    h_t = normalize3(-(eta * wo + wi))
    h_t = h_t * jnp.where(h_t[2] < 0.0, -1.0, 1.0)
    dot_oh = dot3(wo, h_t)
    dot_ih = dot3(wi, h_t)
    denom = dot_oh * eta + dot_ih
    jac_t = jnp.abs(dot_ih) / jnp.maximum(denom * denom, 1e-9)
    F = fresnel_dielectric(jnp.abs(dot_oh), eta)
    pdf_t = ggx_vndf_pdf3(wo, h_t, data.alpha) * jac_t * (1.0 - F)
    pdf_t = jnp.where(smooth & (wiz < -MIN_COS) & (woz > MIN_COS)
                      & (dot_oh > 0.0) & (dot_ih < 0.0), pdf_t, 0.0)
    return pd * pdf_d + ps * pdf_s + pt * pdf_t + pdt * pdf_dt


def bsdf_sample_w(data: BSDFW, wo, u_lobe, u1, u2):
    """bsdf_sample port: returns dict(wi vec3, weight vec3, pdf, is_delta,
    lobe i32, valid)."""
    pd, ps, pt, pdt = _lobe_probs_w(data)
    woz = wo[2]
    smooth = data.alpha >= DELTA_ALPHA

    c1 = pd
    c2 = pd + ps
    c3 = pd + ps + pt
    sel_d = u_lobe < c1
    sel_s = (~sel_d) & (u_lobe < c2)
    sel_t = (~sel_d) & (~sel_s) & (u_lobe < c3)
    lobe = jnp.where(sel_d, LOBE_DIFFUSE_REFL,
                     jnp.where(sel_s, LOBE_SPECULAR_REFL,
                               jnp.where(sel_t, LOBE_SPECULAR_TRANS,
                                         LOBE_DIFFUSE_TRANS)))

    wi_cos = sample_cosine_hemisphere3(u1, u2)

    alpha_s = jnp.maximum(data.alpha, DELTA_ALPHA)
    h = sample_ggx_vndf3(wo, alpha_s, u1, u2)
    h_eff = jnp.where(smooth, h, vec3(jnp.zeros_like(woz),
                                      jnp.zeros_like(woz),
                                      jnp.ones_like(woz)))
    wi_refl = normalize3(2.0 * dot3(wo, h_eff) * h_eff - wo)

    eta = data.eta
    cos_oh = jnp.clip(dot3(wo, h_eff), 0.0, 1.0)
    sin2_t = eta * eta * (1.0 - cos_oh * cos_oh)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wi_refr = normalize3(-eta * wo + (eta * cos_oh - cos_t) * h_eff)
    wi_dt = vec3(wi_cos[0], wi_cos[1], -wi_cos[2])

    wi = jnp.where(sel_d, wi_cos,
                   jnp.where(sel_s, wi_refl,
                             jnp.where(sel_t,
                                       jnp.where(tir, wi_refl, wi_refr),
                                       wi_dt)))

    is_delta = (~smooth) & (sel_s | sel_t)

    f = bsdf_eval_w(data, wo, wi)
    pdf = bsdf_pdf_w(data, wo, wi)
    w_smooth = f / jnp.maximum(pdf, 1e-12)

    f_mirror = fresnel_schlick3(data.specular_f0, jnp.clip(woz, 0.0, 1.0))
    Fd = fresnel_dielectric(jnp.clip(woz, 0.0, 1.0), eta)
    w_delta_s = f_mirror / jnp.maximum(ps, 1e-9)
    w_delta_t = (data.transmission_color
                 * (data.transmission * (1.0 - Fd))
                 / jnp.maximum(pt, 1e-9))
    # TIR: full reflection (Fd == 1 exactly, see bsdf.py TIR note).
    w_delta_t = jnp.where(tir,
                          data.transmission_color * data.transmission
                          / jnp.maximum(pt, 1e-9),
                          w_delta_t)
    w_delta = jnp.where(sel_s, w_delta_s, w_delta_t)

    weight = jnp.where(is_delta, w_delta, w_smooth)
    pdf_out = jnp.where(is_delta, 0.0, pdf)

    valid = (woz > MIN_COS) & jnp.isfinite(luminance3(weight))
    return dict(wi=wi, weight=jnp.maximum(weight, 0.0), pdf=pdf_out,
                is_delta=is_delta, lobe=lobe, valid=valid)


# ---------------------------------------------------------------------------
# Light sampling (lights_baker.sample_light port)
# ---------------------------------------------------------------------------

# Light-table row indices for the [LROWS, 128] wide light table
# (bounce_pallas.pack_lights): one column per light, rows:
LROW_KIND = 0
LROW_P0 = 1            # 1:4
LROW_P1 = 4            # 4:7
LROW_P2 = 7            # 7:10
LROW_EM = 10           # 10:13
LROW_EXTRA = 13        # 13:17
LROW_NORMAL = 17       # 17:20
LROW_POWER = 20
LROW_CDF = 21
LROWS = 22

_DELTA_DIST = 1e8

# Kind codes match lighting/lights_baker.py
KIND_TRIANGLE = 0
KIND_POINT = 1
KIND_DIRECTIONAL = 2
KIND_SPOT = 3
KIND_ENV = 4


class LightFieldsW(NamedTuple):
    kind: jnp.ndarray
    p0: jnp.ndarray       # vec3
    p1: jnp.ndarray       # vec3
    p2: jnp.ndarray       # vec3
    em: jnp.ndarray       # vec3
    extra: jnp.ndarray    # [4, ...]
    normal: jnp.ndarray   # vec3
    power: jnp.ndarray


def sample_light_fields_w(lf: LightFieldsW, sel_pdf, shade_pos, u1, u2,
                          env=None):
    """Per-kind light sample given gathered light fields (wide port of
    lights_baker.sample_light's math after selection). `env`, when the
    scene has an environment light, is the precomputed in-kernel env
    importance sample (wi [3,...], Li [3,...], src_pdf) from
    bounce_pallas._env_sample_w — drawn from the SAME u1/u2, mirroring
    lights_baker.sample_light's env branch.

    Returns dict(wi vec3, dist, Li vec3, pdf, is_delta, valid)."""
    kind = lf.kind

    b0, b1, b2 = sample_triangle_barycentrics(u1, u2)
    lp = lf.p0 + b1 * lf.p1 + b2 * lf.p2
    to_l = lp - shade_pos
    d2 = jnp.maximum(dot3(to_l, to_l), 1e-12)
    dist_tri = jnp.sqrt(d2)
    wi_tri = to_l / dist_tri
    cos_l = dot3(-wi_tri, lf.normal)
    area = jnp.maximum(lf.extra[0], 1e-12)
    pdf_tri = sel_pdf * d2 / jnp.maximum(area * jnp.maximum(cos_l, 1e-9),
                                         1e-12)
    valid_tri = cos_l > 1e-6

    to_p = lf.p0 - shade_pos
    d2p = jnp.maximum(dot3(to_p, to_p), 1e-12)
    dist_p = jnp.sqrt(d2p)
    wi_p = to_p / dist_p
    li_point = lf.em / d2p
    cos_spot = dot3(-wi_p, lf.p1)
    spot_atten = jnp.clip((cos_spot - lf.extra[1])
                          / jnp.maximum(lf.extra[0] - lf.extra[1], 1e-6),
                          0.0, 1.0)
    spot_atten = spot_atten * spot_atten

    wi_dir = -lf.p1

    is_tri = kind == KIND_TRIANGLE
    is_point = kind == KIND_POINT
    is_spot = kind == KIND_SPOT
    is_dir = kind == KIND_DIRECTIONAL

    wi = jnp.where(is_tri, wi_tri,
                   jnp.where(is_point | is_spot, wi_p, wi_dir))
    dist = jnp.where(is_tri, dist_tri,
                     jnp.where(is_point | is_spot, dist_p, _DELTA_DIST))
    Li = jnp.where(is_tri, lf.em,
                   jnp.where(is_point, li_point,
                             jnp.where(is_spot, li_point * spot_atten,
                                       lf.em)))
    pdf = jnp.where(is_tri, pdf_tri, sel_pdf)
    if env is not None:
        env_wi, env_li, env_src_pdf = env
        is_env = kind == KIND_ENV
        wi = jnp.where(is_env, env_wi, wi)
        dist = jnp.where(is_env, _DELTA_DIST, dist)
        Li = jnp.where(is_env, env_li, Li)
        pdf = jnp.where(is_env, sel_pdf * env_src_pdf, pdf)
    is_delta = is_point | is_spot | is_dir
    # (~is_tri | valid_tri), written with logical ops: Mosaic can't select
    # between i1 vectors ("unsupported target bitwidth for truncation").
    valid = ((valid_tri | ~is_tri) & (pdf > 1e-12) & (sel_pdf > 0.0))
    return dict(wi=wi, dist=dist, Li=Li, pdf=pdf, is_delta=is_delta,
                valid=valid)
