"""StandardBSDF: Falcor-class standard surface model, vectorized for TPU.

Re-implements the behavior of the reference's material stack (reference:
Rtxpt/Shaders/PathTracer/Rendering/Materials/StandardBSDF.hlsli:34-120,
BxDF.hlsli lobes — DiffuseReflectionDisney, SpecularReflectionMicrofacet:383,
specular/diffuse transmission; data layout StandardBSDFData BxDF.hlsli:
615-690) as pure vectorized functions over a wavefront of shading points.

Lobes:
  * diffuse reflection   — Disney retro-diffuse
  * diffuse transmission — Lambert through the surface
  * specular reflection  — GGX (VNDF sampled, height-correlated Smith),
                           delta mirror when alpha < DELTA_ALPHA
  * specular transmission— GGX rough refraction (Walter 2007 Jacobian),
                           delta refraction when alpha < DELTA_ALPHA

Conventions: tangent space with +z = shading normal; `wo` points toward the
viewer, `wi` toward the light; both unit. `eval` returns f(wo,wi) * |wi.z|
(projected BSDF) for the *non-delta* lobes only; delta lobes contribute via
`sample` weights with `is_delta` set (matching how the reference skips NEE
on delta lobes — LobeType.hlsli).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from rtxpt_tpu.utils import math as m

DELTA_ALPHA = 1e-4          # alpha below which specular lobes go delta
MIN_COS = 1e-6

# Lobe ids (reference: LobeType.hlsli classification)
LOBE_DIFFUSE_REFL = 0
LOBE_SPECULAR_REFL = 1
LOBE_SPECULAR_TRANS = 2
LOBE_DIFFUSE_TRANS = 3


@struct.dataclass
class BSDFData:
    """Per-shading-point BSDF parameters, SoA [N] (StandardBSDFData analog)."""

    diffuse: jnp.ndarray        # [N,3] diffuse reflection albedo
    specular_f0: jnp.ndarray    # [N,3] specular reflectance at normal
    alpha: jnp.ndarray          # [N] GGX alpha (= perceptual roughness^2)
    transmission: jnp.ndarray   # [N] specular transmission weight in [0,1]
    diffuse_transmission: jnp.ndarray  # [N]
    eta: jnp.ndarray            # [N] relative IoR n_incident / n_transmitted
    transmission_color: jnp.ndarray  # [N,3]
    # Anisotropic GGX alphas (Disney aspect remap of `anisotropy`;
    # both == alpha for isotropic materials). The tangent frame comes
    # from utils.math.to_local's deterministic normal basis.
    alpha_x: jnp.ndarray = None  # [N]
    alpha_y: jnp.ndarray = None  # [N]

    @property
    def ax(self):
        return self.alpha if self.alpha_x is None else self.alpha_x

    @property
    def ay(self):
        return self.alpha if self.alpha_y is None else self.alpha_y


# ---------------------------------------------------------------------------
# Microfacet pieces (reference: Microfacet.hlsli, Fresnel.hlsli)
# ---------------------------------------------------------------------------


def ggx_ndf(alpha, hz):
    a2 = alpha * alpha
    den = hz * hz * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * den * den, 1e-12)


def ggx_ndf_aniso(ax, ay, h):
    """Anisotropic GGX NDF (Burley/Heitz; == ggx_ndf when ax == ay)."""
    hx, hy, hz = h[..., 0], h[..., 1], h[..., 2]
    axs = jnp.maximum(ax, 1e-5)
    ays = jnp.maximum(ay, 1e-5)
    den = (hx * hx) / (axs * axs) + (hy * hy) / (ays * ays) + hz * hz
    return 1.0 / jnp.maximum(jnp.pi * axs * ays * den * den, 1e-12)


def smith_lambda(alpha, wz):
    wz = jnp.clip(jnp.abs(wz), MIN_COS, 1.0)
    a2 = alpha * alpha
    tan2 = (1.0 - wz * wz) / (wz * wz)
    return 0.5 * (jnp.sqrt(1.0 + a2 * tan2) - 1.0)


def smith_lambda_aniso(ax, ay, w):
    wz = jnp.clip(jnp.abs(w[..., 2]), MIN_COS, 1.0)
    a2 = (ax * ax * w[..., 0] ** 2 + ay * ay * w[..., 1] ** 2) / (wz * wz)
    return 0.5 * (jnp.sqrt(1.0 + a2) - 1.0)


def smith_g1(alpha, wz):
    return 1.0 / (1.0 + smith_lambda(alpha, wz))


def smith_g1_aniso(ax, ay, w):
    return 1.0 / (1.0 + smith_lambda_aniso(ax, ay, w))


def smith_g2(alpha, woz, wiz):
    return 1.0 / (1.0 + smith_lambda(alpha, woz) + smith_lambda(alpha, wiz))


def smith_g2_aniso(ax, ay, wo, wi):
    return 1.0 / (1.0 + smith_lambda_aniso(ax, ay, wo)
                  + smith_lambda_aniso(ax, ay, wi))


def fresnel_schlick(f0, cos_h):
    """Schlick Fresnel with a presence gate: a material with F0 == 0 has NO
    specular lobe at all (specular_f0_scale=0), so the grazing (1-cos)^5
    boost must vanish too — otherwise a "diffuse-only" material routes
    energy through the single-scatter GGX lobe and the furnace test drifts
    (GGX loses ~40% multiple-scattering energy at high roughness)."""
    w = jnp.power(jnp.clip(1.0 - cos_h, 0.0, 1.0), 5.0)
    if f0.ndim > cos_h.ndim:
        present = (m.luminance(f0) > 1e-6).astype(f0.dtype)
        return f0 + (1.0 - f0) * (w * present)[..., None]
    present = (f0 > 1e-6).astype(w.dtype) if f0.ndim == cos_h.ndim else 1.0
    return f0 + (1.0 - f0) * w * present


def fresnel_dielectric(cos_i, eta):
    """Exact unpolarized dielectric Fresnel; eta = n_i/n_t; cos_i >= 0."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = eta * eta * (1.0 - cos_i * cos_i)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    rs = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-12)
    rp = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-12)
    f = 0.5 * (rs * rs + rp * rp)
    return jnp.where(tir, 1.0, f)


def sample_ggx_vndf(wo, alpha, u1, u2, alpha_y=None):
    """Visible-NDF GGX half-vector sampling (Heitz 2018). wo.z > 0."""
    ay = alpha if alpha_y is None else alpha_y
    vx = alpha * wo[..., 0]
    vy = ay * wo[..., 1]
    vz = wo[..., 2]
    vh = m.normalize(jnp.stack([vx, vy, vz], axis=-1))
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where((lensq > 1e-16)[..., None],
                   jnp.stack([-vh[..., 1] * inv_len, vh[..., 0] * inv_len,
                              jnp.zeros_like(inv_len)], axis=-1),
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), vh.shape))
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1)) + s * p2
    nh = (p1[..., None] * t1 + p2[..., None] * t2
          + jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))[..., None] * vh)
    h = jnp.stack([alpha * nh[..., 0], ay * nh[..., 1],
                   jnp.maximum(nh[..., 2], 0.0)], axis=-1)
    return m.normalize(h)


def ggx_vndf_pdf(wo, h, alpha, alpha_y=None):
    """pdf of sampling half-vector h by VNDF from wo (both local)."""
    woz = jnp.maximum(wo[..., 2], MIN_COS)
    doth = jnp.maximum(m.dot(wo, h, False), 0.0)
    if alpha_y is None:
        return smith_g1(alpha, woz) * ggx_ndf(alpha, h[..., 2]) * doth / woz
    return (smith_g1_aniso(alpha, alpha_y, wo)
            * ggx_ndf_aniso(alpha, alpha_y, h) * doth / woz)


# ---------------------------------------------------------------------------
# Lobe selection probabilities
# ---------------------------------------------------------------------------


def _lobe_probs(data: BSDFData):
    f0_lum = m.luminance(data.specular_f0)
    f_avg = jnp.where(f0_lum > 1e-6,
                      jnp.clip(f0_lum + 0.04, 0.0, 1.0), 0.0)
    pd = m.luminance(data.diffuse) * (1.0 - data.transmission) * \
        (1.0 - data.diffuse_transmission)
    # the Kulla-Conty ms lobe is cosine-shaped: give it cosine-sampling
    # budget so rough metals (diffuse=0) still cover it with pdf > 0
    pd = pd + jnp.where(data.alpha >= DELTA_ALPHA,
                        m.luminance(_ms_color(data))
                        * (1.0 - _E_avg_lookup(_ms_alpha(data))), 0.0)
    pdt = data.diffuse_transmission * m.luminance(data.transmission_color)
    ps = f_avg
    pt = data.transmission * (1.0 - f_avg) * m.luminance(data.transmission_color)
    total = pd + ps + pt + pdt
    safe = jnp.maximum(total, 1e-9)
    # Degenerate (black) bsdf: fall back to diffuse to keep pdfs finite.
    pd = jnp.where(total > 1e-9, pd / safe, 1.0)
    ps = jnp.where(total > 1e-9, ps / safe, 0.0)
    pt = jnp.where(total > 1e-9, pt / safe, 0.0)
    pdt = jnp.where(total > 1e-9, pdt / safe, 0.0)
    return pd, ps, pt, pdt


# ---------------------------------------------------------------------------
# eval / pdf over non-delta lobes
# ---------------------------------------------------------------------------


# Diffuse model: "lambert" is exactly energy conserving (closed-furnace
# clean); "disney" is the Frostbite-renormalized Disney retro-diffuse
# matching the reference's look (DiffuseReflectionDisney) but gains ~1%/bounce
# at high roughness.
DIFFUSE_MODEL = "lambert"


def _eval_diffuse(data, wo, wi):
    """Diffuse reflection * cos (reflection hemisphere)."""
    woz, wiz = wo[..., 2], wi[..., 2]
    if DIFFUSE_MODEL == "disney":
        h = m.normalize(wo + wi)
        cos_d = jnp.clip(m.dot(wi, h, False), 0.0, 1.0)
        rough = jnp.sqrt(jnp.maximum(data.alpha, 0.0))
        energy_bias = 0.5 * rough
        energy_factor = 1.0 + rough * (1.0 / 1.51 - 1.0)
        fd90 = energy_bias + 2.0 * rough * cos_d * cos_d

        def pow5(x):
            x = jnp.clip(1.0 - x, 0.0, 1.0)
            return x * x * x * x * x

        fd = ((1.0 + (fd90 - 1.0) * pow5(wiz))
              * (1.0 + (fd90 - 1.0) * pow5(woz)) * energy_factor)
    else:
        fd = jnp.ones_like(woz)
    # Diffuse/specular energy coupling: scale diffuse by the Fresnel energy
    # the specular lobe already claimed (keeps white-furnace <= 1).
    f0_lum = jnp.clip(m.luminance(data.specular_f0), 0.0, 1.0)
    fd = fd * (1.0 - fresnel_schlick(f0_lum, jnp.clip(woz, 0.0, 1.0)))
    f = data.diffuse / jnp.pi * (fd * jnp.maximum(wiz, 0.0))[..., None]
    valid = (woz > MIN_COS) & (wiz > MIN_COS)
    return jnp.where(valid[..., None], f, 0.0)


def _eval_diffuse_trans(data, wo, wi):
    woz, wiz = wo[..., 2], wi[..., 2]
    f = (data.transmission_color * data.diffuse_transmission[..., None]
         / jnp.pi * jnp.maximum(-wiz, 0.0)[..., None])
    valid = (woz > MIN_COS) & (wiz < -MIN_COS)
    return jnp.where(valid[..., None], f, 0.0)


# --- Kulla-Conty multiple-scattering energy compensation -------------------
# Single-scatter GGX loses up to ~60% energy at roughness 1 (the G term
# discards multi-bounce microfacet paths). The compensation lobe
# f_ms = F_ms (1-E(mu_o))(1-E(mu_i)) / (pi (1-E_avg)) restores a white
# furnace for F0=1 (Kulla & Conty 2017; reference analog: Falcor BxDF
# energy compensation, arch-doc gap #5). E(mu, alpha) is the directional
# albedo of the single-scatter lobe, tabulated once on first use.

_E_TABLE = None           # (E [NA, NM], E_avg [NA]) jnp arrays
_E_RES = 32


def _energy_tables():
    global _E_TABLE
    if _E_TABLE is None:
        # Pure numpy build (may be triggered from inside a jit trace via
        # the first bsdf_eval — no jnp ops allowed here). Disk-cached:
        # the table is deterministic in (_E_RES, build version).
        import os as _os
        import tempfile as _tf
        import numpy as _np
        cache = _os.path.join(_tf.gettempdir(),
                              f"rtxpt_tpu_ggx_E_v3_{_E_RES}.npz")
        try:
            z = _np.load(cache)
            _E_TABLE = (z["E"], z["E_avg"])
            return _E_TABLE
        except Exception:
            pass

        def _ndf(a, hz):
            a2 = a * a
            den = hz * hz * (a2 - 1.0) + 1.0
            return a2 / _np.maximum(_np.pi * den * den, 1e-12)

        def _lam(a, wz):
            wz = _np.clip(_np.abs(wz), MIN_COS, 1.0)
            return 0.5 * (_np.sqrt(1.0 + a * a * (1.0 - wz * wz)
                                   / (wz * wz)) - 1.0)

        def _g2(a, woz, wiz):
            return 1.0 / (1.0 + _lam(a, woz) + _lam(a, wiz))

        def _g1(a, wz):
            return 1.0 / (1.0 + _lam(a, wz))

        def _vndf(wo, a, u1, u2):
            vh = wo * _np.asarray([a, a, 1.0])
            vh = vh / _np.linalg.norm(vh, axis=-1, keepdims=True)
            lensq = vh[:, 0] ** 2 + vh[:, 1] ** 2
            inv = 1.0 / _np.sqrt(_np.maximum(lensq, 1e-20))
            t1 = _np.where((lensq > 1e-16)[:, None],
                           _np.stack([-vh[:, 1] * inv, vh[:, 0] * inv,
                                      _np.zeros_like(inv)], -1),
                           _np.asarray([[1.0, 0.0, 0.0]]))
            t2 = _np.cross(vh, t1)
            r = _np.sqrt(u1)
            phi = 2.0 * _np.pi * u2
            p1 = r * _np.cos(phi)
            p2 = r * _np.sin(phi)
            sble = 0.5 * (1.0 + vh[:, 2])
            p2 = (1.0 - sble) * _np.sqrt(
                _np.maximum(0.0, 1.0 - p1 * p1)) + sble * p2
            nh = (p1[:, None] * t1 + p2[:, None] * t2
                  + _np.sqrt(_np.maximum(
                      0.0, 1.0 - p1 * p1 - p2 * p2))[:, None] * vh)
            h = _np.stack([a * nh[:, 0], a * nh[:, 1],
                           _np.maximum(nh[:, 2], 0.0)], -1)
            return h / _np.maximum(
                _np.linalg.norm(h, axis=-1, keepdims=True), 1e-12)

        na = nm = _E_RES
        K = 64
        th = (_np.arange(K) + 0.5) / K * (_np.pi / 2)
        ph = (_np.arange(K) + 0.5) / K * (2 * _np.pi)
        TH, PH = _np.meshgrid(th, ph, indexing="ij")
        wi = _np.stack([_np.sin(TH) * _np.cos(PH),
                        _np.sin(TH) * _np.sin(PH),
                        _np.cos(TH)], -1).reshape(-1, 3)
        dw = ((_np.pi / 2 / K) * (2 * _np.pi / K)
              * _np.sin(TH).reshape(-1))
        g = 64
        gi = (_np.arange(g) + 0.5) / g
        u1g = _np.repeat(gi, g)
        u2g = _np.tile(gi, g)
        mus = _np.arange(nm) / (nm - 1.0)
        alphas = (_np.arange(na) / (na - 1.0)) ** 2
        E = _np.zeros((na, nm), _np.float64)
        for ai, a in enumerate(alphas):
            for mi, mu in enumerate(mus):
                wo3 = _np.asarray(
                    [_np.sqrt(max(0.0, 1 - mu * mu)), 0.0, mu])
                if a >= 0.15:
                    # wide lobes: exact-eval hemisphere quadrature
                    h = wo3[None] + wi
                    h = h / _np.maximum(
                        _np.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
                    num = (_ndf(a, h[:, 2]) * _g2(a, mu, wi[:, 2])
                           / max(4.0 * mu, 1e-9))
                    ok = (wi[:, 2] > MIN_COS) & (mu > MIN_COS)
                    E[ai, mi] = float((_np.where(ok, num, 0.0) * dw).sum())
                else:
                    # narrow lobes: VNDF-warped grid (the fixed grid
                    # misses the D spike; 1-E ~ 0 here anyway)
                    wo_ = _np.tile(wo3[None], (g * g, 1))
                    h = _vndf(wo_, max(a, 1e-4), u1g, u2g)
                    wiv = 2.0 * (wo_ * h).sum(-1, keepdims=True) * h - wo_
                    wiv = wiv / _np.maximum(
                        _np.linalg.norm(wiv, axis=-1, keepdims=True),
                        1e-12)
                    w = _np.where(
                        (wiv[:, 2] > MIN_COS) & (mu > MIN_COS),
                        _g2(a, mu, wiv[:, 2])
                        / _np.maximum(_g1(a, mu), 1e-9), 0.0)
                    E[ai, mi] = float(w.mean())
        E = _np.clip(E, 0.0, 1.0)
        E_avg = 2.0 * _np.trapezoid(E * mus[None, :], mus, axis=1)
        # cache NUMPY (converted per lookup): jnp constants created inside
        # one jit trace must not leak into another
        _E_TABLE = (E.astype(_np.float32), E_avg.astype(_np.float32))
        try:
            _np.savez(cache, E=_E_TABLE[0], E_avg=_E_TABLE[1])
        except Exception:
            pass
    return _E_TABLE


def _E_lookup(alpha, mu):
    E = jnp.asarray(_energy_tables()[0])
    ai = jnp.clip(jnp.sqrt(jnp.clip(alpha, 0.0, 1.0)) * (_E_RES - 1.0),
                  0.0, _E_RES - 1.0)
    mi = jnp.clip(jnp.clip(mu, 0.0, 1.0) * (_E_RES - 1.0),
                  0.0, _E_RES - 1.0)
    a0 = jnp.floor(ai).astype(jnp.int32)
    m0 = jnp.floor(mi).astype(jnp.int32)
    a1 = jnp.minimum(a0 + 1, _E_RES - 1)
    m1 = jnp.minimum(m0 + 1, _E_RES - 1)
    fa = ai - a0
    fm = mi - m0
    return ((E[a0, m0] * (1 - fm) + E[a0, m1] * fm) * (1 - fa)
            + (E[a1, m0] * (1 - fm) + E[a1, m1] * fm) * fa)


def _E_avg_lookup(alpha):
    Ea = jnp.asarray(_energy_tables()[1])
    ai = jnp.clip(jnp.sqrt(jnp.clip(alpha, 0.0, 1.0)) * (_E_RES - 1.0),
                  0.0, _E_RES - 1.0)
    a0 = jnp.floor(ai).astype(jnp.int32)
    a1 = jnp.minimum(a0 + 1, _E_RES - 1)
    fa = ai - a0
    return Ea[a0] * (1 - fa) + Ea[a1] * fa


def bake_e_rows_np(alphas):
    """Host bake of per-material energy rows for the fused kernels:
    E(alpha_m, mu_k) at the table's mu grid (k/(R-1)) with bilinear
    alpha interpolation, + E_avg(alpha_m). Separable bilinear makes the
    kernel's runtime mu-lerp EXACTLY match _E_lookup. Returns
    (e_rows [32, M], e_avg [M]) float32 numpy."""
    import numpy as _np
    E, Ea = _energy_tables()
    alphas = _np.asarray(alphas, _np.float64)
    ai = _np.clip(_np.sqrt(_np.clip(alphas, 0.0, 1.0)) * (_E_RES - 1.0),
                  0.0, _E_RES - 1.0)
    a0 = _np.floor(ai).astype(_np.int64)
    a1 = _np.minimum(a0 + 1, _E_RES - 1)
    fa = (ai - a0).astype(_np.float32)
    rows = (E[a0].T * (1.0 - fa) + E[a1].T * fa).astype(_np.float32)
    eavg = (Ea[a0] * (1.0 - fa) + Ea[a1] * fa).astype(_np.float32)
    return rows, eavg


def bake_e_poly_np(alphas):
    """Per-material polynomial fit of E(mu) in the sqrt(mu) basis
    (degree 5, cos-weighted, mu >= 0.02): the fused kernels evaluate 5
    FMAs instead of a 32-bin table lerp (worst-case fit error ~1e-2 on
    the sharpest rows; the XLA path keeps the exact table). Returns
    (coef [6, M], e_avg [M]) float32."""
    import numpy as _np
    rows, e_avg = bake_e_rows_np(alphas)        # [32, M] exact per alpha
    nm = rows.shape[0]
    mus = _np.arange(nm) / (nm - 1.0)
    sel = mus >= 0.02
    sm = _np.sqrt(mus[sel])
    w = _np.sqrt(mus[sel])
    A = _np.stack([sm ** i for i in range(6)], -1) * w[:, None]
    coef, *_ = _np.linalg.lstsq(A, rows[sel] * w[:, None], rcond=None)
    return coef.astype(_np.float32), e_avg


def _ms_alpha(data):
    """Energy-table key for (an)isotropic lobes: the mean alpha tracks
    the single-scatter loss of the stretched lobe far better than the
    geometric mean (validated by the anisotropic furnace check)."""
    return 0.5 * (data.ax + data.ay)


def _ms_color(data):
    """Kulla-Conty multi-scatter Fresnel factor (per channel)."""
    e_avg = _E_avg_lookup(_ms_alpha(data))[..., None]
    f_avg = data.specular_f0 + (1.0 - data.specular_f0) / 21.0
    return f_avg * f_avg * e_avg / jnp.maximum(
        1.0 - f_avg * (1.0 - e_avg), 1e-4)


def _eval_spec_ms(data, wo, wi):
    """Energy-compensation lobe * cos(wi)."""
    woz, wiz = wo[..., 2], wi[..., 2]
    a_ms = _ms_alpha(data)
    e_o = _E_lookup(a_ms, woz)
    e_i = _E_lookup(a_ms, wiz)
    e_avg = _E_avg_lookup(a_ms)
    f = ((1.0 - e_o) * (1.0 - e_i)
         / (jnp.pi * jnp.maximum(1.0 - e_avg, 1e-4)))
    f_cos = (f * jnp.maximum(wiz, 0.0))[..., None] * _ms_color(data)
    valid = (woz > MIN_COS) & (wiz > MIN_COS) & (data.alpha >= DELTA_ALPHA)
    return jnp.where(valid[..., None], f_cos, 0.0)


def _eval_spec_refl(data, wo, wi):
    woz, wiz = wo[..., 2], wi[..., 2]
    h = m.normalize(wo + wi)
    doth = jnp.maximum(m.dot(wo, h, False), 0.0)
    D = ggx_ndf_aniso(data.ax, data.ay, h)
    G = smith_g2_aniso(data.ax, data.ay, wo, wi)
    F = fresnel_schlick(data.specular_f0, doth)
    spec = F * (D * G / jnp.maximum(4.0 * woz, 1e-9) )[..., None]
    # (f * cos_wi) = F D G / (4 woz wiz) * wiz = F D G / (4 woz)
    valid = (woz > MIN_COS) & (wiz > MIN_COS) & (data.alpha >= DELTA_ALPHA)
    return jnp.where(valid[..., None], spec, 0.0)


def _eval_spec_trans(data, wo, wi):
    """GGX rough refraction * cos (Walter 2007 eq. 21)."""
    woz, wiz = wo[..., 2], wi[..., 2]
    eta = data.eta  # n_i / n_t  (wo side is incident)
    # Half vector for refraction: h = -(wo*n_i + wi*n_t) normalized; in
    # relative terms h ∝ -(eta*wo + wi) with our eta convention.
    h = m.normalize(-(eta[..., None] * wo + wi))
    h = h * jnp.where(h[..., 2:3] < 0.0, -1.0, 1.0)  # keep h upper hemisphere
    dot_oh = m.dot(wo, h, False)
    dot_ih = m.dot(wi, h, False)
    F = fresnel_dielectric(jnp.abs(dot_oh), eta)
    D = ggx_ndf_aniso(data.ax, data.ay, h)
    G = smith_g2_aniso(data.ax, data.ay, wo,
                       jnp.stack([wi[..., 0], wi[..., 1],
                                  jnp.abs(wiz)], axis=-1))
    denom = (dot_oh * eta + dot_ih)
    jac = jnp.abs(dot_ih) / jnp.maximum(denom * denom, 1e-9)
    f_cos = ((1.0 - F) * D * G * jac * jnp.abs(dot_oh)
             / jnp.maximum(jnp.abs(woz), MIN_COS))
    valid = ((woz > MIN_COS) & (wiz < -MIN_COS)
             & (data.alpha >= DELTA_ALPHA)
             & (dot_oh > 0.0) & (dot_ih < 0.0))
    f = data.transmission_color * (data.transmission * f_cos)[..., None]
    return jnp.where(valid[..., None], f, 0.0)


def bsdf_eval(data: BSDFData, wo, wi):
    """Sum of non-delta lobes: f(wo,wi) * |cos(wi)|, [N,3]."""
    pd, ps, pt, pdt = _lobe_probs(data)
    f = (_eval_diffuse(data, wo, wi) * (1.0 - data.transmission)[..., None]
         * (1.0 - data.diffuse_transmission)[..., None]
         + _eval_diffuse_trans(data, wo, wi)
         + _eval_spec_refl(data, wo, wi)
         + _eval_spec_ms(data, wo, wi)
         + _eval_spec_trans(data, wo, wi))
    return f


def bsdf_eval_split(data: BSDFData, wo, wi):
    """bsdf_eval partitioned into (diffuse-ish, specular-ish) channels —
    the NRD diffuse/specular split (NrdConfig.cpp:25-27): diffuse
    reflection + diffuse transmission vs microfacet reflection +
    transmission. f_d + f_s == bsdf_eval exactly."""
    f_d = (_eval_diffuse(data, wo, wi) * (1.0 - data.transmission)[..., None]
           * (1.0 - data.diffuse_transmission)[..., None]
           + _eval_diffuse_trans(data, wo, wi))
    f_s = (_eval_spec_refl(data, wo, wi) + _eval_spec_ms(data, wo, wi)
           + _eval_spec_trans(data, wo, wi))
    return f_d, f_s


def bsdf_pdf(data: BSDFData, wo, wi):
    """Combined solid-angle pdf of `sample` producing wi (non-delta lobes)."""
    pd, ps, pt, pdt = _lobe_probs(data)
    woz, wiz = wo[..., 2], wi[..., 2]
    smooth = data.alpha >= DELTA_ALPHA

    pdf_d = jnp.maximum(wiz, 0.0) / jnp.pi
    pdf_dt = jnp.maximum(-wiz, 0.0) / jnp.pi

    h_r = m.normalize(wo + wi)
    pdf_s = ggx_vndf_pdf(wo, h_r, data.ax, data.ay) / jnp.maximum(
        4.0 * jnp.abs(m.dot(wo, h_r, False)), 1e-9)
    pdf_s = jnp.where(smooth & (wiz > MIN_COS) & (woz > MIN_COS), pdf_s, 0.0)

    eta = data.eta
    h_t = m.normalize(-(eta[..., None] * wo + wi))
    h_t = h_t * jnp.where(h_t[..., 2:3] < 0.0, -1.0, 1.0)
    dot_oh = m.dot(wo, h_t, False)
    dot_ih = m.dot(wi, h_t, False)
    denom = (dot_oh * eta + dot_ih)
    jac_t = jnp.abs(dot_ih) / jnp.maximum(denom * denom, 1e-9)
    F = fresnel_dielectric(jnp.abs(dot_oh), eta)
    pdf_t = ggx_vndf_pdf(wo, h_t, data.ax, data.ay) * jac_t * (1.0 - F)
    pdf_t = jnp.where(smooth & (wiz < -MIN_COS) & (woz > MIN_COS)
                      & (dot_oh > 0.0) & (dot_ih < 0.0), pdf_t, 0.0)
    # Reflection lobe also leaves (1-F)->F split implicit in lobe probs; the
    # spec-trans lobe pdf integrates F into its sampling (see sample below).
    return pd * pdf_d + ps * pdf_s + pt * pdf_t + pdt * pdf_dt


# ---------------------------------------------------------------------------
# sample
# ---------------------------------------------------------------------------


def bsdf_sample(data: BSDFData, wo, u_lobe, u1, u2):
    """Sample wi from the full BSDF.

    Returns dict(wi [N,3], weight [N,3] = f*cos/pdf, pdf [N] (0 for delta),
    is_delta [N] bool, lobe [N] i32, valid [N] bool).
    """
    pd, ps, pt, pdt = _lobe_probs(data)
    woz = wo[..., 2]
    smooth = data.alpha >= DELTA_ALPHA

    c1 = pd
    c2 = pd + ps
    c3 = pd + ps + pt
    sel_d = u_lobe < c1
    sel_s = (~sel_d) & (u_lobe < c2)
    sel_t = (~sel_d) & (~sel_s) & (u_lobe < c3)
    sel_dt = (~sel_d) & (~sel_s) & (~sel_t)
    lobe = jnp.where(sel_d, LOBE_DIFFUSE_REFL,
                     jnp.where(sel_s, LOBE_SPECULAR_REFL,
                               jnp.where(sel_t, LOBE_SPECULAR_TRANS,
                                         LOBE_DIFFUSE_TRANS)))

    # --- candidate wi per lobe ---
    wi_cos, _ = m.sample_cosine_hemisphere(u1, u2)

    alpha_s = jnp.maximum(data.ax, DELTA_ALPHA)
    alpha_sy = jnp.maximum(data.ay, DELTA_ALPHA)
    h = sample_ggx_vndf(wo, alpha_s, u1, u2, alpha_sy)
    h_eff = jnp.where(smooth[..., None], h,
                      jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), h.shape))
    wi_refl = m.normalize(2.0 * m.dot(wo, h_eff) * h_eff - wo)

    eta = data.eta
    cos_oh = jnp.clip(m.dot(wo, h_eff, False), 0.0, 1.0)
    sin2_t = eta * eta * (1.0 - cos_oh * cos_oh)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wi_refr = m.normalize((-eta[..., None]) * wo
                          + (eta * cos_oh - cos_t)[..., None] * h_eff)
    wi_dt = jnp.stack([wi_cos[..., 0], wi_cos[..., 1], -wi_cos[..., 2]],
                      axis=-1)

    wi = jnp.where(sel_d[..., None], wi_cos,
                   jnp.where(sel_s[..., None], wi_refl,
                             jnp.where(sel_t[..., None],
                                       jnp.where(tir[..., None], wi_refl,
                                                 wi_refr),
                                       wi_dt)))

    is_delta = (~smooth) & (sel_s | sel_t)

    # --- smooth path: combined f & pdf for MIS-correct weights ---
    f = bsdf_eval(data, wo, wi)
    pdf = bsdf_pdf(data, wo, wi)
    w_smooth = f / jnp.maximum(pdf, 1e-12)[..., None]

    # --- delta path weights ---
    f_mirror = fresnel_schlick(data.specular_f0, jnp.clip(woz, 0.0, 1.0))
    Fd = fresnel_dielectric(jnp.clip(woz, 0.0, 1.0), eta)
    w_delta_s = f_mirror / jnp.maximum(ps, 1e-9)[..., None]
    w_delta_t = (data.transmission_color
                 * (data.transmission * (1.0 - Fd))[..., None]
                 / jnp.maximum(pt, 1e-9)[..., None])
    # At TIR fresnel_dielectric returns Fd == 1, so the (1-Fd) transmission
    # factor would zero the reflected ray; TIR reflectance is exactly 1, so
    # the full lobe budget reflects (reference keeps TIR paths alive).
    w_delta_t = jnp.where(tir[..., None],
                          data.transmission_color
                          * (data.transmission[..., None])
                          / jnp.maximum(pt, 1e-9)[..., None],
                          w_delta_t)
    w_delta = jnp.where(sel_s[..., None], w_delta_s, w_delta_t)

    weight = jnp.where(is_delta[..., None], w_delta, w_smooth)
    pdf_out = jnp.where(is_delta, 0.0, pdf)

    valid = (woz > MIN_COS) & (m.luminance(weight) >= 0.0)
    # transmission selected but wi ended on wrong side (or vice versa) is
    # already zero-weighted via eval; delta TIR reflects.
    valid = valid & jnp.isfinite(m.luminance(weight))
    return dict(wi=wi, weight=jnp.maximum(weight, 0.0), pdf=pdf_out,
                is_delta=is_delta, lobe=lobe, valid=valid)


# ---------------------------------------------------------------------------
# Material -> BSDFData (MaterialPT.h decode analog)
# ---------------------------------------------------------------------------


def make_bsdf_data(base_color, metallic, roughness, ior, transmission,
                   diffuse_transmission, specular_scale, front,
                   cur_ior=None, below_ior=None,
                   anisotropy=None) -> BSDFData:
    """Assemble BSDFData from (possibly textured) material parameters.

    `front`: bool [N], True when the shading point is seen from outside
    (determines eta orientation). `cur_ior`/`below_ior` come from the
    interior medium stack (nested dielectrics); defaults assume air.
    """
    f0_dielec = (0.08 * specular_scale)[..., None] * jnp.ones_like(base_color)
    specular_f0 = f0_dielec * (1.0 - metallic[..., None]) \
        + base_color * metallic[..., None]
    diffuse = base_color * (1.0 - metallic[..., None])
    mat_ior = jnp.maximum(ior, 1.0 + 1e-4)
    if cur_ior is None:
        eta = jnp.where(front, 1.0 / mat_ior, mat_ior)
    else:
        # entering: from the current medium into this material; exiting:
        # from the current medium (this material) into the one below the
        # stack top — keeps nested dielectrics (glass-in-water) correct.
        bi = below_ior if below_ior is not None else jnp.ones_like(cur_ior)
        eta = jnp.where(front, cur_ior / mat_ior,
                        cur_ior / jnp.maximum(bi, 1.0))
    alpha = jnp.clip(roughness * roughness, 0.0, 1.0)
    if anisotropy is None:
        ax = ay = alpha
    else:
        # Disney aspect remap (KHR_materials_anisotropy strength)
        aspect = jnp.sqrt(1.0 - 0.9 * jnp.clip(anisotropy, 0.0, 1.0))
        ax = jnp.clip(alpha / jnp.maximum(aspect, 1e-3), 0.0, 1.0)
        ay = jnp.clip(alpha * aspect, 0.0, 1.0)
    return BSDFData(
        alpha_x=ax, alpha_y=ay,
        diffuse=diffuse,
        specular_f0=specular_f0,
        alpha=alpha,
        transmission=transmission * (1.0 - metallic),
        diffuse_transmission=diffuse_transmission * (1.0 - metallic),
        eta=eta,
        transmission_color=base_color * 0.0 + 1.0,
    )
