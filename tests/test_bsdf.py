"""BSDF tests: sample/eval/pdf consistency, energy conservation, white
furnace (SURVEY.md §4 planned unit tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtxpt_tpu.pt import bsdf as B
from rtxpt_tpu.utils import rng, math as m


def _data(n, base=(0.8, 0.8, 0.8), metallic=0.0, roughness=0.5,
          ior=1.5, transmission=0.0, dtrans=0.0, specular=0.5):
    mk = lambda v: jnp.full((n,), v, jnp.float32)
    mk3 = lambda v: jnp.tile(jnp.asarray(v, jnp.float32)[None], (n, 1))
    return B.make_bsdf_data(mk3(base), mk(metallic), mk(roughness), mk(ior),
                            mk(transmission), mk(dtrans), mk(specular),
                            jnp.ones((n,), bool))


def _random_wo(n, seed=0):
    r = np.random.default_rng(seed)
    wo = r.normal(0, 1, (n, 3))
    wo[:, 2] = np.abs(wo[:, 2]) + 0.05
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    return jnp.asarray(wo, jnp.float32)


def _samples(n, seed=1):
    r = np.random.default_rng(seed)
    return (jnp.asarray(r.uniform(0, 1, n), jnp.float32),
            jnp.asarray(r.uniform(0, 1, n), jnp.float32),
            jnp.asarray(r.uniform(0, 1, n), jnp.float32))


@pytest.mark.parametrize("metallic,roughness,transmission", [
    (0.0, 1.0, 0.0),     # pure diffuse
    (0.0, 0.4, 0.0),     # diffuse + GGX
    (1.0, 0.3, 0.0),     # rough metal
    (0.0, 0.2, 1.0),     # rough glass
])
def test_sample_pdf_consistency(metallic, roughness, transmission):
    """pdf returned by sample() matches bsdf_pdf(wi), and weight = f/pdf."""
    n = 4096
    data = _data(n, metallic=metallic, roughness=roughness,
                 transmission=transmission)
    wo = _random_wo(n)
    ul, u1, u2 = _samples(n)
    s = B.bsdf_sample(data, wo, ul, u1, u2)
    smooth = ~np.asarray(s["is_delta"])
    valid = np.asarray(s["valid"]) & smooth
    pdf_re = np.asarray(B.bsdf_pdf(data, wo, s["wi"]))
    pdf_s = np.asarray(s["pdf"])
    np.testing.assert_allclose(pdf_s[valid], pdf_re[valid], rtol=2e-3,
                               atol=1e-5)
    f = np.asarray(B.bsdf_eval(data, wo, s["wi"]))
    w = np.asarray(s["weight"])
    expect = f[valid] / np.maximum(pdf_s[valid, None], 1e-12)
    np.testing.assert_allclose(w[valid], expect, rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("metallic,roughness,transmission", [
    (0.0, 1.0, 0.0),
    (0.0, 0.5, 0.0),
    (1.0, 0.4, 0.0),
    (0.0, 0.05, 0.0),
    (0.0, 0.3, 1.0),
])
def test_energy_conservation(metallic, roughness, transmission):
    """Monte-Carlo white furnace: E[weight] <= 1 + tolerance per channel."""
    n = 1 << 15
    data = _data(n, base=(1.0, 1.0, 1.0), metallic=metallic,
                 roughness=roughness, transmission=transmission)
    wo = jnp.tile(jnp.asarray([[0.3, 0.1, 0.9486833]], jnp.float32), (n, 1))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    ul, u1, u2 = _samples(n, seed=3)
    s = B.bsdf_sample(data, wo, ul, u1, u2)
    w = np.asarray(s["weight"])
    valid = np.asarray(s["valid"])
    w = np.where(valid[:, None], w, 0.0)
    mean = w.mean(0)
    assert (mean <= 1.06).all(), f"energy gain: {mean}"
    assert (mean >= 0.0).all()


def test_pdf_integrates_to_one_diffuse():
    """For the diffuse-only BSDF the pdf over the sphere integrates to ~1.

    (With a specular lobe present the integral is rightly < 1: VNDF at high
    alpha emits below-horizon directions that sampling rejects.)"""
    n = 1 << 16
    data = _data(n, roughness=1.0, specular=0.0)
    wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    r = np.random.default_rng(5)
    wi = r.normal(0, 1, (n, 3))
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    pdf = np.asarray(B.bsdf_pdf(data, wo, jnp.asarray(wi, jnp.float32)))
    integral = pdf.mean() * 4 * np.pi
    assert abs(integral - 1.0) < 0.05


def test_ggx_eval_reciprocal_hemisphere():
    """f*cos is non-negative and finite across the hemisphere."""
    n = 8192
    data = _data(n, metallic=1.0, roughness=0.2)
    wo = _random_wo(n, 11)
    wi = _random_wo(n, 12)
    f = np.asarray(B.bsdf_eval(data, wo, wi))
    assert np.isfinite(f).all()
    assert (f >= 0).all()


def test_delta_mirror():
    n = 128
    data = _data(n, metallic=1.0, roughness=0.0)
    wo = _random_wo(n, 13)
    ul, u1, u2 = _samples(n, 14)
    s = B.bsdf_sample(data, wo, ul, u1, u2)
    assert np.asarray(s["is_delta"]).all()
    wi = np.asarray(s["wi"])
    woh = np.asarray(wo)
    expect = np.stack([-woh[:, 0], -woh[:, 1], woh[:, 2]], -1)
    np.testing.assert_allclose(wi, expect, atol=1e-5)


def test_smooth_glass_refracts():
    n = 4096
    data = _data(n, roughness=0.0, transmission=1.0, base=(1.0, 1.0, 1.0))
    wo = _random_wo(n, 15)
    ul, u1, u2 = _samples(n, 16)
    s = B.bsdf_sample(data, wo, ul, u1, u2)
    wi = np.asarray(s["wi"])
    delta = np.asarray(s["is_delta"])
    assert delta.all()
    # some rays refract (wi.z < 0), some reflect by fresnel
    assert (wi[:, 2] < 0).any()
    # Snell's law check for refracted rays
    refr = wi[:, 2] < -1e-4
    woh = np.asarray(wo)
    sin_i = np.sqrt(np.clip(1 - woh[refr, 2] ** 2, 0, 1))
    sin_t = np.sqrt(np.clip(1 - wi[refr, 2] ** 2, 0, 1))
    np.testing.assert_allclose(sin_i / 1.5, sin_t, atol=2e-3)


def test_energy_compensation_metal_furnace():
    """VERDICT r1 #8 gate: Kulla-Conty multiple-scattering compensation —
    a white metal (F0=1) must pass the furnace at roughness 1.0 within 1%
    (single-scatter GGX alone loses ~62% there)."""
    import numpy as np2
    n = 200000
    rng2 = np.random.default_rng(0)
    data = B.make_bsdf_data(
        base_color=jnp.ones((n, 3)), metallic=jnp.ones((n,)),
        roughness=jnp.full((n,), 1.0), ior=jnp.full((n,), 1.5),
        transmission=jnp.zeros((n,)), diffuse_transmission=jnp.zeros((n,)),
        specular_scale=jnp.full((n,), 0.5), front=jnp.ones((n,), bool))
    uo = rng2.uniform(size=(2, n)).astype(np2.float32)
    wo, _ = m.sample_cosine_hemisphere(jnp.asarray(uo[0]),
                                       jnp.asarray(uo[1]))
    u = jnp.asarray(rng2.uniform(size=(3, n)), jnp.float32)
    bs = B.bsdf_sample(data, wo, u[0], u[1], u[2])
    albedo = float(np2.mean(np2.asarray(
        m.luminance(bs["weight"]) * bs["valid"])))
    assert abs(albedo - 1.0) < 0.01, albedo


def test_energy_compensation_zero_for_smooth():
    """The ms lobe must vanish for smooth surfaces (delta handled apart)."""
    n = 16
    data = B.make_bsdf_data(
        base_color=jnp.ones((n, 3)), metallic=jnp.ones((n,)),
        roughness=jnp.full((n,), 0.05), ior=jnp.full((n,), 1.5),
        transmission=jnp.zeros((n,)), diffuse_transmission=jnp.zeros((n,)),
        specular_scale=jnp.full((n,), 0.5), front=jnp.ones((n,), bool))
    wo = jnp.tile(jnp.asarray([[0.0, 0.6, 0.8]]), (n, 1))
    wi = jnp.tile(jnp.asarray([[0.0, -0.6, 0.8]]), (n, 1))
    fms = np.asarray(B._eval_spec_ms(data, wo, wi))
    assert fms.max() < 0.02


def test_anisotropic_lobe_elongation_and_consistency():
    """KHR_materials_anisotropy: the GGX lobe stretches along the tangent
    and sample/eval/pdf stay consistent (FalcorBSDF anisotropy parity)."""
    n = 100000
    rng2 = np.random.default_rng(3)
    data = B.make_bsdf_data(
        base_color=jnp.ones((n, 3)), metallic=jnp.ones((n,)),
        roughness=jnp.full((n,), 0.5), ior=jnp.full((n,), 1.5),
        transmission=jnp.zeros((n,)), diffuse_transmission=jnp.zeros((n,)),
        specular_scale=jnp.full((n,), 0.5), front=jnp.ones((n,), bool),
        anisotropy=jnp.full((n,), 0.9))
    wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    u = jnp.asarray(rng2.uniform(size=(3, n)), jnp.float32)
    bs = B.bsdf_sample(data, wo, u[0] * 0.0 + 0.5, u[1], u[2])
    wi = np.asarray(bs["wi"])
    ok = np.asarray(bs["valid"]) & (wi[:, 2] > 0)
    # tangent(x)-direction spread >> bitangent(y) spread (ax > ay)
    assert wi[ok, 0].std() > 1.8 * wi[ok, 1].std()

    # eval/pdf consistency: E[f cos / pdf] == directional albedo <= ~1
    # (the ms energy table is isotropic — keyed on mean alpha — so strong
    # anisotropy retains a few % single-scatter loss, like the reference)
    w = np.asarray(m.luminance(bs["weight"]) * bs["valid"])
    assert 0.9 < w.mean() < 1.06, w.mean()


def test_anisotropy_zero_matches_isotropic():
    n = 4096
    rng2 = np.random.default_rng(4)
    kw = dict(
        base_color=jnp.ones((n, 3)) * 0.6, metallic=jnp.zeros((n,)),
        roughness=jnp.full((n,), 0.4), ior=jnp.full((n,), 1.5),
        transmission=jnp.zeros((n,)), diffuse_transmission=jnp.zeros((n,)),
        specular_scale=jnp.full((n,), 0.5), front=jnp.ones((n,), bool))
    d0 = B.make_bsdf_data(**kw)
    d1 = B.make_bsdf_data(**kw, anisotropy=jnp.zeros((n,)))
    wo = jnp.tile(jnp.asarray([[0.0, 0.6, 0.8]]), (n, 1))
    wi = jnp.tile(jnp.asarray([[0.5, -0.1, 0.86]]), (n, 1))
    np.testing.assert_allclose(np.asarray(B.bsdf_eval(d0, wo, wi)),
                               np.asarray(B.bsdf_eval(d1, wo, wi)),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(B.bsdf_pdf(d0, wo, wi)),
                               np.asarray(B.bsdf_pdf(d1, wo, wi)),
                               rtol=1e-5)
