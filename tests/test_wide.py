"""Parity tests: wide (structure-of-tiles) shading math vs the [N,3]-shaped
originals in pt/bsdf.py and lighting/lights_baker.py."""

import numpy as np
import jax.numpy as jnp
import pytest

from rtxpt_tpu.pt import bsdf as B
from rtxpt_tpu.pt import wide as W


def _rand_dirs(rs, n, upper=False):
    v = rs.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    if upper:
        v[:, 2] = np.abs(v[:, 2]) + 1e-3
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return v


def _rand_bsdf(rs, n):
    base = rs.uniform(0.05, 1.0, (n, 3)).astype(np.float32)
    metallic = rs.uniform(0, 1, n).astype(np.float32)
    rough = rs.uniform(0, 1, n).astype(np.float32)
    ior = rs.uniform(1.1, 2.0, n).astype(np.float32)
    trans = (rs.uniform(0, 1, n) * (rs.uniform(size=n) < 0.5)).astype(
        np.float32)
    dtrans = (rs.uniform(0, 0.3, n) * (rs.uniform(size=n) < 0.3)).astype(
        np.float32)
    spec = rs.uniform(0, 1, n).astype(np.float32)
    front = rs.uniform(size=n) < 0.8
    cur = np.ones(n, np.float32)
    below = np.ones(n, np.float32)
    data = B.make_bsdf_data(jnp.asarray(base), jnp.asarray(metallic),
                            jnp.asarray(rough), jnp.asarray(ior),
                            jnp.asarray(trans), jnp.asarray(dtrans),
                            jnp.asarray(spec), jnp.asarray(front),
                            cur_ior=jnp.asarray(cur),
                            below_ior=jnp.asarray(below))
    # baked energy polys (the kernels gather these from the MT table)
    e_poly, e_avg = B.bake_e_poly_np(np.clip(rough * rough, 0.0, 1.0))
    dataw = W.make_bsdf_w(jnp.asarray(base.T), jnp.asarray(metallic),
                          jnp.asarray(rough), jnp.asarray(ior),
                          jnp.asarray(trans), jnp.asarray(dtrans),
                          jnp.asarray(spec), jnp.asarray(front),
                          cur_ior=jnp.asarray(cur),
                          below_ior=jnp.asarray(below),
                          e_poly=jnp.asarray(e_poly),
                          e_avg=jnp.asarray(e_avg))
    return data, dataw


def test_vec_math_parity():
    rs = np.random.RandomState(3)
    a = _rand_dirs(rs, 64)
    b = _rand_dirs(rs, 64)
    from rtxpt_tpu.utils import math as m
    aw, bw = jnp.asarray(a.T), jnp.asarray(b.T)
    np.testing.assert_allclose(W.dot3(aw, bw), m.dot(a, b, False),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(W.cross3(aw, bw)).T,
                               np.cross(a, b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(W.to_local3(bw, aw)).T,
                               m.to_local(b, a), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(W.to_world3(bw, aw)).T,
                               m.to_world(b, a), rtol=1e-5, atol=1e-5)


def test_bsdf_eval_pdf_parity():
    rs = np.random.RandomState(7)
    n = 512
    data, dataw = _rand_bsdf(rs, n)
    wo = _rand_dirs(rs, n, upper=True)
    wi = _rand_dirs(rs, n)
    f_ref = B.bsdf_eval(data, jnp.asarray(wo), jnp.asarray(wi))
    p_ref = B.bsdf_pdf(data, jnp.asarray(wo), jnp.asarray(wi))
    f_w = W.bsdf_eval_w(dataw, jnp.asarray(wo.T), jnp.asarray(wi.T))
    p_w = W.bsdf_pdf_w(dataw, jnp.asarray(wo.T), jnp.asarray(wi.T))
    # The kernel path evaluates the Kulla-Conty E(mu) via a per-material
    # degree-5 fit (5 FMAs — the exact 32-bin lerp costs ~24% of the
    # whole bounce kernel); fit error concentrates at grazing mu, where
    # the integral contribution vanishes (kernel furnace stays within
    # 0.1%). Compare accordingly: tight in the interior, loose absolute
    # allowance for the grazing ms band.
    wiz = wi[:, 2]
    woz = wo[:, 2]
    interior = (woz > 0.1) & (np.abs(wiz) > 0.1)
    np.testing.assert_allclose(np.asarray(f_w).T[interior],
                               np.asarray(f_ref)[interior],
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(f_w).T, np.asarray(f_ref),
                               rtol=2e-1, atol=1e-1)    # grazing band
    np.testing.assert_allclose(np.asarray(p_w), np.asarray(p_ref),
                               rtol=2e-2, atol=1e-3)


def test_bsdf_sample_parity():
    rs = np.random.RandomState(11)
    n = 512
    data, dataw = _rand_bsdf(rs, n)
    wo = _rand_dirs(rs, n, upper=True)
    ul = rs.uniform(size=n).astype(np.float32)
    u1 = rs.uniform(size=n).astype(np.float32)
    u2 = rs.uniform(size=n).astype(np.float32)
    s_ref = B.bsdf_sample(data, jnp.asarray(wo), jnp.asarray(ul),
                          jnp.asarray(u1), jnp.asarray(u2))
    s_w = W.bsdf_sample_w(dataw, jnp.asarray(wo.T), jnp.asarray(ul),
                          jnp.asarray(u1), jnp.asarray(u2))
    np.testing.assert_allclose(np.asarray(s_w["wi"]).T,
                               np.asarray(s_ref["wi"]), rtol=1e-4, atol=1e-5)
    # exclude grazing lanes from the weight check: the ms fit error
    # (see eval parity note) divides by a near-zero pdf there
    wiz = np.asarray(s_ref["wi"])[:, 2]
    woz = wo[:, 2]
    interior = (woz > 0.1) & (np.abs(wiz) > 0.1)
    np.testing.assert_allclose(np.asarray(s_w["weight"]).T[interior],
                               np.asarray(s_ref["weight"])[interior],
                               rtol=3e-2, atol=3e-2)
    # near-delta VNDF spikes amplify 1e-4 direction rounding into huge
    # pdf ratios; clamp for comparison (MIS ratios saturate there anyway)
    np.testing.assert_allclose(np.minimum(np.asarray(s_w["pdf"]), 1e3),
                               np.minimum(np.asarray(s_ref["pdf"]), 1e3),
                               rtol=1e-2, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(s_w["is_delta"]),
                                  np.asarray(s_ref["is_delta"]))
    np.testing.assert_array_equal(np.asarray(s_w["lobe"]),
                                  np.asarray(s_ref["lobe"]))


def test_light_sample_parity():
    """sample_light_fields_w matches lights_baker.sample_light given the
    same selected light."""
    from rtxpt_tpu.lighting.lights_baker import bake_lights, sample_light
    from rtxpt_tpu.lighting.envmap import bake_envmap
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.scene.procedural import cornell_box

    scene = prepare(cornell_box())
    lights = scene.lights
    env = bake_envmap(None)
    rs = np.random.RandomState(13)
    n = 256
    pos = rs.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    u_sel = rs.uniform(size=n).astype(np.float32)
    u1 = rs.uniform(size=n).astype(np.float32)
    u2 = rs.uniform(size=n).astype(np.float32)

    ref = sample_light(lights, env, jnp.asarray(pos), jnp.asarray(u_sel),
                       jnp.asarray(u1), jnp.asarray(u2))

    li = ref["light_index"]
    take = lambda arr: jnp.take(arr, li, axis=0)
    lf = W.LightFieldsW(
        kind=take(lights.kind),
        p0=take(lights.p0).T, p1=take(lights.p1).T, p2=take(lights.p2).T,
        em=take(lights.emission).T, extra=take(lights.extra).T,
        normal=take(lights.normal).T, power=take(lights.power))
    sel_pdf = take(lights.power)
    out = W.sample_light_fields_w(lf, sel_pdf, jnp.asarray(pos.T),
                                  jnp.asarray(u1), jnp.asarray(u2))
    np.testing.assert_allclose(np.asarray(out["wi"]).T,
                               np.asarray(ref["wi"]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["dist"]),
                               np.asarray(ref["dist"]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["Li"]).T,
                               np.asarray(ref["Li"]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["pdf"]),
                               np.asarray(ref["pdf"]), rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["valid"]),
                                  np.asarray(ref["valid"]))
