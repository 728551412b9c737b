"""Procedural sky + environment importance sampling tests."""

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.config import NEEMode, PathTracerConfig
from rtxpt_tpu.lighting.envmap import bake_envmap, env_eval, env_pdf, \
    env_sample
from rtxpt_tpu.lighting.sky import make_sky
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.pt.integrator import render
from rtxpt_tpu.scene.procedural import single_triangle, default_camera


def test_sky_image_properties():
    img = make_sky(128, 64, sun_dir=(0.2, 0.8, 0.1))
    assert img.shape == (64, 128, 3)
    assert np.isfinite(img).all() and (img >= 0).all()
    # sun disk much brighter than median sky
    assert img.max() > np.median(img) * 20
    # upper hemisphere brighter than ground rows
    assert img[:28].mean() > img[-8:].mean()


def test_env_sample_pdf_consistency():
    """env_sample's pdf must match env_pdf at the sampled direction."""
    img = make_sky(64, 32)
    env = bake_envmap(img)
    n = 4096
    r = np.random.default_rng(3)
    u1 = jnp.asarray(r.uniform(0, 1, n), jnp.float32)
    u2 = jnp.asarray(r.uniform(0, 1, n), jnp.float32)
    d, rad, pdf = env_sample(env, u1, u2)
    pdf2 = env_pdf(env, d)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2),
                               rtol=1e-3)
    # sampled radiance equals lookup
    np.testing.assert_allclose(np.asarray(rad),
                               np.asarray(env_eval(env, d)), rtol=1e-4)


def test_env_importance_sampling_integrates_correctly():
    """MC estimate of irradiance via env IS equals uniform-sphere MC."""
    img = make_sky(64, 32, bake_sun=False)
    env = bake_envmap(img)
    n = 1 << 15
    r = np.random.default_rng(5)
    u1 = jnp.asarray(r.uniform(0, 1, n), jnp.float32)
    u2 = jnp.asarray(r.uniform(0, 1, n), jnp.float32)
    d, rad, pdf = env_sample(env, u1, u2)
    est_is = float(np.asarray(
        (rad.sum(-1) / jnp.maximum(pdf, 1e-9)).mean())) / (4 * np.pi)

    du = r.normal(0, 1, (n, 3))
    du /= np.linalg.norm(du, axis=-1, keepdims=True)
    rad_u = np.asarray(env_eval(env, jnp.asarray(du, jnp.float32)))
    est_uni = rad_u.sum(-1).mean()
    assert abs(est_is - est_uni) / est_uni < 0.05, (est_is, est_uni)


def test_sky_lit_render():
    host = single_triangle("point")
    host.analytic_lights = None
    host.envmap_image = make_sky(64, 32)
    scene = prepare(host)
    cam = default_camera(host, 32, 32)
    cfg = PathTracerConfig(max_bounces=2, nee=NEEMode.POWER)
    hdr, _, _ = render(scene, cam, cfg, 32, 32, spp=4)
    h = np.asarray(hdr)
    assert np.isfinite(h).all()
    assert h.mean() > 0.05  # sky lights the scene + background visible
