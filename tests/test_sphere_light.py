"""kSphere analytic light (PolymorphicLight.h:28-38 analog)."""

import numpy as np

from rtxpt_tpu.config import PathTracerConfig
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.pt.integrator import render
from rtxpt_tpu.scene.procedural import default_camera, single_triangle

W = H = 32


def _img(kind, spp=8):
    host = single_triangle(kind)
    scene = prepare(host)
    cam = default_camera(host, W, H)
    cfg = PathTracerConfig(max_bounces=1)
    img, _, _ = render(scene, cam, cfg, W, H, spp=spp)
    return np.asarray(img)


def test_sphere_matches_point_far_field():
    """A small sphere light with L*pi*r^2 == I must match the point light
    of intensity I (the cone sampler's normalization check)."""
    a = _img("point")
    b = _img("sphere", spp=32)
    mask = a.sum(-1) > 1e-4
    rel = np.abs(a - b).sum(-1)[mask] / (a.sum(-1)[mask] + 1e-6)
    assert float(np.median(rel)) < 0.03, float(np.median(rel))


def test_sphere_light_softens_with_radius():
    """Larger radius => penumbra: variance of the lit region must not
    explode, and the image stays finite with sane energy."""
    import jax.numpy as jnp
    from rtxpt_tpu.scene.scene import LIGHT_SPHERE

    host = single_triangle("sphere")
    big = 0.8
    L = 10.0 / (np.pi * big * big)
    host.analytic_lights = host.analytic_lights.replace(
        angular_size=jnp.full((1,), big, jnp.float32),
        intensity=jnp.asarray([[L, L, L]], jnp.float32))
    scene = prepare(host)
    cam = default_camera(host, W, H)
    img, _, _ = render(scene, cam, PathTracerConfig(max_bounces=1),
                       W, H, spp=16)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    ref = _img("point")
    # same total flux => same order of magnitude of lit energy
    assert 0.5 < img.sum() / ref.sum() < 2.0
