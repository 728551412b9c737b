"""End-to-end integrator tests: analytic direct lighting, furnace energy,
Cornell sanity (the pytest analog of the reference's golden harness,
SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rtxpt_tpu.config import NEEMode, PathTracerConfig
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.pt.integrator import render
from rtxpt_tpu.scene.procedural import (
    cornell_box, default_camera, furnace_box, single_triangle,
)


def test_point_light_direct_analytic():
    """Diffuse plane + point light: L = albedo/pi * I * cos/r^2."""
    host = single_triangle("point")
    # pure Lambert for the analytic comparison
    host.materials = host.materials.replace(
        specular_f0_scale=jnp.zeros((1,), jnp.float32))
    scene = prepare(host)
    cam = default_camera(host, 64, 64)
    cfg = PathTracerConfig(max_bounces=1, nee=NEEMode.POWER,
                           enable_russian_roulette=False)
    hdr, _, _ = render(scene, cam, cfg, 64, 64, spp=4)
    hdr = np.asarray(hdr)
    # center pixel: hit ~(0,0,0); light at (0,0,2), I=10; cos=1, r2=4
    expected = np.asarray([0.8, 0.6, 0.4]) / np.pi * 10.0 / 4.0
    got = hdr[31:33, 31:33].mean((0, 1))
    np.testing.assert_allclose(got, expected, rtol=0.02)


def test_directional_light_direct_analytic():
    host = single_triangle("directional")
    host.materials = host.materials.replace(
        specular_f0_scale=jnp.zeros((1,), jnp.float32))
    scene = prepare(host)
    cam = default_camera(host, 32, 32)
    cfg = PathTracerConfig(max_bounces=1, nee=NEEMode.POWER,
                           enable_russian_roulette=False)
    hdr, _, _ = render(scene, cam, cfg, 32, 32, spp=2)
    hdr = np.asarray(hdr)
    expected = np.asarray([0.8, 0.6, 0.4]) / np.pi * 2.0  # radiance 2, cos 1
    got = hdr[15:17, 15:17].mean((0, 1))
    np.testing.assert_allclose(got, expected, rtol=0.02)


@pytest.mark.parametrize("nee", [NEEMode.POWER, NEEMode.OFF])
def test_furnace_energy(nee):
    """Closed box, albedo a, emission e: L = e/(1-a) everywhere.

    Truncation at 12 bounces misses a^13 ~= 5.5% of energy (a=0.8); the
    estimate must land between (analytic - tail) and analytic + noise."""
    host = furnace_box(albedo=0.8, emission=0.5)
    scene = prepare(host)
    cam = default_camera(host, 16, 16)
    cfg = PathTracerConfig(max_bounces=12, enable_russian_roulette=False,
                           nee=nee)
    hdr, _, _ = render(scene, cam, cfg, 16, 16, spp=8)
    mean = float(np.asarray(hdr).mean())
    analytic = 0.5 / (1 - 0.8)
    assert abs(mean - analytic) / analytic < 0.09, \
        f"furnace mean {mean} vs {analytic}"


def test_cornell_sanity(cornell_scene):
    """Wall colors bleed correctly; image is finite and lit."""
    host, scene = cornell_scene
    cam = default_camera(host, 48, 48)
    cfg = PathTracerConfig(max_bounces=4)
    hdr, _, rays = render(scene, cam, cfg, 48, 48, spp=4)
    hdr = np.asarray(hdr)
    assert np.isfinite(hdr).all()
    assert hdr.mean() > 0.05
    left = hdr[10:38, 2:10].mean((0, 1))
    right = hdr[10:38, -10:-2].mean((0, 1))
    # The light is warm (17,12,4) so absolute channel order is light-tinted;
    # compare green/red ratios between the wall strips instead.
    assert left[0] > left[1] * 1.5, f"left wall not red: {left}"
    ratio_r = right[1] / right[0]
    ratio_l = left[1] / left[0]
    assert ratio_r > ratio_l * 1.6, f"right not greener: {left} vs {right}"
    assert rays > 0


def test_nee_matches_bsdf_sampling(cornell_scene):
    """NEE+MIS and pure BSDF sampling must converge to the same image
    (consistency of the two estimators — MIS-parity guard)."""
    host, scene = cornell_scene
    cam = default_camera(host, 24, 24)
    # NEE's shadow ray adds one path segment vs BSDF-only at equal bounce
    # budget, so compare at a depth where the truncated tail is small.
    cfg_nee = PathTracerConfig(nee=NEEMode.POWER, max_bounces=6,
                               enable_russian_roulette=False)
    cfg_bsdf = PathTracerConfig(nee=NEEMode.OFF, max_bounces=7,
                                enable_russian_roulette=False)
    a, _, _ = render(scene, cam, cfg_nee, 24, 24, spp=16)
    b, _, _ = render(scene, cam, cfg_bsdf, 24, 24, spp=96)
    a = np.asarray(a)
    b = np.asarray(b)
    assert abs(a.mean() - b.mean()) / a.mean() < 0.08, \
        f"NEE {a.mean()} vs BSDF {b.mean()}"


def test_uniform_vs_power_nee(cornell_scene):
    host, scene = cornell_scene
    cam = default_camera(host, 16, 16)
    base = dict(max_bounces=2, enable_russian_roulette=False)
    a, _, _ = render(scene, cam,
                     PathTracerConfig(nee=NEEMode.POWER, **base),
                     16, 16, spp=32)
    b, _, _ = render(scene, cam,
                     PathTracerConfig(nee=NEEMode.UNIFORM, **base),
                     16, 16, spp=32)
    assert abs(float(np.asarray(a).mean()) - float(np.asarray(b).mean())) \
        / float(np.asarray(a).mean()) < 0.08
