"""Nested dielectrics / interior-list tests."""

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.config import NEEMode, PathTracerConfig
from rtxpt_tpu.pt.integrator import render
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.scene.procedural import cornell_box, default_camera

W = H = 32


def _glass_cornell(absorption=(0.0, 0.0, 0.0)):
    host = cornell_box()
    mats = host.materials
    host.materials = mats.replace(
        transmission=mats.transmission.at[4].set(1.0),
        roughness=mats.roughness.at[4].set(0.0),
        metallic=mats.metallic.at[4].set(0.0),
        ior=mats.ior.at[4].set(1.5),
        volume_absorption=mats.volume_absorption.at[4].set(
            jnp.asarray(absorption)),
    )
    return host


def test_glass_box_renders_transmission():
    host = _glass_cornell()
    scene = prepare(host)
    cam = default_camera(host, W, H)
    cfg = PathTracerConfig(max_bounces=8)
    hdr, _, _ = render(scene, cam, cfg, W, H, spp=8)
    h = np.asarray(hdr)
    assert np.isfinite(h).all()
    # glass region (tall box, left-center of frame) is lit (light passes)
    region = h[12:26, 6:14]
    assert region.mean() > 0.01


def test_absorption_darkens_glass():
    cam_args = (W, H)
    base = prepare(_glass_cornell((0.0, 0.0, 0.0)))
    tinted = prepare(_glass_cornell((4.0, 0.2, 4.0)))  # green-pass tint
    host = _glass_cornell()
    cam = default_camera(host, W, H)
    cfg = PathTracerConfig(max_bounces=8)
    a, _, _ = render(base, cam, cfg, W, H, spp=8)
    b, _, _ = render(tinted, cam, cfg, W, H, spp=8)
    a = np.asarray(a)
    b = np.asarray(b)
    region_a = a[12:26, 6:14]
    region_b = b[12:26, 6:14]
    # tinted glass passes less red/blue than clear glass
    assert region_b[..., 0].mean() < region_a[..., 0].mean() * 0.9
    # and keeps green comparatively (ratio shifts toward green)
    ga = region_a[..., 1].mean() / max(region_a[..., 0].mean(), 1e-6)
    gb = region_b[..., 1].mean() / max(region_b[..., 0].mean(), 1e-6)
    assert gb > ga * 1.2


def test_energy_not_gained_with_glass():
    host = _glass_cornell()
    scene = prepare(host)
    cam = default_camera(host, W, H)
    cfg = PathTracerConfig(max_bounces=10, enable_russian_roulette=False)
    hdr, _, _ = render(scene, cam, cfg, W, H, spp=8)
    # compare against the diffuse-box scene: glass redistributes, total
    # image energy stays in the same ballpark (no blow-up)
    host2 = cornell_box()
    scene2 = prepare(host2)
    ref, _, _ = render(scene2, cam, cfg, W, H, spp=8)
    assert np.asarray(hdr).mean() < np.asarray(ref).mean() * 1.5
    assert np.isfinite(np.asarray(hdr)).all()
