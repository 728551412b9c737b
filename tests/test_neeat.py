"""NEE-AT adaptive light sampling tests."""

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.config import NEEMode, PathTracerConfig
from rtxpt_tpu.pt.integrator import render, render_adaptive
from rtxpt_tpu.scene.procedural import cornell_box, default_camera
from rtxpt_tpu.prepare import prepare

W = H = 24


def test_neeat_matches_power_sampler(cornell_scene):
    """Adaptive sampling must stay unbiased: mean matches the power
    sampler after the feedback loop warms up."""
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    base = dict(max_bounces=3, enable_russian_roulette=False)
    hdr_a, state, _ = render_adaptive(
        scene, cam, PathTracerConfig(nee=NEEMode.NEEAT, **base),
        W, H, spp=24)
    hdr_p, _, _ = render(
        scene, cam, PathTracerConfig(nee=NEEMode.POWER, **base),
        W, H, spp=24)
    a = float(np.asarray(hdr_a).mean())
    p = float(np.asarray(hdr_p).mean())
    assert abs(a - p) / p < 0.08, f"NEE-AT {a} vs POWER {p}"


def test_neeat_feedback_concentrates(cornell_scene):
    """The tile histograms should concentrate probability on the emissive
    quad (both Cornell lights are tris of the same quad)."""
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    cfg = PathTracerConfig(nee=NEEMode.NEEAT, max_bounces=2)
    _, state, _ = render_adaptive(scene, cam, cfg, W, H, spp=8)
    pdf = np.asarray(state.tile_pdf)
    # lights 0,1 are the two emissive triangles; their mass should dominate
    lit_tiles = pdf.sum(-1) > 0
    mass = pdf[:, :2].sum(-1)
    assert mass[lit_tiles].mean() > 0.9
