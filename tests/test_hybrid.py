"""Hybrid (IntroSample-analog) renderer tests."""

import numpy as np

from rtxpt_tpu.pt.hybrid import render_hybrid, ssao
from rtxpt_tpu.scene.procedural import default_camera

W = H = 32


def test_hybrid_renders_lit_frame(cornell_scene):
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    hdr = np.asarray(render_hybrid(scene, cam, W, H))
    assert hdr.shape == (H, W, 3)
    assert np.isfinite(hdr).all()
    assert hdr.mean() > 0.02
    # left strip redder than right strip (walls visible)
    left = hdr[10:24, 2:8].mean((0, 1))
    right = hdr[10:24, -8:-2].mean((0, 1))
    assert left[0] / max(left[1], 1e-6) > right[0] / max(right[1], 1e-6)


def test_ssao_darkens_corners(cornell_scene):
    from rtxpt_tpu.pt.restir import gbuffer_from_primary

    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    gb, _ = gbuffer_from_primary(scene, cam, W, H)
    ao = np.asarray(ssao(gb.depth, gb.normal, gb.pos, W, H)).reshape(H, W)
    assert np.isfinite(ao).all()
    assert (ao >= 0).all() and (ao <= 1).all()
    # open wall centers less occluded than box-corner regions
    assert ao.mean() > 0.4
    assert ao.min() < 0.9
