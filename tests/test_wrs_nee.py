"""WRS (reservoir) NEE candidate tests."""

import numpy as np

from rtxpt_tpu.config import NEEMode, PathTracerConfig
from rtxpt_tpu.pt.integrator import render
from rtxpt_tpu.scene.procedural import default_camera

W = H = 24


def test_wrs_matches_single_candidate(cornell_scene):
    """K-candidate WRS NEE is unbiased: mean matches 1-candidate NEE."""
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    base = dict(max_bounces=2, enable_russian_roulette=False,
                nee=NEEMode.POWER)
    a, _, _ = render(scene, cam, PathTracerConfig(nee_candidates=1, **base),
                     W, H, spp=32)
    b, _, _ = render(scene, cam, PathTracerConfig(nee_candidates=4, **base),
                     W, H, spp=32)
    a = np.asarray(a)
    b = np.asarray(b)
    assert abs(a.mean() - b.mean()) / a.mean() < 0.06, \
        f"WRS {b.mean()} vs single {a.mean()}"
    assert np.isfinite(b).all()
