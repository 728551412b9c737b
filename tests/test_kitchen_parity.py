"""Realtime-vs-reference RMSE parity on the kitchen scene — the BASELINE
metric (BASELINE.md: 'RMSE parity vs reference-mode accumulation') that
round-2 review flagged as unmeasured. The converged golden
(kitchen.reference.64spp.npy) is generated out-of-band by
scripts/gen_goldens.py (the reference generates its tests.json goldens
out-of-band the same way, Support/tests/generate_golden.ps1)."""

import os

import numpy as np
import pytest

from rtxpt_tpu.config import DenoiserMode, PathTracerConfig, RenderConfig
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.scene.procedural import default_camera, kitchen_scene

HERE = os.path.dirname(__file__)
GOLDEN = os.path.join(HERE, "goldens", "kitchen.reference.64spp.npy")
W = H = 256


def _tm(x):
    # compare in a tonemapped space so parity isn't dominated by a few
    # fireflies (the reference's comparisons are also display-referred)
    x = np.clip(np.asarray(x), 0.0, None)
    return x / (1.0 + x)


@pytest.fixture(scope="module")
def kitchen():
    host = kitchen_scene()
    return host, prepare(host)


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="converged golden not generated yet "
                           "(scripts/gen_goldens.py)")
def test_reference_converges_to_golden(kitchen):
    """reference@4spp must sit close to the converged 64spp golden."""
    from rtxpt_tpu.pt.integrator import render
    host, scene = kitchen
    cam = default_camera(host, W, H)
    img, _, _ = render(scene, cam, PathTracerConfig(max_bounces=5),
                       W, H, spp=4)
    ref = np.load(GOLDEN)
    e = float(np.sqrt(np.mean((_tm(img) - _tm(ref)) ** 2)))
    # measured noise floor: 0.1175 @ 4spp, 0.054 @ 16spp (ratio 2.18 ~
    # sqrt(4): pure Monte-Carlo variance on the 513-light scene, no bias)
    assert e < 0.13, e


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="converged golden not generated yet "
                           "(scripts/gen_goldens.py)")
def test_realtime_parity_with_reference(kitchen):
    """4 denoised realtime frames must land within RMSE budget of the
    converged reference — the ladder's headline quality metric."""
    from rtxpt_tpu.pt import realtime
    host, scene = kitchen
    cam = default_camera(host, W, H)
    cfg = PathTracerConfig(max_bounces=3)
    rc = RenderConfig(width=W, height=H, denoiser=DenoiserMode.RELAX,
                      tonemap="none")
    state = realtime.init_state(H, W)
    for _ in range(4):
        _, hdr, state = realtime.render_frame(scene, cam, cfg, rc, state)
    ref = np.load(GOLDEN)
    e = float(np.sqrt(np.mean((_tm(hdr) - _tm(ref)) ** 2)))
    # budget: denoiser bias + 3-vs-5 bounce truncation + 4-frame history
    assert e < 0.10, e
