"""ReSTIR DI/GI wired into the realtime frame loop (VERDICT r2 #4).

The reference runs RtxdiPass inside every PathTrace frame
(Sample.cpp:2526-2539, RTXDI/RtxdiPass.cpp:354,519,544); these tests
drive the same integration through rtxpt_tpu.pt.realtime.render_frame
with RenderConfig.restir, and assert the resampler's reason to exist:
lower 1-frame direct-lighting error than NEE at equal ray budget.
"""

import numpy as np
import pytest

from rtxpt_tpu.config import DenoiserMode, PathTracerConfig, RenderConfig
from rtxpt_tpu.pt import realtime
from rtxpt_tpu.pt.integrator import render
from rtxpt_tpu.scene.procedural import default_camera

W = H = 48


def _mse(a, b, mask_edges=False):
    """Clamped MSE; with mask_edges, only the 80% smoothest pixels of the
    reference count — a single-jitter frame (NEE and ReSTIR alike) pays
    an identical geometric-aliasing penalty vs the 96-jitter reference
    that would otherwise swamp the lighting-variance signal."""
    a = np.clip(np.asarray(a), 0.0, 4.0)
    b = np.clip(np.asarray(b), 0.0, 4.0)
    err = (((a - b) ** 2).sum(-1))[1:-1, 1:-1]
    if mask_edges:
        lap = np.abs(4 * b[1:-1, 1:-1] - b[:-2, 1:-1] - b[2:, 1:-1]
                     - b[1:-1, :-2] - b[1:-1, 2:]).sum(-1)
        err = err[lap < np.percentile(lap, 80)]
    return float(err.mean())


def test_restir_di_frame_runs(cornell_scene):
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    pt_cfg = PathTracerConfig(max_bounces=1)
    rc = RenderConfig(width=W, height=H, denoiser=DenoiserMode.NONE,
                      tonemap="none", restir="di")
    state = realtime.init_state(H, W)
    for _ in range(2):
        img, hdr, state = realtime.render_frame(scene, cam, pt_cfg, rc,
                                                state)
    hdr = np.asarray(hdr)
    assert np.isfinite(hdr).all()
    assert hdr.max() > 0.0
    assert state.restir_di is not None          # reservoirs carried forward
    assert state.restir_di.reservoir is not None


def test_restir_di_beats_nee_one_frame(cornell_scene):
    """Equal-budget comparison on direct light (max_bounces=1): one
    ReSTIR DI frame must have lower error vs the converged image than a
    1-spp NEE trace. This is the variance gate VERDICT r2 #4 asks for."""
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    pt_cfg = PathTracerConfig(max_bounces=1)

    ref, _, _ = render(scene, cam, pt_cfg, W, H, spp=96, first_sample=0)
    nee1, _, _ = render(scene, cam, pt_cfg, W, H, spp=1, first_sample=7)

    rc = RenderConfig(width=W, height=H, denoiser=DenoiserMode.NONE,
                      tonemap="none", restir="di")
    state = realtime.init_state(H, W)
    _, hdr, state = realtime.render_frame(scene, cam, pt_cfg, rc, state)

    mse_nee = _mse(nee1, ref, mask_edges=True)
    mse_restir = _mse(hdr, ref, mask_edges=True)
    # 8 RIS candidates + visibility reuse + spatial reuse should cut MSE
    # well below single-sample NEE on soft-shadow Cornell (measured ~0.52x).
    assert mse_restir < 0.65 * mse_nee, (mse_restir, mse_nee)


def test_restir_temporal_reuse_improves():
    """On the 512-light kitchen (where 8 RIS candidates are nowhere near
    converged) temporal reservoir reuse must keep cutting error as M
    accumulates: frame 6 beats frame 1, and frame 1 already beats 1-spp
    NEE. (On 1-light Cornell the initial RIS+spatial pass saturates and
    temporal adds nothing — measured flat — so the gate lives here.)"""
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.scene.procedural import kitchen_scene

    host = kitchen_scene()
    scene = prepare(host)
    cam = default_camera(host, W, H)
    pt_cfg = PathTracerConfig(max_bounces=1)
    ref, _, _ = render(scene, cam, pt_cfg, W, H, spp=96, first_sample=0)
    nee1, _, _ = render(scene, cam, pt_cfg, W, H, spp=1, first_sample=7)

    rc = RenderConfig(width=W, height=H, denoiser=DenoiserMode.NONE,
                      tonemap="none", restir="di")
    state = realtime.init_state(H, W)
    errs = []
    for _ in range(6):
        _, hdr, state = realtime.render_frame(scene, cam, pt_cfg, rc,
                                              state)
        errs.append(_mse(hdr, ref, mask_edges=True))
    # measured: nee 1.70, restir [1.15, 1.10, 0.85, 0.97, 0.86, 0.79]
    assert errs[0] < 0.8 * _mse(nee1, ref, mask_edges=True), errs
    assert min(errs[3:]) < 0.85 * errs[0], errs


def test_restir_digi_runs(cornell_scene):
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    pt_cfg = PathTracerConfig(max_bounces=3)
    rc = RenderConfig(width=W, height=H, denoiser=DenoiserMode.NONE,
                      tonemap="none", restir="digi")
    state = realtime.init_state(H, W)
    for _ in range(2):
        _, hdr, state = realtime.render_frame(scene, cam, pt_cfg, rc,
                                              state)
    hdr = np.asarray(hdr)
    assert np.isfinite(hdr).all()
    assert state.restir_gi is not None
    # indirect resampling must add energy over the DI-only image
    import dataclasses
    rc_di = dataclasses.replace(rc, restir="di")
    state2 = realtime.init_state(H, W)
    _, hdr_di, _ = realtime.render_frame(scene, cam, pt_cfg, rc_di, state2)
    assert np.asarray(hdr).mean() > np.asarray(hdr_di).mean()


def test_restir_regir_candidates(cornell_scene):
    """ReGIR-grid candidate sourcing stays finite and unbiased-ish (mean
    within a loose band of the CDF-candidate image)."""
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    pt_cfg = PathTracerConfig(max_bounces=1)
    rc = RenderConfig(width=W, height=H, denoiser=DenoiserMode.NONE,
                      tonemap="none", restir="di", restir_regir=True)
    state = realtime.init_state(H, W)
    means = []
    for _ in range(4):
        _, hdr, state = realtime.render_frame(scene, cam, pt_cfg, rc,
                                              state)
        means.append(float(np.asarray(hdr).mean()))
    assert state.regir is not None
    assert np.isfinite(means).all() and means[-1] > 0.0

    rc2 = RenderConfig(width=W, height=H, denoiser=DenoiserMode.NONE,
                       tonemap="none", restir="di")
    state2 = realtime.init_state(H, W)
    m2 = []
    for _ in range(4):
        _, hdr2, state2 = realtime.render_frame(scene, cam, pt_cfg, rc2,
                                                state2)
        m2.append(float(np.asarray(hdr2).mean()))
    assert 0.6 < np.mean(means) / np.mean(m2) < 1.6
