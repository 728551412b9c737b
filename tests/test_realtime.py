"""Real-time mode: denoiser + TAA pipeline tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from rtxpt_tpu.config import DenoiserMode, PathTracerConfig, RenderConfig
from rtxpt_tpu.pt import realtime
from rtxpt_tpu.pt.integrator import render
from rtxpt_tpu.render import denoise as dn
from rtxpt_tpu.scene.procedural import default_camera


W = H = 48


def test_denoiser_reduces_noise(cornell_scene):
    """Variance of the denoised 1spp frame must be much lower than raw,
    and the mean must stay in the same ballpark (energy preserved)."""
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    pt_cfg = PathTracerConfig(max_bounces=3)
    rc = RenderConfig(width=W, height=H, denoiser=DenoiserMode.RELAX,
                      tonemap="none")
    state = realtime.init_state(H, W)

    raw_frames = []
    hdrs = []
    for _ in range(4):
        img, hdr, state = realtime.render_frame(scene, cam, pt_cfg, rc,
                                                state)
        hdrs.append(np.asarray(hdr))
    final = hdrs[-1]
    assert np.isfinite(final).all()

    # raw 1spp frame for comparison
    raw, _, _ = render(scene, cam, pt_cfg, W, H, spp=1, first_sample=7)
    raw = np.asarray(raw)

    # local noise proxy: mean |laplacian| on clamped images (robust to
    # isolated fireflies which dominate a squared metric)
    def roughness_metric(img):
        img = np.clip(img, 0.0, 1.0)
        lap = (4 * img[1:-1, 1:-1] - img[:-2, 1:-1] - img[2:, 1:-1]
               - img[1:-1, :-2] - img[1:-1, 2:])
        return float(np.mean(np.abs(lap)))

    assert roughness_metric(final) < roughness_metric(raw) * 0.35
    # energy ballpark (denoiser biased but not catastrophically)
    assert 0.5 < final.mean() / raw.mean() < 2.0


def test_denoiser_temporal_accumulation_converges(cornell_scene):
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    pt_cfg = PathTracerConfig(max_bounces=2)
    rc = RenderConfig(width=W, height=H, denoiser=DenoiserMode.RELAX,
                      tonemap="none")
    state = realtime.init_state(H, W)
    for _ in range(3):
        _, hdr, state = realtime.render_frame(scene, cam, pt_cfg, rc, state)
    # history length grows where geometry is visible
    hist = np.asarray(state.denoiser.history_len)
    assert hist.max() >= 3.0


def test_taa_static_scene_stabilizes(cornell_scene):
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    pt_cfg = PathTracerConfig(max_bounces=1)
    rc = RenderConfig(width=W, height=H, denoiser=DenoiserMode.NONE,
                      enable_taa=True, tonemap="none")
    state = realtime.init_state(H, W)
    prev = None
    diffs = []
    for _ in range(6):
        _, hdr, state = realtime.render_frame(scene, cam, pt_cfg, rc, state)
        hdr = np.asarray(hdr)
        if prev is not None:
            diffs.append(np.abs(hdr - prev).mean())
        prev = hdr
    # frame-to-frame difference shrinks as TAA accumulates
    assert diffs[-1] < diffs[0]


def test_motion_vectors_translation(cornell_scene):
    """Camera strafe yields motion vectors matching the pixel shift."""
    from rtxpt_tpu.scene.camera import look_at
    host, scene = cornell_scene
    cam1 = default_camera(host, 64, 64)
    c = host.camera
    pos2 = np.asarray(c["position"]) + np.asarray([0.05, 0.0, 0.0])
    cam2 = look_at(pos2, np.asarray(c["target"]) + np.asarray([0.05, 0, 0]),
                   c["up"], c["fov_y_deg"], 64, 64)
    pt_cfg = PathTracerConfig(max_bounces=1)
    from rtxpt_tpu.pt.integrator import render_sample_jit
    out = render_sample_jit(scene, cam2, pt_cfg, 64, 64, jnp.uint32(0), True)
    motion = realtime.motion_vectors(cam1, out["wpos"], out["depth"], 64, 64)
    motion = np.asarray(motion)
    depth = np.asarray(out["depth"])
    # central region: back wall ~2.45 away, strafe 0.05 -> a consistent
    # horizontal shift, vertical ~0
    sel = depth > 0
    mx = motion[..., 0][sel]
    my = motion[..., 1][sel]
    # |my| carries the subpixel sample jitter (hit points are jittered,
    # projection lands within +-0.5px): E[|my|] ~= 0.25 for uniform jitter.
    assert np.abs(my).mean() < 0.35
    assert mx.mean() > 0.3  # strafing +x moves image content left


def test_render_scale_upscaling(cornell_scene):
    """DLSS-SR substitute: render at 0.5x, upscale to display; output is
    display-sized, finite, and structurally similar to native."""
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    pt_cfg = PathTracerConfig(max_bounces=2)
    rc_lo = RenderConfig(width=W, height=H, denoiser=DenoiserMode.RELAX,
                         enable_taa=True, tonemap="none", render_scale=0.5)
    state = realtime.init_state(H, W)
    for _ in range(3):
        img, hdr, state = realtime.render_frame(scene, cam, pt_cfg, rc_lo,
                                                state)
    hdr = np.asarray(hdr)
    assert hdr.shape == (H, W, 3)
    assert np.isfinite(hdr).all()
    rc_hi = RenderConfig(width=W, height=H, denoiser=DenoiserMode.RELAX,
                         tonemap="none")
    s2 = realtime.init_state(H, W)
    for _ in range(3):
        _, ref, s2 = realtime.render_frame(scene, cam, pt_cfg, rc_hi, s2)
    ref = np.asarray(ref)
    # upscaled image approximates native (blurrier but same lighting);
    # clamp first — the tiny 11-radiance emitter dominates unclamped means
    # and quantizes differently across resolutions
    a = np.clip(hdr, 0, 1).mean()
    b = np.clip(ref, 0, 1).mean()
    assert abs(a - b) / b < 0.15, (a, b)
