"""ReSTIR x stable planes composition (VERDICT r3 missing #5): resampled
DI on the dominant plane's base surface + path-traced GI fill with
first-vertex direct lighting suppressed, composited in one final shade
(the reference's RTXDI-over-stable-planes + fused DI+GI final,
RtxdiPass.cpp:354,519,544-550)."""

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.config import DenoiserMode, PathTracerConfig, RenderConfig
from rtxpt_tpu.pt import realtime
from rtxpt_tpu.pt.integrator import render
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.scene.camera import camera_ray
from rtxpt_tpu.scene.procedural import cornell_box, default_camera

W = H = 32


def _glass_cornell():
    """Cornell with a smooth-glass tall box: the dominant plane walks the
    transmission chain, so ReSTIR DI shades the surface BEHIND glass."""
    host = cornell_box()
    mats = host.materials
    host.materials = mats.replace(
        transmission=mats.transmission.at[4].set(1.0),
        roughness=mats.roughness.at[4].set(0.0),
        metallic=mats.metallic.at[4].set(0.0))
    return host, prepare(host)


def test_restir_planes_matches_reference_mean():
    """--stable-planes --restir di: multi-frame mean matches the plain
    path-traced reference (ReSTIR DI replaces the first-vertex NEE
    unbiasedly; the fill supplies everything past the first vertex)."""
    host, scene = _glass_cornell()
    cam = default_camera(host, W, H)
    pt_cfg = PathTracerConfig(max_bounces=3, firefly_clamp=64.0)
    rc = RenderConfig(width=W, height=H, denoiser=DenoiserMode.NONE,
                      tonemap="none", restir="di")
    state = realtime.init_state(H, W)
    acc = None
    frames = 24
    for _ in range(frames):
        _, hdr, state = realtime.render_frame_stable_planes(
            scene, cam, pt_cfg, rc, state)
        acc = hdr if acc is None else acc + hdr
    sp = np.asarray(acc) / frames
    assert np.isfinite(sp).all()
    ref, _, _ = render(scene, cam, pt_cfg, W, H, spp=frames)
    ref = np.asarray(ref)
    assert abs(sp.mean() - ref.mean()) / ref.mean() < 0.08, \
        (sp.mean(), ref.mean())
    # the DI reservoir state is live and carried across frames
    assert state.restir_di is not None
    assert state.restir_di.reservoir is not None


def test_restir_planes_transmitted_plane_lit():
    """The surface seen THROUGH the glass box receives resampled direct
    light (denoised DI on the transmitted plane)."""
    from rtxpt_tpu.pt.integrator import _pixel_grid
    from rtxpt_tpu.pt.stable_planes import decompose

    host, scene = _glass_cornell()
    cam = default_camera(host, W, H)
    px, py = _pixel_grid(W, H)
    n = px.shape[0]
    o, d, _ = camera_ray(cam, px, py, jnp.full((n,), 0.5),
                         jnp.full((n,), 0.5))
    planes, _ = decompose(scene, o, d)
    deep = np.asarray(planes[0].nverts) > 1      # walked a delta chain
    assert deep.any(), "no transmission chain found"

    pt_cfg = PathTracerConfig(max_bounces=3, firefly_clamp=64.0)
    rc = RenderConfig(width=W, height=H, denoiser=DenoiserMode.RELAX,
                      tonemap="none", restir="di")
    state = realtime.init_state(H, W)
    hdr = None
    for _ in range(3):
        _, hdr, state = realtime.render_frame_stable_planes(
            scene, cam, pt_cfg, rc, state)
    img = np.asarray(hdr).reshape(-1, 3)
    assert np.isfinite(img).all()
    # through-glass pixels are lit, not black
    assert img[deep].mean() > 1e-3
