"""Second denoiser variant (REBLUR recurrent blur) + diffuse/specular
split-channel denoising (reference: NrdConfig.cpp:25-27 RELAX/REBLUR
graphs; Sample.cpp:2570-2573 split instances)."""

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.config import (DenoiserMode, NEEMode, PathTracerConfig,
                              RenderConfig)
from rtxpt_tpu.pt import realtime
from rtxpt_tpu.pt.integrator import render_sample_jit
from rtxpt_tpu.scene.procedural import cornell_box, default_camera
from rtxpt_tpu.prepare import prepare

W = H = 32


def _glossy_cornell():
    host = cornell_box()
    mats = host.materials
    # make the short box glossy so the specular channel carries energy
    host.materials = mats.replace(
        metallic=mats.metallic.at[3].set(1.0),
        roughness=mats.roughness.at[3].set(0.3))
    return host, prepare(host)


def test_split_channels_partition_radiance():
    """L_diff + L_spec + primary emission == L exactly (the split is an
    exact partition, not an approximation)."""
    host, scene = _glossy_cornell()
    cam = default_camera(host, W, H)
    cfg = PathTracerConfig(max_bounces=3, nee=NEEMode.POWER,
                           split_channels=True)
    out = render_sample_jit(scene, cam, cfg, W, H, jnp.uint32(0), True)
    L = np.asarray(out["L"])
    total = (np.asarray(out["L_diff"]) + np.asarray(out["L_spec"])
             + np.asarray(out["emission"]))
    np.testing.assert_allclose(total, L, rtol=1e-4, atol=1e-5)
    # the glossy box must route energy into the spec channel
    assert float(np.asarray(out["L_spec"]).sum()) > 0.01


def test_reblur_denoises():
    """REBLUR mode runs and reduces noise vs the raw 1spp frame."""
    host, scene = _glossy_cornell()
    cam = default_camera(host, W, H)
    cfg = PathTracerConfig(max_bounces=3)
    rc = RenderConfig(width=W, height=H, denoiser=DenoiserMode.REBLUR,
                      tonemap="none")
    rc_off = RenderConfig(width=W, height=H, denoiser=DenoiserMode.NONE,
                          tonemap="none")
    s1 = realtime.init_state(H, W)
    s2 = realtime.init_state(H, W)
    for _ in range(3):
        _, hdr_dn, s1 = realtime.render_frame(scene, cam, cfg, rc, s1)
        _, hdr_raw, s2 = realtime.render_frame(scene, cam, cfg, rc_off, s2)
    dn = np.asarray(hdr_dn)
    raw = np.asarray(hdr_raw)
    assert np.isfinite(dn).all()
    # local (3x3 high-frequency) noise energy must drop
    def hf(x):
        blur = sum(np.roll(np.roll(x, dy, 0), dx, 1)
                   for dy in (-1, 0, 1) for dx in (-1, 0, 1)) / 9.0
        return float(((x - blur)[2:-2, 2:-2] ** 2).mean())
    assert hf(dn) < hf(raw) * 0.5, (hf(dn), hf(raw))


def test_split_denoise_frame_finite():
    host, scene = _glossy_cornell()
    cam = default_camera(host, W, H)
    cfg = PathTracerConfig(max_bounces=2)
    rc = RenderConfig(width=W, height=H, denoiser=DenoiserMode.RELAX,
                      split_denoise=True, tonemap="none")
    state = realtime.init_state(H, W)
    for _ in range(2):
        img, hdr, state = realtime.render_frame(scene, cam, cfg, rc, state)
    assert np.isfinite(np.asarray(hdr)).all()
    assert float(np.asarray(hdr).mean()) > 0.01
