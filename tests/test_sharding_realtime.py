"""Sharded realtime frame: 8-virtual-device parity vs the single-device
pipeline (VERDICT r3 missing #4: trace+denoise+TAA across the mesh with
ppermute halo exchange; SURVEY §2.6 'tile+sample sharding over ICI ...
first-class'). conftest.py forces the 8-device CPU mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtxpt_tpu.config import (DenoiserMode, NEEMode, PathTracerConfig,
                              RenderConfig)
from rtxpt_tpu.parallel.mesh import make_mesh
from rtxpt_tpu.parallel import realtime_sharded as rs
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.pt import realtime
from rtxpt_tpu.scene.procedural import cornell_box, default_camera

W, H = 48, 32          # H % 8 == 0; blocks of 4 rows force 14-hop halos


def _frames(n_frames=3, denoiser=DenoiserMode.RELAX, nee=NEEMode.POWER,
            split=False, taa=True, bloom=True, move=True):
    host = cornell_box()
    scene = prepare(host)
    cfg = PathTracerConfig(max_bounces=2, nee=nee)
    rc = RenderConfig(width=W, height=H, denoiser=denoiser,
                      enable_taa=taa, enable_bloom=bloom,
                      split_denoise=split)
    mesh = make_mesh()
    cams = []
    for i in range(n_frames):
        cam = default_camera(host, W, H)
        if move and i:
            # small dolly: a few px of real motion, < MOTION_CLAMP
            cam = cam.replace(position=cam.position
                              + jnp.asarray([0.004 * i, 0.003 * i, 0.0]))
        cams.append(cam)

    st_ref = realtime.init_state(H, W, scene=scene, pt_cfg=cfg)
    st_sh = rs.init_state_sharded(H, W, mesh, scene=scene, pt_cfg=cfg)
    outs = []
    for i in range(n_frames):
        ref_img, ref_hdr, st_ref = realtime.render_frame(
            scene, cams[i], cfg, rc, st_ref)
        sh_img, sh_hdr, st_sh = rs.render_frame_sharded(
            scene, cams[i], cfg, rc, st_sh, mesh)
        outs.append((np.asarray(ref_hdr), np.asarray(sh_hdr),
                     np.asarray(ref_img), np.asarray(sh_img)))
    return outs, st_ref, st_sh


def test_sharded_frame_matches_single_device():
    """3 frames with camera motion: trace, ReLAX denoise (halo
    exchange), TAA, bloom, autoexposure tonemap must match the
    single-device pipeline (same math, psum-reordered reductions)."""
    outs, _, _ = _frames()
    for i, (rh, sh, ri, si) in enumerate(outs):
        assert np.isfinite(sh).all()
        np.testing.assert_allclose(sh, rh, rtol=2e-4, atol=2e-5,
                                   err_msg=f"hdr frame {i}")
        np.testing.assert_allclose(si, ri, rtol=2e-4, atol=2e-5,
                                   err_msg=f"display frame {i}")


def test_sharded_split_channels_reblur():
    """Split diffuse/specular denoising with the REBLUR variant stays
    sharded end-to-end and matches."""
    outs, _, _ = _frames(n_frames=2, denoiser=DenoiserMode.REBLUR,
                         split=True)
    for i, (rh, sh, _, _) in enumerate(outs):
        np.testing.assert_allclose(sh, rh, rtol=2e-4, atol=2e-5,
                                   err_msg=f"frame {i}")


def test_sharded_neeat_feedback_psum():
    """NEE-AT: the per-device partial feedback histograms must reduce to
    the single-device histogram (GSPMD psum), and the learned state must
    match after 2 frames."""
    outs, st_ref, st_sh = _frames(n_frames=2, nee=NEEMode.NEEAT,
                                  denoiser=DenoiserMode.RELAX,
                                  taa=False, bloom=False, move=False)
    assert st_ref.neeat is not None and st_sh.neeat is not None
    for f in ("tile_pdf", "tile_cdf", "ema", "conf"):
        a = getattr(st_ref.neeat, f, None)
        b = getattr(st_sh.neeat, f, None)
        if a is None:
            continue
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=f)
    for rh, sh, _, _ in outs:
        np.testing.assert_allclose(sh, rh, rtol=2e-4, atol=2e-5)


def test_sharded_is_actually_sharded():
    """The denoiser state and hdr output must live row-sharded on the
    mesh (not silently replicated)."""
    host = cornell_box()
    scene = prepare(host)
    cfg = PathTracerConfig(max_bounces=2, nee=NEEMode.POWER)
    rc = RenderConfig(width=W, height=H, denoiser=DenoiserMode.RELAX)
    mesh = make_mesh()
    st = rs.init_state_sharded(H, W, mesh, scene=scene, pt_cfg=cfg)
    cam = default_camera(host, W, H)
    _, hdr, st = rs.render_frame_sharded(scene, cam, cfg, rc, st, mesh)
    assert len(hdr.sharding.device_set) == mesh.devices.size
    assert len(st.denoiser.color.sharding.device_set) == mesh.devices.size
