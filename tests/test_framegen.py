"""Frame generation (render/framegen.py — the DLSS-FG/MFG analog built
on the renderer's exact motion vectors instead of an optical-flow net).
Reference: README.md DLSS-FG/MFG feature rows."""

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.render.framegen import generate_frames, interpolate_frame


def _checker_image(h=48, w=64, shift=0.0):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    v = (np.sin((xx - shift) * 0.4) * np.cos(yy * 0.3) * 0.5 + 0.5)
    img = np.stack([v, v * 0.7, 1.0 - v], -1).astype(np.float32)
    return jnp.asarray(img)


def test_midpoint_matches_half_shifted_oracle():
    """Pure horizontal translation by m px: the t=0.5 frame must equal
    the image translated by m/2 (small-motion exact case)."""
    m = 4.0
    cur = _checker_image(shift=0.0)
    prev = _checker_image(shift=m)        # scene moved left: prev offset
    motion = jnp.tile(jnp.asarray([[m, 0.0]], jnp.float32),
                      (48 * 64, 1)).reshape(48, 64, 2)
    mid = interpolate_frame(prev, cur, motion, t=0.5)
    oracle = _checker_image(shift=m / 2)
    a = np.asarray(mid)[8:-8, 8:-8]
    b = np.asarray(oracle)[8:-8, 8:-8]
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    assert rmse < 2e-2, rmse
    # endpoints reproduce the inputs exactly-ish
    e0 = interpolate_frame(prev, cur, motion, t=0.0)
    e1 = interpolate_frame(prev, cur, motion, t=1.0)
    assert np.allclose(np.asarray(e0)[8:-8, 8:-8],
                       np.asarray(prev)[8:-8, 8:-8], atol=2e-2)
    assert np.allclose(np.asarray(e1), np.asarray(cur), atol=1e-5)


def test_multi_frame_generation_ordering():
    """MFG: n=3 frames interpolate monotonically between prev and cur."""
    cur = _checker_image(shift=0.0)
    prev = _checker_image(shift=6.0)
    motion = jnp.tile(jnp.asarray([[6.0, 0.0]], jnp.float32),
                      (48 * 64, 1)).reshape(48, 64, 2)
    gens = generate_frames(prev, cur, motion, n=3)
    assert len(gens) == 3
    errs = [float(np.mean(np.abs(np.asarray(g) - np.asarray(cur))))
            for g in gens]
    assert errs[0] > errs[1] > errs[2]    # approaching cur
    for g in gens:
        assert np.isfinite(np.asarray(g)).all()


def test_static_scene_is_identity():
    """Zero motion: every generated frame equals the (identical) inputs."""
    img = _checker_image()
    motion = jnp.zeros((48, 64, 2), jnp.float32)
    mid = interpolate_frame(img, img, motion, 0.5)
    assert np.allclose(np.asarray(mid), np.asarray(img), atol=1e-5)


def test_capture_emits_generated_frames(tmp_path):
    """rc.frame_gen in the capture loop writes .genK frames between
    rendered screenshots (the FG integration point)."""
    from rtxpt_tpu.apps.capture import CaptureScript, run_capture
    from rtxpt_tpu.config import (DenoiserMode, PathTracerConfig,
                                  RenderConfig)
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.scene.procedural import cornell_box

    host = cornell_box()
    scene = prepare(host)
    cfg = PathTracerConfig(max_bounces=2)
    rc = RenderConfig(width=32, height=24, denoiser=DenoiserMode.NONE,
                      frame_gen=1)
    script = CaptureScript(screenshot_frames=[1, 2], total_frames=3)
    saved = run_capture(scene, host, cfg, rc, script,
                        out_dir=str(tmp_path))
    assert 1 in saved and 2 in saved
    assert "1.gen0" in saved and "2.gen0" in saved
    import os
    assert os.path.getsize(saved["1.gen0"]) > 0
