"""Golden-image regression + aux subsystem tests (the pytest analog of
Support/tests: tests.json matrix, _1_render headless determinism,
_2_compare metrics — SURVEY.md §4)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from rtxpt_tpu.config import DenoiserMode, PathTracerConfig, RenderConfig
from rtxpt_tpu.pt.integrator import render
from rtxpt_tpu.scene.procedural import default_camera
from rtxpt_tpu.utils.image import absolute_error_count, psnr, rmse

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
W = H = 32
SPP = 8
BOUNCES = 3


def _render_cornell(scene_pair):
    host, scene = scene_pair
    cam = default_camera(host, W, H)
    cfg = PathTracerConfig(max_bounces=BOUNCES)
    hdr, _, _ = render(scene, cam, cfg, W, H, spp=SPP)
    return np.asarray(hdr)


def test_golden_cornell_reference(cornell_scene):
    """Deterministic render matches the committed golden (RMSE + PSNR
    thresholds like tests.json's per-test budgets)."""
    path = os.path.join(GOLDEN_DIR, "cornell_32_8spp.npy")
    img = _render_cornell(cornell_scene)
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, img)
        pytest.skip("golden generated; re-run to compare")
    golden = np.load(path)
    e = rmse(img, golden)
    assert e < 5e-3, f"RMSE vs golden {e}"
    assert psnr(img, golden) > 40


def test_render_is_deterministic(cornell_scene):
    """Same seed -> bitwise-identical frame (headless determinism)."""
    a = _render_cornell(cornell_scene)
    b = _render_cornell(cornell_scene)
    assert absolute_error_count(a, b) == 0


def test_checkpoint_resume(cornell_scene, tmp_path):
    from rtxpt_tpu.render.checkpoint import resume_render

    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    cfg = PathTracerConfig(max_bounces=2)
    ckpt = str(tmp_path / "acc.npz")
    # run 4 spp with checkpoint every 2
    full, _ = resume_render(scene, cam, cfg, W, H, ckpt, total_spp=4,
                            checkpoint_every=2)
    # simulate crash after 2: re-run from the midway checkpoint
    from rtxpt_tpu.render.checkpoint import save_accumulation, \
        load_accumulation
    acc, n, _ = load_accumulation(ckpt)
    assert n == 4
    # fresh run without checkpoint gives identical result
    ckpt2 = str(tmp_path / "acc2.npz")
    full2, _ = resume_render(scene, cam, cfg, W, H, ckpt2, total_spp=4,
                             checkpoint_every=100)
    np.testing.assert_allclose(full, full2, atol=1e-6)


def test_pixel_probe(cornell_scene):
    from rtxpt_tpu.utils.debug import probe_pixel

    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    cfg = PathTracerConfig(max_bounces=3)
    rec = probe_pixel(scene, cam, cfg, W // 2, H // 2)
    assert len(rec) >= 1
    assert rec[0]["hit"]
    assert rec[0]["t"] > 0
    assert "material" in rec[0]


def test_nan_canary(cornell_scene):
    from rtxpt_tpu.utils.debug import nan_canary, paint_nan_markers

    img = _render_cornell(cornell_scene)
    c = nan_canary(img)
    assert c["ok"], c
    bad = img.copy()
    bad[0, 0, 0] = np.nan
    assert not nan_canary(bad)["ok"]
    painted = np.asarray(paint_nan_markers(jnp.asarray(bad)))
    assert painted[0, 0, 0] == 1.0 and painted[0, 0, 2] == 1.0


def test_capture_script(cornell_scene, tmp_path):
    from rtxpt_tpu.apps.capture import CaptureScript, run_capture

    host, scene = cornell_scene
    pt_cfg = PathTracerConfig(max_bounces=1)
    rc = RenderConfig(width=16, height=16, denoiser=DenoiserMode.NONE)
    script = CaptureScript(screenshot_frames=[0, 2], total_frames=3,
                           out_pattern="shot_{index:02d}.png")
    saved = run_capture(scene, host, pt_cfg, rc, script, str(tmp_path))
    assert set(saved) == {0, 2}
    for p in saved.values():
        assert os.path.exists(p)


def test_metrics_collection(cornell_scene):
    from rtxpt_tpu.utils.metrics import FrameMetrics

    m = FrameMetrics(warmup=0)
    for _ in range(2):
        m.begin_frame()
        with m.marker("pathtrace"):
            _render_cornell(cornell_scene)
        m.end_frame(rays=1000)
    avg = m.averages()
    assert avg["frames"] == 2
    assert avg["ms"] > 0
    assert "mrays_s" in avg


def test_local_config_overrides(tmp_path, monkeypatch):
    """LocalConfig.h analog: JSON overrides apply only to flags the user
    did not pass explicitly (command line wins)."""
    import argparse
    from rtxpt_tpu.utils.localconfig import apply_local_config

    cfgfile = tmp_path / "local.json"
    cfgfile.write_text('{"width": 960, "spp": 4, "denoiser": "reblur"}')
    monkeypatch.setenv("RTXPT_TPU_LOCAL_CONFIG", str(cfgfile))
    args = argparse.Namespace(width=512, spp=16, denoiser="relax")
    applied = apply_local_config(args, argv=["--spp", "8"])
    assert args.width == 960          # overridden (not on command line)
    assert args.spp == 16             # explicit flag wins, untouched
    assert args.denoiser == "reblur"
    assert dict(applied) == {"width": 960, "denoiser": "reblur"}
