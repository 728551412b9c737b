"""Declarative golden-image matrix (Support/tests/run_tests.ps1 +
tests.json analog): each entry renders deterministically and compares to a
committed golden with per-test RMSE/PSNR budgets. First run generates the
goldens (generate_golden.ps1 analog)."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from rtxpt_tpu.config import DenoiserMode, PathTracerConfig, RenderConfig
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.scene.procedural import cornell_box, default_camera
from rtxpt_tpu.utils.image import psnr, rmse

HERE = os.path.dirname(__file__)
GOLDEN_DIR = os.path.join(HERE, "goldens")
with open(os.path.join(HERE, "matrix.json")) as f:
    MATRIX = json.load(f)["tests"]

_scene_cache = {}


def _build_scene(name: str):
    if name in _scene_cache:
        return _scene_cache[name]
    if name == "cornell":
        host = cornell_box()
    elif name == "cornell-glass":
        host = cornell_box()
        m = host.materials
        host.materials = m.replace(
            transmission=m.transmission.at[4].set(1.0),
            roughness=m.roughness.at[4].set(0.0),
            metallic=m.metallic.at[4].set(0.0))
    elif name == "kitchen":
        from rtxpt_tpu.scene.procedural import kitchen_scene
        host = kitchen_scene()
    else:
        raise ValueError(name)
    out = (host, prepare(host))
    _scene_cache[name] = out
    return out


def _run(entry):
    host, scene = _build_scene(entry["scene"])
    cam = default_camera(host, entry["width"], entry["height"])
    cfg = PathTracerConfig(max_bounces=entry["bounces"])
    if entry["mode"] == "reference":
        from rtxpt_tpu.pt.integrator import render
        hdr, _, _ = render(scene, cam, cfg, entry["width"], entry["height"],
                           spp=entry["spp"])
        return np.asarray(hdr)
    from rtxpt_tpu.pt import realtime
    rc = RenderConfig(width=entry["width"], height=entry["height"],
                      denoiser=DenoiserMode.RELAX, tonemap="none")
    state = realtime.init_state(entry["height"], entry["width"])
    for _ in range(entry["frames"]):
        _, hdr, state = realtime.render_frame(scene, cam, cfg, rc, state)
    return np.asarray(hdr)


@pytest.mark.parametrize("entry", MATRIX, ids=lambda e: e["name"])
def test_matrix_golden(entry):
    img = _run(entry)
    assert np.isfinite(img).all()
    path = os.path.join(GOLDEN_DIR, entry["name"] + ".npy")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, img)
        pytest.skip("golden generated; re-run to compare")
    golden = np.load(path)
    e = rmse(img, golden)
    p = psnr(img, golden)
    assert e <= entry["rmse"], f"{entry['name']}: RMSE {e} > {entry['rmse']}"
    assert p >= entry["psnr"], f"{entry['name']}: PSNR {p} < {entry['psnr']}"
