"""In-kernel environment + texture paths of the fused/clustered tiers.

Round-3 headline feature (VERDICT r2 "Next round" #2): textured and
env-lit scenes must run the Pallas hot tiers in parity with the XLA
wavefront instead of silently falling back. Kernels run in interpret
mode on the CPU mesh (reference behavior under test: in-megakernel
bindless MIP sampling PathTracerBridgeDonut.hlsli:270-285 and env eval
Shaders/PathTracer/Lighting/EnvMap.hlsli).
"""

import dataclasses
import os

import numpy as np
import pytest

os.environ.setdefault("RTXPT_TPU_PALLAS_INTERPRET", "1")

from rtxpt_tpu.config import NEEMode, PathTracerConfig          # noqa: E402
from rtxpt_tpu.prepare import prepare                           # noqa: E402
from rtxpt_tpu.pt import dispatch                               # noqa: E402
from rtxpt_tpu.pt.integrator import render                      # noqa: E402
from rtxpt_tpu.scene.procedural import (                        # noqa: E402
    city_scene, default_camera, textured_cornell)


def _render_pair(sd, cam, cfg, w, h, spp, want_tier):
    """Render on the resolved hot tier and on the pinned-XLA reference;
    assert the hot tier actually served the first render."""
    r = dispatch.resolve(sd, cfg)
    assert r.kernel_tier == want_tier, r.kernel_tier
    img = np.asarray(render(sd, cam, cfg, w, h, spp=spp)[0])
    ref = np.asarray(render(sd, cam,
                            dataclasses.replace(cfg, kernel_tier="xla"),
                            w, h, spp=spp)[0])
    assert not np.array_equal(img, ref), "reference path did not run"
    assert np.isfinite(img).all()
    return img, ref


def test_fused_env_parity():
    host = textured_cornell(with_env=True)
    host.textures = None                      # env only
    host.materials = host.materials.replace(
        base_color_tex=None)
    sd = prepare(host)
    assert sd.bounce_tables is not None
    assert sd.bounce_tables.env_rows is not None
    cam = default_camera(host, 32, 32)
    cfg = PathTracerConfig(max_bounces=3, nee=NEEMode.POWER)
    img, ref = _render_pair(sd, cam, cfg, 32, 32, 4, "fused")
    rmse = float(np.sqrt(np.mean((img - ref) ** 2)))
    # same sampler, same env CDF -> near-exact (atan2 poly + fp order)
    assert rmse < 5e-3, rmse
    assert abs(img.mean() - ref.mean()) < 2e-3, (img.mean(), ref.mean())


def test_fused_texture_parity():
    host = textured_cornell(with_env=False)
    sd = prepare(host)
    assert sd.bounce_tables is not None
    assert sd.bounce_tables.tex_ct is not None
    cam = default_camera(host, 32, 32)
    cfg = PathTracerConfig(max_bounces=3, nee=NEEMode.POWER,
                           stochastic_texture_filtering=True)
    img, ref = _render_pair(sd, cam, cfg, 32, 32, 4, "fused")
    rmse = float(np.sqrt(np.mean((img - ref) ** 2)))
    assert rmse < 5e-3, rmse
    # the checker must actually show up (white walls become patterned)
    assert img[:, :, 0].std() > 0.02


def test_fused_texture_requires_stf():
    """Without stochastic filtering the kernel has no bilinear path —
    textured scenes must fall back to XLA."""
    host = textured_cornell(with_env=False)
    sd = prepare(host)
    cfg = PathTracerConfig(max_bounces=2, nee=NEEMode.POWER,
                           stochastic_texture_filtering=False)
    assert dispatch.resolve(sd, cfg).kernel_tier == "xla"


def test_fused_env_and_texture():
    host = textured_cornell(with_env=True, with_mr=True)
    sd = prepare(host)
    assert sd.bounce_tables is not None
    cam = default_camera(host, 24, 24)
    cfg = PathTracerConfig(max_bounces=3, nee=NEEMode.POWER,
                           stochastic_texture_filtering=True)
    img, ref = _render_pair(sd, cam, cfg, 24, 24, 4, "fused")
    rmse = float(np.sqrt(np.mean((img - ref) ** 2)))
    assert rmse < 8e-3, rmse


@pytest.mark.slow
def test_clustered_env_tex_parity():
    host = city_scene(tri_budget=4000, seed=1, blocks=2, textured=True,
                      with_env=True)
    sd = prepare(host)
    assert sd.cluster_tables is not None, "expected clustered path"
    assert sd.cluster_tables.env_rows is not None
    assert sd.cluster_tables.tex_ct is not None
    cam = default_camera(host, 48, 32)
    cfg = PathTracerConfig(max_bounces=3, nee=NEEMode.POWER,
                           stochastic_texture_filtering=True)
    img, ref = _render_pair(sd, cam, cfg, 48, 32, 4, "clustered")
    rmse = float(np.sqrt(np.mean((img - ref) ** 2)))
    assert rmse < 2e-2, rmse
    assert abs(img.mean() - ref.mean()) < 5e-3, (img.mean(), ref.mean())


def test_fused_normal_map_parity():
    """Normal maps on the fused tier (VERDICT r3 missing #1: normal-map
    scenes previously demoted to the XLA wavefront)."""
    host = textured_cornell(with_env=False, with_normal=True)
    sd = prepare(host)
    assert sd.bounce_tables is not None, "normal map must not demote"
    cam = default_camera(host, 32, 32)
    cfg = PathTracerConfig(max_bounces=3, nee=NEEMode.POWER,
                           stochastic_texture_filtering=True)
    img, ref = _render_pair(sd, cam, cfg, 32, 32, 4, "fused")
    rmse = float(np.sqrt(np.mean((img - ref) ** 2)))
    assert rmse < 5e-3, rmse
    # the ripples must actually shade differently from a flat normal
    flat = textured_cornell(with_env=False, with_normal=False)
    base = np.asarray(render(prepare(flat), cam, cfg, 32, 32, spp=4)[0])
    assert float(np.abs(img - base).max()) > 0.02


@pytest.mark.slow
def test_clustered_normal_map_parity():
    host = city_scene(tri_budget=4000, seed=1, blocks=2, textured=True,
                      normal_mapped=True)
    sd = prepare(host)
    assert sd.cluster_tables is not None, "normal map must not demote"
    cam = default_camera(host, 48, 32)
    cfg = PathTracerConfig(max_bounces=2, nee=NEEMode.POWER,
                           stochastic_texture_filtering=True)
    img, ref = _render_pair(sd, cam, cfg, 48, 32, 4, "clustered")
    rmse = float(np.sqrt(np.mean((img - ref) ** 2)))
    assert rmse < 2e-2, rmse
