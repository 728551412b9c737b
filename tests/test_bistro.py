"""Programmer-art Bistro stress asset (BASELINE.json config 5; the
reference benchmarks against Amazon Lumberyard Bistro, README.md).
Small-budget build here; the full-budget run is scripts/run_ladder.py
rung 5 on TPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from rtxpt_tpu.config import NEEMode, PathTracerConfig
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.pt.integrator import render_sample
from rtxpt_tpu.scene.procedural import (bistro_scene, bistro_animations,
                                        default_camera)


def test_bistro_builds_all_stress_features():
    host = bistro_scene(tri_budget=30_000, n_bulbs=150)
    n = sum(len(i.indices) for i in host.instances)
    assert 20_000 < n < 45_000, n
    sd = prepare(host)
    # >128 emissive bulbs + the sun
    assert int(np.asarray(sd.lights.count)) > 128
    # alpha foliage -> opacity micromap path engaged
    assert sd.tri_opacity is not None
    # volumes + nested dielectrics present
    assert sd.has_nested_priorities
    # textured with a normal map
    assert sd.textures is not None
    assert int(np.max(np.asarray(sd.materials.normal_tex))) >= 0


def test_bistro_renders_finite():
    host = bistro_scene(tri_budget=15_000, n_bulbs=40)
    sd = prepare(host)
    cam = default_camera(host, 32, 24)
    cfg = PathTracerConfig(max_bounces=3, nee=NEEMode.POWER,
                           stochastic_texture_filtering=True)
    out = render_sample(sd, cam, cfg, 32, 24, jnp.uint32(1))
    img = np.asarray(out["L"])
    assert np.isfinite(img).all()
    assert img.mean() > 1e-4          # sun + bulbs actually light it


@pytest.mark.slow
def test_bistro_animation_refit():
    from rtxpt_tpu.scene import animation as anim
    host = bistro_scene(tri_budget=15_000, n_bulbs=40,
                        alpha_foliage=False)
    sd = prepare(host)
    tracks = bistro_animations(host)
    assert len(tracks) == 9            # 8 crowns + sign
    sd1, tables = anim.refresh_refit(host, tracks, 0.8, sd)
    cam = default_camera(host, 24, 24)
    cfg = PathTracerConfig(max_bounces=2, nee=NEEMode.POWER,
                           stochastic_texture_filtering=True)
    a = np.asarray(render_sample(sd, cam, cfg, 24, 24, jnp.uint32(1))["L"])
    b = np.asarray(render_sample(sd1, cam, cfg, 24, 24, jnp.uint32(1))["L"])
    assert np.isfinite(b).all()
    assert not np.array_equal(a, b)    # the crowns moved
