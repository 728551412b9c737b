"""Fused Pallas bounce kernel vs the XLA wavefront integrator.

Runs the kernel in interpret mode on the CPU mesh (docs/PERF_NOTES.md
fragility rule: interpret-validate before any TPU compile) and checks it
reproduces trace_paths on the same rays/seeds."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from rtxpt_tpu.config import NEEMode, PathTracerConfig
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.scene.procedural import cornell_box, default_camera


@pytest.fixture()
def force_interpret(monkeypatch):
    monkeypatch.setenv("RTXPT_TPU_PALLAS_INTERPRET", "1")


def _rays(scene, n_px=24):
    from rtxpt_tpu.pt.integrator import EFFECT_LENS, _lds, _pixel_grid
    from rtxpt_tpu.scene.camera import camera_ray
    from rtxpt_tpu.utils import rng

    cam = default_camera(cornell_box(), n_px, n_px)
    px, py = _pixel_grid(n_px, n_px)
    cfg = PathTracerConfig(max_bounces=3, nee=NEEMode.POWER)
    sidx = jnp.uint32(5)
    seed = rng.pixel_seed(px, py, 0, EFFECT_LENS)
    u1, u2 = _lds(cfg, sidx, seed, (0, 1))
    o, d, spread = camera_ray(cam, px, py, u1, u2)
    return cfg, o, d, spread, px, py, sidx


def test_tables_built():
    scene = prepare(cornell_box())
    assert scene.bounce_tables is not None
    tbl = scene.bounce_tables
    assert tbl.n_tris == 36
    # chunk depth rounds to the 8-sublane f32 tile (36 -> 40), 4
    # coefficient row groups per chunk (bounce_pallas._build_tables)
    assert tbl.tri_rows.shape == (4 * 40, 128)
    assert tbl.attr_rows.shape[1] == tbl.tc == 40


@pytest.mark.parametrize("nee", [NEEMode.POWER, NEEMode.UNIFORM,
                                 NEEMode.OFF])
def test_bounce_kernel_matches_xla(force_interpret, nee):
    from rtxpt_tpu.pt.bounce_pallas import trace_paths_pallas
    from rtxpt_tpu.pt.integrator import trace_paths

    scene = prepare(cornell_box())
    cfg, o, d, spread, px, py, sidx = _rays(scene)
    cfg = PathTracerConfig(max_bounces=3, nee=nee,
                           enable_russian_roulette=False)

    ref = trace_paths(scene.replace(bounce_tables=None), cfg, o, d, spread,
                      px, py, sidx)
    out = trace_paths_pallas(scene, cfg, o, d, spread, px, py, sidx)

    L_ref = np.asarray(ref["L"])
    L_out = np.asarray(out["L"])
    assert np.isfinite(L_out).all()
    np.testing.assert_allclose(L_out, L_ref, rtol=2e-3, atol=2e-3)


def test_bounce_kernel_aux_matches(force_interpret):
    from rtxpt_tpu.pt.bounce_pallas import trace_paths_pallas
    from rtxpt_tpu.pt.integrator import trace_paths

    scene = prepare(cornell_box())
    cfg, o, d, spread, px, py, sidx = _rays(scene)
    ref = trace_paths(scene.replace(bounce_tables=None), cfg, o, d, spread,
                      px, py, sidx, want_aux=True)
    out = trace_paths_pallas(scene, cfg, o, d, spread, px, py, sidx,
                             want_aux=True)
    for k in ("albedo", "normal", "depth", "wpos", "emission"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-3, atol=1e-3, err_msg=k)


def test_bounce_kernel_rr_active(force_interpret):
    """With RR on, the kernel still matches (same RR seeds/kills)."""
    from rtxpt_tpu.pt.bounce_pallas import trace_paths_pallas
    from rtxpt_tpu.pt.integrator import trace_paths

    scene = prepare(cornell_box())
    cfg, o, d, spread, px, py, sidx = _rays(scene)
    cfg = PathTracerConfig(max_bounces=5, nee=NEEMode.POWER,
                           enable_russian_roulette=True,
                           min_bounces_before_rr=2)
    ref = trace_paths(scene.replace(bounce_tables=None), cfg, o, d, spread,
                      px, py, sidx)
    out = trace_paths_pallas(scene, cfg, o, d, spread, px, py, sidx)
    np.testing.assert_allclose(np.asarray(out["L"]), np.asarray(ref["L"]),
                               rtol=2e-3, atol=2e-3)


def test_bounce_kernel_vbuffer_injection(force_interpret):
    """Stable-planes FILL analog: fused kernel with an injected first hit
    + per-lane bounce budget matches the XLA wavefront given the same
    V-buffer restart (VERDICT r2 gap: FILL used to force the XLA path)."""
    from rtxpt_tpu.accel.traverse import scene_closest
    from rtxpt_tpu.pt.bounce_pallas import trace_paths_pallas
    from rtxpt_tpu.pt.integrator import trace_paths

    scene = prepare(cornell_box())
    cfg, o, d, spread, px, py, sidx = _rays(scene)
    cfg = PathTracerConfig(max_bounces=3, nee=NEEMode.POWER,
                           enable_russian_roulette=False)

    n = o.shape[0]
    fh = scene_closest(scene, o, d, jnp.zeros((n,), jnp.float32),
                       jnp.full((n,), cfg.max_ray_travel, jnp.float32))
    budget = jnp.where(jnp.arange(n) % 3 == 0, 1, 2).astype(jnp.int32)

    ref = trace_paths(scene.replace(bounce_tables=None), cfg, o, d, spread,
                      px, py, sidx, first_hit=fh, bounce_budget=budget)
    out = trace_paths_pallas(scene, cfg, o, d, spread, px, py, sidx,
                             first_hit=fh, bounce_budget=budget)
    L_ref = np.asarray(ref["L"])
    L_out = np.asarray(out["L"])
    assert np.isfinite(L_out).all()
    np.testing.assert_allclose(L_out, L_ref, rtol=2e-3, atol=2e-3)
    # the budget actually bit: a 1-bounce lane differs from unlimited
    full = trace_paths_pallas(scene, cfg, o, d, spread, px, py, sidx,
                              first_hit=fh)
    assert np.abs(np.asarray(full["L"]) - L_out).max() > 1e-4


def test_bounce_kernel_first_direct_matches_xla(force_interpret):
    """first_direct=False (stable-planes FILL under external ReSTIR DI,
    VERDICT r4 missing #3): the fused kernel's per-lane gates must match
    the XLA wavefront's static bounce gates (integrator.py:273,376,405),
    and the result must be strictly darker than the full trace (primary
    direct light removed)."""
    from rtxpt_tpu.pt.bounce_pallas import trace_paths_pallas
    from rtxpt_tpu.pt.integrator import trace_paths

    scene = prepare(cornell_box())
    cfg, o, d, spread, px, py, sidx = _rays(scene)
    cfg = PathTracerConfig(max_bounces=3, nee=NEEMode.POWER,
                           enable_russian_roulette=False)

    ref = trace_paths(scene.replace(bounce_tables=None), cfg, o, d, spread,
                      px, py, sidx, first_direct=False)
    out = trace_paths_pallas(scene, cfg, o, d, spread, px, py, sidx,
                             first_direct=False)
    L_ref = np.asarray(ref["L"])
    L_out = np.asarray(out["L"])
    assert np.isfinite(L_out).all()
    np.testing.assert_allclose(L_out, L_ref, rtol=2e-3, atol=2e-3)

    full = np.asarray(trace_paths_pallas(
        scene, cfg, o, d, spread, px, py, sidx)["L"])
    assert L_out.mean() < full.mean() * 0.9
