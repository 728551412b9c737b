"""Hybrid (IntroSample-analog) renderer tests."""

import numpy as np

from rtxpt_tpu.pt.hybrid import render_hybrid, ssao
from rtxpt_tpu.scene.procedural import default_camera

W = H = 32


def test_hybrid_renders_lit_frame(cornell_scene):
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    hdr = np.asarray(render_hybrid(scene, cam, W, H))
    assert hdr.shape == (H, W, 3)
    assert np.isfinite(hdr).all()
    assert hdr.mean() > 0.02
    # left strip redder than right strip (walls visible)
    left = hdr[10:24, 2:8].mean((0, 1))
    right = hdr[10:24, -8:-2].mean((0, 1))
    assert left[0] / max(left[1], 1e-6) > right[0] / max(right[1], 1e-6)


def test_ssao_darkens_corners(cornell_scene):
    from rtxpt_tpu.pt.restir import gbuffer_from_primary

    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    gb, _ = gbuffer_from_primary(scene, cam, W, H)
    ao = np.asarray(ssao(gb.depth, gb.normal, gb.pos, W, H)).reshape(H, W)
    assert np.isfinite(ao).all()
    assert (ao >= 0).all() and (ao <= 1).all()
    # open wall centers less occluded than box-corner regions
    assert ao.mean() > 0.4
    assert ao.min() < 0.9


def test_probe_sh_irradiance_constant_env():
    """A constant-radiance probe must give irradiance L (E = pi*L, and
    probe_irradiance folds the /pi) for every normal direction."""
    import jax.numpy as jnp
    from rtxpt_tpu.lighting.probe import (LocalProbe, _equirect_dirs,
                                          _sh_basis, probe_irradiance)
    h, w = 32, 64
    L = 0.7
    rad = np.full((h * w, 3), L, np.float32)
    d, dw = _equirect_dirs(h, w)
    sh = jnp.asarray((_sh_basis(d) * dw[:, None]).T.astype(np.float32)) \
        @ jnp.asarray(rad)
    probe = LocalProbe(base=jnp.asarray(rad.reshape(h, w, 3)),
                       mips=jnp.zeros((5, h, w, 3)), sh=sh,
                       center=jnp.zeros(3))
    nrm = np.random.default_rng(0).standard_normal((64, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    irr = np.asarray(probe_irradiance(probe, jnp.asarray(nrm)))
    assert np.allclose(irr, L, rtol=0.02), (irr.min(), irr.max())


def test_probe_prefilter_blurs_with_roughness():
    """GGX prefilter: higher mips are progressively smoother versions of
    a point-bright probe (energy preserved, peak reduced)."""
    import jax.numpy as jnp
    from rtxpt_tpu.lighting.probe import _ggx_operators
    h, w = 32, 64
    rad = np.zeros((h * w, 3), np.float32)
    rad[(h // 2) * w + w // 4] = 100.0
    ops = _ggx_operators(h, w)
    peaks = [float(np.max(ops[l] @ rad)) for l in range(len(ops))]
    assert all(peaks[i] > peaks[i + 1] for i in range(len(peaks) - 1)), peaks


def test_hybrid_with_probe(cornell_scene):
    """Probe-based hybrid must produce a lit, finite frame with indirect
    ambient in shadowed regions (the local probe sees the lit interior,
    unlike the env map which is absent in the closed box)."""
    from rtxpt_tpu.lighting.probe import bake_probe
    from rtxpt_tpu.scene.procedural import default_camera
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    probe = bake_probe(scene)
    assert np.isfinite(np.asarray(probe.base)).all()
    assert float(np.asarray(probe.base).max()) > 0.0
    hdr = np.asarray(render_hybrid(scene, cam, W, H, probe=probe))
    assert np.isfinite(hdr).all()
    assert hdr.max() > 0.0
    # ambient from the probe raises shadowed-floor luminance vs no-probe
    hdr0 = np.asarray(render_hybrid(scene, cam, W, H, use_probe=False))
    assert hdr.mean() > hdr0.mean()
