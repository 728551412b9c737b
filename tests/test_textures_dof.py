"""Texture atlas / MIP / ray-cone LOD and depth-of-field tests."""

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.scene.textures import bake_textures, sample_texture


def test_atlas_bilinear_roundtrip():
    img = np.zeros((8, 8, 3), np.float32)
    img[:, 4:, 0] = 1.0   # right half red
    atlas = bake_textures([img])
    uv = jnp.asarray([[0.25, 0.5], [0.8, 0.5]], jnp.float32)
    tid = jnp.asarray([0, 0], jnp.int32)
    out = np.asarray(sample_texture(atlas, tid, uv,
                                    jnp.zeros((2,), jnp.float32)))
    assert out[0, 0] < 0.2      # left = black
    assert out[1, 0] > 0.8      # right = red


def test_mip_chain_averages():
    img = np.zeros((8, 8, 3), np.float32)
    img[:, 4:, :] = 1.0          # half white -> coarsest mip ~0.5
    atlas = bake_textures([img])
    uv = jnp.asarray([[0.5, 0.5]], jnp.float32)
    tid = jnp.asarray([0], jnp.int32)
    coarse = np.asarray(sample_texture(atlas, tid, uv,
                                       jnp.full((1,), 10.0, jnp.float32)))
    np.testing.assert_allclose(coarse[0, :3], 0.5, atol=0.05)


def test_missing_texture_returns_white():
    img = np.zeros((4, 4, 3), np.float32)
    atlas = bake_textures([img])
    out = np.asarray(sample_texture(atlas, jnp.asarray([-1], jnp.int32),
                                    jnp.asarray([[0.5, 0.5]], jnp.float32),
                                    jnp.zeros((1,), jnp.float32)))
    np.testing.assert_allclose(out[0], 1.0)


def test_depth_of_field_blurs_off_focus(cornell_scene):
    """Thin-lens camera: off-focal-plane geometry gets blurrier with
    aperture (variance across lens samples > pinhole)."""
    from rtxpt_tpu.scene.camera import look_at, camera_ray

    host, scene = cornell_scene
    c = host.camera
    n = 64
    px = jnp.full((n,), 16, jnp.int32)
    py = jnp.full((n,), 16, jnp.int32)
    u = jnp.full((n,), 0.5, jnp.float32)
    ul1 = jnp.linspace(0.05, 0.95, n)
    ul2 = jnp.linspace(0.0, 0.9, n)

    cam_dof = look_at(c["position"], c["target"], c["up"], c["fov_y_deg"],
                      32, 32, aperture_radius=0.05, focal_distance=1.0)
    o, d, _ = camera_ray(cam_dof, px, py, u, u, ul1, ul2)
    o = np.asarray(o)
    d = np.asarray(d)
    # origins spread over the aperture
    assert o.std(0).max() > 0.01
    # rays converge at the focal plane: positions at t=focal distance agree
    p_focus = o + d * 1.0
    assert p_focus.std(0).max() < o.std(0).max() * 0.5


def test_spot_light_cone(cornell_scene):
    """Spot light illuminates inside its cone, dark outside."""
    import jax.numpy as jnp2
    from rtxpt_tpu.scene.scene import AnalyticLights, LIGHT_SPOT
    from rtxpt_tpu.scene.procedural import single_triangle, default_camera
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.pt.integrator import render
    from rtxpt_tpu.config import PathTracerConfig
    import numpy as np2

    host = single_triangle("point")
    host.analytic_lights = AnalyticLights(
        kind=jnp2.asarray([LIGHT_SPOT], jnp2.int32),
        position=jnp2.asarray([[0.0, 0.0, 2.0]], jnp2.float32),
        direction=jnp2.asarray([[0.0, 0.0, -1.0]], jnp2.float32),
        intensity=jnp2.asarray([[20.0, 20.0, 20.0]], jnp2.float32),
        angular_size=jnp2.zeros((1,), jnp2.float32),
        cos_inner=jnp2.asarray([np2.cos(0.15)], jnp2.float32),
        cos_outer=jnp2.asarray([np2.cos(0.3)], jnp2.float32),
    )
    scene = prepare(host)
    cam = default_camera(host, 48, 48)
    hdr, _, _ = render(scene, cam,
                       PathTracerConfig(max_bounces=1), 48, 48, spp=4)
    h = np2.asarray(hdr)
    center = h[22:26, 22:26].mean()
    corner = h[4:10, 4:10].mean()
    assert center > 0.05
    assert corner < center * 0.1, f"spot cone leak: {corner} vs {center}"


def test_histogram_auto_exposure_rejects_outliers():
    """256-bin percentile AE (ToneMappingPasses.h:153): a tiny very-bright
    emitter must not crush the exposure the way the plain log-mean does."""
    import jax.numpy as jnp2
    from rtxpt_tpu.render.postprocess import (auto_exposure,
                                              auto_exposure_histogram)
    base = np.full((64, 64, 3), 0.18, np.float32)
    e_plain = float(auto_exposure_histogram(jnp2.asarray(base)))
    hot = base.copy()
    hot[:3, :] = 1.0e5                        # ~4.7% hot pixels (< the 5%
    e_hot = float(auto_exposure_histogram(jnp2.asarray(hot)))  # cut)
    # histogram AE: nearly unchanged; log-mean AE: dragged down
    assert abs(e_hot - e_plain) / e_plain < 0.05
    e_logmean_hot = float(auto_exposure(jnp2.asarray(hot)))
    assert e_logmean_hot < e_plain * 0.8


def test_stochastic_texture_filtering_unbiased(cornell_scene):
    """RTXTF: jittered single-texel filtering matches bilinear filtering
    in expectation on a textured render."""
    import jax.numpy as jnp2
    from rtxpt_tpu.config import NEEMode, PathTracerConfig
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.pt.integrator import render
    from rtxpt_tpu.scene.procedural import cornell_box, default_camera

    host = cornell_box()
    # checkerboard base-color texture on material 0
    img = np.zeros((8, 8, 4), np.float32)
    img[::2, ::2] = 1.0
    img[1::2, 1::2] = 1.0
    img[..., 3] = 1.0
    host.textures = [img]
    mats = host.materials
    host.materials = mats.replace(
        base_color_tex=mats.base_color_tex.at[0].set(0))
    scene = prepare(host)
    cam = default_camera(host, 24, 24)
    base = dict(max_bounces=2, nee=NEEMode.POWER)
    a, _, _ = render(scene, cam, PathTracerConfig(**base), 24, 24, spp=48)
    b, _, _ = render(scene, cam,
                     PathTracerConfig(stochastic_texture_filtering=True,
                                      **base), 24, 24, spp=48)
    a = np.asarray(a); b = np.asarray(b)
    assert abs(a.mean() - b.mean()) / a.mean() < 0.03
