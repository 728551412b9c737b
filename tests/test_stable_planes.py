"""Stable-planes decomposition tests."""

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.config import DenoiserMode, PathTracerConfig, RenderConfig
from rtxpt_tpu.pt import realtime
from rtxpt_tpu.pt.stable_planes import decompose
from rtxpt_tpu.pt.integrator import _pixel_grid, render
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.scene.camera import camera_ray
from rtxpt_tpu.scene.procedural import cornell_box, default_camera

W = H = 32


def _rays(host, scene):
    cam = default_camera(host, W, H)
    px, py = _pixel_grid(W, H)
    n = px.shape[0]
    o, d, _ = camera_ray(cam, px, py, jnp.full((n,), 0.5),
                         jnp.full((n,), 0.5))
    return cam, o, d


def test_diffuse_scene_single_plane(cornell_scene):
    """All-diffuse Cornell: every pixel terminates at plane 0, no plane 1."""
    host, scene = cornell_scene
    cam, o, d = _rays(host, scene)
    planes, background = decompose(scene, o, d)
    p0, p1, p2 = planes
    assert bool(jnp.all(p0.valid | background))
    assert not bool(jnp.any(p1.valid))
    assert not bool(jnp.any(p2.valid))
    # root branch id everywhere on the (forkless) dominant chain
    assert (np.asarray(p0.branch_id)[np.asarray(p0.valid)] >= 1).all()
    # plane0 restart rays are the camera rays themselves
    np.testing.assert_allclose(np.asarray(p0.o)[np.asarray(p0.valid)],
                               np.asarray(o)[np.asarray(p0.valid)])


def test_mirror_reflection_creates_chain():
    """Smooth metal floor: plane 0 walks through the reflection."""
    host = cornell_box()
    import jax.numpy as jnp2
    mats = host.materials
    # make material 0 (white walls/floor) a perfect mirror
    host.materials = mats.replace(
        metallic=mats.metallic.at[0].set(1.0),
        roughness=mats.roughness.at[0].set(0.0))
    scene = prepare(host)
    cam, o, d = _rays(host, scene)
    planes, background = decompose(scene, o, d)
    p0 = planes[0]
    # chains through mirrors are longer than the primary hit distance
    depth = np.asarray(p0.depth)
    valid = np.asarray(p0.valid)
    assert valid.any()
    assert depth[valid].max() > 2.5  # bounced at least once (box size 1)


def test_glass_creates_transmission_plane():
    host = cornell_box()
    mats = host.materials
    # make the tall box (material 4) smooth glass
    host.materials = mats.replace(
        transmission=mats.transmission.at[4].set(1.0),
        roughness=mats.roughness.at[4].set(0.0),
        metallic=mats.metallic.at[4].set(0.0))
    scene = prepare(host)
    cam, o, d = _rays(host, scene)
    planes, background = decompose(scene, o, d)
    p1 = planes[1]
    assert bool(jnp.any(p1.valid)), "no transmission plane on glass box"
    thp = np.asarray(p1.thp)[np.asarray(p1.valid)]
    assert (thp > 0).all() and (thp <= 1.0).all()


def test_stable_planes_frame_matches_reference_mean(cornell_scene):
    """Decomposed realtime frame (no denoise) equals the plain path-traced
    image in expectation for a diffuse scene."""
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    pt_cfg = PathTracerConfig(max_bounces=3)
    rc = RenderConfig(width=W, height=H, denoiser=DenoiserMode.NONE,
                      tonemap="none")
    state = realtime.init_state(H, W)
    acc = None
    frames = 24
    for _ in range(frames):
        _, hdr, state = realtime.render_frame_stable_planes(
            scene, cam, pt_cfg, rc, state)
        acc = hdr if acc is None else acc + hdr
    sp = np.asarray(acc) / frames
    ref, _, _ = render(scene, cam, pt_cfg, W, H, spp=frames)
    ref = np.asarray(ref)
    assert abs(sp.mean() - ref.mean()) / ref.mean() < 0.05


def test_stable_planes_with_denoiser_multiframe(cornell_scene):
    """Regression: flat-vs-image buffer shapes in the per-plane denoise
    path (frame >= 2 reprojects with the previous camera)."""
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    pt_cfg = PathTracerConfig(max_bounces=2)
    rc = RenderConfig(width=W, height=H, denoiser=DenoiserMode.RELAX,
                      tonemap="none")
    state = realtime.init_state(H, W)
    for _ in range(2):
        _, hdr, state = realtime.render_frame_stable_planes(
            scene, cam, pt_cfg, rc, state)
    import numpy as np2
    assert np2.isfinite(np2.asarray(hdr)).all()


def test_glass_over_mirror_composites_to_reference():
    """VERDICT r1 #6 gate: glass-over-mirror scene — three planes denoise
    separately (here: accumulate separately) and composite to the
    reference-mode render within RMSE 2e-2."""
    host = cornell_box()
    mats = host.materials
    host.materials = mats.replace(
        # tall box (mat 4): smooth glass; floor shares mat 0 -> mirror the
        # short box (mat 3) instead to get glass-over-mirror interplay
        transmission=mats.transmission.at[4].set(1.0),
        roughness=mats.roughness.at[4].set(0.0).at[3].set(0.0),
        metallic=mats.metallic.at[3].set(1.0))
    scene = prepare(host)
    cam = default_camera(host, W, H)
    # firefly clamp on BOTH estimators: glass+mirror caustic-ish paths
    # have heavy-tailed variance; clamping makes the finite-spp
    # comparison well-posed (same clamped integrand both sides).
    pt_cfg = PathTracerConfig(max_bounces=4, firefly_clamp=0.5)
    rc = RenderConfig(width=W, height=H, denoiser=DenoiserMode.NONE,
                      tonemap="none")
    state = realtime.init_state(H, W)
    acc = None
    frames = 64
    for _ in range(frames):
        _, hdr, state = realtime.render_frame_stable_planes(
            scene, cam, pt_cfg, rc, state)
        acc = hdr if acc is None else acc + hdr
    sp = np.asarray(acc) / frames
    ref, _, _ = render(scene, cam, pt_cfg, W, H, spp=frames)
    ref = np.asarray(ref)
    rmse = float(np.sqrt(np.mean((sp - ref) ** 2)))
    assert rmse < 2e-2, rmse
