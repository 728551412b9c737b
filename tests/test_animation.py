"""Dynamic scene tests: per-frame transform update + BVH rebuild."""

import numpy as np

from rtxpt_tpu.config import PathTracerConfig
from rtxpt_tpu.pt.integrator import render
from rtxpt_tpu.scene import animation as anim
from rtxpt_tpu.scene.procedural import cornell_box, default_camera

W = H = 24


def test_animated_instance_moves_shadows():
    host = cornell_box(boxes=True)
    cam = default_camera(host, W, H)
    cfg = PathTracerConfig(max_bounces=2)

    # slide the whole interior mesh right by 0.2 over time — crude but
    # exercises re-flatten + rebuild + light rebake
    a = [anim.InstanceAnimation(
        instance=0,
        transform_fn=lambda t: anim.translation([0.2 * t, 0.0, 0.0]))]

    s0 = anim.refresh(host, a, 0.0)
    img0, _, _ = render(s0, cam, cfg, W, H, spp=4)
    s1 = anim.refresh(host, a, 1.0, prev=s0)
    img1, _, _ = render(s1, cam, cfg, W, H, spp=4)

    img0 = np.asarray(img0)
    img1 = np.asarray(img1)
    assert np.isfinite(img1).all()
    # scene moved -> image changed substantially
    assert np.abs(img1 - img0).mean() > 0.005


def test_skinning_matches_rigid_transform():
    rng = np.random.default_rng(0)
    pos = rng.normal(0, 1, (64, 3)).astype(np.float32)
    m = anim.rotation_y(0.7) @ anim.translation([1, 2, 3])
    joints = np.zeros((64, 4), np.int32)
    weights = np.zeros((64, 4), np.float32)
    weights[:, 0] = 1.0
    out = anim.skin_vertices(pos, joints, weights, m[None])
    hom = np.concatenate([pos, np.ones((64, 1), np.float32)], -1)
    expect = hom @ m[:3, :].T
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_blended_skinning_interpolates():
    pos = np.asarray([[0, 0, 0]], np.float32)
    pal = np.stack([anim.translation([1, 0, 0]),
                    anim.translation([0, 1, 0])])
    joints = np.asarray([[0, 1, 0, 0]], np.int32)
    weights = np.asarray([[0.5, 0.5, 0, 0]], np.float32)
    out = anim.skin_vertices(pos, joints, weights, pal)
    np.testing.assert_allclose(out, [[0.5, 0.5, 0.0]], atol=1e-6)
