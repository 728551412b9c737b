"""Device-side BVH refit (accel/refit.py) vs full rebuild
(reference split: BLAS update vs rebuild, Sample.cpp:1170-1198)."""

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.accel.lbvh import build_bvh
from rtxpt_tpu.accel.refit import (build_refit_tables, derive_children,
                                   refit_bvh)
from rtxpt_tpu.accel.traverse import intersect_closest


def _soup(n, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    e = rng.normal(0, 0.4, (n, 2, 3)).astype(np.float32)
    pos = np.stack([c, c + e[:, 0], c + e[:, 1]], 1).reshape(-1, 3)
    idx = np.arange(3 * n, dtype=np.int32).reshape(-1, 3)
    return pos, idx


def _rays(m, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-8, 8, (m, 3)).astype(np.float32)
    d = rng.standard_normal((m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_refit_children_derivation():
    """left=i+1 / right=miss[i+1] reconstructs a consistent binary tree."""
    pos, idx = _soup(300)
    bvh = build_bvh(pos, idx)
    ch = derive_children(bvh)
    prim = np.asarray(bvh.node_prim)
    internal = prim < 0
    # every node except the root is some node's child, exactly once
    kids = ch[internal].reshape(-1)
    assert (kids >= 0).all()
    assert len(set(kids.tolist())) == len(kids)
    assert set(kids.tolist()) == set(range(1, len(prim)))


def test_refit_matches_rebuild_hits():
    pos, idx = _soup(500)
    bvh = build_bvh(pos, idx)
    tab = build_refit_tables(bvh)

    # deform: rotate + nonuniform stretch (changes all AABBs)
    th = 0.4
    R = np.asarray([[np.cos(th), 0, np.sin(th)],
                    [0, 1.3, 0],
                    [-np.sin(th), 0, np.cos(th)]], np.float32)
    pos2 = (pos @ R.T) + np.asarray([0.3, -0.2, 0.1], np.float32)

    refit = refit_bvh(bvh, tab, jnp.asarray(pos2), jnp.asarray(idx))
    rebuilt = build_bvh(pos2, idx)

    o, d = _rays(512)
    tn = jnp.zeros((512,))
    tx = jnp.full((512,), 1e9)
    h1 = intersect_closest(refit, o, d, tn, tx)
    h2 = intersect_closest(rebuilt, o, d, tn, tx)
    np.testing.assert_array_equal(np.asarray(h1.prim), np.asarray(h2.prim))
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t),
                               rtol=1e-5, atol=1e-5)


def test_refresh_refit_render_matches_rebuild():
    from rtxpt_tpu.config import NEEMode, PathTracerConfig
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.pt.integrator import render
    from rtxpt_tpu.scene.animation import (
        InstanceAnimation, refresh, refresh_refit, rotation_y)
    from rtxpt_tpu.scene.procedural import cornell_box, default_camera

    host = cornell_box()
    sd0 = prepare(host)
    anims = [InstanceAnimation(0, lambda t: rotation_y(t))]
    cam = default_camera(host, 32, 32)
    cfg = PathTracerConfig(max_bounces=3, nee=NEEMode.POWER)

    sd_rebuild = refresh(host, anims, 0.35, prev=sd0)
    sd_refit, _ = refresh_refit(host, anims, 0.35, prev=sd0)
    img_a = np.asarray(render(sd_rebuild, cam, cfg, 32, 32, spp=2)[0])
    img_b = np.asarray(render(sd_refit, cam, cfg, 32, 32, spp=2)[0])
    np.testing.assert_allclose(img_a, img_b, atol=5e-3)
