"""Experiment: candidate-list quality vs wavefront sort key design.

Builds the real bounce-1 wavefront on the city scene, then measures the
cull candidate stats (mean/p90/overflow @ kslots) under several sort-key
designs. Also measures bounce-0 (primary) stats under scanline vs
Morton-tile pixel order.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    w, h = 1920, 1080
    from rtxpt_tpu.config import NEEMode, PathTracerConfig
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.pt import bounce_clustered as bc
    from rtxpt_tpu.pt.bounce_pallas import (
        FS_D, FS_O, IS_ACTIVE, NF, NI, _cfg_key, _R)
    from rtxpt_tpu.accel.cull import cull_candidates
    from rtxpt_tpu.ops.wavefront import _spread6
    from rtxpt_tpu.pt.integrator import _pixel_grid, EFFECT_LENS, _lds
    from rtxpt_tpu.scene.camera import camera_ray
    from rtxpt_tpu.scene.procedural import city_scene, default_camera
    from rtxpt_tpu.utils import rng

    host = city_scene(tri_budget=350_000)
    sd = prepare(host)
    tbl = sd.cluster_tables
    cam = default_camera(host, w, h)
    cfg = PathTracerConfig(max_bounces=4, nee=NEEMode.POWER)
    from rtxpt_tpu.pt.dispatch import resolve
    cfg = resolve(sd, cfg)
    key = _cfg_key(cfg)
    kslots = 64

    px, py = _pixel_grid(w, h)
    n = px.shape[0]
    sidx = jnp.uint32(1)
    seed = rng.pixel_seed(px, py, 0, EFFECT_LENS)
    u1, u2 = _lds(cfg, sidx, seed, (0, 1))
    o, d, spread = camera_ray(cam, px, py, u1, u2)

    lanes = _R * 128
    npad = -(-max(n, lanes) // lanes) * lanes
    nrows = npad // 128
    n_groups = nrows // _R

    def pad1(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((npad - n, *x.shape[1:]), fill, x.dtype)]) \
            if npad != n else x

    def build_state(o, d, px, py):
        fs = jnp.concatenate([
            pad1(o).T.reshape(3, nrows, 128),
            pad1(d, 1.0).T.reshape(3, nrows, 128),
            jnp.ones((3, nrows, 128), jnp.float32),
            jnp.zeros((3, nrows, 128), jnp.float32),
            jnp.zeros((2, nrows, 128), jnp.float32),
            pad1(spread).reshape(1, nrows, 128),
        ], axis=0)
        is_ = jnp.concatenate([
            pad1(jnp.ones((n,), jnp.int32)).reshape(1, nrows, 128),
            jnp.ones((1, nrows, 128), jnp.int32),
            jnp.full((2, nrows, 128), -1, jnp.int32),
            pad1(px).reshape(1, nrows, 128),
            pad1(py).reshape(1, nrows, 128),
        ], axis=0)
        return fs, is_

    g4 = lambda x3: x3.reshape(3, n_groups, _R, 128)
    cull_j = jax.jit(cull_candidates, static_argnames=("kslots",))

    def stats(tag, fs, is_):
        act = (is_[IS_ACTIVE] > 0).reshape(n_groups, _R, 128)
        cand, ovf = cull_j(
            g4(fs[FS_O:FS_O + 3]), g4(fs[FS_D:FS_D + 3]), act,
            jnp.float32(cfg.max_ray_travel), tbl.aabb_lo, tbl.aabb_hi,
            kslots=kslots)
        c = np.asarray(cand[:, 0, 0])
        rm = np.asarray(cand[:, 0, 1 + kslots:1 + 2 * kslots])
        # mean rows-per-candidate over real candidates
        kmask = np.arange(kslots)[None, :] < c[:, None]
        bits = np.zeros_like(rm)
        for r in range(8):
            bits += (rm >> r) & 1
        rows_per_cand = bits[kmask].mean() if kmask.any() else 0.0
        print(f"{tag:28s} cand mean={c.mean():5.1f} p50={np.percentile(c,50):3.0f} "
              f"p90={np.percentile(c,90):3.0f} overflow={int(ovf):8d} "
              f"rows/cand={rows_per_cand:.2f}")
        return cand

    # ---- bounce 0: scanline vs morton pixel order ----
    fs0, is0 = build_state(o, d, px, py)
    stats("b0 scanline", fs0, is0)

    # Morton pixel order
    mx = np.asarray(px)
    my = np.asarray(py)
    def spread16(v):
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v
    mkey = (spread16(my.astype(np.int64)) << 1) | spread16(mx.astype(np.int64))
    order0 = np.argsort(mkey, kind="stable")
    po = jnp.asarray(order0)
    fs0m, is0m = build_state(o[po], d[po], px[po], py[po])
    stats("b0 morton pixels", fs0m, is0m)

    # ---- bounce 1 wavefront (from morton-ordered primaries) ----
    scal = jnp.stack([sidx, jnp.uint32(0)]).reshape(1, 2)
    cand0 = stats.__wrapped__ if False else None
    act = (is0m[IS_ACTIVE] > 0).reshape(n_groups, _R, 128)
    cand, _ = cull_j(
        g4(fs0m[FS_O:FS_O + 3]), g4(fs0m[FS_D:FS_D + 3]), act,
        jnp.float32(cfg.max_ray_travel), tbl.aabb_lo, tbl.aabb_hi,
        kslots=kslots)
    fs1, is1, sh, hitb = bc._kernel_a_call(
        scal, cand, fs0m, is0m, tbl.mat_rows, tbl.light_rows, tbl.env_rows,
        None, None, tbl.blocks, key, kslots, tbl.n_lights, tbl.tr, True,
        interpret=False)

    of = fs1[FS_O:FS_O + 3].reshape(3, npad)
    df = fs1[FS_D:FS_D + 3].reshape(3, npad)
    a1 = is1[IS_ACTIVE].reshape(npad) > 0
    print("bounce1 active:", int(np.asarray(a1.sum())))
    slo = jnp.min(tbl.aabb_lo, axis=0)
    sext = jnp.maximum(jnp.max(tbl.aabb_hi, axis=0) - slo, 1e-6)

    q = jnp.clip(((of - slo[:, None]) / sext[:, None]) * 63.0,
                 0.0, 63.0).astype(jnp.int32)
    cell18 = (_spread6(q[0]) << 2) | (_spread6(q[1]) << 1) | _spread6(q[2])
    octant = ((df[0] > 0).astype(jnp.int32)
              | ((df[1] > 0).astype(jnp.int32) << 1)
              | ((df[2] > 0).astype(jnp.int32) << 2))
    # finer direction bits: 2 bits per component of |d| ranking? use
    # quantized direction on the octant cube face
    ax = jnp.abs(df)
    # dominant axis (0..2)
    dom = jnp.argmax(ax, axis=0)
    q2 = jnp.clip(((of - slo[:, None]) / sext[:, None]) * 31.0,
                  0.0, 31.0).astype(jnp.int32)

    def spread5(v):
        v = (v | (v << 8)) & 0x00F00F
        v = (v | (v << 4)) & 0x0C30C3
        v = (v | (v << 2)) & 0x249249
        return v
    cell15 = (spread5(q2[0]) << 2) | (spread5(q2[1]) << 1) | spread5(q2[2])

    variants = {
        "b1 cur (cell18,oct lo)": (cell18 << 3) | octant,
        "b1 oct-hi, cell18": (octant << 18) | cell18,
        "b1 oct+dom hi, cell15": (((octant << 2) | dom) << 15) | cell15,
        "b1 dom+oct hi, cell18": (((dom << 3) | octant) << 18) | cell18,
    }
    for tag, k2 in variants.items():
        kk = jnp.where(a1, k2, jnp.int32(2 ** 30))
        order = jnp.argsort(kk)
        fsp = jnp.take(fs1.reshape(NF, npad).T, order, axis=0).T.reshape(
            NF, nrows, 128)
        isp = jnp.take(is1.reshape(NI, npad).T, order, axis=0).T.reshape(
            NI, nrows, 128)
        stats(tag, fsp, isp)


if __name__ == "__main__":
    main()
