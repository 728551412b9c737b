"""Stage-level timing of the clustered path on the city scene (real TPU).

Splits one bounce into: cull, kernel A (intersect+shade), shadow cull,
kernel B (occlusion), wavefront sort — each timed with block_until_ready
so the round-3 throughput work (VERDICT #3: 4.5 -> >=25 Mrays/s) attacks
the actual bottleneck.

Usage: python scripts/profile_cluster_stages.py [tri_budget] [w] [h]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


_RTT = None


def _sync(out):
    # axon tunnel: block_until_ready is unreliable before the first
    # readback — force a tiny device->host transfer per leaf instead.
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def _rtt():
    global _RTT
    if _RTT is None:
        bump = jax.jit(lambda x: x + 1)
        z = bump(jnp.float32(0))
        _sync(z)
        t0 = time.perf_counter()
        for _ in range(4):
            z = bump(z)
            _sync(z)
        _RTT = (time.perf_counter() - t0) / 4
        print(f"(tunnel rtt ~{_RTT*1e3:.1f} ms)")
    return _RTT


def timed(fn, *args, n=4, **kw):
    out = fn(*args, **kw)
    _sync(out)
    rtt = _rtt()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _sync(out)
    dt = (time.perf_counter() - t0 - rtt) / n
    return out, max(dt, 1e-9)


def main():
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 350_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1080

    from rtxpt_tpu.config import NEEMode, PathTracerConfig
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.pt import bounce_clustered as bc
    from rtxpt_tpu.pt.bounce_pallas import (
        FS_D, FS_O, IS_ACTIVE, NF, NI, _cfg_key, _R)
    from rtxpt_tpu.accel.cull import cull_candidates
    from rtxpt_tpu.ops.wavefront import ray_coherence_key
    from rtxpt_tpu.pt.integrator import _pixel_grid, EFFECT_LENS, _lds
    from rtxpt_tpu.scene.camera import camera_ray
    from rtxpt_tpu.scene.procedural import city_scene, default_camera
    from rtxpt_tpu.utils import rng

    print("backend:", jax.default_backend())
    host = city_scene(tri_budget=budget)
    sd = prepare(host)
    tbl = sd.cluster_tables
    assert tbl is not None
    print(f"tris={tbl.n_tris} clusters={tbl.n_clusters}")
    cam = default_camera(host, w, h)
    cfg = PathTracerConfig(max_bounces=4, nee=NEEMode.POWER)
    from rtxpt_tpu.pt.dispatch import resolve
    cfg = resolve(sd, cfg)
    key = _cfg_key(cfg)
    kslots = min(cfg.cluster_kslots, tbl.n_clusters)

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

    fs = jnp.concatenate([
        pad1(o).T.reshape(3, nrows, 128), pad1(d, 1.0).T.reshape(3, nrows, 128),
        jnp.ones((3, nrows, 128), jnp.float32),
        jnp.zeros((3, nrows, 128), jnp.float32),
        jnp.zeros((3, nrows, 128), jnp.float32),
    ], axis=0)
    is_ = jnp.concatenate([
        pad1(jnp.ones((n,), jnp.int32)).reshape(1, nrows, 128),
        jnp.ones((1, nrows, 128), jnp.int32),
        jnp.full((2, nrows, 128), -1, jnp.int32),
        pad1(px).reshape(1, nrows, 128),
        pad1(py).reshape(1, nrows, 128),
        jnp.full((1, nrows, 128), 0x3FFFFFFF, jnp.int32),
        jnp.zeros((1, nrows, 128), jnp.int32),   # logical bounce  # budget
    ], axis=0)
    assert fs.shape[0] == NF and is_.shape[0] == NI

    g4 = lambda x3: x3.reshape(3, n_groups, _R, 128)
    act = (is_[IS_ACTIVE] > 0).reshape(n_groups, _R, 128)

    cull_j = jax.jit(cull_candidates, static_argnames=("kslots",))
    (cand, ovf), t_cull = timed(
        cull_j, g4(fs[FS_O:FS_O + 3]), g4(fs[FS_D:FS_D + 3]), act,
        jnp.float32(cfg.max_ray_travel), tbl.aabb_lo, tbl.aabb_hi,
        kslots=kslots)
    counts = np.asarray(cand[:, 0, 0])
    print(f"cull: {t_cull*1e3:.1f} ms; candidates/group: "
          f"mean={counts.mean():.1f} p50={np.percentile(counts,50):.0f} "
          f"p90={np.percentile(counts,90):.0f} max={counts.max()} "
          f"overflow={int(ovf)}")

    scal = jnp.stack([sidx, jnp.uint32(0)]).reshape(1, 2)
    (ka_out), t_ka = timed(
        bc._kernel_a_call, scal, cand, fs, is_, tbl.mat_rows,
        tbl.light_rows, tbl.env_rows, None, None, tbl.blocks,
        key, kslots, tbl.n_lights, tbl.tr, True, interpret=False)
    fs2, is2, sh, hitb = ka_out
    print(f"kernel A (bounce 0): {t_ka*1e3:.1f} ms "
          f"({npad/t_ka/1e6:.1f} Mrays/s isolated)")

    do = sh[bc.SH_DO] > 0.5
    dop = do.reshape(n_groups, _R, 128)
    (cand_s, ovf2), t_cull_s = timed(
        cull_j, g4(sh[bc.SH_O:bc.SH_O + 3]), g4(sh[bc.SH_D:bc.SH_D + 3]),
        dop, sh[bc.SH_DIST].reshape(n_groups, _R, 128),
        tbl.aabb_lo, tbl.aabb_hi, kslots=kslots)
    counts_s = np.asarray(cand_s[:, 0, 0])
    print(f"shadow cull: {t_cull_s*1e3:.1f} ms; mean cand "
          f"{counts_s.mean():.1f}")
    occ, t_kb = timed(bc._kernel_b_call, cand_s, sh, tbl.blocks, kslots,
                      interpret=False)
    print(f"kernel B (shadow): {t_kb*1e3:.1f} ms")

    # sorted bounce-1 wavefront: time kernel A on scattered rays
    slo = jnp.min(tbl.aabb_lo, axis=0)
    sext = jnp.maximum(jnp.max(tbl.aabb_hi, axis=0) - slo, 1e-6)

    @jax.jit
    def sort_wf(fs, is_):
        of = fs[FS_O:FS_O + 3].reshape(3, npad)
        df = fs[FS_D:FS_D + 3].reshape(3, npad)
        a = is_[IS_ACTIVE].reshape(npad) > 0
        k2 = ray_coherence_key(of, df, slo, sext, a)
        order = jnp.argsort(k2)
        fs2 = jnp.take(fs.reshape(NF, npad).T, order, axis=0).T.reshape(
            NF, nrows, 128)
        is2 = jnp.take(is_.reshape(NI, npad).T, order, axis=0).T.reshape(
            NI, nrows, 128)
        return fs2, is2

    (fs3, is3), t_sort = timed(sort_wf, fs2, is2)
    print(f"wavefront sort: {t_sort*1e3:.1f} ms")

    act3 = (is3[IS_ACTIVE] > 0).reshape(n_groups, _R, 128)
    nact = int(np.asarray(is3[IS_ACTIVE]).sum())
    (cand3, ovf3), t_cull3 = timed(
        cull_j, g4(fs3[FS_O:FS_O + 3]), g4(fs3[FS_D:FS_D + 3]), act3,
        jnp.float32(cfg.max_ray_travel), tbl.aabb_lo, tbl.aabb_hi,
        kslots=kslots)
    counts3 = np.asarray(cand3[:, 0, 0])
    print(f"bounce-1 cull: {t_cull3*1e3:.1f} ms; active={nact} "
          f"cand mean={counts3.mean():.1f} p90={np.percentile(counts3,90):.0f} "
          f"overflow={int(ovf3)}")
    scal1 = jnp.stack([sidx, jnp.uint32(1)]).reshape(1, 2)
    (_ka3), t_ka3 = timed(
        bc._kernel_a_call, scal1, cand3, fs3, is3, tbl.mat_rows,
        tbl.light_rows, tbl.env_rows, None, None, tbl.blocks,
        key, kslots, tbl.n_lights, tbl.tr, True, interpret=False)
    print(f"kernel A (bounce 1, sorted): {t_ka3*1e3:.1f} ms")

    per_bounce = t_cull + t_ka + t_cull_s + t_kb + t_sort
    print(f"\nest. per-bounce: {per_bounce*1e3:.1f} ms "
          f"-> 4-bounce frame ~{4*per_bounce*1e3:.0f} ms; "
          f"npad={npad}")


if __name__ == "__main__":
    main()
