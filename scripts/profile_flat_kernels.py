"""Time the flat all-rows clustered kernels (A1/A2/B1) on the city scene
on real TPU, against the round-3 per-row kernels A/B.

Usage: python scripts/profile_flat_kernels.py [tri_budget] [w] [h]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from profile_cluster_stages import timed, _sync  # noqa: E402


def main():
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 350_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1080

    from rtxpt_tpu.config import NEEMode, PathTracerConfig
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.pt import bounce_clustered as bc
    from rtxpt_tpu.pt import wide as W
    from rtxpt_tpu.pt.bounce_pallas import (
        FS_D, FS_O, IS_ACTIVE, NF, NI, _cfg_key, _R)
    from rtxpt_tpu.accel.cull import cull_candidates
    from rtxpt_tpu.pt.dispatch import resolve
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
    cfg = resolve(sd, PathTracerConfig(max_bounces=4, nee=NEEMode.POWER))
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
        pad1(o).T.reshape(3, nrows, 128),
        pad1(d, 1.0).T.reshape(3, nrows, 128),
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
        jnp.zeros((1, nrows, 128), jnp.int32),   # logical bounce
    ], axis=0)
    assert fs.shape[0] == NF and is_.shape[0] == NI

    g4 = lambda x3: x3.reshape(3, n_groups, _R, 128)
    act = (is_[IS_ACTIVE] > 0).reshape(n_groups, _R, 128)

    cull_j = jax.jit(cull_candidates, static_argnames=("kslots",))
    (cand, ovf), t_cull = timed(
        cull_j, g4(fs[FS_O:FS_O + 3]), g4(fs[FS_D:FS_D + 3]), act,
        jnp.float32(cfg.max_ray_travel), tbl.aabb_lo, tbl.aabb_hi,
        kslots=kslots)
    print(f"cull: {t_cull*1e3:.1f} ms, overflow={int(ovf)}")
    scal = jnp.stack([sidx, jnp.uint32(0)]).reshape(1, 2)

    @jax.jit
    def build_od(fs, is_):
        of = fs[FS_O:FS_O + 3].reshape(3, npad)
        df = fs[FS_D:FS_D + 3].reshape(3, npad)
        od = jnp.concatenate([
            df, W.cross3(of, df), of,
            (is_[IS_ACTIVE] > 0).reshape(1, npad).astype(jnp.float32)],
            axis=0)
        return bc._to_flat_groups(od, n_groups)

    od, t_od = timed(build_od, fs, is_)
    print(f"od build: {t_od*1e3:.1f} ms")

    ha, t_a1 = timed(bc._kernel_a1_call, cand, od, tbl.blocks, kslots,
                     float(cfg.max_ray_travel), noprune=False,
                     interpret=False)
    print(f"kernel A1 (bounce 0): {t_a1*1e3:.1f} ms "
          f"({npad/t_a1/1e6:.1f} Mrays/s isolated)")

    @jax.jit
    def reshape_ha(ha):
        return bc._from_flat_groups(ha, bc.HA_ROWS, nrows)

    ha_t, t_hr = timed(reshape_ha, ha)
    print(f"ha reshape: {t_hr*1e3:.1f} ms")

    (ka2), t_a2 = timed(
        bc._kernel_a2_call, scal, ha_t, fs, is_, tbl.mat_rows,
        tbl.light_rows, tbl.env_rows, None, None,
        key, tbl.n_lights, tbl.tr, True, interpret=False)
    fs2, is2, sh, hitb = ka2[0], ka2[1], ka2[2], ka2[3]
    print(f"kernel A2 (shade): {t_a2*1e3:.1f} ms")

    # old kernel A for comparison
    (ka_old), t_ka = timed(
        bc._kernel_a_call, scal, cand, fs, is_, tbl.mat_rows,
        tbl.light_rows, tbl.env_rows, None, None, tbl.blocks,
        key, kslots, tbl.n_lights, tbl.tr, True, interpret=False)
    print(f"old kernel A: {t_ka*1e3:.1f} ms   "
          f"flat total {1e3*(t_od+t_a1+t_hr+t_a2):.1f} ms")

    do = sh[bc.SH_DO] > 0.5
    dop = do.reshape(n_groups, _R, 128)
    (cand_s, ovf2), t_cs = timed(
        cull_j, g4(sh[bc.SH_O:bc.SH_O + 3]), g4(sh[bc.SH_D:bc.SH_D + 3]),
        dop, sh[bc.SH_DIST].reshape(n_groups, _R, 128),
        tbl.aabb_lo, tbl.aabb_hi, kslots=kslots)

    @jax.jit
    def sh_flat_f(sh):
        return bc._to_flat_groups(sh.reshape(bc.SH_ROWS, npad), n_groups)

    sh_f, t_shf = timed(sh_flat_f, sh)
    occ, t_b1 = timed(bc._kernel_b1_call, cand_s, sh_f, tbl.blocks, kslots,
                      interpret=False)
    print(f"kernel B1 (flat shadow): {t_b1*1e3:.1f} ms (+{t_shf*1e3:.1f} "
          "reshape)")
    occ_o, t_kb = timed(bc._kernel_b_call, cand_s, sh, tbl.blocks, kslots,
                        interpret=False)
    print(f"old kernel B: {t_kb*1e3:.1f} ms")
    print("occ parity:", float(jnp.max(jnp.abs(
        occ.reshape(nrows, 128) - occ_o))))

    # sorted bounce-1 A1 (the expensive case)
    from rtxpt_tpu.ops.wavefront import ray_coherence_key
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
    act3 = (is3[IS_ACTIVE] > 0).reshape(n_groups, _R, 128)
    (cand3, ovf3), t_c3 = timed(
        cull_j, g4(fs3[FS_O:FS_O + 3]), g4(fs3[FS_D:FS_D + 3]), act3,
        jnp.float32(cfg.max_ray_travel), tbl.aabb_lo, tbl.aabb_hi,
        kslots=kslots)
    od3, _ = timed(build_od, fs3, is3)
    ha3, t_a1b = timed(bc._kernel_a1_call, cand3, od3, tbl.blocks, kslots,
                       float(cfg.max_ray_travel), noprune=False,
                       interpret=False)
    print(f"kernel A1 (bounce 1, sorted): {t_a1b*1e3:.1f} ms")
    scal1 = jnp.stack([sidx, jnp.uint32(1)]).reshape(1, 2)
    (_ka3), t_ka3 = timed(
        bc._kernel_a_call, scal1, cand3, fs3, is3, tbl.mat_rows,
        tbl.light_rows, tbl.env_rows, None, None, tbl.blocks,
        key, kslots, tbl.n_lights, tbl.tr, True, interpret=False)
    print(f"old kernel A (bounce 1): {t_ka3*1e3:.1f} ms")


if __name__ == "__main__":
    main()
