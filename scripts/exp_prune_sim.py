"""Simulate the clustered tier's per-row prune against ground-truth hits.

Questions answered with real city data (no kernel changes):
  * how many row-visits does the current (nearest-first, per-row bound)
    prune execute per bounce-0 row?
  * how much of that is forced by miss (sky) lanes vs committed lanes?
  * what would per-lane-granularity pruning (the unreachable ideal) cost?
  * how much would tighter clusters help (candidates whose te is beyond
    every lane's commit)?
"""

import os
import sys

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
        FS_D, FS_O, IS_ACTIVE, IS_PX, IS_PY, NF, NI, _cfg_key, _R)
    from rtxpt_tpu.accel.cull import cull_candidates
    from rtxpt_tpu.ops.wavefront import pixel_morton_key
    from rtxpt_tpu.pt.integrator import _pixel_grid, EFFECT_LENS, _lds
    from rtxpt_tpu.scene.camera import camera_ray
    from rtxpt_tpu.scene.procedural import city_scene, default_camera
    from rtxpt_tpu.utils import rng
    from rtxpt_tpu.accel.cluster import CT

    host = city_scene(tri_budget=350_000)
    sd = prepare(host)
    tbl = sd.cluster_tables
    cam = default_camera(host, w, h)
    cfg = PathTracerConfig(max_bounces=1, nee=NEEMode.OFF)
    from rtxpt_tpu.pt.dispatch import resolve
    cfg = resolve(sd, cfg)

    px, py = _pixel_grid(w, h)
    n = px.shape[0]
    sidx = jnp.uint32(1)
    seed = rng.pixel_seed(px, py, 0, EFFECT_LENS)
    u1, u2 = _lds(cfg, sidx, seed, (0, 1))
    o, d, spread = camera_ray(cam, px, py, u1, u2)

    # Morton pixel order
    mkey = np.asarray(pixel_morton_key(px, py))
    order = np.argsort(mkey, kind="stable")
    po = jnp.asarray(order)
    o, d, px2, py2 = o[po], d[po], px[po], py[po]

    lanes = _R * 128
    npad = -(-max(n, lanes) // lanes) * lanes
    nrows = npad // 128
    n_groups = nrows // _R

    def pad1(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((npad - n, *x.shape[1:]), fill, x.dtype)]) \
            if npad != n else x

    o3 = pad1(o).T.reshape(3, n_groups, _R, 128)
    d3 = pad1(d, 1.0).T.reshape(3, n_groups, _R, 128)
    act = pad1(jnp.ones((n,), jnp.int32)).reshape(n_groups, _R, 128) > 0

    kslots = 64
    cand, ovf = jax.jit(cull_candidates, static_argnames=("kslots",))(
        o3, d3, act, jnp.float32(cfg.max_ray_travel),
        tbl.aabb_lo, tbl.aabb_hi, kslots=kslots)
    cand = np.asarray(cand)

    # ground-truth hits via the XLA BVH path
    from rtxpt_tpu.accel.traverse import intersect_closest
    hit = jax.jit(lambda o, d: intersect_closest(
        sd.bvh, o, d, jnp.float32(1e-4),
        jnp.float32(cfg.max_ray_travel)))(o, d)
    t_true = np.asarray(pad1(jnp.where(hit.prim >= 0, hit.t, np.inf)))
    prim = np.asarray(pad1(hit.prim.astype(jnp.float32), -1.0)).astype(int)
    cid_true = np.where(prim >= 0, prim // CT, -1)
    print(f"miss fraction: {(prim < 0).mean():.3f}  overflow {int(ovf)}")

    t_true = t_true.reshape(n_groups, _R, 128)
    cid_true = cid_true.reshape(n_groups, _R, 128)

    counts = cand[:, 0, 0]
    ids = cand[:, 0, 1:1 + kslots]
    te_g = cand[:, 0, 1 + kslots:1 + 2 * kslots].view(np.float32)
    te_r = cand[:, 0, 1 + 2 * kslots:1 + 10 * kslots].view(
        np.float32).reshape(n_groups, kslots, _R)

    BIG = np.float32(1e30)
    row_visits = 0          # current design (per-row bound)
    lane_visits = 0         # unreachable per-lane ideal (128-lane rows still)
    commit_possible = 0     # visits where some lane's true cluster == cand
    total_slots = 0
    for g in range(n_groups):
        c = counts[g]
        total_slots += c
        best = np.where(np.isfinite(t_true[g]), BIG, BIG)  # [R,128] all BIG
        best = np.full((_R, 128), BIG, np.float32)
        for i in range(c):
            te_rows = te_r[g, i]                   # [R]
            cl = ids[g, i]
            for r in range(_R):
                bound = best[r].max()
                if te_rows[r] <= bound:
                    row_visits += 1
                    # lanes whose true winner is this cluster commit now
                    m = cid_true[g, r] == cl
                    best[r] = np.where(m, t_true[g, r], best[r])
        # per-lane ideal: lane stops once its own t is committed; a row
        # visit happens if ANY lane in the row still needs this cluster
        best2 = np.full((_R, 128), BIG, np.float32)
        for i in range(c):
            te_rows = te_r[g, i]
            cl = ids[g, i]
            for r in range(_R):
                lane_need = te_rows[r] <= best2[r]   # per-lane gate
                if lane_need.any():
                    lane_visits += 1
                    m = cid_true[g, r] == cl
                    best2[r] = np.where(m, t_true[g, r], best2[r])
        if g % 500 == 0:
            print(f"  g={g}/{n_groups}", flush=True)

    rows_total = n_groups * _R
    print(f"slots (group visits, no prune): {total_slots} "
          f"({total_slots/n_groups:.1f}/group)")
    print(f"row-visits current prune: {row_visits} "
          f"({row_visits/rows_total:.1f}/row)")
    print(f"row-visits per-lane gate: {lane_visits} "
          f"({lane_visits/rows_total:.1f}/row)")


if __name__ == "__main__":
    main()
