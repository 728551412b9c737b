"""Experiment: treelet (radix-tree cut) clusters vs fixed Morton runs.

The clustered tier cuts the Morton-sorted triangle array into fixed
CT=128 runs; runs that straddle geometry (end of one building, start of
the next street) get elongated AABBs that inflate every group's
candidate list. A Karras radix tree over the same Morton codes implies
a hierarchy whose subtrees are CONTIGUOUS ranges; cutting it into
maximal subtrees of <=CT triangles yields variable-length clusters that
respect geometric boundaries — same block machinery (ranges stay
contiguous), tighter boxes.

Measures: cluster count, total AABB surface area, and the cull's
per-group candidate stats on the real bounce-0 wavefront, old vs new.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def radix_cut_clusters(codes: np.ndarray, max_size: int):
    """Cut the implicit binary radix tree over sorted 30-bit Morton codes
    into maximal subtrees of <= max_size leaves. Returns [K+1] offsets."""
    n = len(codes)
    cuts = []

    # iterative stack of (lo, hi, bit) half-open ranges
    stack = [(0, n, 29)]
    while stack:
        lo, hi, bit = stack.pop()
        if hi - lo <= max_size:
            cuts.append((lo, hi))
            continue
        if bit < 0:
            # identical codes beyond bit resolution: chop evenly
            for s in range(lo, hi, max_size):
                cuts.append((s, min(s + max_size, hi)))
            continue
        # first index in [lo,hi) with bit set (codes sorted ascending)
        mid = lo + int(np.searchsorted(
            (codes[lo:hi] >> bit) & 1, 1, side="left"))
        if mid == lo or mid == hi:
            stack.append((lo, hi, bit - 1))
        else:
            stack.append((mid, hi, bit - 1))
            stack.append((lo, mid, bit - 1))
    cuts.sort()
    offsets = np.array([c[0] for c in cuts] + [n], np.int64)
    return offsets


def merge_small(offsets, sa, counts, max_size, lam=1.15):
    """Greedy SAH-ish merge of adjacent clusters: merge when
    SA_u*(n1+n2) <= lam*(SA1*n1+SA2*n2) and n1+n2 <= max_size."""
    return offsets  # placeholder; measure raw cut first


def cluster_aabbs(tmin, tmax, offsets):
    k = len(offsets) - 1
    lo = np.empty((k, 3), np.float32)
    hi = np.empty((k, 3), np.float32)
    for i in range(k):
        s, e = offsets[i], offsets[i + 1]
        lo[i] = tmin[s:e].min(0)
        hi[i] = tmax[s:e].max(0)
    return lo, hi


def surf_area(lo, hi):
    d = np.maximum(hi - lo, 0)
    return 2 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 0] * d[:, 2])


def main():
    w, h = 1920, 1080
    from rtxpt_tpu.config import NEEMode, PathTracerConfig
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.pt.bounce_pallas import _R
    from rtxpt_tpu.accel.cull import cull_candidates
    from rtxpt_tpu.ops.wavefront import pixel_morton_key
    from rtxpt_tpu.pt.integrator import _pixel_grid, EFFECT_LENS, _lds
    from rtxpt_tpu.scene.camera import camera_ray
    from rtxpt_tpu.scene.procedural import city_scene, default_camera
    from rtxpt_tpu.utils import rng
    from rtxpt_tpu.accel.cluster import CT, morton_codes

    host = city_scene(tri_budget=350_000)
    sd = prepare(host)
    tbl = sd.cluster_tables
    cam = default_camera(host, w, h)

    # triangle geometry in prepared (Morton-permuted) order
    pos = np.asarray(sd.geometry.positions)
    idx = np.asarray(sd.geometry.indices)
    v0, v1, v2 = pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    cent = (v0 + v1 + v2) / 3.0
    codes = morton_codes(cent)
    # prepared order IS Morton order already; verify monotone
    mono = bool((np.diff(codes.astype(np.int64)) >= 0).all())
    print(f"codes monotone in prepared order: {mono}")
    if not mono:
        codes = np.sort(codes)

    old_lo = np.asarray(tbl.aabb_lo)
    old_hi = np.asarray(tbl.aabb_hi)
    print(f"OLD fixed runs: {len(old_lo)} clusters, "
          f"total SA {surf_area(old_lo, old_hi).sum():.3e}, "
          f"mean size {len(v0)/len(old_lo):.1f}")

    t0 = time.time()
    offsets = radix_cut_clusters(codes, CT)
    sizes = np.diff(offsets)
    nlo, nhi = cluster_aabbs(tmin, tmax, offsets)
    print(f"NEW radix cut ({time.time()-t0:.2f}s): {len(sizes)} clusters, "
          f"total SA {surf_area(nlo, nhi).sum():.3e}, "
          f"mean size {sizes.mean():.1f} p10 "
          f"{np.percentile(sizes,10):.0f} p50 {np.percentile(sizes,50):.0f}")

    # cull comparison on the real bounce-0 wavefront (Morton pixel order)
    px, py = _pixel_grid(w, h)
    n = px.shape[0]
    seed = rng.pixel_seed(px, py, 0, EFFECT_LENS)
    cfg = PathTracerConfig(max_bounces=1, nee=NEEMode.OFF)
    u1, u2 = _lds(cfg, jnp.uint32(1), seed, (0, 1))
    o, d, _ = camera_ray(cam, px, py, u1, u2)
    mkey = np.asarray(pixel_morton_key(px, py))
    order = jnp.asarray(np.argsort(mkey, kind="stable"))
    o, d = o[order], d[order]
    lanes = _R * 128
    npad = -(-max(n, lanes) // lanes) * lanes
    n_groups = npad // lanes

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((npad - n, *x.shape[1:]), fill, x.dtype)]) \
            if npad != n else x

    o3 = pad(o).T.reshape(3, n_groups, _R, 128)
    d3 = pad(d, 1.0).T.reshape(3, n_groups, _R, 128)
    act = pad(jnp.ones((n,), jnp.int32)).reshape(n_groups, _R, 128) > 0
    cull_j = jax.jit(cull_candidates, static_argnames=("kslots",))

    for name, clo, chi in [("old", old_lo, old_hi), ("new", nlo, nhi)]:
        cand, ovf = cull_j(o3, d3, act, jnp.float32(1e30),
                           jnp.asarray(clo), jnp.asarray(chi), kslots=64)
        counts = np.asarray(cand[:, 0, 0])
        print(f"cull[{name}]: cand mean={counts.mean():.1f} "
              f"p50={np.percentile(counts,50):.0f} "
              f"p90={np.percentile(counts,90):.0f} overflow={int(ovf)}")


if __name__ == "__main__":
    main()
