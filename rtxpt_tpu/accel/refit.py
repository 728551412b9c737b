"""Device-side BVH refit for animated/skinned geometry.

The TPU analog of per-frame BLAS *update* vs rebuild (reference:
Sample.cpp:1170-1198 UpdateSkinnedBLASs — update when the topology is
unchanged, rebuild otherwise). A full host rebuild re-flattens + re-sorts
(~57 ms @ 200k tris, docs/PERF_NOTES.md); a refit keeps the Karras
topology (preorder + miss links) and only repropagates AABBs bottom-up —
a handful of fused jnp passes entirely on device.

The threaded preorder layout needs no extra builder output: for an
internal node i, its left child is i+1 (preorder) and its right child is
miss[i+1] (the left subtree's skip edge lands exactly on its sibling), so
the child table and node heights derive from (node_prim, node_miss) alone.
Bottom-up propagation runs one masked pass per tree level; levels are
whole-array ops so XLA fuses each pass into 2 gathers + selects.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from rtxpt_tpu.accel.bvh import ThreadedBVH

_AABB_EPS = 1e-7


@struct.dataclass
class RefitTables:
    """Static per-topology schedule (host-built once per build)."""

    children: jnp.ndarray    # [M,2] i32; -1 for leaves
    height: jnp.ndarray      # [M] i32 distance-to-deepest-leaf
    levels: int = struct.field(pytree_node=False, default=0)


def build_refit_tables(bvh: ThreadedBVH) -> RefitTables:
    """Derive children + heights from the preorder/miss-link arrays."""
    prim = np.asarray(bvh.node_prim)
    miss = np.asarray(bvh.node_miss)
    m = len(prim)
    internal = prim < 0
    left = np.where(internal, np.arange(m, dtype=np.int64) + 1, -1)
    right = np.where(internal, miss[np.clip(left, 0, m - 1)], -1)
    # heights by fixed point: children are strictly deeper in preorder, so
    # each pass finalizes one more level from the leaves up.
    h = np.zeros(m, np.int64)
    li = np.clip(left, 0, m - 1)
    ri = np.clip(right, 0, m - 1)
    for _ in range(m):
        hn = np.where(internal, 1 + np.maximum(h[li], h[ri]), 0)
        if np.array_equal(hn, h):
            break
        h = hn
    children = np.stack([left, right], axis=1).astype(np.int32)
    return RefitTables(children=jnp.asarray(children),
                       height=jnp.asarray(h.astype(np.int32)),
                       levels=int(h.max(initial=0)))


def refit_bvh(bvh: ThreadedBVH, tables: RefitTables,
              positions, indices) -> ThreadedBVH:
    """Repropagate AABBs + repack triangles for moved vertices (pure jnp;
    jit-safe). Topology (prim order, miss links) is unchanged."""
    positions = jnp.asarray(positions)
    indices = jnp.asarray(indices)
    tri = jnp.take(indices, bvh.prim_tri, axis=0)        # [T,3]
    v0 = jnp.take(positions, tri[:, 0], axis=0)
    v1 = jnp.take(positions, tri[:, 1], axis=0)
    v2 = jnp.take(positions, tri[:, 2], axis=0)
    e1 = v1 - v0
    e2 = v2 - v0

    tmin = jnp.minimum(jnp.minimum(v0, v1), v2) - _AABB_EPS
    tmax = jnp.maximum(jnp.maximum(v0, v1), v2) + _AABB_EPS

    prim = bvh.node_prim
    is_leaf = prim >= 0
    pidx = jnp.maximum(prim, 0)
    nmin = jnp.where(is_leaf[:, None], jnp.take(tmin, pidx, axis=0),
                     jnp.zeros_like(bvh.node_min))
    nmax = jnp.where(is_leaf[:, None], jnp.take(tmax, pidx, axis=0),
                     jnp.zeros_like(bvh.node_max))

    li = jnp.maximum(tables.children[:, 0], 0)
    ri = jnp.maximum(tables.children[:, 1], 0)
    for lvl in range(1, tables.levels + 1):
        upd = (tables.height == lvl)[:, None]
        cmin = jnp.minimum(jnp.take(nmin, li, axis=0),
                           jnp.take(nmin, ri, axis=0))
        cmax = jnp.maximum(jnp.take(nmax, li, axis=0),
                           jnp.take(nmax, ri, axis=0))
        nmin = jnp.where(upd, cmin, nmin)
        nmax = jnp.where(upd, cmax, nmax)

    nodes = jnp.concatenate([
        nmin, nmax,
        bvh.nodes[:, 6:8],                               # prim, miss links
        jnp.take(v0, pidx, axis=0) * is_leaf[:, None],
        jnp.take(e1, pidx, axis=0) * is_leaf[:, None],
        jnp.take(e2, pidx, axis=0) * is_leaf[:, None],
    ], axis=1)

    brute = bvh.brute
    if brute is not None:
        # Rebuild the MXU brute operands in ORIGINAL triangle order (the
        # brute path returns original prim ids), pure jnp. The cached
        # Pallas rhs table is host-packed, so the refit drops it (the
        # opt-in kernel falls back to the XLA matmul formulation).
        v0o = jnp.take(positions, indices[:, 0], axis=0)
        e1o = jnp.take(positions, indices[:, 1], axis=0) - v0o
        e2o = jnp.take(positions, indices[:, 2], axis=0) - v0o
        no = jnp.cross(e1o, e2o)
        brute = brute.replace(
            e1_t=e1o.T, e2_t=e2o.T, n_t=no.T,
            v0xe2_t=jnp.cross(v0o, e2o).T,
            v0xe1_t=jnp.cross(v0o, e1o).T,
            v0n=jnp.sum(v0o * no, axis=-1),
            pallas_rhs=None)
    return bvh.replace(nodes=nodes, brute=brute,
                       node_min=nmin, node_max=nmax,
                       tri_v0=v0, tri_e1=e1, tri_e2=e2)
