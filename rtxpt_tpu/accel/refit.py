"""Device-side BVH refit for animated/skinned geometry.

The TPU analog of per-frame BLAS *update* vs rebuild (reference:
Sample.cpp:1170-1198 UpdateSkinnedBLASs — update when the topology is
unchanged, rebuild otherwise). A full host rebuild re-flattens + re-sorts
(~57 ms @ 200k tris, docs/PERF_NOTES.md); a refit keeps the Karras
topology (preorder + miss links) and only recomputes AABBs on device.

TPU-first formulation: per-node bottom-up propagation would serialize
~tree-height dependent passes of random gathers (measured 85 ms @ 70k
tris). Instead, every node of a preorder-threaded LBVH covers a
CONTIGUOUS range of packed triangles, so node AABBs are range-min/max
queries over the packed triangle AABB array — answered with a sparse
table (log2 T doubling levels built by SHIFTED elementwise min/max, no
gathers) plus exactly ONE static-index gather pair per node:

    node_min[i] = min(L_k[s_i], L_k[e_i - 2^k]),  k = floor(log2(e_i-s_i))

All ranges/levels are static per topology (RefitTables), so XLA sees
constant-index gathers grouped by level.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax.numpy as jnp
from flax import struct

from rtxpt_tpu.accel.bvh import ThreadedBVH

_AABB_EPS = 1e-7


@struct.dataclass
class RefitTables:
    """Static per-topology schedule (host-built once per build).

    level_nodes[k]: node ids whose range size falls in [2^k, 2^(k+1));
    level_lo[k]/level_hi_idx[k]: the two range-query positions per node.
    Stored as a tuple of numpy arrays (static jit constants).
    """

    levels: Tuple = struct.field(pytree_node=False, default=())

    @property
    def n_levels(self) -> int:
        return len(self.levels)


def derive_children(bvh: ThreadedBVH) -> np.ndarray:
    """[M,2] children from the preorder+miss layout (left = i+1,
    right = miss[i+1]); -1 for leaves. Used by tests and the range
    derivation below."""
    prim = np.asarray(bvh.node_prim)
    miss = np.asarray(bvh.node_miss)
    m = len(prim)
    internal = prim < 0
    left = np.where(internal, np.arange(m, dtype=np.int64) + 1, -1)
    right = np.where(internal, miss[np.clip(left, 0, m - 1)], -1)
    return np.stack([left, right], axis=1).astype(np.int32)


def build_refit_tables(bvh: ThreadedBVH) -> RefitTables:
    """Derive each node's contiguous packed-triangle range and group
    nodes by range-size level. Fully vectorized: a node's SUBTREE is the
    contiguous preorder index range [i, miss[i] or M), so the prim range
    is a range-min/max over the node-prim array — answered with a host
    sparse table (no per-node python loop)."""
    prim = np.asarray(bvh.node_prim).astype(np.int64)
    miss = np.asarray(bvh.node_miss).astype(np.int64)
    m = len(prim)
    end = np.where(miss >= 0, miss, m)

    INF = np.int64(1 << 60)
    plo = np.where(prim >= 0, prim, INF)
    phi = np.where(prim >= 0, prim, -INF)
    tlo = [plo]
    thi = [phi]
    k = 1
    while (1 << k) <= m:
        s_ = 1 << (k - 1)
        a = tlo[-1]
        b = np.concatenate([a[s_:], np.full(s_, INF, np.int64)])
        tlo.append(np.minimum(a, b))
        a = thi[-1]
        b = np.concatenate([a[s_:], np.full(s_, -INF, np.int64)])
        thi.append(np.maximum(a, b))
        k += 1
    idx = np.arange(m, dtype=np.int64)
    span = np.maximum(end - idx, 1)
    kk = np.floor(np.log2(span)).astype(np.int64)
    q2 = end - (1 << kk)
    lo = np.minimum(tlo_at(tlo, kk, idx), tlo_at(tlo, kk, q2))
    hi = np.maximum(tlo_at(thi, kk, idx), tlo_at(thi, kk, q2)) + 1

    size = hi - lo
    klev = np.maximum(
        np.floor(np.log2(np.maximum(size, 1))).astype(np.int64), 0)
    levels = []
    for kv in range(int(klev.max()) + 1):
        nodes = np.nonzero(klev == kv)[0].astype(np.int32)
        if len(nodes) == 0:
            levels.append(None)
            continue
        q1 = lo[nodes].astype(np.int32)
        q2v = (hi[nodes] - (1 << kv)).astype(np.int32)
        levels.append((nodes, q1, q2v))
    # static inverse permutation: answers computed level-major map back
    # to node order with ONE take (TPU scatters are slow)
    order = np.concatenate([lv[0] for lv in levels if lv is not None])
    inv = np.empty(m, np.int64)
    inv[order] = np.arange(len(order))
    return RefitTables(levels=tuple(levels) + ((inv.astype(np.int32),),))


def tlo_at(tables, kk, pos):
    """tables[kk[i]][pos[i]] for vectorized per-element level select."""
    out = np.empty(len(pos), np.int64)
    for k in range(len(tables)):
        m_ = kk == k
        if m_.any():
            out[m_] = tables[k][pos[m_]]
    return out


def refit_bvh(bvh: ThreadedBVH, tables: RefitTables,
              positions, indices) -> ThreadedBVH:
    """Recompute AABBs + repack triangles for moved vertices (pure jnp;
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

    # sparse table: level k halves computed by shifted elementwise min
    t = tmin.shape[0]
    mins: List[jnp.ndarray] = [tmin]
    maxs: List[jnp.ndarray] = [tmax]
    for k in range(1, len(tables.levels) - 1):
        s = 1 << (k - 1)
        prev_n, prev_x = mins[-1], maxs[-1]
        if s < t:
            shifted_n = jnp.concatenate(
                [prev_n[s:], jnp.full((s, 3), jnp.inf)], axis=0)
            shifted_x = jnp.concatenate(
                [prev_x[s:], jnp.full((s, 3), -jnp.inf)], axis=0)
            mins.append(jnp.minimum(prev_n, shifted_n))
            maxs.append(jnp.maximum(prev_x, shifted_x))
        else:
            mins.append(prev_n)
            maxs.append(prev_x)

    lv_levels = tables.levels[:-1]
    (inv,) = tables.levels[-1]
    parts_n = []
    parts_x = []
    for k, lv in enumerate(lv_levels):
        if lv is None:
            continue
        nodes, q1, q2 = lv
        parts_n.append(jnp.minimum(jnp.take(mins[k], q1, axis=0),
                                   jnp.take(mins[k], q2, axis=0)))
        parts_x.append(jnp.maximum(jnp.take(maxs[k], q1, axis=0),
                                   jnp.take(maxs[k], q2, axis=0)))
    nmin = jnp.take(jnp.concatenate(parts_n, axis=0), inv, axis=0)
    nmax = jnp.take(jnp.concatenate(parts_x, axis=0), inv, axis=0)

    prim = bvh.node_prim
    is_leaf = prim >= 0
    pidx = jnp.maximum(prim, 0)
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
