"""Conservative per-ray-group cluster culling (pure XLA, runs per bounce).

Produces the per-group candidate-cluster lists the clustered bounce
kernels (pt/bounce_clustered.py) loop over with manual DMA. This is the
traversal half of the two-level scheme (accel/cluster.py): dense
interval-arithmetic slab tests on the VPU instead of per-ray pointer
chasing — the grid of (ray-row, cluster) tests is tiny (G*8 x C) compared
to the intersection work it prunes.

For each 128-ray row we take component-interval bounds of origins O and
directions D over the active lanes, then test against each cluster AABB B
with a conservative interval slab test: per axis the shifted slab is
S = [B.lo - O.hi, B.hi - O.lo] and a feasible t >= 0 with t*d in S for
some d in D gives the per-axis entry/exit bounds

  enter_a = S.lo>0: S.lo/max(D.hi,eps)   (infeasible if D.hi<=0)
            S.hi<0: S.hi/min(D.lo,-eps)  (infeasible if D.lo>=0)
            else:   0
  exit_a  = D.lo>0: S.hi/D.lo ; D.hi<0: S.lo/D.hi ; else +inf

(hit iff max_a enter <= min(min_a exit, tmax)). Exact for point intervals,
conservative (never drops a truly-hit cluster) otherwise.

Two-phase: (1) the GROUP hull beam (interval hull of the 8 row beams) is
tested against every cluster — [G,1,C], 8x less work/memory than the
row-dense form — and the k nearest candidates are selected on the hull
entry distance (the hull beam is a superset of each row beam, so nothing
any row needs can be hull-missed, and hull-enter <= row-enter makes it a
valid monotone DMA-gate bound); (2) per-row entry distances are computed
only for the k selected slots ([G,R,k]). Candidates are kept sorted by
hull enter distance and truncated to `kslots` (overflow is counted and
reported — a nonzero overflow means some rays may miss geometry; raise
kslots or sort rays for coherence).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(3e38)
_EPS = 1e-20


def _row_bounds(x, active, sign):
    """Masked per-row bounds. x [3,G,R,128], active [G,R,128] ->
    [3,G,R]."""
    if sign > 0:
        v = jnp.where(active[None], x, -_INF)
        return jnp.max(v, axis=-1)
    v = jnp.where(active[None], x, _INF)
    return jnp.min(v, axis=-1)


def _slab_chunk(olo, ohi, dlo, dhi, blo, bhi, tmax_row):
    """Interval slab test of rows vs a cluster chunk.
    olo.. [3,G,R]; blo,bhi [3,Cc]; tmax_row [G,R] -> enter [G,R,Cc] f32
    (+inf where missed)."""
    slo = blo[:, None, None, :] - ohi[..., None]    # [3,G,R,Cc]
    shi = bhi[:, None, None, :] - olo[..., None]
    dl = dlo[..., None]
    dh = dhi[..., None]

    pos = slo > 0.0
    neg = shi < 0.0
    enter = jnp.where(
        pos, jnp.where(dh > _EPS, slo / jnp.maximum(dh, _EPS), _INF),
        jnp.where(neg,
                  jnp.where(dl < -_EPS, shi / jnp.minimum(dl, -_EPS), _INF),
                  0.0))
    exit_ = jnp.where(
        dl > _EPS, shi / jnp.maximum(dl, _EPS),
        jnp.where(dh < -_EPS, slo / jnp.minimum(dh, -_EPS), _INF))
    t_en = jnp.max(enter, axis=0)                   # [G,R,Cc]
    t_ex = jnp.minimum(jnp.min(exit_, axis=0), tmax_row[..., None])
    return jnp.where(t_en <= t_ex, t_en, _INF)


def cull_candidates(o, d, active, tmax, aabb_lo, aabb_hi, kslots: int,
                    chunk: int = 512, lo=None):
    """Build per-group candidate lists.

    o,d: [3,G,R,128]; active [G,R,128] bool; tmax: scalar or [G,R,128];
    aabb_lo/hi [C,3]. Returns (cand [G,1,1+(2+R)*kslots] i32, overflow []).

    `lo` (([G] f32 enter, [G] i32 cluster-id), optional) is a per-group
    STRICT lower bound in the lexicographic (enter, id) total order:
    only clusters ordering strictly after it are candidates. The paged-
    traversal driver (pt/bounce_clustered.py) passes the previous
    page's last kept slot, so successive pages walk the entry-sorted
    cluster order without re-selecting the processed prefix. The id
    tiebreak matters: entry ties are common (every cluster AABB
    containing the ray origins enters at 0.0) and an enter-only bound
    would re-select the same k forever (lax.top_k breaks ties by lowest
    index, consistent with this order), stalling page progress.

    cand row layout: [count,
      ids x K            (sorted by group-min entry distance),
      te_group x K       (f32 bits; kernels gate the DMA stream on it),
      te_row x K*R       (f32 bits, slot-major: slot i's rows at
                          1+2K+R*i .. +R; +inf where the row's interval
                          beam misses the cluster — this both replaces
                          the old rowmask and gives each ray-row its own
                          nearest-first prune bound)].

    Positive-float bit patterns are order-preserving as int32, so the
    kernels compare these against committed-t bit patterns directly
    (Mosaic has no scalar bitcast).
    """
    G, R = o.shape[1], o.shape[2]
    C = aabb_lo.shape[0]
    olo = _row_bounds(o, active, -1)
    ohi = _row_bounds(o, active, +1)
    dlo = _row_bounds(d, active, -1)
    dhi = _row_bounds(d, active, +1)
    if jnp.ndim(tmax) == 0:
        tmax_row = jnp.full((G, R), tmax, jnp.float32)
    else:
        tmax_row = jnp.max(jnp.where(active, tmax, -_INF), axis=-1)
    row_any = jnp.any(active, axis=-1)              # [G,R]
    tmax_row = jnp.where(row_any, tmax_row, -_INF)  # empty row: never hits

    # Phase 1: GROUP-hull beam vs every cluster ([G,1,C] — R times less
    # work/memory than the row-dense form; the hull beam is a superset of
    # each row beam, so hull-enter <= every row-enter and nothing a row
    # needs can be hull-missed). Slot order and the kernels' monotone DMA
    # gate both ride the hull-enter value.
    g_olo = jnp.min(jnp.where(row_any[None], olo, _INF), 2, keepdims=True)
    g_ohi = jnp.max(jnp.where(row_any[None], ohi, -_INF), 2, keepdims=True)
    g_dlo = jnp.min(jnp.where(row_any[None], dlo, _INF), 2, keepdims=True)
    g_dhi = jnp.max(jnp.where(row_any[None], dhi, -_INF), 2, keepdims=True)
    g_tmax = jnp.max(tmax_row, axis=1, keepdims=True)

    blo = aabb_lo.T                                  # [3,C]
    bhi = aabb_hi.T
    enters = []
    for c0 in range(0, C, chunk):
        c1 = min(c0 + chunk, C)
        enters.append(_slab_chunk(g_olo, g_ohi, g_dlo, g_dhi,
                                  blo[:, c0:c1], bhi[:, c0:c1], g_tmax))
    enter_g = jnp.concatenate(enters, axis=-1)[:, 0]  # [G,C]
    if lo is not None:
        lo_e, lo_i = lo
        cid = jnp.arange(C, dtype=jnp.int32)[None, :]
        after = (enter_g > lo_e[:, None]) | (
            (enter_g == lo_e[:, None]) & (cid > lo_i[:, None]))
        enter_g = jnp.where(after, enter_g, _INF)
    hit_g = enter_g < _INF

    k = min(kslots, C)
    neg, idx = jax.lax.top_k(-enter_g, k)            # nearest-first
    ids = idx.astype(jnp.int32)                      # [G,k]
    sel_hit = (-neg) < _INF
    count = jnp.sum(sel_hit.astype(jnp.int32), axis=-1)          # [G]
    total = jnp.sum(hit_g.astype(jnp.int32), axis=-1)
    overflow = jnp.sum(jnp.maximum(total - count, 0))
    te = jnp.take_along_axis(enter_g, ids, axis=1)
    te_bits = jax.lax.bitcast_convert_type(te, jnp.int32)

    # Phase 2: exact per-row entry distances, only for the k selected
    # slots ([G,R,k] with per-group gathered boxes).
    sblo = jnp.take(aabb_lo, ids, axis=0)            # [G,k,3]
    sbhi = jnp.take(aabb_hi, ids, axis=0)
    slo = jnp.transpose(sblo, (2, 0, 1))[:, :, None, :] - ohi[..., None]
    shi = jnp.transpose(sbhi, (2, 0, 1))[:, :, None, :] - olo[..., None]
    dl = dlo[..., None]
    dh = dhi[..., None]
    pos = slo > 0.0
    negm = shi < 0.0
    r_enter = jnp.where(
        pos, jnp.where(dh > _EPS, slo / jnp.maximum(dh, _EPS), _INF),
        jnp.where(negm,
                  jnp.where(dl < -_EPS, shi / jnp.minimum(dl, -_EPS), _INF),
                  0.0))
    r_exit = jnp.where(
        dl > _EPS, shi / jnp.maximum(dl, _EPS),
        jnp.where(dh < -_EPS, slo / jnp.minimum(dh, -_EPS), _INF))
    t_en = jnp.max(r_enter, axis=0)                  # [G,R,k]
    t_ex = jnp.minimum(jnp.min(r_exit, axis=0), tmax_row[..., None])
    te_row = jnp.where(t_en <= t_ex, t_en, _INF)
    te_row_bits = jax.lax.bitcast_convert_type(te_row, jnp.int32)
    te_row_bits = jnp.transpose(te_row_bits, (0, 2, 1)).reshape(G, k * R)
    if k < kslots:
        padk = kslots - k
        ids = jnp.pad(ids, ((0, 0), (0, padk)))
        te_bits = jnp.pad(te_bits, ((0, 0), (0, padk)))
        te_row_bits = jnp.pad(te_row_bits, ((0, 0), (0, padk * R)))
    cand = jnp.concatenate([count[:, None], ids, te_bits, te_row_bits],
                           axis=1)
    return cand[:, None, :].astype(jnp.int32), overflow
