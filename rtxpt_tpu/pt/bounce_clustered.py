"""Clustered fused bounce kernels for LARGE scenes (Pallas TPU).

Extends the fused-bounce design of pt/bounce_pallas.py past its
VMEM-resident triangle cap by streaming Morton-ordered triangle clusters
(accel/cluster.py) from HBM with manual double-buffered DMA, guided by
per-ray-group candidate lists built in XLA each bounce (accel/cull.py).
This is the TPU redesign of DXR TLAS/BLAS traversal for Bistro-scale
scenes (reference: Rtxpt/Shaders/PathTracerBridgeDonut.hlsli:996,1034).

Per bounce, two kernels ride the wavefront (the XLA glue between them is
elementwise only):

  kernel A (closest hit + shade):
    for each candidate cluster (nearest-first): DMA its 64 KB block,
    ONE bf16-pass [16,512]x[16,128] MXU matmul per 128-ray row yields
    det|u|v|t for all (ray,tri) pairs in CLUSTER-LOCAL coordinates
    (conservative edge margins — bf16 only *selects* the winner);
    the winner's attribute columns arrive via a one-hot [27,128]@[128,128]
    matmul and the per-ray best (t, cluster, attrs) lives in VMEM scratch.
    After the loop the winner hit is REFIT in exact f32 from its
    v0/e1/e2 rows, then the shared shading body
    (bounce_pallas.surface_and_shade: volume absorption, emissive MIS,
    NEE light sample + BSDF eval, scatter sample, RR) runs in-kernel;
    the NEE shadow ray is emitted as output channels.

  kernel B (shadow occlusion):
    same candidate loop over the shadow rays' own culled lists, any-hit
    only (no margins, no refit); XLA adds contrib * ~occluded to L.

Eligibility mirrors bounce_pallas (<=128 materials/lights, no envmap
light, no textures/alpha) with the triangle cap lifted to
accel.cluster.MAX_CLUSTERS * CT.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtxpt_tpu.accel import cluster as CL
from rtxpt_tpu.accel.cluster import CT
from rtxpt_tpu.accel.cull import cull_candidates
from rtxpt_tpu.pt import bounce_pallas as bp
from rtxpt_tpu.pt import wide as W
from rtxpt_tpu.utils import rng
from rtxpt_tpu.pt.bounce_pallas import (
    _BIG, _R, FS_D, FS_L, FS_O, FS_PREVPDF, FS_THP, IS_ACTIVE, IS_MED0,
    IS_MED1, IS_PREVDELTA, IS_PX, IS_PY, NF, NI, _cfg_key, _interpret,
    _round_up, surface_and_shade)

# Clustered-tier block height (ray rows per kernel block). Wider blocks
# amortize each candidate cluster's VMEM DMA over more rays (the kernel
# is DMA-bound: profile_cluster_stages shows ~15.5 KB of cluster bytes
# per ray at R=8) at the cost of a wider cull hull (slightly more
# candidates per group). Read ONCE at import — never at trace time — so
# the jit cache key (operand shapes) always owns the decision.
_R = int(os.environ.get("RTXPT_TPU_CLUSTER_R", str(_R)))

# Split-bf16-pass conservative margins (relative to |det|); the exact
# refit re-tests the winner so these only need to prevent FALSE NEGATIVES
# at shared edges. Margin-admitted candidates tie on t with the true hit
# on the OTHER side of a shared edge (same plane), so the selection ranks
# strictly-inside candidates ahead of margin-only ones (_TIE_BUMP) — see
# the shared-diagonal crack note in tests/test_cluster.py.
MARGIN = 2e-3
_TIE_BUMP = 1e-4
# Refit acceptance margin (barycentric units), with clamping: a winner
# within this band is kept as an edge hit rather than dropped (dropping
# would crack the mesh; keeping fattens silhouettes by <=0.1% of a tri).
REFIT_EPS = 1e-3
# Extra any-hit backoff absorbing the split-bf16 t rounding (~1e-5..1e-4
# relative in bad magnitude ratios); systematic origin-offset shortening
# is already handled upstream (offset-aware sdist in surface_and_shade).
SHADOW_T_EPS = 2e-4

# shadow-request output channels
SH_O = 0          # 0:3 shadow origin
SH_D = 3          # 3:6 direction
SH_DIST = 6
SH_CONTRIB = 7    # 7:10
SH_DO = 10
SH_CDIFF = 11     # 11:14 diffuse-channel part of contrib (split mode)
SH_UA = 14        # stochastic-alpha uniform (OMM unknown-cell shadows)
SH_ROWS = 15

# ---- flat all-rows tier (round 4) -----------------------------------------
# The per-row kernel uses only K=32 of the MXU's 128 contraction rows and
# pays per-row branch/selection overhead 8x per visit. The flat tier
# instead processes the WHOLE group as one [*, FL=R*128] lane vector:
# XLA prebuilds the global-coordinate ray operand rows once per bounce
# (reshaping [R,128] tiles to flat lanes is free in XLA, impossible in
# Mosaic), and the kernel applies the cluster-center correction + split-
# bf16 per visit elementwise, preserving the cluster-local numerics
# exactly. One [32,4CT]x[32,FL] MXU pass per visit replaces 8 row
# matmuls, and the winner-attribute gather contracts over the full
# K=CT=128. Intersection (A1) and shading (A2) split into two kernels:
# A1's flat results cross through HBM and XLA reshapes them back to
# [R,128] tiles for the VPU-efficient shading body.
_FL = _R * 128

# A1 ray-operand input rows (XLA-prebuilt, global coordinates)
OD_D = 0          # 0:3 direction
OD_OXD = 3        # 3:6 o x d
OD_O = 6          # 6:9 origin
OD_ACT = 9        # active mask (gates the prune bound)
OD_ROWS = 10

# A1 -> A2 hit/attribute rows (flat [HA_ROWS, G, FL])
HA_T = 0          # closest t (_BIG = miss)
HA_U = 1
HA_V = 2
HA_FRONT = 3      # winner det (refit-exact); >0 = front face
HA_PRIM = 4       # global triangle index (-1 = miss)
HA_ATTR = 5       # + bp.AT_ROWS logical attribute rows (bp.AT_* order)
HA_UNK = HA_ATTR + bp.AT_ROWS   # winner micro-cell is UNKNOWN (OMM)
HA_INST = HA_UNK + 1            # winner instance id (instanced; -1 miss)
HA_ROWS = HA_INST + 1

# A1 best-winner scratch rows [_BF_ROWS, FL]
_BF_T = 0
_BF_ATTR = 1                      # 1 .. 1+CL.AT_ROWS
_BF_CEN = 1 + CL.AT_ROWS          # 3 rows: cluster center
_BF_UNK = _BF_CEN + 3             # winner micro-cell UNKNOWN flag (OMM)
_BF_OD = _BF_UNK + 1              # 3 rows: winner OBJECT-space d (inst)
_BF_OO = _BF_OD + 3               # 3 rows: winner object-space o
_BF_IID = _BF_OO + 3              # winner instance id (f32-exact i32)
_BF_ROWS = _round_up(_BF_IID + 1, 8)


def _lane_tile(x, reps):
    """Broadcast a replicated [1,128] row to [1, reps*128] lanes."""
    return jnp.concatenate([x] * reps, axis=1)


def _flat_cols(od, cx, cy, cz):
    """[32, FL] split-bf16 cluster-local ray operand for the whole group.
    Identical math to _row_cols, vectorized over all R*128 lanes: the
    global operand rows are shifted into cluster-local coordinates
    (o' = o - c, (o x d)' = o x d - c x d) and THEN split, so rounding
    error scales with the cluster extent exactly as in the per-row
    kernel. cx/cy/cz are [1, FL] replicated center components."""
    f32 = jnp.float32
    d0 = od[OD_D:OD_D + 1]
    d1 = od[OD_D + 1:OD_D + 2]
    d2 = od[OD_D + 2:OD_D + 3]
    cxd0 = cy * d2 - cz * d1
    cxd1 = cz * d0 - cx * d2
    cxd2 = cx * d1 - cy * d0
    zero = jnp.zeros((1, _FL), f32)
    corr = jnp.concatenate(
        [zero, zero, zero, cxd0, cxd1, cxd2, cx, cy, cz, zero],
        axis=0)                                              # [10,FL]
    op = jnp.concatenate(
        [od[0:9], jnp.ones((1, _FL), f32)], axis=0) - corr
    hi = op.astype(jnp.bfloat16).astype(f32)
    lo = op - hi
    return jnp.concatenate(
        [hi, lo, hi, jnp.zeros((2, _FL), f32)], axis=0)


def _flat_center(cur):
    """Cluster-center components as replicated [1, FL] rows."""
    cr = CL.CENTER_ROW
    reps = _FL // 128
    cx = _lane_tile(cur[cr:cr + 1, 0:128], reps)
    cy = _lane_tile(cur[cr:cr + 1, CT:CT + 128], reps)
    cz = _lane_tile(cur[cr:cr + 1, 2 * CT:2 * CT + 128], reps)
    return cx, cy, cz


def _xform_od(od, xf):
    """World -> object ray-operand rows for one instanced visit.

    `xf` [16,128] is the candidate instance's transform tile
    (accel/cluster.py ClusterTables.xf: X[i,j] = M10[j,i]); one
    [16,128]x[16,FL] MXU pass maps the world [d, oxd, o, 1] rows to the
    instance's object frame. HIGHEST precision is load-bearing: the
    operands are GLOBAL world coordinates (the cluster-local shift
    happens after, in _flat_cols), so a bf16-pass product would inject
    O(2^-8 * scene extent) error ahead of the split-bf16 machinery whose
    whole design keeps error at O(2^-17 * cluster extent). The t
    parameter is preserved because the object direction stays
    unnormalized (x_o(t) = A^-1(o + t d) + t_o = o_o + t d_o).
    Returns [10, FL] (rows 0:9 = object d|oxd|o, row 9 ~= 1)."""
    f32 = jnp.float32
    base = jnp.concatenate(
        [od[0:9], jnp.ones((1, _FL), f32), jnp.zeros((6, _FL), f32)],
        axis=0)                                      # [16, FL]
    prod = jax.lax.dot_general(
        xf, base, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=f32)                  # [128, FL]
    return prod[0:10]


# Micro-cell edge guard band (cell units): the split-bf16 (u,v) carry
# ~MARGIN-scale error, so a decisive TRANSPARENT verdict within this
# band of a cell boundary could flip vs the exact state — with a huge
# per-path consequence (a light path killed or a solid surface passed).
# Near-edge candidates are never decisively rejected; they resolve as
# UNKNOWN (shade-time texture test / stochastic shadow coverage).
_EDGE4 = 4.0 * 4.0 * MARGIN


def _micro_state_guarded(wlo, whi, u, v):
    """(state, near_edge) at bf16-precision barycentrics."""
    uu = u * 4.0
    vv = v * 4.0
    a = jnp.minimum(jnp.floor(uu), 3.0)
    b = jnp.minimum(jnp.floor(vv), 3.0)
    du = uu - a
    dv = vv - b
    near = ((du < _EDGE4) | (du > 1.0 - _EDGE4)
            | (dv < _EDGE4) | (dv > 1.0 - _EDGE4)
            | (jnp.abs(du + dv - 1.0) < _EDGE4))
    return bp._micro_state(wlo, whi, u, v), near


def _kernel_a1(*refs, kslots, max_travel, noprune, omm=False,
               instanced=False):
    """Flat closest-hit kernel: candidate loop + split-bf16 selection over
    all R*128 lanes at once, exact f32 refit of the winner, logical
    attribute rows out. No shading (kernel A2). With omm blocks,
    micro-TRANSPARENT candidates are rejected during selection and the
    winner's UNKNOWN state is exported (HA_UNK) for the shade-time
    texture alpha test (bounce_pallas surface_and_shade pass-through).
    With instanced tables, each visit DMAs the candidate's instance
    transform tile alongside its block, re-bases the ray into the
    prototype's object frame (_xform_od) and the refit runs on the
    winner's saved object ray; the winner instance id is exported
    (HA_INST) for the XLA attribute post-transform."""
    if instanced:
        (cand_ref, od_ref, blocks_hbm, xf_hbm, ha_out,
         buf0, buf1, bufx0, bufx1, best_ref, flag_ref,
         sem0, sem1, semx0, semx1) = refs
        xfs = (xf_hbm, bufx0, bufx1, semx0, semx1)
    else:
        (cand_ref, od_ref, blocks_hbm, ha_out,
         buf0, buf1, best_ref, flag_ref, sem0, sem1) = refs
        xfs = None
    f32 = jnp.float32
    slots = CL.OMM_SLOTS if omm else 4
    od = od_ref[0]                                   # [OD_ROWS, FL]
    act = od[OD_ACT:OD_ACT + 1] > 0.5                # [1,FL]

    best_ref[:] = jnp.concatenate(
        [jnp.full((1, _FL), _BIG, f32),
         jnp.zeros((_BF_ROWS - 1, _FL), f32)], axis=0)

    def _bound_bits():
        bt = best_ref[_BF_T:_BF_T + 1, :]
        bound = jnp.where(act, bt, 0.0)
        return jnp.max(jax.lax.bitcast_convert_type(bound, jnp.int32))

    def alive(i):
        if noprune:
            return cand_ref[0, 0, 0] > 0
        t_en_bits = cand_ref[0, 0, 1 + kslots
                             + jnp.minimum(i, kslots - 1)]
        return t_en_bits <= _bound_bits()

    def visit(i, cur, curx=None):
        amat = _attr_mat(cur, slots)                 # [AT_ROWS, CT]
        cx, cy, cz = _flat_center(cur)
        if instanced:
            od_v = _xform_od(od, curx)               # object-frame rows
        else:
            od_v = od
        cols = _flat_cols(od_v, cx, cy, cz)          # [32, FL]
        q = _quantities(cur, cols, omm=omm)          # [CT, FL] each
        det, un, vn, tn = q[0], q[1], q[2], q[3]
        s = jnp.where(det >= 0.0, 1.0, -1.0)
        absd = det * s
        su = un * s
        sv = vn * s
        st = tn * s
        mm = MARGIN * absd
        valid = ((absd > 1e-30) & (su >= -mm) & (sv >= -mm)
                 & (su + sv <= absd + mm + mm)
                 & (st > 0.0) & (st < max_travel * absd))
        strict = (su >= 0.0) & (sv >= 0.0) & (su + sv <= absd)
        inv_d = 1.0 / jnp.maximum(absd, 1e-30)
        tt = st * inv_d
        tt = tt * jnp.where(strict, 1.0, 1.0 + _TIE_BUMP)
        if omm:
            state, near = _micro_state_guarded(
                q[4], q[5],
                jnp.clip(su * inv_d, 0.0, 1.0),
                jnp.clip(sv * inv_d, 0.0, 1.0))
            valid = valid & ((state != bp.MICRO_TRANSPARENT) | near)
            unk_c = ((state == bp.MICRO_UNKNOWN) | near).astype(f32)
        t_m = jnp.where(valid, tt, _BIG)
        t_c = jnp.min(t_m, axis=0, keepdims=True)    # [1,FL]
        b = best_ref[:]
        improved = t_c < b[_BF_T:_BF_T + 1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (CT, _FL), 0)
        jrow = jnp.min(jnp.where(t_m <= t_c, iota, CT), axis=0,
                       keepdims=True)
        sel = (iota == jrow).astype(f32)             # [CT, FL]
        # winner-attribute gather as ONE default-precision MXU pass:
        # 3-way bf16 split of the attrs (hi/mid/lo, ~2^-25 relative —
        # integer id rows exact to 24 bits) stacked into [3*AT_ROWS, CT]
        # <= 128 rows. sel is exactly {0,1} (bf16-exact), so each pass
        # product is exact; HIGHEST here cost 6 full MXU passes (the
        # dominant A1 matmul cost, round-4 profile).
        a_hi = amat.astype(jnp.bfloat16).astype(f32)
        a_r = amat - a_hi
        a_mid = a_r.astype(jnp.bfloat16).astype(f32)
        a_lo = a_r - a_mid
        attr3 = jax.lax.dot_general(
            jnp.concatenate([a_hi, a_mid, a_lo], axis=0), sel,
            (((1,), (0,)), ((), ())),
            preferred_element_type=f32)              # [3*AT_ROWS, FL]
        na = CL.AT_ROWS
        attr_c = (attr3[0:na] + attr3[na:2 * na]) + attr3[2 * na:3 * na]
        unk_w = (jnp.sum(sel * unk_c, axis=0, keepdims=True) if omm
                 else jnp.zeros((1, _FL), f32))
        parts = [t_c, attr_c, cx, cy, cz, unk_w]
        if instanced:
            # the refit must run on the WINNER's object ray + id
            iid = cand_ref[0, 0, _cand_inst_base(kslots)
                           + jnp.minimum(i, kslots - 1)]
            parts += [od_v[OD_D:OD_D + 3], od_v[OD_O:OD_O + 3],
                      jnp.full((1, _FL), iid.astype(f32))]
        used = 5 + CL.AT_ROWS + (7 if instanced else 0)
        new = jnp.concatenate(
            parts + [jnp.zeros((_BF_ROWS - used, _FL), f32)], axis=0)
        best_ref[:] = jnp.where(improved, new, b)

    _candidate_loop(cand_ref, blocks_hbm, buf0, buf1, sem0, sem1,
                    kslots, visit, flag_ref, alive, xf=xfs)

    # ----- exact f32 refit of the winner (all lanes at once) -----
    b = best_ref[:]
    had = b[_BF_T:_BF_T + 1] < _BIG
    a0 = _BF_ATTR

    def row3(i):
        return jnp.stack([b[i:i + 1], b[i + 1:i + 2], b[i + 2:i + 3]],
                         axis=0)                     # [3,1,FL]

    v0 = row3(a0 + CL.AT_V0)
    e1 = row3(a0 + CL.AT_E1)
    e2 = row3(a0 + CL.AT_E2)
    cen = row3(_BF_CEN)
    if instanced:
        # v0/e1/e2 are prototype-object-space: refit on the winner's
        # saved object ray (t stays the world parameter — see _xform_od)
        ocl = row3(_BF_OO) - cen
        dr = row3(_BF_OD)
    else:
        ocl = jnp.stack([od[OD_O:OD_O + 1], od[OD_O + 1:OD_O + 2],
                         od[OD_O + 2:OD_O + 3]], axis=0) - cen
        dr = jnp.stack([od[OD_D:OD_D + 1], od[OD_D + 1:OD_D + 2],
                        od[OD_D + 2:OD_D + 3]], axis=0)
    pvec = W.cross3(dr, e2)
    detx = W.dot3(e1, pvec)
    ok = jnp.abs(detx) > 1e-30
    inv = jnp.where(ok, 1.0 / jnp.where(ok, detx, 1.0), 0.0)
    tvec = ocl - v0
    u = W.dot3(tvec, pvec) * inv
    qvec = W.cross3(tvec, e1)
    v = W.dot3(dr, qvec) * inv
    tx = W.dot3(e2, qvec) * inv
    exact_ok = (ok & (u >= -REFIT_EPS) & (v >= -REFIT_EPS)
                & (u + v <= 1.0 + REFIT_EPS)
                & (tx > 0.0) & (tx < max_travel))
    isvalid = b[a0 + CL.AT_VALID:a0 + CL.AT_VALID + 1] > 0.5
    hitr = had & exact_ok & isvalid
    u = jnp.clip(u, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0)
    scale = 1.0 / jnp.maximum(u + v, 1.0)
    u = u * scale
    v = v * scale
    gidx = b[a0 + CL.AT_GIDX:a0 + CL.AT_GIDX + 1]
    attr_rows = [jnp.zeros((1, _FL), f32)] * bp.AT_ROWS
    for bp_i, cl_i in _ATTR_ROW_MAP.items():
        attr_rows[bp_i] = b[a0 + cl_i:a0 + cl_i + 1]
    unk_row = jnp.where(hitr, b[_BF_UNK:_BF_UNK + 1], 0.0)
    inst_row = (jnp.where(hitr, b[_BF_IID:_BF_IID + 1], -1.0)
                if instanced else jnp.full((1, _FL), -1.0, f32))
    ha_out[0] = jnp.concatenate(
        [jnp.where(hitr, tx, _BIG), u, v,
         jnp.where(hitr, detx, -1.0),
         jnp.where(hitr, gidx, -1.0)] + attr_rows
        + [unk_row, inst_row], axis=0)


def _kernel_b1(cand_ref, sh_ref, blocks_hbm, occ_out,
               buf0, buf1, flag_ref, sem0, sem1, *, kslots, omm=False):
    """Flat any-hit over the shadow rays' candidate lists. With omm,
    micro-TRANSPARENT candidates never occlude and UNKNOWN cells occlude
    STOCHASTICALLY against the baked coverage (SH_UA per-ray uniform —
    same resolve as the fused tier's _occluded_group)."""
    _kernel_b1_body(cand_ref, sh_ref, blocks_hbm, occ_out,
                    buf0, buf1, flag_ref, sem0, sem1,
                    kslots=kslots, omm=omm, xfs=None)


def _kernel_b1_inst(cand_ref, sh_ref, blocks_hbm, xf_hbm, occ_out,
                    buf0, buf1, bufx0, bufx1, flag_ref,
                    sem0, sem1, semx0, semx1, *, kslots, omm=False):
    """Instanced variant of _kernel_b1: per-visit instance-transform DMA
    + object-frame ray re-basing (_xform_od)."""
    _kernel_b1_body(cand_ref, sh_ref, blocks_hbm, occ_out,
                    buf0, buf1, flag_ref, sem0, sem1,
                    kslots=kslots, omm=omm,
                    xfs=(xf_hbm, bufx0, bufx1, semx0, semx1))


def _kernel_b1_body(cand_ref, sh_ref, blocks_hbm, occ_out,
                    buf0, buf1, flag_ref, sem0, sem1, *, kslots, omm,
                    xfs):
    sh = sh_ref[0]                                   # [SH_ROWS, FL]
    dist = sh[SH_DIST:SH_DIST + 1] * (1.0 - SHADOW_T_EPS)
    occ_out[0] = jnp.where(sh[SH_DO:SH_DO + 1] > 0.5, 0.0, 1.0)
    ua = sh[SH_UA:SH_UA + 1]
    oxd = W.cross3(sh[SH_O:SH_O + 3], sh[SH_D:SH_D + 3])
    od = jnp.concatenate([
        sh[SH_D:SH_D + 3], oxd, sh[SH_O:SH_O + 3],
        jnp.zeros((1, _FL), jnp.float32)], axis=0)   # [OD_ROWS, FL]

    def alive(i):
        return jnp.max(1.0 - occ_out[0]) > 0.5

    def visit(i, cur, curx=None):
        cx, cy, cz = _flat_center(cur)
        od_v = _xform_od(od, curx) if xfs is not None else od
        cols = _flat_cols(od_v, cx, cy, cz)
        q = _quantities(cur, cols, omm=omm)
        det, un, vn, tn = q[0], q[1], q[2], q[3]
        s = jnp.where(det >= 0.0, 1.0, -1.0)
        absd = det * s
        su = un * s
        sv = vn * s
        st = tn * s
        valid = ((absd > 1e-30) & (su >= 0.0) & (sv >= 0.0)
                 & (su + sv <= absd)
                 & (st > 0.0) & (st < dist * absd))
        if omm:
            inv_d = 1.0 / jnp.maximum(absd, 1e-30)
            state, near = _micro_state_guarded(
                q[4], q[5],
                jnp.clip(su * inv_d, 0.0, 1.0),
                jnp.clip(sv * inv_d, 0.0, 1.0))
            cov = q[6]
            unkb = (state == bp.MICRO_UNKNOWN) | near
            valid = valid & ((state != bp.MICRO_TRANSPARENT) | near) \
                & (~unkb | (ua < cov))
        occ_v = jnp.max(valid.astype(jnp.float32), axis=0, keepdims=True)
        occ_out[0] = jnp.maximum(occ_out[0], occ_v)

    _candidate_loop(cand_ref, blocks_hbm, buf0, buf1, sem0, sem1,
                    kslots, visit, flag_ref, alive, xf=xfs)


def _kernel_a2(*refs, cfg_key, n_lights, tr, first_emissive,
               has_env, has_tex, tex_maps, final_env=False,
               prio=False, maxb=None, omm=False):
    """Shading kernel over A1's reshaped hit/attribute tiles: the
    surface_and_shade body on [R,128] VPU tiles (exactly the per-row
    kernel's post-loop half, with the intersection results provided)."""
    f32 = jnp.float32
    split_ch_k = cfg_key[9]
    it = iter(refs)
    scal_ref = next(it)
    ha_ref = next(it)
    fs_ref = next(it)
    is_ref = next(it)
    fs2_ref = next(it) if split_ch_k else None
    mat_ref = next(it)
    light_ref = next(it)
    env_ref = next(it) if has_env else None
    tex_ct_ref = next(it) if has_tex else None
    tex_meta_ref = next(it) if has_tex else None
    fs_out = next(it)
    is_out = next(it)
    sh_out = next(it)
    hit_out = next(it)
    ext_nee = cfg_key[0] in (3, 4, 5) and n_lights > 0 and not final_env
    surf_out = next(it) if ext_nee else None
    fs2_out = next(it) if split_ch_k else None
    max_travel = cfg_key[5]
    sample_idx = scal_ref[0, 0]
    bounce = scal_ref[0, 1].astype(jnp.int32)

    fs = fs_ref[:]
    is_ = is_ref[:]
    fs2 = fs2_ref[:] if split_ch_k else None
    ha = ha_ref[:]
    o = fs[FS_O:FS_O + 3]
    d = fs[FS_D:FS_D + 3]
    t = ha[HA_T]
    bu = ha[HA_U]
    bv = ha[HA_V]
    prim_f = ha[HA_PRIM]
    hit = t < _BIG
    front = ha[HA_FRONT] > 0.0

    def attr(i, k=1):
        if k == 1:
            return ha[HA_ATTR + i]
        return ha[HA_ATTR + i:HA_ATTR + i + k]

    if final_env:
        nee_mode_ = cfg_key[0]
        enable_mis_ = cfg_key[1]
        use_nee_ = nee_mode_ in (1, 2) and n_lights > 0
        active_in = is_[IS_ACTIVE] > 0
        prev_delta_in = is_[IS_PREVDELTA] > 0
        miss_mask = active_in & ~hit
        L = fs[bp.FS_L:bp.FS_L + 3]
        env_L, p_env = bp._env_eval_pdf(
            env_ref, d, nee_mode_ == 1, n_lights,
            with_pdf=use_nee_ and bool(enable_mis_))
        if use_nee_ and enable_mis_:
            w_env = jnp.where(prev_delta_in, 1.0,
                              W.power_heuristic(fs[FS_PREVPDF], p_env))
        else:
            w_env = jnp.ones_like(t)
        c_env = jnp.where(miss_mask,
                          fs[FS_THP:FS_THP + 3] * env_L * w_env, 0.0)
        L = L + c_env
        fs_out[:] = jnp.concatenate([fs[:FS_L], L, fs[FS_L + 3:]], axis=0)
        is_out[:] = jnp.concatenate(
            [jnp.zeros((1, _R, 128), jnp.int32), is_[1:]], axis=0)
        sh_out[:] = jnp.zeros((SH_ROWS, _R, 128), f32)
        hit_out[:] = jnp.stack(
            [jnp.where(hit, t, 0.0), prim_f, bu, bv,
             front.astype(f32), jnp.zeros_like(t)], axis=0)
        if split_ch_k:
            cd = jnp.where(fs2[6:7] > 0.5, 0.0, c_env)
            fs2_out[:] = jnp.concatenate(
                [fs2[0:3] + cd, fs2[3:6] + (c_env - cd), fs2[6:7]],
                axis=0)
        return

    s = surface_and_shade(
        o=o, d=d, t=t, hit=hit, front=front, bu=bu, bv=bv, attr=attr,
        thp=fs[FS_THP:FS_THP + 3], L=fs[bp.FS_L:bp.FS_L + 3],
        prev_pdf=fs[FS_PREVPDF], active=is_[IS_ACTIVE] > 0,
        prev_delta=is_[IS_PREVDELTA] > 0,
        med0=is_[IS_MED0], med1=is_[IS_MED1],
        px=is_[IS_PX], py=is_[IS_PY], sample_idx=sample_idx, bounce=bounce,
        mat_ref=mat_ref, light_ref=light_ref, cfg_key=cfg_key,
        n_lights=n_lights, first_emissive=first_emissive,
        env_ref=env_ref,
        tex_refs=((tex_ct_ref, tex_meta_ref, tr) if has_tex else None),
        tex_maps=tex_maps,
        cone=fs[bp.FS_CONE], spread=fs[bp.FS_SPREAD],
        budget=is_[bp.IS_BUDGET],
        ld=(fs2[0:3] if split_ch_k else None),
        ls=(fs2[3:6] if split_ch_k else None),
        fspec=(fs2[6] if split_ch_k else None),
        lbounce=is_[bp.IS_LBOUNCE], maxb=maxb, prio=prio,
        omm_unknown=(ha[HA_UNK] if omm else None))

    fs_out[:] = jnp.concatenate(
        [s["o_new"], s["wi_world"], s["thp"], s["L"], s["prev_pdf"][None],
         s["cone"][None], s["spread"][None]],
        axis=0)
    is_out[:] = jnp.stack(
        [s["active"].astype(jnp.int32), s["prev_delta"].astype(jnp.int32),
         s["med0"], s["med1"], is_[IS_PX], is_[IS_PY],
         is_[bp.IS_BUDGET], s["lbounce"]], axis=0)
    ua_row = (s["u_alpha"][None] if omm and s.get("u_alpha") is not None
              else jnp.zeros((1, _R, 128), f32))
    sh_out[:] = jnp.concatenate(
        [s["shadow_o"], s["shadow_d"], s["sdist"][None], s["contrib"],
         s["do_nee"].astype(f32)[None], s["cdiff"], ua_row], axis=0)
    # flag row: ext-NEE consumes shaded/lb0 (1 = lb==0, 2 = lb>0);
    # the in-kernel NEE path reads do_nee
    if ext_nee:
        flag = s["shaded"].astype(f32) \
            * (1.0 + (is_[bp.IS_LBOUNCE] > 0).astype(f32))
    else:
        flag = s["do_nee"].astype(f32)
    hit_out[:] = jnp.stack(
        [jnp.where(hit, t, 0.0), prim_f, bu, bv,
         front.astype(f32), flag], axis=0)
    if split_ch_k:
        fs2_out[:] = jnp.concatenate(
            [s["ld"], s["ls"], s["fspec"][None]], axis=0)

# best-hit scratch row map ([R, _B_ROWS, 128]: one tile per ray-row)
_B_T = 0
_B_CID = 1
_B_ATTR = 2                      # 2 .. 2+CL.AT_ROWS
_B_CEN = 2 + CL.AT_ROWS          # 3 rows: cluster center
_B_ROWS = _round_up(2 + CL.AT_ROWS + 3, 8)

# bounce_pallas logical attr index -> cluster-table attr row
_ATTR_MAP = {bp.AT_N0: CL.AT_N0, bp.AT_N1: CL.AT_N1, bp.AT_N2: CL.AT_N2,
             bp.AT_GN: CL.AT_GN, bp.AT_MID: CL.AT_MID,
             bp.AT_LPDF: CL.AT_LPDF, bp.AT_LAREA: CL.AT_LAREA,
             bp.AT_ISLIGHT: CL.AT_ISLIGHT, bp.AT_LODB: CL.AT_LODB,
             bp.AT_LID: CL.AT_LID, bp.AT_TANG: CL.AT_TANG,
             bp.AT_TSGN: CL.AT_TSGN}
for _j in range(2):
    _ATTR_MAP[bp.AT_UV0 + _j] = CL.AT_UV0 + _j
    _ATTR_MAP[bp.AT_UV1 + _j] = CL.AT_UV1 + _j
    _ATTR_MAP[bp.AT_UV2 + _j] = CL.AT_UV2 + _j

# Row-level map (every bp attr ROW -> cluster attr row): _ATTR_MAP holds
# only the BASE row of 3-wide attributes (attr(i, k) reads k consecutive
# rows on both sides), so expand the vector entries here.
_ATTR_ROW_MAP = dict(_ATTR_MAP)
for _base in (bp.AT_N0, bp.AT_N1, bp.AT_N2, bp.AT_GN, bp.AT_TANG):
    for _j in range(1, 3):
        _ATTR_ROW_MAP[_base + _j] = _ATTR_MAP[_base] + _j


def default_kslots() -> int:
    return int(os.environ.get("RTXPT_TPU_CLUSTER_KSLOTS", "64"))


# ----- sort-carry packing (wavefront sort operand diet) -----
# The XLA sort's cost scales with its operand count (every payload row
# rides the full sorting network), so the per-lane int state packs into
# two u32 words around the sort. Field widths: active 1 | prevdelta 1 |
# lbounce 6 | med0+1 8 | med1+1 8 (w0); px 12 | py 12 | budget 8 (w1).
# px/py cap at 4095 (<= 4K frames); budget saturates at 254 with the
# _NO_BUDGET sentinel mapping to 255 (bounce budgets are <= max_bounces
# in practice).
_U32 = jnp.uint32


def _pack_is2(flat_is):
    u = flat_is.astype(jnp.int32).astype(_U32)
    w0 = ((u[IS_ACTIVE] & 1) | ((u[IS_PREVDELTA] & 1) << 1)
          | ((u[bp.IS_LBOUNCE] & 63) << 2)
          | (((flat_is[IS_MED0] + 1).astype(_U32) & 255) << 8)
          | (((flat_is[IS_MED1] + 1).astype(_U32) & 255) << 16))
    bud = jnp.minimum(flat_is[bp.IS_BUDGET], 255).astype(_U32)
    w1 = (u[IS_PX] & 4095) | ((u[IS_PY] & 4095) << 12) | (bud << 24)
    return w0, w1


def _unpack_is2(w0, w1):
    i32 = jnp.int32
    bud = (w1 >> 24).astype(i32)
    return jnp.stack([
        (w0 & 1).astype(i32),
        ((w0 >> 1) & 1).astype(i32),
        ((w0 >> 8) & 255).astype(i32) - 1,
        ((w0 >> 16) & 255).astype(i32) - 1,
        (w1 & 4095).astype(i32),
        ((w1 >> 12) & 4095).astype(i32),
        jnp.where(bud >= 255, jnp.int32(bp._NO_BUDGET), bud),
        ((w0 >> 2) & 63).astype(i32),
    ])


def _pack_bf16_pair(a, b):
    """Two f32 rows -> one u32 row (bf16 halves; ~2^-8 relative)."""
    ah = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16).astype(_U32)
    bh = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.uint16).astype(_U32)
    return ah | (bh << 16)


def _unpack_bf16_pair(w):
    a = jax.lax.bitcast_convert_type(
        (w & 0xFFFF).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(
        (w >> 16).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
    return a, b


def _dma(cand_ref, blocks_hbm, slot, buf, sem, kslots):
    c = cand_ref[0, 0, 1 + jnp.minimum(slot, kslots - 1)]
    return pltpu.make_async_copy(blocks_hbm.at[c], buf, sem)


def _cand_inst_base(kslots):
    """Start of the appended per-slot instance-id section of a cand row
    (instanced tier; trace_paths_clustered appends it after te_row)."""
    return 1 + (2 + _R) * kslots


def _dma_xf(cand_ref, xf_hbm, slot, buf, sem, kslots):
    iid = cand_ref[0, 0, _cand_inst_base(kslots)
                   + jnp.minimum(slot, kslots - 1)]
    return pltpu.make_async_copy(xf_hbm.at[iid], buf, sem)


def _candidate_loop(cand_ref, blocks_hbm, buf0, buf1, sem0, sem1,
                    kslots, visit, flag_ref, alive=None, xf=None):
    """Double-buffered nearest-first candidate loop; `visit(i, cur)` runs
    with the cluster block VALUE in VMEM for every slot whose DMA was
    started.

    `alive(i)` is a scalar-bool prune predicate evaluated ONCE per slot,
    right before its DMA would start (so a pruned slot costs neither HBM
    bandwidth nor compute). It must be MONOTONE: once false for slot i it
    stays false for all later slots (candidates are sorted by entry
    distance and prune bounds only shrink). `flag_ref` is SMEM (1,2) i32
    scratch recording the per-parity start decision so the wait/visit at
    step i agrees with the decision taken at step i-1."""
    count = cand_ref[0, 0, 0]
    if alive is None:
        alive = lambda i: True
    if xf is not None:
        xf_hbm, bufx0, bufx1, semx0, semx1 = xf

    def start(slot, buf, sem, bufx, semx):
        _dma(cand_ref, blocks_hbm, slot, buf, sem, kslots).start()
        if xf is not None:
            _dma_xf(cand_ref, xf_hbm, slot, bufx, semx, kslots).start()

    a0 = (count > 0) & alive(0)
    flag_ref[0, 0] = a0.astype(jnp.int32)
    flag_ref[0, 1] = 0

    @pl.when(a0)
    def _():
        start(0, buf0, sem0, bufx0 if xf is not None else None,
              semx0 if xf is not None else None)

    def step(i, cur, curs, nxt, nxts, curx, curxs, nxtx, nxtxs):
        started = flag_ref[0, jax.lax.rem(i, 2)] > 0

        @pl.when(started)
        def _():
            _dma(cand_ref, blocks_hbm, i, cur, curs, kslots).wait()
            if xf is None:
                visit(i, cur[:])
            else:
                _dma_xf(cand_ref, xf_hbm, i, curx, curxs, kslots).wait()
                visit(i, cur[:], curx[:])

        nxt_alive = started & (i + 1 < count) & alive(i + 1)
        flag_ref[0, jax.lax.rem(i + 1, 2)] = nxt_alive.astype(jnp.int32)

        @pl.when(nxt_alive)
        def _():
            start(i + 1, nxt, nxts, nxtx, nxtxs)

    none4 = (None, None, None, None)

    def body(i, carry):
        jax.lax.cond(
            i % 2 == 0,
            lambda: step(i, buf0, sem0, buf1, sem1,
                         *((bufx0, semx0, bufx1, semx1)
                           if xf is not None else none4)),
            lambda: step(i, buf1, sem1, buf0, sem0,
                         *((bufx1, semx1, bufx0, semx0)
                           if xf is not None else none4)))
        return carry

    jax.lax.fori_loop(0, kslots, body, 0)


def _attr_mat(cur, slots=4):
    """Unpack the logical attribute rows [AT_ROWS, CT] from a block.
    `slots` = quantity lanes per physical row (OMM_SLOTS for OMM
    blocks)."""
    ab = CL.ATTR_BASE
    return jnp.concatenate([
        cur[ab + j // slots:ab + 1 + j // slots,
            (j % slots) * CT:(j % slots + 1) * CT]
        for j in range(CL.AT_ROWS)], axis=0)


def _bf16_split(x):
    """(hi, lo) with hi = bf16-exact part of x (elementwise, in-kernel)."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _row_cols(o, d, r, cx, cy, cz):
    """[32,128] split-bf16 cluster-local ray operand for ray-row r:
    rows 0..9 r_hi, 10..19 r_lo, 20..29 r_hi again, 30..31 zero — paired
    with the block's stacked [c_hi; c_hi; c_lo] contraction (see
    accel/cluster.py split-bf16 note)."""
    f32 = jnp.float32
    ox = o[0][r:r + 1] - cx
    oy = o[1][r:r + 1] - cy
    oz = o[2][r:r + 1] - cz
    dx = d[0][r:r + 1]
    dy = d[1][r:r + 1]
    dz = d[2][r:r + 1]
    cxd0 = oy * dz - oz * dy
    cxd1 = oz * dx - ox * dz
    cxd2 = ox * dy - oy * dx
    rvec = jnp.concatenate(
        [dx, dy, dz, cxd0, cxd1, cxd2, ox, oy, oz,
         jnp.ones((1, 128), f32)], axis=0)           # [10,128]
    r_hi, r_lo = _bf16_split(rvec)
    return jnp.concatenate(
        [r_hi, r_lo, r_hi, jnp.zeros((2, 128), f32)], axis=0)


def _quantities(cur, cols, omm=False):
    """Split-bf16 intersection quantities for one (row, cluster) visit:
    one K=32 MXU pass computes c_hi*r_hi + c_hi*r_lo + c_lo*r_hi in f32
    accumulation (~2^-17 relative error — bf16 speed, f32-class quality).
    Returns det,u_num,v_num,t_num as [CT,128] (tris x rays); with omm
    blocks, also mm_lo, mm_hi (EXACT 16-bit ints: the split residual of
    a 16-bit int is itself bf16-exact) and cov — see accel/cluster.py
    OMM_SLOTS."""
    lanes = cur.shape[-1]
    chi = cur[0:10, :]
    clo = cur[10:20, :]
    cstack = jnp.concatenate(
        [chi, chi, clo, jnp.zeros((2, lanes), jnp.float32)], axis=0)
    prod = jax.lax.dot_general(
        cstack, cols, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # DEFAULT precision
    out = (prod[0:CT], prod[CT:2 * CT], prod[2 * CT:3 * CT],
           prod[3 * CT:4 * CT])
    if omm:
        out = out + (prod[4 * CT:5 * CT], prod[5 * CT:6 * CT],
                     prod[6 * CT:7 * CT])
    return out


def _kernel_a(*refs,
              cfg_key, kslots, n_lights, tr, first_emissive,
              has_env, has_tex, tex_maps, final_env=False):
    f32 = jnp.float32
    it = iter(refs)
    scal_ref = next(it)
    cand_ref = next(it)
    fs_ref = next(it)
    is_ref = next(it)
    mat_ref = next(it)
    light_ref = next(it)
    env_ref = next(it) if has_env else None
    tex_ct_ref = next(it) if has_tex else None
    tex_meta_ref = next(it) if has_tex else None
    blocks_hbm = next(it)
    fs_out = next(it)
    is_out = next(it)
    sh_out = next(it)
    hit_out = next(it)
    buf0 = next(it)
    buf1 = next(it)
    best_ref = next(it)
    flag_ref = next(it)
    sem0 = next(it)
    sem1 = next(it)
    max_travel = cfg_key[5]
    sample_idx = scal_ref[0, 0]
    bounce = scal_ref[0, 1].astype(jnp.int32)

    fs = fs_ref[:]
    is_ = is_ref[:]
    o = fs[FS_O:FS_O + 3]
    d = fs[FS_D:FS_D + 3]
    act = is_[IS_ACTIVE] > 0                         # [R,128]

    # reset persistent scratch for this grid step
    init = jnp.concatenate(
        [jnp.full((1, 128), _BIG, f32),
         jnp.zeros((_B_ROWS - 1, 128), f32)], axis=0)
    for r in range(_R):
        best_ref[r] = init

    noprune = cfg_key[8]

    def _row_bound_bits(r):
        # Worst committed t over the row's live lanes, as an int32 bit
        # pattern (positive-float bits are order-preserving; Mosaic has
        # no scalar bitcast). Dead lanes don't gate (0.0 -> bits 0).
        bt = best_ref[r, _B_T:_B_T + 1, :]
        bound = jnp.where(act[r:r + 1], bt, 0.0)
        return jnp.max(jax.lax.bitcast_convert_type(bound, jnp.int32))

    def alive(i):
        # DMA/visit gate: candidates arrive sorted by group-min entry
        # distance; once every live ray has committed a nearer hit the
        # remaining (farther) clusters cannot matter -- and their blocks
        # are not even fetched.
        if noprune:
            return cand_ref[0, 0, 0] > 0
        bb = _row_bound_bits(0)
        for r in range(1, _R):
            bb = jnp.maximum(bb, _row_bound_bits(r))
        t_en_bits = cand_ref[0, 0, 1 + kslots
                             + jnp.minimum(i, kslots - 1)]
        return t_en_bits <= bb

    def visit(i, cur):
        amat = _attr_mat(cur)                        # [AT_ROWS,128]
        cr = CL.CENTER_ROW
        cx = cur[cr:cr + 1, 0:128]
        cy = cur[cr:cr + 1, 128:256]
        cz = cur[cr:cr + 1, 256:384]
        c_f = cand_ref[0, 0, 1 + jnp.minimum(i, kslots - 1)].astype(f32)
        cidv = jnp.full((1, 128), 0.0, f32) + c_f
        te_base = 1 + 2 * kslots + _R * jnp.minimum(i, kslots - 1)
        for r in range(_R):
            # Per-row gate: the row's own conservative entry distance
            # (from the cull) vs the row's worst committed t; +inf when
            # the row's beam misses the cluster entirely (replacing the
            # old rowmask), so geometric misses and individually retired
            # rows both skip the matmul.
            te_r = cand_ref[0, 0, te_base + r]
            if noprune:
                row_on = te_r < jnp.int32(0x7F800000)
            else:
                row_on = te_r <= _row_bound_bits(r)

            @pl.when(row_on)
            def _(r=r):
                _visit_row(r, cur, amat, cx, cy, cz, cidv)

    def _visit_row(r, cur, amat, cx, cy, cz, cidv):
        if True:
            cols = _row_cols(o, d, r, cx, cy, cz)
            det, un, vn, tn = _quantities(cur, cols)
            s = jnp.where(det >= 0.0, 1.0, -1.0)
            absd = det * s
            su = un * s
            sv = vn * s
            st = tn * s
            mm = MARGIN * absd
            valid = ((absd > 1e-30) & (su >= -mm) & (sv >= -mm)
                     & (su + sv <= absd + mm + mm)
                     & (st > 0.0) & (st < max_travel * absd))
            strict = (su >= 0.0) & (sv >= 0.0) & (su + sv <= absd)
            tt = st / jnp.maximum(absd, 1e-30)
            # margin-only candidates rank behind strict ones at t-ties
            tt = tt * jnp.where(strict, 1.0, 1.0 + _TIE_BUMP)
            t_m = jnp.where(valid, tt, _BIG)
            t_c = jnp.min(t_m, axis=0, keepdims=True)          # [1,128]
            b = best_ref[r]
            improved = t_c < b[_B_T:_B_T + 1]
            iota = jax.lax.broadcasted_iota(jnp.int32, (CT, 128), 0)
            jrow = jnp.min(jnp.where(t_m <= t_c, iota, CT), axis=0,
                           keepdims=True)
            sel = (iota == jrow).astype(f32)                    # [tris,rays]
            attr_c = jax.lax.dot_general(
                amat, sel, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)            # [27,128]
            new = jnp.concatenate(
                [t_c, cidv, attr_c, cx, cy, cz,
                 jnp.zeros((_B_ROWS - 5 - CL.AT_ROWS, 128), f32)], axis=0)
            best_ref[r] = jnp.where(improved, new, b)

    _candidate_loop(cand_ref, blocks_hbm, buf0, buf1, sem0, sem1,
                    kslots, visit, flag_ref, alive)

    # ----- exact f32 refit of the winner hit (per ray-row) -----
    rows_t, rows_u, rows_v, rows_front, rows_prim = [], [], [], [], []
    best_rows = []
    for r in range(_R):
        b = best_ref[r]
        best_rows.append(b)
        had = b[_B_T:_B_T + 1] < _BIG
        a0 = _B_ATTR

        def row3(i):
            # [3,1,128] vec3 with [1,128] components (2D: Mosaic-safe)
            return jnp.stack([b[i:i + 1], b[i + 1:i + 2], b[i + 2:i + 3]],
                             axis=0)

        v0 = row3(a0 + CL.AT_V0)
        e1 = row3(a0 + CL.AT_E1)
        e2 = row3(a0 + CL.AT_E2)
        cen = row3(_B_CEN)
        ocl = jnp.stack([o[0][r:r + 1], o[1][r:r + 1],
                         o[2][r:r + 1]], axis=0) - cen
        dr = jnp.stack([d[0][r:r + 1], d[1][r:r + 1],
                        d[2][r:r + 1]], axis=0)
        pvec = W.cross3(dr, e2)
        detx = W.dot3(e1, pvec)
        ok = jnp.abs(detx) > 1e-30
        inv = jnp.where(ok, 1.0 / jnp.where(ok, detx, 1.0), 0.0)
        tvec = ocl - v0
        u = W.dot3(tvec, pvec) * inv
        qvec = W.cross3(tvec, e1)
        v = W.dot3(dr, qvec) * inv
        tx = W.dot3(e2, qvec) * inv
        exact_ok = (ok & (u >= -REFIT_EPS) & (v >= -REFIT_EPS)
                    & (u + v <= 1.0 + REFIT_EPS)
                    & (tx > 0.0) & (tx < max_travel))
        isvalid = b[a0 + CL.AT_VALID:a0 + CL.AT_VALID + 1] > 0.5
        hitr = had & exact_ok & isvalid
        u = jnp.clip(u, 0.0, 1.0)
        v = jnp.clip(v, 0.0, 1.0)
        scale = 1.0 / jnp.maximum(u + v, 1.0)
        u = u * scale
        v = v * scale
        rows_t.append(jnp.where(hitr, tx, _BIG))
        rows_u.append(u)
        rows_v.append(v)
        rows_front.append(jnp.where(hitr, detx, -1.0))
        gidx = b[a0 + CL.AT_GIDX:a0 + CL.AT_GIDX + 1]
        rows_prim.append(jnp.where(hitr, gidx, -1.0))

    t = jnp.concatenate(rows_t, axis=0)              # [R,128]
    bu = jnp.concatenate(rows_u, axis=0)
    bv = jnp.concatenate(rows_v, axis=0)
    det_pick = jnp.concatenate(rows_front, axis=0)
    prim_f = jnp.concatenate(rows_prim, axis=0)
    hit = t < _BIG
    front = det_pick > 0.0

    def attr(i, k=1):
        base = _B_ATTR + _ATTR_MAP[i]
        if k == 1:
            return jnp.concatenate(
                [b[base:base + 1] for b in best_rows], axis=0)
        return jnp.stack([
            jnp.concatenate([b[base + j:base + j + 1] for b in best_rows],
                            axis=0) for j in range(k)], axis=0)

    if final_env:
        # Final env-only round (bounce == max_bounces) — see
        # bounce_pallas._bounce_kernel final_env.
        nee_mode_ = cfg_key[0]
        enable_mis_ = cfg_key[1]
        use_nee_ = nee_mode_ in (1, 2) and n_lights > 0
        active_in = is_[IS_ACTIVE] > 0
        prev_delta_in = is_[IS_PREVDELTA] > 0
        miss_mask = active_in & ~hit
        L = fs[bp.FS_L:bp.FS_L + 3]
        env_L, p_env = bp._env_eval_pdf(
            env_ref, d, nee_mode_ == 1, n_lights,
            with_pdf=use_nee_ and bool(enable_mis_))
        if use_nee_ and enable_mis_:
            w_env = jnp.where(prev_delta_in, 1.0,
                              W.power_heuristic(fs[FS_PREVPDF], p_env))
        else:
            w_env = jnp.ones_like(t)
        L = L + jnp.where(miss_mask,
                          fs[FS_THP:FS_THP + 3] * env_L * w_env, 0.0)
        fs_out[:] = jnp.concatenate([fs[:FS_L], L, fs[FS_L + 3:]], axis=0)
        is_out[:] = jnp.concatenate(
            [jnp.zeros((1, _R, 128), jnp.int32), is_[1:]], axis=0)
        sh_out[:] = jnp.zeros((SH_ROWS, _R, 128), f32)
        hit_out[:] = jnp.stack(
            [jnp.where(hit, t, 0.0), prim_f, bu, bv,
             front.astype(f32), jnp.zeros_like(t)], axis=0)
        return

    s = surface_and_shade(
        o=o, d=d, t=t, hit=hit, front=front, bu=bu, bv=bv, attr=attr,
        thp=fs[FS_THP:FS_THP + 3], L=fs[FS_L:FS_L + 3],
        prev_pdf=fs[FS_PREVPDF], active=is_[IS_ACTIVE] > 0,
        prev_delta=is_[IS_PREVDELTA] > 0,
        med0=is_[IS_MED0], med1=is_[IS_MED1],
        px=is_[IS_PX], py=is_[IS_PY], sample_idx=sample_idx, bounce=bounce,
        mat_ref=mat_ref, light_ref=light_ref, cfg_key=cfg_key,
        n_lights=n_lights, first_emissive=first_emissive,
        env_ref=env_ref,
        tex_refs=((tex_ct_ref, tex_meta_ref, tr) if has_tex else None),
        tex_maps=tex_maps,
        cone=fs[bp.FS_CONE], spread=fs[bp.FS_SPREAD],
        budget=is_[bp.IS_BUDGET],
        lbounce=is_[bp.IS_LBOUNCE])

    fs_out[:] = jnp.concatenate(
        [s["o_new"], s["wi_world"], s["thp"], s["L"], s["prev_pdf"][None],
         s["cone"][None], s["spread"][None]],
        axis=0)
    is_out[:] = jnp.stack(
        [s["active"].astype(jnp.int32), s["prev_delta"].astype(jnp.int32),
         s["med0"], s["med1"], is_[IS_PX], is_[IS_PY],
         is_[bp.IS_BUDGET], s["lbounce"]], axis=0)
    sh_out[:] = jnp.concatenate(
        [s["shadow_o"], s["shadow_d"], s["sdist"][None], s["contrib"],
         s["do_nee"].astype(f32)[None], s["cdiff"],
         jnp.zeros((1, _R, 128), f32)], axis=0)
    hit_out[:] = jnp.stack(
        [jnp.where(hit, t, 0.0), prim_f, bu, bv,
         front.astype(f32), s["do_nee"].astype(f32)], axis=0)


def _kernel_b(cand_ref, sh_ref, blocks_hbm, occ_out,
              buf0, buf1, flag_ref, sem0, sem1, *, kslots):
    """Any-hit over the shadow rays' candidate lists -> occluded 0/1."""
    sh = sh_ref[:]
    so = sh[SH_O:SH_O + 3]
    sd = sh[SH_D:SH_D + 3]
    dist = sh[SH_DIST] * (1.0 - SHADOW_T_EPS)
    # lanes with no shadow request start "occluded" so resolved rows and
    # groups skip remaining visits (the XLA L-update masks by do anyway)
    occ_out[:] = jnp.where(sh[SH_DO:SH_DO + 1][0] > 0.5, 0.0, 1.0
                           ) * jnp.ones((_R, 128), jnp.float32)

    def _row_open(r):
        # 1 while any lane in row r still needs resolving
        return jnp.max(1.0 - occ_out[r:r + 1, :]) > 0.5

    def alive(i):
        open_ = _row_open(0)
        for r in range(1, _R):
            open_ = open_ | _row_open(r)
        return open_

    def visit(i, cur):
        cr = CL.CENTER_ROW
        cx = cur[cr:cr + 1, 0:128]
        cy = cur[cr:cr + 1, 128:256]
        cz = cur[cr:cr + 1, 256:384]
        te_base = 1 + 2 * kslots + _R * jnp.minimum(i, kslots - 1)
        for r in range(_R):
            # Per-row gate: skip rows whose beam misses the cluster
            # (te=+inf) and rows already fully occluded.
            te_r = cand_ref[0, 0, te_base + r]
            row_on = (te_r < jnp.int32(0x7F800000)) & _row_open(r)

            @pl.when(row_on)
            def _(r=r):
                _visit_row(r, cur, cx, cy, cz)

    def _visit_row(r, cur, cx, cy, cz):
        if True:
            cols = _row_cols(so, sd, r, cx, cy, cz)
            det, un, vn, tn = _quantities(cur, cols)
            s = jnp.where(det >= 0.0, 1.0, -1.0)
            absd = det * s
            su = un * s
            sv = vn * s
            st = tn * s
            dr = dist[r:r + 1]
            valid = ((absd > 1e-30) & (su >= 0.0) & (sv >= 0.0)
                     & (su + sv <= absd)
                     & (st > 0.0) & (st < dr * absd))
            occ_r = jnp.max(valid.astype(jnp.float32), axis=0,
                            keepdims=True)
            cur_occ = occ_out[:]
            rowmask = jax.lax.broadcasted_iota(
                jnp.int32, (_R, 128), 0) == r
            occ_out[:] = jnp.where(rowmask,
                                   jnp.maximum(cur_occ, occ_r), cur_occ)

    _candidate_loop(cand_ref, blocks_hbm, buf0, buf1, sem0, sem1,
                    kslots, visit, flag_ref, alive)


# ---------------------------------------------------------------------------
# pallas_call wrappers (flat tier)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("kslots", "max_travel", "noprune",
                              "interpret", "omm"))
def _kernel_a1_call(cand, od, blocks, kslots, max_travel, noprune=False,
                    interpret=False, omm=False, xf=None):
    """od: [G, OD_ROWS, FL] flat ray operand -> ha [G, HA_ROWS, FL].
    `xf` ([I,16,128], optional) switches on the instanced variant: the
    cand rows then carry block ids + an appended instance-id section and
    each visit re-bases the ray into the candidate's object frame."""
    grid = od.shape[0]
    lanes = blocks.shape[2]
    instanced = xf is not None
    kern = functools.partial(_kernel_a1, kslots=kslots,
                             max_travel=max_travel, noprune=noprune,
                             omm=omm, instanced=instanced)
    in_specs = [
        pl.BlockSpec((1, 1, cand.shape[2]), lambda b: (b, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, OD_ROWS, _FL), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [cand, od, blocks]
    scratch = [
        pltpu.VMEM((CL.BLK_ROWS, lanes), jnp.float32),
        pltpu.VMEM((CL.BLK_ROWS, lanes), jnp.float32),
    ]
    if instanced:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(xf)
        scratch += [pltpu.VMEM((16, 128), jnp.float32),
                    pltpu.VMEM((16, 128), jnp.float32)]
    scratch += [
        pltpu.VMEM((_BF_ROWS, _FL), jnp.float32),
        pltpu.SMEM((1, 2), jnp.int32),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    if instanced:
        scratch += [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, HA_ROWS, _FL), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, HA_ROWS, _FL), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.jit, static_argnames=("kslots", "interpret",
                                              "omm"))
def _kernel_b1_call(cand, sh, blocks, kslots, interpret=False, omm=False,
                    xf=None):
    """sh: [G, SH_ROWS, FL] flat shadow rows -> occ [G, 1, FL]."""
    grid = sh.shape[0]
    lanes = blocks.shape[2]
    instanced = xf is not None
    kern = functools.partial(
        _kernel_b1_inst if instanced else _kernel_b1,
        kslots=kslots, omm=omm)
    in_specs = [
        pl.BlockSpec((1, 1, cand.shape[2]), lambda b: (b, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, SH_ROWS, _FL), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [cand, sh, blocks]
    scratch = [
        pltpu.VMEM((CL.BLK_ROWS, lanes), jnp.float32),
        pltpu.VMEM((CL.BLK_ROWS, lanes), jnp.float32),
    ]
    if instanced:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(xf)
        scratch += [pltpu.VMEM((16, 128), jnp.float32),
                    pltpu.VMEM((16, 128), jnp.float32)]
    scratch += [
        pltpu.SMEM((1, 2), jnp.int32),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    if instanced:
        scratch += [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, _FL), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 1, _FL), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)


@functools.partial(
    jax.jit,
    static_argnames=("cfg_key", "n_lights", "tr", "first_emissive",
                     "tex_maps", "final_env", "interpret", "prio",
                     "maxb", "omm"))
def _kernel_a2_call(scal, ha, fs, is_, mat_rows, light_rows, env_rows,
                    tex_ct, tex_meta,
                    cfg_key, n_lights, tr, first_emissive,
                    tex_maps=(1, 0, 0, 0), final_env=False, interpret=False,
                    fs2=None, prio=False, maxb=None, omm=False):
    """ha: [HA_ROWS, nrows, 128] (A1 output reshaped to tiles)."""
    nrows = fs.shape[1]
    grid = nrows // _R
    has_env = env_rows is not None
    has_tex = tex_ct is not None
    split_ch = bool(cfg_key[9])
    assert (fs2 is not None) == split_ch
    kern = functools.partial(
        _kernel_a2, cfg_key=cfg_key, n_lights=n_lights, tr=tr,
        first_emissive=first_emissive, has_env=has_env, has_tex=has_tex,
        tex_maps=tex_maps, final_env=final_env, prio=prio, maxb=maxb,
        omm=omm)
    const2 = lambda b: (0, 0)
    in_specs = [
        pl.BlockSpec((1, 2), const2, memory_space=pltpu.SMEM),
        pl.BlockSpec((HA_ROWS, _R, 128), lambda b: (0, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NF, _R, 128), lambda b: (0, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NI, _R, 128), lambda b: (0, b, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [scal, ha, fs, is_]
    if split_ch:
        in_specs.append(pl.BlockSpec((7, _R, 128), lambda b: (0, b, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(fs2)
    in_specs += [
        pl.BlockSpec(mat_rows.shape, const2, memory_space=pltpu.VMEM),
        pl.BlockSpec(light_rows.shape, const2, memory_space=pltpu.VMEM),
    ]
    inputs += [mat_rows, light_rows]
    if has_env:
        in_specs.append(pl.BlockSpec(env_rows.shape, const2,
                                     memory_space=pltpu.VMEM))
        inputs.append(env_rows)
    if has_tex:
        in_specs.append(pl.BlockSpec(tex_ct.shape, const2,
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(tex_meta.shape, const2,
                                     memory_space=pltpu.VMEM))
        inputs.extend([tex_ct, tex_meta])
    out_specs = [
        pl.BlockSpec((NF, _R, 128), lambda b: (0, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NI, _R, 128), lambda b: (0, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((SH_ROWS, _R, 128), lambda b: (0, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((6, _R, 128), lambda b: (0, b, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((NF, nrows, 128), jnp.float32),
        jax.ShapeDtypeStruct((NI, nrows, 128), jnp.int32),
        jax.ShapeDtypeStruct((SH_ROWS, nrows, 128), jnp.float32),
        jax.ShapeDtypeStruct((6, nrows, 128), jnp.float32),
    ]
    ext_nee = cfg_key[0] in (3, 4, 5) and n_lights > 0 and not final_env
    if ext_nee:
        out_specs.append(pl.BlockSpec((bp.SF_ROWS, _R, 128),
                                      lambda b: (0, b, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((bp.SF_ROWS, nrows, 128), jnp.float32))
    if split_ch:
        out_specs.append(pl.BlockSpec((7, _R, 128), lambda b: (0, b, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((7, nrows, 128), jnp.float32))
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*inputs)
    out = list(out)
    fs_o, is_o, sh_o, hit_o = out[0], out[1], out[2], out[3]
    k = 4
    surf_o = None
    if ext_nee:
        surf_o = out[k]
        k += 1
    fs2_o = out[k] if split_ch else None
    return fs_o, is_o, sh_o, hit_o, surf_o, fs2_o


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("cfg_key", "kslots", "n_lights", "tr",
                     "first_emissive", "tex_maps", "final_env",
                     "interpret"))
def _kernel_a_call(scal, cand, fs, is_, mat_rows, light_rows, env_rows,
                   tex_ct, tex_meta, blocks,
                   cfg_key, kslots, n_lights, tr, first_emissive,
                   tex_maps=(1, 0, 0, 0), final_env=False, interpret=False):
    nrows = fs.shape[1]
    grid = nrows // _R
    has_env = env_rows is not None
    has_tex = tex_ct is not None
    kern = functools.partial(
        _kernel_a, cfg_key=cfg_key, kslots=kslots, n_lights=n_lights,
        tr=tr, first_emissive=first_emissive, has_env=has_env,
        has_tex=has_tex, tex_maps=tex_maps, final_env=final_env)
    const2 = lambda b: (0, 0)
    in_specs = [
        pl.BlockSpec((1, 2), const2, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, cand.shape[2]), lambda b: (b, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((NF, _R, 128), lambda b: (0, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NI, _R, 128), lambda b: (0, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(mat_rows.shape, const2, memory_space=pltpu.VMEM),
        pl.BlockSpec(light_rows.shape, const2,
                     memory_space=pltpu.VMEM),
    ]
    inputs = [scal, cand, fs, is_, mat_rows, light_rows]
    if has_env:
        in_specs.append(pl.BlockSpec(env_rows.shape, const2,
                                     memory_space=pltpu.VMEM))
        inputs.append(env_rows)
    if has_tex:
        in_specs.append(pl.BlockSpec(tex_ct.shape, const2,
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(tex_meta.shape, const2,
                                     memory_space=pltpu.VMEM))
        inputs.extend([tex_ct, tex_meta])
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    inputs.append(blocks)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((NF, _R, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NI, _R, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SH_ROWS, _R, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, _R, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NF, nrows, 128), jnp.float32),
            jax.ShapeDtypeStruct((NI, nrows, 128), jnp.int32),
            jax.ShapeDtypeStruct((SH_ROWS, nrows, 128), jnp.float32),
            jax.ShapeDtypeStruct((6, nrows, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((CL.BLK_ROWS, CL.LANES), jnp.float32),
            pltpu.VMEM((CL.BLK_ROWS, CL.LANES), jnp.float32),
            pltpu.VMEM((_R, _B_ROWS, 128), jnp.float32),
            pltpu.SMEM((1, 2), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.jit, static_argnames=("kslots", "interpret"))
def _kernel_b_call(cand, sh, blocks, kslots, interpret=False):
    nrows = sh.shape[1]
    grid = nrows // _R
    kern = functools.partial(_kernel_b, kslots=kslots)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1, cand.shape[2]), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((SH_ROWS, _R, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_R, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((CL.BLK_ROWS, CL.LANES), jnp.float32),
            pltpu.VMEM((CL.BLK_ROWS, CL.LANES), jnp.float32),
            pltpu.SMEM((1, 2), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(cand, sh, blocks)


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

# Scanned bounce chain (read ONCE at import): bounces 1..N-1 ride one
# lax.scan so the per-bounce program compiles once. RTXPT_TPU_CLUSTER_SCAN=0
# falls back to the unrolled chain — for toolchains where the scanned
# program wedges the remote compiler (docs/PERF_NOTES.md round 5a).
_SCAN = os.environ.get("RTXPT_TPU_CLUSTER_SCAN", "1") != "0"

# Flat all-rows tier default (read ONCE at import; RTXPT_TPU_CLUSTER_FLAT=0
# falls back to the round-3 per-row kernels for A/B comparison).
_FLAT = os.environ.get("RTXPT_TPU_CLUSTER_FLAT", "1") != "0"


def _to_flat_groups(rows2d, n_groups):
    """[K, npad] -> [G, K, FL] (per-group flat blocks for kernel A1/B1)."""
    k = rows2d.shape[0]
    return rows2d.reshape(k, n_groups, _FL).swapaxes(0, 1)


def _from_flat_groups(flat, k, nrows):
    """[G, K, FL] -> [K, nrows, 128]."""
    return flat.swapaxes(0, 1).reshape(k, nrows, 128)


def _page_boundary(cand, kslots):
    """Per-group boundary for the NEXT candidate page: the last kept
    slot as an (entry distance, cluster id) pair — the strict
    lexicographic lower bound accel/cull.py pages on. Where the list
    did not saturate (count < kslots) the whole feasible tail fit, so
    the bound is (+INF, max-id) and the next page selects nothing.
    cand [G, 1, 1+(2+R)K] i32: ids at 1..1+K, te_group f32-bits at
    1+K..1+2K."""
    count = cand[:, 0, 0]
    sat = count >= kslots
    te = jax.lax.bitcast_convert_type(
        cand[:, 0, 2 * kslots], jnp.float32)
    lid = cand[:, 0, kslots]
    return (jnp.where(sat, te, jnp.float32(3e38)),
            jnp.where(sat, lid, jnp.int32(2 ** 30)))


def eligible(scene, cfg, neeat_state) -> bool:
    """Back-compat structural eligibility (tier resolution lives in
    pt/dispatch.py, outside jit)."""
    from rtxpt_tpu.pt.dispatch import clustered_structural_ok
    return clustered_structural_ok(scene, cfg, neeat_state)


def trace_paths_clustered(scene, cfg, o, d, cone_spread, px, py, sample_idx,
                          want_aux: bool = False,
                          first_emissive: bool = True,
                          neeat_state=None):
    """Large-scene fused wavefront; same contract as trace_paths.
    `neeat_state` routes NEE through the external XLA block
    (pt/nee_external.py) — NEE-AT / >128 lights / WRS K>1."""
    tbl: CL.ClusterTables = scene.cluster_tables
    n = o.shape[0]
    f32 = jnp.float32
    lanes = _R * 128
    npad = _round_up(max(n, lanes), lanes)
    nrows = npad // 128
    n_groups = nrows // _R
    kslots = int(getattr(cfg, "cluster_kslots", 0)) or default_kslots()
    kslots = min(kslots, tbl.n_clusters)

    def pad1(x, fill=0.0):
        if npad == n:
            return x
        return jnp.concatenate(
            [x, jnp.full((npad - n, *x.shape[1:]), fill, x.dtype)])

    def rows3(x, fill=0.0):
        return pad1(x, fill).T.reshape(3, nrows, 128)

    def rows1(x, fill=0.0):
        return pad1(x, fill).reshape(nrows, 128)

    fs = jnp.concatenate([
        rows3(o), rows3(d, 1.0),
        jnp.ones((3, nrows, 128), f32),
        jnp.zeros((3, nrows, 128), f32),
        jnp.zeros((1, nrows, 128), f32),         # prev_pdf
        jnp.zeros((1, nrows, 128), f32),         # cone width
        rows1(cone_spread)[None],                # cone spread
    ], axis=0)
    ones_mask = pad1(jnp.ones((n,), jnp.int32)).reshape(1, nrows, 128)
    is_ = jnp.concatenate([
        ones_mask,
        jnp.ones((1, nrows, 128), jnp.int32),
        jnp.full((2, nrows, 128), -1, jnp.int32),
        rows1(px).astype(jnp.int32)[None],
        rows1(py).astype(jnp.int32)[None],
        jnp.full((1, nrows, 128), bp._NO_BUDGET, jnp.int32),
        jnp.zeros((1, nrows, 128), jnp.int32),    # logical bounce
    ], axis=0)

    sample_idx = jnp.asarray(sample_idx).astype(jnp.uint32)
    key = _cfg_key(cfg)
    interp = _interpret(cfg)
    use_nee = key[0] in (1, 2) and tbl.n_lights > 0
    ext_nee = key[0] in (3, 4, 5) and tbl.n_lights > 0
    split_ch = bool(key[9])
    fs2 = jnp.zeros((7, nrows, 128), f32) if split_ch else None
    if split_ch:
        assert _FLAT, "split channels require the flat clustered tier"
    neeat_hist = None
    if ext_nee:
        assert _FLAT, "external NEE requires the flat clustered tier"
        from rtxpt_tpu.lighting import neeat as na
        from rtxpt_tpu.pt.nee_external import external_nee
        if key[0] == 3 and neeat_state is not None:
            neeat_hist = na.zero_hist(neeat_state)
    use_tex = tbl.tex_ct is not None and \
        bool(cfg.stochastic_texture_filtering)
    tex_maps = tbl.tex_maps if use_tex else (1, 0, 0, 0)
    # nested-dielectric priorities: MT_PRIO is always packed in mat_rows
    # (bounce_pallas.pack_materials); the shade kernel runs the false-hit
    # pass-through only when the scene declares priorities
    prio = bool(getattr(scene, "has_nested_priorities", False)) and _FLAT
    # alpha/OMM: blocks carry micromap quantity lanes; transparent cells
    # reject in-traversal, UNKNOWN cells resolve at shade time against
    # the texture (pass-through) / stochastically for shadows
    omm = bool(getattr(tbl, "omm", False)) and _FLAT and use_tex
    # instanced tables: object-space prototype blocks + expanded world
    # candidate list (accel/cluster.py build_cluster_tables_instanced)
    instanced = bool(getattr(tbl, "instanced", False))
    if instanced:
        assert _FLAT, "instanced clustered tier requires the flat kernels"
    xf_arg = tbl.xf if instanced else None

    def g4(x3):
        return x3.reshape(3, n_groups, _R, 128)

    def _map_cand_inst(cand):
        """World-candidate cand rows -> kernel cand rows: ids replaced
        by pool BLOCK ids (the DMA index) and the per-slot INSTANCE ids
        appended (read at _cand_inst_base; indexes the xf DMA +
        inst_post). Paging boundaries must be computed from the
        pre-remap rows (world ids are the page order's tiebreak)."""
        if not instanced:
            return cand
        ids = jnp.clip(cand[:, 0, 1:1 + kslots], 0, tbl.n_clusters - 1)
        bl = jnp.take(tbl.wc_block, ids, axis=0)
        ins = jnp.take(tbl.wc_inst, ids, axis=0)
        return jnp.concatenate(
            [cand[:, 0, 0:1], bl, cand[:, 0, 1 + kslots:], ins],
            axis=1)[:, None, :]

    def _post_attr_inst(ha_t):
        """XLA attribute post-transform for instanced hits: rotate the
        object-space normal/tangent rows of A1's export into world space
        per winner instance (o2w linear for tangents, normal matrix +
        renormalize for normals) and shift the ray-cone LOD bias by the
        instance's area-scale term. Runs on [HA_ROWS, nrows, 128]."""
        if not instanced:
            return ha_t
        iid = jnp.maximum(ha_t[HA_INST].astype(jnp.int32), 0)
        post = jnp.take(tbl.inst_post, iid, axis=0)  # [nrows,128,19]

        def rot(base, moff, renorm):
            v = ha_t[HA_ATTR + base:HA_ATTR + base + 3]

            def m(k):
                return post[..., moff + k]

            out = jnp.stack([
                m(0) * v[0] + m(1) * v[1] + m(2) * v[2],
                m(3) * v[0] + m(4) * v[1] + m(5) * v[2],
                m(6) * v[0] + m(7) * v[1] + m(8) * v[2]])
            if renorm:
                n = jnp.sqrt(jnp.maximum(
                    out[0] * out[0] + out[1] * out[1] + out[2] * out[2],
                    1e-24))
                out = out / n
            return out

        rows = list(ha_t)
        for base in (bp.AT_N0, bp.AT_N1, bp.AT_N2, bp.AT_GN):
            r = rot(base, 9, True)
            for j in range(3):
                rows[HA_ATTR + base + j] = r[j]
        r = rot(bp.AT_TANG, 0, False)
        for j in range(3):
            rows[HA_ATTR + bp.AT_TANG + j] = r[j]
        rows[HA_ATTR + bp.AT_LODB] = \
            ha_t[HA_ATTR + bp.AT_LODB] + post[..., 18]
        return jnp.stack(rows)

    # ----- paged traversal (kslots saturation without dropped geometry) --
    # A group whose nearest-first candidate list saturates streams further
    # PAGES of the entry-sorted cluster order; each page's cull gets the
    # previous page's boundary as a hull-entry lower bound and the rays'
    # committed t as a per-ray tmax, so satisfied groups produce count=0
    # lists (the kernels' DMA gates then stream nothing). DXR-traversal
    # analog: hardware traversal never drops geometry, it just walks more
    # nodes. tests/test_cluster_saturation.py proves parity vs the
    # no-cap oracle.
    pages = int(getattr(cfg, "cluster_pages", 0)) or 1
    pages = max(1, min(pages, -(-tbl.n_clusters // kslots)))
    max_travel_f = jnp.float32(cfg.max_ray_travel)

    def _closest_paged(o3, d3, act, od_flat):
        """Paged closest hit: cull + kernel A1 per page, min-t merge.
        Returns (ha [G,HA_ROWS,FL], overflow of the FINAL page — the
        candidates still feasible past the last boundary at the
        tightened per-ray tmax, i.e. the honest possibly-lost count)."""
        ha = None
        lo = None
        tmax = max_travel_f
        ovf = jnp.int32(0)
        for _p in range(pages):
            cand, ovf = cull_candidates(
                o3, d3, act, tmax, tbl.aabb_lo, tbl.aabb_hi, kslots,
                lo=lo)
            ha_p = _kernel_a1_call(
                _map_cand_inst(cand), od_flat, tbl.blocks, kslots,
                float(cfg.max_ray_travel),
                noprune=bool(cfg.cluster_noprune), interpret=interp,
                omm=omm, xf=xf_arg)
            if ha is None:
                ha = ha_p
            else:
                imp = ha_p[:, HA_T:HA_T + 1] < ha[:, HA_T:HA_T + 1]
                ha = jnp.where(imp, ha_p, ha)
            if _p + 1 < pages:
                lo = _page_boundary(cand, kslots)
                tmax = jnp.minimum(ha[:, HA_T], max_travel_f).reshape(
                    n_groups, _R, 128)
        return ha, ovf

    def _occ_paged(shp, dop):
        """Paged any-hit occlusion: cull + kernel B1 per page, OR-merge
        over each lane's participating pages. Returns (occ [nrows,128]
        f32, final-page overflow)."""
        occ = None
        lo = None
        ovf = jnp.int32(0)
        dop_g = dop.reshape(n_groups, _R, 128)
        for _p in range(pages):
            part = dop if occ is None else (dop & (occ < 0.5))
            if occ is None:
                shp_p = shp
            else:
                shp_p = jnp.concatenate(
                    [shp[:SH_DO], part.astype(jnp.float32)[None],
                     shp[SH_DO + 1:]], axis=0)
            # The cull's active mask stays the PAGE-0 mask: the group
            # hull (and with it each cluster's entry distance, i.e. the
            # page order) must be stable across pages or the strict
            # boundary could exclude a never-examined cluster whose
            # entry moved below it. Finished lanes instead drop out via
            # per-ray tmax = -INF (cull treats that as "this row bounds
            # nothing") — a fully finished group culls to count 0.
            tmax_p = jnp.where(part, shp[SH_DIST], -jnp.float32(3e38))
            cand_s, ovf = cull_candidates(
                g4(shp_p[SH_O:SH_O + 3]), g4(shp_p[SH_D:SH_D + 3]),
                dop_g, tmax_p.reshape(n_groups, _R, 128),
                tbl.aabb_lo, tbl.aabb_hi, kslots, lo=lo)
            occ_p = _kernel_b1_call(
                _map_cand_inst(cand_s), _to_flat_groups(
                    shp_p.reshape(SH_ROWS, npad), n_groups),
                tbl.blocks, kslots, interpret=interp,
                omm=omm, xf=xf_arg).reshape(nrows, 128)
            occ = occ_p if occ is None else jnp.where(part, occ_p, occ)
            if _p + 1 < pages:
                lo = _page_boundary(cand_s, kslots)
        return occ, ovf

    # ----- wavefront sorting (the SER analog, SURVEY §2.6) -----
    # Scatter rays between bounces are spatially incoherent, which blows
    # up per-group candidate lists (kslots overflow = dropped geometry)
    # and per-visit waste. Sorting lanes by (origin-cell Morton, direction
    # octant) restores group coherence, and ordering terminated lanes
    # last gives compaction for free: their groups get count=0 lists.
    # Cost: one 2M-key argsort + row-gather permutation per bounce —
    # O(10ms) vs O(100ms) kernel time. Reference: SER
    # (PathTracerSample.hlsl:136-151 / SERUtils.hlsli:22-50).
    from rtxpt_tpu.ops.wavefront import (
        pixel_morton_key, ray_coherence_key, sort_rows_by_key, unsort_rows)
    slo = jnp.min(tbl.aabb_lo, axis=0)
    sext = jnp.maximum(jnp.max(tbl.aabb_hi, axis=0) - slo, 1e-6)

    def _sort_wavefront(fs, is_, fs2, src, bounce):
        flat_fs = fs.reshape(NF, npad)
        flat_is = is_.reshape(NI, npad)
        active = flat_is[IS_ACTIVE] > 0
        if bounce == 0:
            # Primaries: image-space Morton tiles (origins are all at the
            # camera, so the cell/octant key cannot separate them).
            skey = jnp.where(
                active,
                pixel_morton_key(flat_is[IS_PX], flat_is[IS_PY]),
                jnp.int32(2 ** 30))
        else:
            skey = ray_coherence_key(
                flat_fs[FS_O:FS_O + 3], flat_fs[FS_D:FS_D + 3],
                slo, sext, active)
        n2 = 7 if fs2 is not None else 0
        flat2 = fs2.reshape(n2, npad) if fs2 is not None else \
            jnp.zeros((0, npad), f32)
        # Sort-carry diet (the 24-operand carry was the #2 clustered
        # cost, 81 ms/bounce on the city — docs/PERF_NOTES.md): the 8
        # int rows pack into 2 words (the sort network's cost scales
        # with operand count, the VPU pack/unpack is one linear pass)
        # and cone+spread ride one word as a bf16 pair. O(30 ops/lane)
        # buys ~7 fewer 2M-lane sorting-network operands.
        iw0, iw1 = _pack_is2(flat_is)
        cs = _pack_bf16_pair(flat_fs[bp.FS_CONE], flat_fs[bp.FS_SPREAD])
        nf13 = bp.FS_CONE                        # rows 0..12 stay f32
        out = jax.lax.sort(
            (skey,) + tuple(flat_fs[i] for i in range(nf13))
            + (cs, iw0, iw1)
            + tuple(flat2[i] for i in range(n2))
            + (src.reshape(npad),), num_keys=1)
        cone_s, spread_s = _unpack_bf16_pair(out[1 + nf13])
        fs_s = jnp.concatenate(
            [jnp.stack(out[1:1 + nf13]),
             cone_s[None], spread_s[None]]).reshape(NF, nrows, 128)
        is_s = _unpack_is2(out[2 + nf13], out[3 + nf13]).reshape(
            NI, nrows, 128)
        fs2_s = (jnp.stack(out[4 + nf13:4 + nf13 + n2]).reshape(
            7, nrows, 128) if fs2 is not None else None)
        src2 = out[4 + nf13 + n2].reshape(nrows, 128)
        return fs_s, is_s, fs2_s, src2

    src = jnp.arange(npad, dtype=jnp.int32).reshape(nrows, 128)
    sort_rays = bool(getattr(cfg, "sort_rays", True))

    def _bounce_round(fs, is_, fs2, src, neeat_hist, bounce, is_first):
        """One wavefront bounce (sort, cull, kernel A, NEE + kernel B).

        `bounce` is a STATIC int for the unrolled first bounce and a
        TRACED uint32 inside the lax.scan over the remaining bounces —
        the whole per-bounce program compiles ONCE instead of
        max_bounces times (the cold city compile blew the driver bench's
        stage budget in r4/r5; every bounce-varying decision below is
        either static `is_first` or rides per-lane state).

        Returns (fs, is_, fs2, src, neeat_hist, n_active, d_rays,
        d_overflow, hitb)."""
        if sort_rays:
            fs, is_, fs2, src = _sort_wavefront(
                fs, is_, fs2, src, 0 if is_first else 1)
        active_in = is_[IS_ACTIVE]
        n_active = jnp.sum(active_in)
        d_rays = n_active
        act = (active_in > 0).reshape(n_groups, _R, 128)
        scal = jnp.stack([
            sample_idx,
            jnp.asarray(bounce, jnp.uint32)]).reshape(1, 2)
        if _FLAT:
            of = fs[FS_O:FS_O + 3].reshape(3, npad)
            df = fs[FS_D:FS_D + 3].reshape(3, npad)
            od = jnp.concatenate([
                df, W.cross3(of, df), of,
                (active_in > 0).reshape(1, npad).astype(f32)], axis=0)
            ha, ovf = _closest_paged(
                g4(fs[FS_O:FS_O + 3]), g4(fs[FS_D:FS_D + 3]), act,
                _to_flat_groups(od, n_groups))
            d_overflow = ovf
            ha_t = _post_attr_inst(
                _from_flat_groups(ha, HA_ROWS, nrows))
            d_in = fs[FS_D:FS_D + 3]
            prev_pdf_in = fs[FS_PREVPDF]
            prev_delta_in = is_[IS_PREVDELTA]
            lb_pre = is_[bp.IS_LBOUNCE]
            fs, is_, sh, hitb, surf, fs2 = _kernel_a2_call(
                scal, ha_t, fs, is_, tbl.mat_rows, tbl.light_rows,
                tbl.env_rows,
                tbl.tex_ct if use_tex else None,
                tbl.tex_meta if use_tex else None,
                key, tbl.n_lights, tbl.tr, first_emissive,
                tex_maps=tex_maps, interpret=interp, fs2=fs2,
                prio=prio, omm=omm,
                maxb=cfg.max_bounces if (prio or omm) else None)
            if ext_nee:
                # hitb[5]: 0 = not shaded, 1 = shaded lb==0, 2 = lb>0
                hitm = (hitb[5] > 0.5).reshape(npad)
                lb0 = (hitb[5] < 1.5).reshape(npad)
                res = external_nee(
                    scene, cfg, neeat_state,
                    surf.reshape(bp.SF_ROWS, npad),
                    d_in.reshape(3, npad), hitm,
                    prev_pdf_in.reshape(npad),
                    prev_delta_in.reshape(npad) > 0,
                    is_[IS_PX].reshape(npad), is_[IS_PY].reshape(npad),
                    sample_idx, 0, first_emissive,
                    first_spec=(fs2[6].reshape(npad) > 0.5 if split_ch
                                else None),
                    lb=lb_pre.reshape(npad))
                L = fs[FS_L:FS_L + 3] \
                    + res["em_add"].T.reshape(3, nrows, 128)
                fs = jnp.concatenate([fs[:FS_L], L, fs[FS_L + 3:]],
                                     axis=0)
                if split_ch and key[0] == 3:
                    # deferred NEE-AT emissive split (primary excluded:
                    # per-lane lb gate — `bounce` is traced in the scan)
                    fspec_f = fs2[6:7] > 0.5
                    em_t = jnp.where(lb_pre[None] > 0,
                                     res["em_add"].T.reshape(3, nrows, 128),
                                     0.0)
                    cd = jnp.where(fspec_f, 0.0, em_t)
                    fs2 = jnp.concatenate(
                        [fs2[0:3] + cd, fs2[3:6] + (em_t - cd),
                         fs2[6:7]], axis=0)
                # pack the XLA-selected shadow requests into the SH
                # layout so the flat shadow path below runs unchanged
                if omm:
                    seed_sa = rng.pixel_seed(
                        is_[IS_PX].reshape(npad),
                        is_[IS_PY].reshape(npad),
                        lb_pre.reshape(npad), bp.EFFECT_ALPHA)
                    if cfg.low_discrepancy:
                        (ua,) = rng.ld_samples(sample_idx, seed_sa, (0,))
                    else:
                        ua = rng.uniform_sample(
                            seed_sa,
                            rng.hash_combine(sample_idx, jnp.uint32(0)))
                    ua_row = ua.reshape(1, npad)
                else:
                    ua_row = jnp.zeros((1, npad), f32)
                sh = jnp.concatenate([
                    res["shadow_o"].T, res["shadow_d"].T,
                    res["sdist"][None], res["contrib"].T,
                    res["do_nee"].astype(f32)[None], res["cdiff"].T,
                    ua_row,
                ], axis=0).reshape(SH_ROWS, nrows, 128)
        else:
            # legacy per-row kernel: single page (traversal + shading
            # are one kernel, so the min-t page merge has no seam here)
            cand, ovf = cull_candidates(
                g4(fs[FS_O:FS_O + 3]), g4(fs[FS_D:FS_D + 3]), act,
                max_travel_f, tbl.aabb_lo, tbl.aabb_hi, kslots)
            d_overflow = ovf
            fs, is_, sh, hitb = _kernel_a_call(
                scal, cand, fs, is_, tbl.mat_rows, tbl.light_rows,
                tbl.env_rows,
                tbl.tex_ct if use_tex else None,
                tbl.tex_meta if use_tex else None,
                tbl.blocks,
                key, kslots, tbl.n_lights, tbl.tr, first_emissive,
                tex_maps=tex_maps, interpret=interp)
        if use_nee or ext_nee:
            do = sh[SH_DO] > 0.5
            if sort_rays:
                # Shadow rays target per-lane random lights; the primary
                # wavefront order leaves group direction bounds wide, so
                # the shadow wavefront gets its own (octant, cell) sort.
                # Carry diet: B1 only reads o/d/dist/do/ua — the
                # contribution rows are consumed in UNSORTED lane order
                # after the occlusion comes back (unsort_rows below), so
                # they never ride the sorting network. do packs into
                # dist's sign (dist > 0 always; do=0 lanes get -dist).
                flat_sh = sh.reshape(SH_ROWS, npad)
                skey = ray_coherence_key(
                    flat_sh[SH_O:SH_O + 3], flat_sh[SH_D:SH_D + 3],
                    slo, sext, do.reshape(npad))
                ssrc = jnp.arange(npad, dtype=jnp.int32)
                dodist = jnp.where(flat_sh[SH_DO] > 0.5,
                                   flat_sh[SH_DIST], -flat_sh[SH_DIST])
                carry = (flat_sh[SH_O], flat_sh[SH_O + 1],
                         flat_sh[SH_O + 2], flat_sh[SH_D],
                         flat_sh[SH_D + 1], flat_sh[SH_D + 2], dodist,
                         flat_sh[SH_UA])
                out = jax.lax.sort((skey,) + carry + (ssrc,), num_keys=1)
                dd = out[7]
                dop_f = (dd > 0.0).astype(f32)
                zrow = jnp.zeros((1, npad), f32)
                shp = jnp.concatenate([
                    jnp.stack(out[1:7]), jnp.abs(dd)[None],
                    zrow, zrow, zrow, dop_f[None],
                    zrow, zrow, zrow, out[8][None]],
                    axis=0).reshape(SH_ROWS, nrows, 128)
                ssrc = out[9]
            else:
                shp = sh
            dop = shp[SH_DO] > 0.5
            if _FLAT:
                occ, ovf2 = _occ_paged(shp, dop)
                d_overflow = d_overflow + ovf2
            else:
                cand_s, ovf2 = cull_candidates(
                    g4(shp[SH_O:SH_O + 3]), g4(shp[SH_D:SH_D + 3]),
                    dop.reshape(n_groups, _R, 128),
                    shp[SH_DIST].reshape(n_groups, _R, 128),
                    tbl.aabb_lo, tbl.aabb_hi, kslots)
                d_overflow = d_overflow + ovf2
                occ = _kernel_b_call(cand_s, shp, tbl.blocks, kslots,
                                     interpret=interp)
            if sort_rays:
                occ = unsort_rows(
                    ssrc, occ.reshape(1, npad))[0].reshape(nrows, 128)
            ok = do & (occ < 0.5)
            L = fs[FS_L:FS_L + 3] + jnp.where(
                ok[None], sh[SH_CONTRIB:SH_CONTRIB + 3], 0.0)
            fs = jnp.concatenate([fs[:FS_L], L, fs[FS_L + 3:]], axis=0)
            if split_ch:
                cd = jnp.where(ok[None], sh[SH_CDIFF:SH_CDIFF + 3], 0.0)
                tot = jnp.where(ok[None],
                                sh[SH_CONTRIB:SH_CONTRIB + 3], 0.0)
                fs2 = jnp.concatenate(
                    [fs2[0:3] + cd, fs2[3:6] + (tot - cd), fs2[6:7]],
                    axis=0)
            d_rays = d_rays + jnp.sum(do.astype(jnp.int32))
            if neeat_hist is not None:
                cf = sh[SH_CONTRIB:SH_CONTRIB + 3].reshape(3, npad)
                neeat_hist = na.accumulate_feedback(
                    neeat_state, neeat_hist, res["tile"], res["li"],
                    jnp.maximum(cf[0] * 0.2126 + cf[1] * 0.7152
                                + cf[2] * 0.0722, 0.0),
                    ok.reshape(npad))
        return (fs, is_, fs2, src, neeat_hist, n_active, d_rays,
                d_overflow, hitb)

    # Bounce 0 unrolled (pixel-Morton sort key + V-buffer hit capture),
    # bounces 1.. in ONE lax.scan so the per-bounce program — the cull,
    # two 25-operand sort networks and three Pallas kernels — compiles
    # once instead of max_bounces times. Nested-priority pass-through
    # iterations (false-hit rejection, bounce_pallas surface_and_shade)
    # do not advance the per-lane logical bounce; the scan runs extra
    # rounds so rejected lanes still reach full depth — free here
    # (scan trip count is runtime), unlike the fused tier's unrolled
    # chain (trace_paths_pallas `extra`).
    n_rounds = cfg.max_bounces + \
        (int(getattr(cfg, "passthrough_extra_iters", 2))
         if (prio or omm) else 0)
    (fs, is_, fs2, src, neeat_hist, nact0, rays0, ovf0,
     hit0) = _bounce_round(fs, is_, fs2, src, neeat_hist, 0, True)
    src0 = src
    ray_count = rays0
    overflow = ovf0
    occ_list = [nact0]
    if n_rounds > 1 and _SCAN:
        def _scan_body(carry, bounce_t):
            fs, is_, fs2, src, hist, rc, ovf = carry
            (fs, is_, fs2, src, hist, nact, d_rays, d_ovf,
             _hitb) = _bounce_round(fs, is_, fs2, src, hist,
                                    bounce_t, False)
            return (fs, is_, fs2, src, hist, rc + d_rays,
                    ovf + d_ovf), nact

        (fs, is_, fs2, src, neeat_hist, ray_count, overflow), occ_s = \
            jax.lax.scan(
                _scan_body,
                (fs, is_, fs2, src, neeat_hist, ray_count, overflow),
                jnp.arange(1, n_rounds, dtype=jnp.uint32))
        occ_list.append(occ_s)
    elif n_rounds > 1:
        # RTXPT_TPU_CLUSTER_SCAN=0: unrolled fallback (same body) for
        # toolchains where the scanned program wedges the compiler
        for b in range(1, n_rounds):
            (fs, is_, fs2, src, neeat_hist, nact, d_rays, d_ovf,
             _hitb) = _bounce_round(fs, is_, fs2, src, neeat_hist,
                                    b, False)
            ray_count = ray_count + d_rays
            overflow = overflow + d_ovf
            occ_list.append(nact)

    if tbl.env_rows is not None:
        # final env-only round for escaping rays (XLA loop parity)
        active_in = is_[IS_ACTIVE]
        act = (active_in > 0).reshape(n_groups, _R, 128)
        scal = jnp.stack(
            [sample_idx, jnp.uint32(cfg.max_bounces)]).reshape(1, 2)
        if _FLAT:
            of = fs[FS_O:FS_O + 3].reshape(3, npad)
            df = fs[FS_D:FS_D + 3].reshape(3, npad)
            od = jnp.concatenate([
                df, W.cross3(of, df), of,
                (active_in > 0).reshape(1, npad).astype(f32)], axis=0)
            ha, ovf = _closest_paged(
                g4(fs[FS_O:FS_O + 3]), g4(fs[FS_D:FS_D + 3]), act,
                _to_flat_groups(od, n_groups))
            overflow = overflow + ovf
            ha_t = _post_attr_inst(
                _from_flat_groups(ha, HA_ROWS, nrows))
            fs, is_, _sh, _hitf, _surf, fs2 = _kernel_a2_call(
                scal, ha_t, fs, is_, tbl.mat_rows, tbl.light_rows,
                tbl.env_rows, None, None,
                key, tbl.n_lights, tbl.tr, first_emissive,
                final_env=True, interpret=interp, fs2=fs2)
        else:
            cand, ovf = cull_candidates(
                g4(fs[FS_O:FS_O + 3]), g4(fs[FS_D:FS_D + 3]), act,
                max_travel_f, tbl.aabb_lo, tbl.aabb_hi, kslots)
            overflow = overflow + ovf
            fs, is_, _sh, _hitf = _kernel_a_call(
                scal, cand, fs, is_, tbl.mat_rows, tbl.light_rows,
                tbl.env_rows, None, None, tbl.blocks,
                key, kslots, tbl.n_lights, tbl.tr, first_emissive,
                final_env=True, interpret=interp)
        ray_count = ray_count + jnp.sum(active_in)
    occ_list.append(jnp.sum(is_[IS_ACTIVE]))
    occupancy = jnp.concatenate(
        [jnp.atleast_1d(o) for o in occ_list])

    # undo the lane permutation (src tracked through every sort)
    if sort_rays:
        Lr = unsort_rows(src.reshape(npad), fs[FS_L:FS_L + 3].reshape(3, npad))
        L = Lr.T[:n]
    else:
        L = fs[FS_L:FS_L + 3].reshape(3, npad).T[:n]
    out = dict(L=L, ray_count=ray_count, occupancy=occupancy,
               cull_overflow=overflow)
    if split_ch:
        if sort_rays:
            f2 = unsort_rows(src.reshape(npad), fs2[0:6].reshape(6, npad))
        else:
            f2 = fs2[0:6].reshape(6, npad)
        out["L_diff"] = f2[0:3].T[:n]
        out["L_spec"] = f2[3:6].T[:n]
    if neeat_hist is not None:
        out["neeat_hist"] = neeat_hist

    if want_aux:
        from rtxpt_tpu.accel.traverse import Hit
        from rtxpt_tpu.pt.surface import load_surface
        if sort_rays:
            # hit0 was produced on the bounce-0-sorted wavefront
            hit0 = unsort_rows(src0.reshape(npad),
                               hit0.reshape(6, npad)).reshape(6, nrows, 128)
        t0 = hit0[0].reshape(npad)[:n]
        prim0 = hit0[1].reshape(npad)[:n].astype(jnp.int32)
        uv0 = jnp.stack([hit0[2].reshape(npad)[:n],
                         hit0[3].reshape(npad)[:n]], axis=-1)
        front0 = hit0[4].reshape(npad)[:n] > 0.5
        hit_s = Hit(t=jnp.where(prim0 >= 0, t0, cfg.max_ray_travel),
                    prim=prim0, bary=uv0, front=front0)
        hm = prim0 >= 0
        surf = load_surface(scene, hit_s, o, d,
                            cone_spread * jnp.maximum(t0, 0.0))
        alb = surf.bsdf.diffuse + surf.bsdf.specular_f0
        out["albedo"] = jnp.where(hm[..., None], alb, 1.0)
        if split_ch:
            out["albedo_diff"] = jnp.where(
                hm[..., None], surf.bsdf.diffuse, 1.0)
            out["albedo_spec"] = jnp.where(
                hm[..., None], surf.bsdf.specular_f0 + 0.04, 1.0)
        out["normal"] = jnp.where(hm[..., None], surf.sh_n, 0.0)
        out["depth"] = jnp.where(hm, t0, 0.0)
        out["wpos"] = jnp.where(hm[..., None], surf.pos, 0.0)
        out["emission"] = jnp.where(hm[..., None], surf.emissive, 0.0)
    return out
