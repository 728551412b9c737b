"""Two-level acceleration structure: instance BVH over per-mesh BVHs.

TPU-native analog of DXR BLAS/TLAS (reference: Sample.cpp:1088-1242
CreateTlas/BuildTLAS with per-instance transforms; BLAS reuse across
instances; skinned/rigid BLAS update at Sample.cpp:1170-1198). The
round-2 framework flattened everything to world space at prepare time,
which costs O(T x instances) memory for instanced scenes and O(scene)
re-flatten per animated frame; this module keeps one BVH per mesh
*prototype* and a small threaded BVH over instances, so rigid animation
is O(instances) (refit_tlas) and geometry memory is O(sum of prototype
sizes).

TPU-first traversal design — a SINGLE lockstep `lax.while_loop`, not a
nested two-loop traversal: the TLAS rows and all mesh-BVH node tables
live in ONE widened preorder node pool [M,22] so each step stays "one
gather + elementwise math" (same shape as accel/traverse.py). An
instance leaf row carries its world->object transform inline; entering
it saves a one-deep resume point (there are exactly two levels, so the
traversal "stack" is one register) and re-bases the ray into mesh frame.
A mesh subtree's exit links are a POP sentinel that restores the world
ray and jumps to the saved resume node.

Node row layout ([M,22] f32; int-in-f32 exact below 2^24):
    0:6   aabb lo/hi       (world for TLAS rows, object for mesh rows)
    6     prim             mesh leaf: pool-packed triangle id; else -1
    7     miss link        next preorder node on miss; -1 done; -2 POP
    8:17  mesh leaf: tri v0|e1|e2 (object space)
          instance leaf: world->object rotation, row-major
    17:20 instance leaf: world->object translation
    20    instance leaf: mesh-subtree entry node; else -1
    21    instance leaf: instance id; else -1

v2 scope:
    * emissive materials on ANY prototype: the lights bake runs over an
      expanded (instance x emissive pool tri) world-space list; hits map
      to lights via inst_light_base[inst] + em_rank[prim]
      (lights_baker.emissive_prim_index). Rigid animation of emissive
      instances needs a lights rebake (refit_tlas refits boxes only).
    * remaining fallback: alpha-tested/OMM scenes take the flattened BVH
      path (the micromap bake is flatten-ordered; prepare() reverts).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from rtxpt_tpu.accel.traverse import Hit

_POP = -2.0
_F32I_MAX = 1 << 24


@struct.dataclass
class TLAS:
    nodes: jnp.ndarray          # [M,22] f32 unified node pool
    prim_tri: jnp.ndarray       # [Tp] i32 packed -> original pool tri id
    inst_pack: jnp.ndarray      # [I,21] o2w rot(9) | o2w trans(3) | nmat(9)
    # --- refit machinery (static topology, AABB/transform update) ---
    inst_rows: jnp.ndarray      # [I] i32 node row of instance i's leaf
    inst_mesh: jnp.ndarray      # [I] i32 prototype id
    mesh_lo: jnp.ndarray        # [P,3] object-space prototype AABBs
    mesh_hi: jnp.ndarray        # [P,3]
    leaf_order: jnp.ndarray     # [I] i32 instance id at TLAS leaf slot k
    int_rows: jnp.ndarray       # [K] i32 node rows of TLAS internal nodes
    # sparse-table range-min lookups, precomputed per internal node:
    int_level: jnp.ndarray      # [K] i32 floor(log2(range len))
    int_a: jnp.ndarray          # [K] i32 left lookup index
    int_b: jnp.ndarray          # [K] i32 right lookup index (b-2^k+1)
    # --- emissive instancing (v2) ---------------------------------------
    # The lights bake runs over an EXPANDED triangle list: one entry per
    # (instance, emissive pool tri) pair in instance-major, pool order.
    # A hit (prim, inst) maps to its expanded id — and through
    # LightList.tri_light to its light — as
    #     inst_light_base[inst] + em_rank[prim].
    em_rank: Optional[jnp.ndarray] = None         # [Tpool] i32, -1 none
    inst_light_base: Optional[jnp.ndarray] = None  # [I] i32
    n_instances: int = struct.field(pytree_node=False, default=0)
    n_meshes: int = struct.field(pytree_node=False, default=0)

    @property
    def num_nodes(self) -> int:
        return self.nodes.shape[0]


# ---------------------------------------------------------------------------
# Host build
# ---------------------------------------------------------------------------


def _box_tree_preorder(lo: np.ndarray, hi: np.ndarray):
    """Median-split threaded BVH over boxes. Returns (rows, leaf_order):
    rows = list of (aabb_lo, aabb_hi, leaf_id, miss) in preorder with
    miss links; leaf_id >= 0 marks a leaf (index into lo/hi), -1 internal.
    leaf_order lists leaf ids in preorder (contiguous-subtree property:
    every internal node covers a contiguous slice of leaf_order, which
    refit_tlas exploits for range-min updates)."""
    n = len(lo)
    cen = (lo + hi) * 0.5
    rows = []
    leaf_order = []
    ranges = []        # per-row (leaf_lo, leaf_hi) slice of leaf_order

    def rec(ids: np.ndarray, miss: int) -> int:
        my = len(rows)
        blo = lo[ids].min(0)
        bhi = hi[ids].max(0)
        if len(ids) == 1:
            rows.append([blo, bhi, int(ids[0]), miss])
            ranges.append((len(leaf_order), len(leaf_order)))
            leaf_order.append(int(ids[0]))
            return my
        rows.append([blo, bhi, -1, miss])
        ranges.append(None)  # patched below
        axis = int(np.argmax(bhi - blo))
        order = ids[np.argsort(cen[ids, axis], kind="stable")]
        half = len(order) // 2
        a0 = len(leaf_order)
        left_ids, right_ids = order[:half], order[half:]
        # preorder: a subtree over k boxes occupies exactly 2k-1 rows, so
        # the right child's row is known before recursing — the left
        # subtree's exit (miss) links can point at it directly
        right_row = my + 1 + (2 * len(left_ids) - 1)
        rec(left_ids, right_row)
        got = rec(right_ids, miss)
        assert got == right_row
        ranges[my] = (a0, len(leaf_order) - 1)
        return my

    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 4 * n + 1000))
    try:
        rec(np.arange(n), -1)
    finally:
        sys.setrecursionlimit(old_limit)
    return rows, np.asarray(leaf_order, np.int64), ranges


def _mesh_key(inst) -> object:
    k = getattr(inst, "mesh_key", None)
    return k if k is not None else id(inst.positions)


def build_two_level(host, min_sharing: float = 1.5) -> Optional[dict]:
    """Group host.instances by shared prototype and build the two-level
    structure. Returns None (caller falls back to flatten mode) when the
    scene would not benefit (instances/prototypes < min_sharing and no
    animation hint) or hits a v1 restriction (alpha textures, emissive on
    multi-instance prototypes).

    Returns a dict: {tlas, geometry-pool arrays (positions, normals,
    uvs, indices, tri_material, tri_subinstance), light_positions
    (world-space positions view for the lights bake)}.
    """
    from rtxpt_tpu.accel.lbvh import build_bvh

    insts = host.instances
    if not insts:
        return None
    keys = [_mesh_key(it) for it in insts]
    protos: List[int] = []            # instance index of first occurrence
    proto_of: List[int] = []          # per-instance prototype id
    seen = {}
    for i, k in enumerate(keys):
        if k in seen:
            proto_of.append(seen[k])
        else:
            seen[k] = len(protos)
            proto_of.append(len(protos))
            protos.append(i)
    n_inst, n_proto = len(insts), len(protos)
    force = getattr(host, "force_instancing", False)
    if n_inst / n_proto < min_sharing and not force:
        return None
    if host.textures:
        mats = host.materials
        if mats is not None and np.any(np.asarray(mats.alpha_cutoff) >= 0):
            return None               # alpha retrace is BVH-path only (v1)

    # ---- object pool (prototypes concatenated, original tri order) ----
    pool_pos, pool_nrm, pool_uv, pool_idx = [], [], [], []
    pool_mat, pool_sub = [], []
    tri_base = np.zeros(n_proto + 1, np.int64)
    vert_base = 0
    for p, i0 in enumerate(protos):
        it = insts[i0]
        pool_pos.append(np.asarray(it.positions, np.float32))
        pool_nrm.append(np.asarray(it.normals, np.float32))
        uvs = it.uvs if it.uvs is not None else np.zeros(
            (len(it.positions), 2), np.float32)
        pool_uv.append(np.asarray(uvs, np.float32))
        pool_idx.append(np.asarray(it.indices, np.int64) + vert_base)
        pool_mat.append(np.asarray(it.material, np.int32))
        pool_sub.append(np.full((len(it.indices),), i0, np.int32))
        vert_base += len(it.positions)
        tri_base[p + 1] = tri_base[p] + len(it.indices)
    positions = np.concatenate(pool_pos)
    normals = np.concatenate(pool_nrm)
    uvs = np.concatenate(pool_uv)
    indices = np.concatenate(pool_idx).astype(np.int32)
    tri_material = np.concatenate(pool_mat)
    tri_subinstance = np.concatenate(pool_sub)

    # v2: emissive materials on ANY prototype. Rank each pool triangle
    # among its prototype's emissive tris; the per-instance expanded
    # light list is assembled below once transforms are known.
    em_rank = np.full((len(indices),), -1, np.int32)
    proto_em_count = np.zeros(n_proto, np.int64)
    if host.materials is not None:
        em = np.asarray(host.materials.emissive)
        lum = em @ np.asarray([0.2126, 0.7152, 0.0722])
        emissive_mat = lum > 0.0                   # matches bake_lights
        for p in range(n_proto):
            tm = tri_material[tri_base[p]:tri_base[p + 1]]
            mask = emissive_mat[np.clip(tm, 0, len(emissive_mat) - 1)]
            proto_em_count[p] = int(mask.sum())
            em_rank[tri_base[p]:tri_base[p + 1]][mask] = \
                np.arange(int(mask.sum()), dtype=np.int32)

    # ---- per-prototype mesh BVHs (object space) ----
    mesh_tables, mesh_prim_tri = [], []
    mesh_lo = np.zeros((n_proto, 3), np.float32)
    mesh_hi = np.zeros((n_proto, 3), np.float32)
    for p, i0 in enumerate(protos):
        it = insts[i0]
        bvh = build_bvh(it.positions, it.indices)
        tbl = np.array(np.asarray(bvh.nodes))          # [m,17]
        pt = np.asarray(bvh.prim_tri).astype(np.int64)
        # exit links become POP; internal links re-based at assembly
        mesh_tables.append(tbl)
        mesh_prim_tri.append(pt + tri_base[p])
        mesh_lo[p] = tbl[0, 0:3]
        mesh_hi[p] = tbl[0, 3:6]

    # ---- instance transforms + world AABBs ----
    o2w = np.stack([np.asarray(it.transform, np.float32)
                    for it in insts])                  # [I,4,4]
    A = o2w[:, :3, :3]
    b = o2w[:, :3, 3]
    w2o = np.linalg.inv(o2w)[:, :4, :4]
    c = ((mesh_lo + mesh_hi) * 0.5)[proto_of]
    e = ((mesh_hi - mesh_lo) * 0.5)[proto_of]
    cw = np.einsum("nij,nj->ni", A, c) + b
    ew = np.einsum("nij,nj->ni", np.abs(A), e)
    inst_lo, inst_hi = cw - ew, cw + ew

    trows, leaf_order, _ranges = _box_tree_preorder(inst_lo, inst_hi)
    n_tlas = len(trows)

    # mesh pool bases (after the TLAS block)
    node_base = np.zeros(n_proto + 1, np.int64)
    node_base[0] = n_tlas
    for p in range(n_proto):
        node_base[p + 1] = node_base[p] + len(mesh_tables[p])
    packed_base = np.zeros(n_proto + 1, np.int64)
    for p in range(n_proto):
        packed_base[p + 1] = packed_base[p] + len(mesh_prim_tri[p])
    m_total = int(node_base[-1])
    assert m_total < _F32I_MAX and packed_base[-1] < _F32I_MAX

    nodes = np.zeros((m_total, 22), np.float32)
    nodes[:, 6] = -1.0
    nodes[:, 20] = -1.0
    nodes[:, 21] = -1.0

    # TLAS rows
    inst_rows = np.zeros(n_inst, np.int64)
    int_rows, int_ranges = [], []
    for r, (blo, bhi, leaf_id, miss) in enumerate(trows):
        nodes[r, 0:3] = blo
        nodes[r, 3:6] = bhi
        nodes[r, 7] = float(miss)
        if leaf_id >= 0:
            p = proto_of[leaf_id]
            nodes[r, 8:17] = w2o[leaf_id, :3, :3].reshape(-1)
            nodes[r, 17:20] = w2o[leaf_id, :3, 3]
            nodes[r, 20] = float(node_base[p])
            nodes[r, 21] = float(leaf_id)
            inst_rows[leaf_id] = r
        else:
            int_rows.append(r)
            int_ranges.append(_ranges[r])

    # mesh pool rows
    for p in range(n_proto):
        tbl = mesh_tables[p]
        base = node_base[p]
        dst = nodes[base:base + len(tbl)]
        dst[:, 0:17] = tbl
        pr = tbl[:, 6]
        dst[:, 6] = np.where(pr >= 0, pr + float(packed_base[p]), -1.0)
        ms = tbl[:, 7]
        dst[:, 7] = np.where(ms >= 0, ms + float(base), _POP)

    prim_tri = np.concatenate(mesh_prim_tri).astype(np.int32)

    # inst pack: o2w rot | o2w trans | normal matrix (= w2o rot transposed)
    nmat = np.transpose(w2o[:, :3, :3], (0, 2, 1))
    inst_pack = np.concatenate([
        A.reshape(n_inst, 9), b, nmat.reshape(n_inst, 9)], axis=1)

    # sparse-table lookup indices for internal-node range-min refit
    int_rows = np.asarray(int_rows, np.int64)
    rg = np.asarray(int_ranges, np.int64).reshape(-1, 2)
    ln = rg[:, 1] - rg[:, 0] + 1
    lev = np.floor(np.log2(np.maximum(ln, 1))).astype(np.int64)
    ib = rg[:, 1] - (1 << lev) + 1

    # Expanded emissive list for the lights bake: per (instance, emissive
    # pool tri) pair, world-space vertices, instance-major, pool order.
    # bake_lights then yields one light per entry and its tri_light array
    # indexes exactly this expansion (BakeEmissiveTriangles over the
    # instanced scene — Sample.cpp per-instance emissive collection).
    inst_light_base = np.zeros(n_inst, np.int64)
    exp_tris, exp_mats, exp_insts = [], [], []
    run = 0
    v0i = positions[indices[:, 0]]
    v1i = positions[indices[:, 1]]
    v2i = positions[indices[:, 2]]
    for i in range(n_inst):
        inst_light_base[i] = run
        p = proto_of[i]
        t0, t1 = tri_base[p], tri_base[p + 1]
        sel = np.nonzero(em_rank[t0:t1] >= 0)[0] + t0
        if len(sel):
            tri = np.stack([v0i[sel], v1i[sel], v2i[sel]], 1)  # [E,3,3]
            exp_tris.append(tri @ A[i].T + b[i])
            exp_mats.append(tri_material[sel])
            exp_insts.append(np.full((len(sel),), i, np.int32))
        run += len(sel)
    if exp_tris:
        et = np.concatenate(exp_tris).astype(np.float32)   # [E,3,3]
        light_positions = et.reshape(-1, 3)
        light_indices = np.arange(et.shape[0] * 3,
                                  dtype=np.int32).reshape(-1, 3)
        light_materials = np.concatenate(exp_mats).astype(np.int32)
        light_subinstance = np.concatenate(exp_insts)
    else:
        light_positions = np.zeros((0, 3), np.float32)
        light_indices = np.zeros((0, 3), np.int32)
        light_materials = np.zeros((0,), np.int32)
        light_subinstance = np.zeros((0,), np.int32)

    tl = TLAS(
        nodes=jnp.asarray(nodes),
        prim_tri=jnp.asarray(prim_tri),
        inst_pack=jnp.asarray(inst_pack.astype(np.float32)),
        inst_rows=jnp.asarray(inst_rows.astype(np.int32)),
        inst_mesh=jnp.asarray(np.asarray(proto_of, np.int32)),
        mesh_lo=jnp.asarray(mesh_lo),
        mesh_hi=jnp.asarray(mesh_hi),
        leaf_order=jnp.asarray(leaf_order.astype(np.int32)),
        int_rows=jnp.asarray(int_rows.astype(np.int32)),
        int_level=jnp.asarray(lev.astype(np.int32)),
        int_a=jnp.asarray(rg[:, 0].astype(np.int32)),
        int_b=jnp.asarray(ib.astype(np.int32)),
        em_rank=jnp.asarray(em_rank),
        inst_light_base=jnp.asarray(inst_light_base.astype(np.int32)),
        n_instances=n_inst, n_meshes=n_proto,
    )
    return dict(tlas=tl, positions=positions, normals=normals, uvs=uvs,
                indices=indices, tri_material=tri_material,
                tri_subinstance=tri_subinstance,
                tri_base=tri_base,
                light_positions=light_positions,
                light_indices=light_indices,
                light_materials=light_materials,
                light_subinstance=light_subinstance)


# ---------------------------------------------------------------------------
# Device traversal
# ---------------------------------------------------------------------------

_INVD_MAX = 1e30
_TRI_EPS = 1e-9


def _safe_inv(d):
    mag = jnp.abs(d)
    sgn = jnp.where(d >= 0.0, 1.0, -1.0)
    return jnp.where(mag > 1e-24, 1.0 / jnp.where(mag > 1e-24, d, 1.0),
                     sgn * _INVD_MAX)


def _traverse_tlas(tl: TLAS, o, d, tmin, tmax, any_hit: bool):
    """Single-loop two-level traversal; see module docstring for the
    enter/pop state machine. o,d: [N,3] world rays."""
    zero = (o[..., 0] + d[..., 0] + tmin + tmax) * 0.0
    zero3 = zero[..., None] * jnp.ones((3,), jnp.float32)
    state = dict(
        node=zero.astype(jnp.int32),
        t=jnp.asarray(tmax, jnp.float32) + zero,
        prim=zero.astype(jnp.int32) - 1,
        inst=zero.astype(jnp.int32) - 1,
        hit_inst=zero.astype(jnp.int32) - 1,
        uv=jnp.stack([zero, zero], axis=-1),
        front=zero > 1.0,
        resume=zero.astype(jnp.int32) - 1,
        co=o + zero3, cd=d + zero3,
        cinvd=_safe_inv(d) + zero3,
    )

    def cond(s):
        return jnp.any(s["node"] >= 0)

    def body(s):
        node = s["node"]
        active = node >= 0
        nd = jnp.maximum(node, 0)

        g = jnp.take(tl.nodes, nd, axis=0)           # [N,22] — THE gather
        bmin = g[:, 0:3]
        bmax = g[:, 3:6]
        pr = g[:, 6].astype(jnp.int32)
        miss_link = g[:, 7].astype(jnp.int32)
        enter = g[:, 20].astype(jnp.int32)
        iid = g[:, 21].astype(jnp.int32)

        co, cd, cinvd = s["co"], s["cd"], s["cinvd"]
        t0 = (bmin - co) * cinvd
        t1 = (bmax - co) * cinvd
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        tn = jnp.maximum(tn, tmin)
        tf = jnp.minimum(tf, s["t"])
        aabb_hit = (tn <= tf) & active

        is_leaf = pr >= 0
        v0 = g[:, 8:11]
        e1 = g[:, 11:14]
        e2 = g[:, 14:17]
        pvec = jnp.cross(cd, e2)
        det = jnp.sum(e1 * pvec, axis=-1)
        front = det > 0.0
        ok_det = jnp.abs(det) > _TRI_EPS
        inv_det = jnp.where(ok_det, 1.0 / jnp.where(ok_det, det, 1.0), 0.0)
        tvec = co - v0
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(cd * qvec, axis=-1) * inv_det
        th = jnp.sum(e2 * qvec, axis=-1) * inv_det
        tri_hit = (ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                   & (th > tmin) & (th < s["t"])
                   & is_leaf & aabb_hit)

        t_new = jnp.where(tri_hit, th, s["t"])
        prim_new = jnp.where(tri_hit, pr, s["prim"])
        hit_inst = jnp.where(tri_hit, s["inst"], s["hit_inst"])
        uv_new = jnp.where(tri_hit[:, None], jnp.stack([u, v], -1), s["uv"])
        front_new = jnp.where(tri_hit, front, s["front"])

        is_inst = enter >= 0
        enter_ok = aabb_hit & is_inst
        descend = aabb_hit & ~is_leaf & ~is_inst
        nxt = jnp.where(descend, nd + 1, miss_link)
        nxt = jnp.where(enter_ok, enter, nxt)
        pop = nxt == -2

        # ray re-basing: world -> object on enter, restore on pop
        R = g[:, 8:17].reshape(-1, 3, 3)
        tr = g[:, 17:20]
        o_obj = jnp.einsum("nij,nj->ni", R, o) + tr
        d_obj = jnp.einsum("nij,nj->ni", R, d)
        ek = enter_ok[:, None]
        pk = pop[:, None]
        co_n = jnp.where(ek, o_obj, jnp.where(pk, o, co))
        cd_n = jnp.where(ek, d_obj, jnp.where(pk, d, cd))
        cinvd_n = jnp.where(ek | pk, _safe_inv(cd_n), cinvd)
        resume = jnp.where(enter_ok, miss_link, s["resume"])
        inst = jnp.where(enter_ok, iid,
                         jnp.where(pop, -1, s["inst"]))
        nxt = jnp.where(pop, s["resume"], nxt)
        if any_hit:
            nxt = jnp.where(tri_hit, -1, nxt)
        nxt = jnp.where(active, nxt, -1)
        return dict(node=nxt, t=t_new, prim=prim_new, inst=inst,
                    hit_inst=hit_inst, uv=uv_new, front=front_new,
                    resume=resume, co=co_n, cd=cd_n, cinvd=cinvd_n)

    return jax.lax.while_loop(cond, body, state)


def intersect_closest_tlas(tl: TLAS, o, d, tmin, tmax) -> Hit:
    """Closest-hit over the two-level structure; Hit.prim is the object
    POOL triangle id, Hit.inst the instance (use both to shade)."""
    s = _traverse_tlas(tl, o, d, tmin, tmax, any_hit=False)
    prim_orig = jnp.where(s["prim"] >= 0,
                          jnp.take(tl.prim_tri, jnp.maximum(s["prim"], 0)),
                          -1)
    return Hit(t=s["t"], prim=prim_orig, bary=s["uv"], front=s["front"],
               inst=jnp.where(prim_orig >= 0, s["hit_inst"], -1))


def intersect_any_tlas(tl: TLAS, o, d, tmin, tmax) -> jnp.ndarray:
    s = _traverse_tlas(tl, o, d, tmin, tmax, any_hit=True)
    return s["prim"] >= 0


# ---------------------------------------------------------------------------
# Rigid-animation refit (device, O(instances))
# ---------------------------------------------------------------------------


@jax.jit
def refit_tlas(tl: TLAS, transforms: jnp.ndarray) -> TLAS:
    """Update instance transforms [I,4,4] without touching mesh BVHs —
    the BuildTLAS-per-frame analog (Sample.cpp:1200-1242). Instance leaf
    rows get new world AABBs + world->object transforms; internal TLAS
    rows are refit by sparse-table range-min over the (static) preorder
    leaf ranges. Topology is kept: quality degrades only if instances
    migrate far from the build layout (then rebuild via build_two_level).

    NOTE: em_rank/inst_light_base survive unchanged (they are topology),
    but the LIGHT LIST's world-space vertices do not — moving emissive
    instances requires a lights rebake (prepare._prepare_two_level's
    expanded bake) alongside this refit.
    """
    A = transforms[:, :3, :3]
    b = transforms[:, :3, 3]
    w2o = jnp.linalg.inv(transforms)
    Rw = w2o[:, :3, :3]
    trw = w2o[:, :3, 3]

    lo = jnp.take(tl.mesh_lo, tl.inst_mesh, axis=0)
    hi = jnp.take(tl.mesh_hi, tl.inst_mesh, axis=0)
    c = (lo + hi) * 0.5
    e = (hi - lo) * 0.5
    cw = jnp.einsum("nij,nj->ni", A, c) + b
    ew = jnp.einsum("nij,nj->ni", jnp.abs(A), e)
    ilo, ihi = cw - ew, cw + ew

    n_i = tl.inst_pack.shape[0]
    keep = jnp.take(tl.nodes, tl.inst_rows, axis=0)
    leaf_rows = jnp.concatenate([
        ilo, ihi,
        keep[:, 6:8],
        Rw.reshape(n_i, 9), trw,
        keep[:, 20:22],
    ], axis=1)
    nodes = tl.nodes.at[tl.inst_rows].set(leaf_rows)

    # internal rows: range-min/max over leaf-order AABBs via sparse table
    llo = jnp.take(ilo, tl.leaf_order, axis=0)
    lhi = jnp.take(ihi, tl.leaf_order, axis=0)
    n_lv = max(int(np.ceil(np.log2(max(n_i, 1)))) + 1, 1)
    los = [llo]
    his = [lhi]
    idx_all = jnp.arange(n_i)
    for k in range(1, n_lv):
        h = 1 << (k - 1)
        prev_lo, prev_hi = los[-1], his[-1]
        sh = jnp.minimum(idx_all + h, n_i - 1)
        los.append(jnp.minimum(prev_lo, jnp.take(prev_lo, sh, axis=0)))
        his.append(jnp.maximum(prev_hi, jnp.take(prev_hi, sh, axis=0)))
    los_t = jnp.stack(los)            # [n_lv, I, 3]
    his_t = jnp.stack(his)

    ka = tl.int_level
    blo = jnp.minimum(los_t[ka, tl.int_a], los_t[ka, tl.int_b])
    bhi = jnp.maximum(his_t[ka, tl.int_a], his_t[ka, tl.int_b])
    nodes = nodes.at[tl.int_rows, 0:3].set(blo)
    nodes = nodes.at[tl.int_rows, 3:6].set(bhi)

    nmat = jnp.transpose(Rw, (0, 2, 1))
    inst_pack = jnp.concatenate([
        A.reshape(n_i, 9), b, nmat.reshape(n_i, 9)], axis=1)
    return tl.replace(nodes=nodes, inst_pack=inst_pack)
