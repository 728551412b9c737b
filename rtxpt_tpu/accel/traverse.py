"""Wavefront BVH traversal + ray/triangle intersection (device code).

Replaces DXR RayQuery scatter/visibility rays (reference:
PathTracerBridgeDonut.hlsli:996 traceScatterRay, :1034 traceVisibilityRay).

The kernel is a single `lax.while_loop` over traversal steps; per step every
ray in the wavefront advances one node of the threaded BVH (accel/bvh.py).
TPU gathers dominate the cost, so the entire per-node payload (AABB, skip
links, leaf triangle) lives in ONE fused [M,17] table — exactly one
jnp.take per ray per step; everything else is elementwise math. Rays that
finish early idle via masks until the wavefront drains (the classic
lockstep-SIMT trade; ray sorting in ops/ restores coherence).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from rtxpt_tpu.accel.bvh import ThreadedBVH

_INVD_MAX = 1e30
_TRI_EPS = 1e-9


@struct.dataclass
class Hit:
    t: jnp.ndarray        # [N] f32 hit distance (tmax where missed)
    prim: jnp.ndarray     # [N] i32 original triangle id, -1 = miss
    bary: jnp.ndarray     # [N,2] f32 barycentrics (u toward v1, v toward v2)
    front: jnp.ndarray    # [N] bool geometric front face (ccw)
    # Instance id for two-level (TLAS) scenes (accel/tlas.py); None on the
    # single-level flattened path. prim is then the OBJECT-pool tri id.
    inst: jnp.ndarray = None

    @property
    def miss(self):
        return self.prim < 0


def _safe_inv(d):
    mag = jnp.abs(d)
    sgn = jnp.where(d >= 0.0, 1.0, -1.0)
    return jnp.where(mag > 1e-24, 1.0 / jnp.where(mag > 1e-24, d, 1.0),
                     sgn * _INVD_MAX)


def _traverse(bvh: ThreadedBVH, o, d, tmin, tmax, any_hit: bool,
              max_steps: int = 0):
    """Core traversal. o,d: [N,3]; tmin,tmax: [N]. Returns raw state dict."""
    invd = _safe_inv(d)

    # Derive the initial carry from ALL ray inputs so while_loop carry types
    # match the body outputs under shard_map manual sharding (vma: constants
    # and replicated operands are unvarying, body outputs varying — e.g. a
    # camera origin broadcast from a replicated Camera is unvarying while
    # the jittered directions are varying).
    zero = (o[..., 0] + d[..., 0] + tmin + tmax) * 0.0
    state = dict(
        node=zero.astype(jnp.int32),
        t=jnp.asarray(tmax, jnp.float32) + zero,
        prim=zero.astype(jnp.int32) - 1,
        uv=jnp.stack([zero, zero], axis=-1),
        front=zero > 1.0,
        steps=jnp.zeros((), jnp.int32),
    )

    def cond(s):
        alive = jnp.any(s["node"] >= 0)
        if max_steps:
            alive = alive & (s["steps"] < max_steps)
        return alive

    def body(s):
        node = s["node"]
        active = node >= 0
        nd = jnp.maximum(node, 0)

        g = jnp.take(bvh.nodes, nd, axis=0)          # [N,17] — THE gather
        bmin = g[:, 0:3]
        bmax = g[:, 3:6]
        pr = g[:, 6].astype(jnp.int32)
        miss_link = g[:, 7].astype(jnp.int32)
        v0 = g[:, 8:11]
        e1 = g[:, 11:14]
        e2 = g[:, 14:17]

        # Slab test
        t0 = (bmin - o) * invd
        t1 = (bmax - o) * invd
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        tn = jnp.maximum(tn, tmin)
        tf = jnp.minimum(tf, s["t"])
        aabb_hit = (tn <= tf) & active

        # Möller–Trumbore on the leaf triangle carried in the node row
        is_leaf = pr >= 0
        pvec = jnp.cross(d, e2)
        det = jnp.sum(e1 * pvec, axis=-1)
        front = det > 0.0
        ok_det = jnp.abs(det) > _TRI_EPS
        inv_det = jnp.where(ok_det, 1.0 / jnp.where(ok_det, det, 1.0), 0.0)
        tvec = o - v0
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(d * qvec, axis=-1) * inv_det
        th = jnp.sum(e2 * qvec, axis=-1) * inv_det
        tri_hit = (ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                   & (th > tmin) & (th < s["t"])
                   & is_leaf & aabb_hit)
        if bvh.tri_micro is not None:
            # OMM in-traversal alpha: reject micro-TRANSPARENT hits here
            # instead of a full re-trace (scene/omm.py bake; reference
            # resolves the same states driver-side via OMM-built BLASes)
            from rtxpt_tpu.scene.omm import MICRO_TRANSPARENT, micro_index
            mm = jnp.take(bvh.tri_micro, jnp.maximum(pr, 0))
            mi = jnp.clip(micro_index(u, v), 0, 15)  # NaN-lane safety
            st = (mm >> (2 * mi)) & 3
            tri_hit = tri_hit & (st != MICRO_TRANSPARENT)

        t_new = jnp.where(tri_hit, th, s["t"])
        prim_new = jnp.where(tri_hit, pr, s["prim"])
        uv_new = jnp.where(tri_hit[:, None], jnp.stack([u, v], -1), s["uv"])
        front_new = jnp.where(tri_hit, front, s["front"])

        descend = aabb_hit & ~is_leaf
        nxt = jnp.where(descend, nd + 1, miss_link)
        if any_hit:
            nxt = jnp.where(tri_hit, -1, nxt)
        nxt = jnp.where(active, nxt, -1)
        return dict(node=nxt, t=t_new, prim=prim_new, uv=uv_new,
                    front=front_new, steps=s["steps"] + 1)

    return jax.lax.while_loop(cond, body, state)


import os


def _use_vmem_kernel(bvh: ThreadedBVH) -> bool:
    """Trace-time dispatch: Pallas VMEM kernel on TPU for small scenes.
    Disabled by default — the in-kernel loop faults current Mosaic runtimes
    (see traverse_pallas.py header); the MXU brute-force path (accel/
    brute.py) covers the small-scene regime instead."""
    if os.environ.get("RTXPT_TPU_PALLAS_TRAVERSAL") != "1":
        return False
    from rtxpt_tpu.accel import traverse_pallas as tp

    if bvh.num_nodes > tp.MAX_VMEM_NODES:
        return False
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return backend not in ("cpu", "gpu")


def intersect_closest(bvh: ThreadedBVH, o, d, tmin, tmax) -> Hit:
    """Closest-hit query over a ray wavefront (scatter rays)."""
    if bvh.brute is not None:
        from rtxpt_tpu.accel.brute import intersect_closest_brute

        return intersect_closest_brute(bvh.brute, o, d, tmin, tmax)
    if _use_vmem_kernel(bvh):
        from rtxpt_tpu.accel import traverse_pallas as tp

        s = tp.traverse_vmem(bvh.nodes, o, d, tmin, tmax, any_hit=False)
    else:
        s = _traverse(bvh, o, d, tmin, tmax, any_hit=False)
    prim_orig = jnp.where(s["prim"] >= 0,
                          jnp.take(bvh.prim_tri, jnp.maximum(s["prim"], 0)),
                          -1)
    return Hit(t=s["t"], prim=prim_orig, bary=s["uv"], front=s["front"])


def scene_closest(scene, o, d, tmin, tmax) -> Hit:
    """Closest-hit against a SceneData: two-level (TLAS) traversal when
    the scene is instanced, flattened BVH otherwise. The single seam all
    passes (integrator, ReSTIR, hybrid, debug) should route through so
    instanced scenes work everywhere (Bridge::traceScatterRay analog)."""
    if getattr(scene, "tlas", None) is not None:
        from rtxpt_tpu.accel.tlas import intersect_closest_tlas
        return intersect_closest_tlas(scene.tlas, o, d, tmin, tmax)
    return intersect_closest(scene.bvh, o, d, tmin, tmax)


def scene_any(scene, o, d, tmin, tmax) -> jnp.ndarray:
    """Visibility against a SceneData (see scene_closest)."""
    if getattr(scene, "tlas", None) is not None:
        from rtxpt_tpu.accel.tlas import intersect_any_tlas
        return intersect_any_tlas(scene.tlas, o, d, tmin, tmax)
    return intersect_any(scene.bvh, o, d, tmin, tmax)


def intersect_any(bvh: ThreadedBVH, o, d, tmin, tmax) -> jnp.ndarray:
    """Visibility query: True where *occluded* (shadow rays)."""
    if bvh.brute is not None:
        from rtxpt_tpu.accel.brute import intersect_any_brute

        return intersect_any_brute(bvh.brute, o, d, tmin, tmax)
    if _use_vmem_kernel(bvh):
        from rtxpt_tpu.accel import traverse_pallas as tp

        s = tp.traverse_vmem(bvh.nodes, o, d, tmin, tmax, any_hit=True)
    else:
        s = _traverse(bvh, o, d, tmin, tmax, any_hit=True)
    return s["prim"] >= 0
