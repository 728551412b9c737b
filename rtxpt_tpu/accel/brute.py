"""MXU brute-force ray/triangle intersection — matmul-factored
Möller-Trumbore over all (ray, triangle) pairs.

The TPU-native observation: every Möller-Trumbore quantity is a triple
product, i.e. *bilinear* in per-ray and per-triangle vectors:

    det   = e1 . (d x e2)        = -d . n                 (n = e1 x e2)
    u_num = (o - v0) . (d x e2)  = (o x d) . e2 + d . (v0 x e2)
    v_num = d . ((o - v0) x e1)  = -(o x d) . e1 - d . (v0 x e1)
    t_num = e2 . ((o - v0) x e1) = o . n - (v0 . n)

so the whole N x T intersection grid is FOUR [N,3] @ [3,T] matmuls plus
elementwise masking and a min-reduction over T — exactly the shape the MXU
wants, with zero gathers. This replaces BVH traversal entirely for scenes
up to a few thousand triangles (and becomes the cluster-level test of the
two-level scheme for large scenes). Replaces DXR RayQuery on the reference
hot path (PathTracerBridgeDonut.hlsli:996,1034) for such scenes.

Memory: intermediates are [N, T]; rays are processed in chunks so
N_chunk * T stays bounded.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rtxpt_tpu.accel.traverse import Hit

# Dispatch threshold (triangle count) for brute over BVH traversal, and
# max [N_chunk x T] intermediate footprint.
BRUTE_MAX_TRIS = 4096
_MAX_PAIRS = 1 << 24      # 16M pair-entries * 4B * ~6 arrays ~= 400MB


@struct.dataclass
class BruteTris:
    """Precomputed per-triangle matmul operands, [3, T] layout."""

    e1_t: jnp.ndarray      # [3,T]
    e2_t: jnp.ndarray      # [3,T]
    n_t: jnp.ndarray       # [3,T]  (e1 x e2, unnormalized)
    v0xe2_t: jnp.ndarray   # [3,T]
    v0xe1_t: jnp.ndarray   # [3,T]
    v0n: jnp.ndarray       # [T]    (v0 . n)
    # Pre-baked [K, 4*Tpad] operand table for the Pallas kernel
    # (accel/brute_pallas.py) — built once at scene prep.
    pallas_rhs: object = None

    @property
    def num_triangles(self) -> int:
        return self.v0n.shape[0]


def brute_from_edges(v0: np.ndarray, e1: np.ndarray,
                     e2: np.ndarray) -> BruteTris:
    """Build operands (incl. the cached Pallas table) from host arrays."""
    n = np.cross(e1, e2)
    tris = BruteTris(
        e1_t=jnp.asarray(e1.T.copy()),
        e2_t=jnp.asarray(e2.T.copy()),
        n_t=jnp.asarray(n.T.copy()),
        v0xe2_t=jnp.asarray(np.cross(v0, e2).T.copy()),
        v0xe1_t=jnp.asarray(np.cross(v0, e1).T.copy()),
        v0n=jnp.asarray(np.einsum("tj,tj->t", v0, n)),
    )
    from rtxpt_tpu.accel.brute_pallas import PALLAS_MAX_TRIS, pack_tris_np
    if len(v0) <= PALLAS_MAX_TRIS:
        tris = tris.replace(pallas_rhs=jnp.asarray(
            pack_tris_np(v0, e1, e2, n)))
    return tris


def build_brute(positions, indices) -> BruteTris:
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int32)
    v0 = positions[indices[:, 0]]
    v1 = positions[indices[:, 1]]
    v2 = positions[indices[:, 2]]
    return brute_from_edges(v0, v1 - v0, v2 - v0)


def _intersect_chunk(tris: BruteTris, o, d, tmin, tmax, any_hit: bool):
    f32 = jnp.float32
    oxd = jnp.cross(o, d)

    def mm(a, b):
        # HIGHEST: TPU default matmul precision is bf16-input, which is
        # catastrophic for intersection geometry.
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)

    det = -mm(d, tris.n_t)                                   # [N,T]
    # u_num = o.(d x e2) - v0.(d x e2) = (o x d).e2 + d.(v0 x e2)
    u_num = mm(oxd, tris.e2_t) + mm(d, tris.v0xe2_t)
    v_num = -mm(oxd, tris.e1_t) - mm(d, tris.v0xe1_t)
    t_num = mm(o, tris.n_t) - tris.v0n[None, :]

    ok_det = jnp.abs(det) > 1e-12
    inv = jnp.where(ok_det, 1.0 / jnp.where(ok_det, det, 1.0), 0.0)
    u = u_num * inv
    v = v_num * inv
    t = t_num * inv
    valid = (ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
             & (t > tmin[:, None]) & (t < tmax[:, None]))
    t_m = jnp.where(valid, t, jnp.inf)
    # Winner extraction WITHOUT gathers (XLA row-gathers are slow on TPU):
    # min-reduce for t, iota-min for the index, then masked sum-reduce picks.
    t_best = jnp.min(t_m, axis=1)
    hit = jnp.isfinite(t_best)
    n_t = t_m.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 1)
    j = jnp.min(jnp.where(t_m <= t_best[:, None], iota, n_t), axis=1)
    sel = iota == j[:, None]

    def pick(x):
        return jnp.sum(jnp.where(sel, x, 0.0), axis=1)

    prim = jnp.where(hit, j.astype(jnp.int32), -1)
    uu = jnp.where(hit, pick(u), 0.0)
    vv = jnp.where(hit, pick(v), 0.0)
    front = jnp.where(hit, pick(det) > 0.0, False)
    return dict(
        t=jnp.where(hit, t_best, tmax),
        prim=prim,
        uv=jnp.stack([uu, vv], -1),
        front=front,
    )


def _use_pallas(tris: BruteTris) -> bool:
    """Opt-in (RTXPT_TPU_PALLAS_BRUTE=1). The kernel matches the XLA path
    exactly and wins isolated microbenches, but in-frame XLA fuses the
    intersect into neighboring ops while the kernel pays fixed per-call
    costs (rhs DMA per grid block + launch) that dominate at small T.
    It becomes the default once shading fuses INTO the kernel so each
    call does enough work (docs/PERF_NOTES.md round-2 item)."""
    import os

    if os.environ.get("RTXPT_TPU_PALLAS_BRUTE") != "1":
        return False
    from rtxpt_tpu.accel.brute_pallas import PALLAS_MAX_TRIS

    if tris.num_triangles > PALLAS_MAX_TRIS or tris.pallas_rhs is None:
        return False
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def intersect_closest_brute(tris: BruteTris, o, d, tmin, tmax) -> Hit:
    if _use_pallas(tris):
        from rtxpt_tpu.accel.brute_pallas import intersect_brute_pallas

        s = intersect_brute_pallas(tris, o, d, tmin, tmax)
        return Hit(t=s["t"], prim=s["prim"], bary=s["uv"], front=s["front"])
    n = o.shape[0]
    t_count = tris.num_triangles
    chunk = max(min(n, _MAX_PAIRS // max(t_count, 1)), 1)
    if n <= chunk:
        s = _intersect_chunk(tris, o, d, tmin, tmax, False)
    else:
        pad = (-n) % chunk
        def pp(x, fill=0.0):
            return jnp.concatenate(
                [x, jnp.full((pad, *x.shape[1:]), fill, x.dtype)]) \
                if pad else x
        oc = pp(o).reshape(-1, chunk, 3)
        dc = pp(d, 1.0).reshape(-1, chunk, 3)
        tn = pp(tmin).reshape(-1, chunk)
        tx = pp(tmax, -1.0).reshape(-1, chunk)
        s = jax.lax.map(
            lambda args: _intersect_chunk(tris, *args, False),
            (oc, dc, tn, tx))
        s = jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:])[:n], s)
    return Hit(t=s["t"], prim=s["prim"], bary=s["uv"], front=s["front"])


def intersect_any_brute(tris: BruteTris, o, d, tmin, tmax) -> jnp.ndarray:
    hit = intersect_closest_brute(tris, o, d, tmin, tmax)
    return ~hit.miss
