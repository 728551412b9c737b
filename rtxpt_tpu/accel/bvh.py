"""Threaded (skip-link) BVH device layout.

TPU-native replacement for DXR TLAS/BLAS + RayQuery (reference:
Sample.cpp:1061-1242 AS management, PathTracerBridgeDonut.hlsli:996,1034
inline RayQuery — SURVEY.md §2.3 "TPU equivalents").

Layout rationale: traversal on a TPU wants *no per-ray stacks and no
scatters* — just gathers and elementwise math across a ray wavefront. We
store nodes in **preorder** with a **miss link** (skip pointer):

    next(node) = node + 1            if AABB hit and node is internal
    next(node) = miss[node]          otherwise (leaf handled, or AABB miss)

so per traversal step each ray does: 1 gather of node data, 1 slab test,
1 (masked) triangle test, 1 select. Termination: next == -1.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ThreadedBVH:
    # Single fused per-node gather table [M,17] f32 — one jnp.take per
    # traversal step (gathers are the TPU bottleneck; see accel/traverse.py):
    #   0:3 aabb min | 3:6 aabb max | 6 prim-as-f32 (-1 internal) |
    #   7 miss-link-as-f32 (-1 done) | 8:11 tri v0 | 11:14 e1 | 14:17 e2
    # (int-in-f32 is exact below 2^24 — node/prim counts beyond that switch
    # to a split table; asserted in the builder.)
    nodes: jnp.ndarray       # [M,17] f32
    # Matmul-factored all-pairs intersection operands (accel/brute.py),
    # present when the scene is small enough for the MXU brute-force path.
    brute: object            # Optional[BruteTris]
    node_min: jnp.ndarray    # [M,3] f32
    node_max: jnp.ndarray    # [M,3] f32
    node_prim: jnp.ndarray   # [M] i32: -1 internal, else packed-triangle index
    node_miss: jnp.ndarray   # [M] i32: next preorder node on miss; -1 = done
    tri_v0: jnp.ndarray      # [T,3] f32 packed triangles in leaf order
    tri_e1: jnp.ndarray      # [T,3] f32 (v1 - v0)
    tri_e2: jnp.ndarray      # [T,3] f32 (v2 - v0)
    prim_tri: jnp.ndarray    # [T] i32 packed index -> original triangle id
    # Optional OMM micromaps in PACKED order (scene/omm.py, level-2 2-bit
    # micro states): the traversal leaf test rejects micro-TRANSPARENT
    # hits in-loop — the anyhit-free OMM fast path.
    tri_micro: jnp.ndarray = None  # [T] i32 or None

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]

    @property
    def num_triangles(self) -> int:
        return self.tri_v0.shape[0]
