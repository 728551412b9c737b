"""Pallas TPU traversal kernel for VMEM-resident BVHs.

The pure-XLA traversal (accel/traverse.py) is bound by HBM gather
throughput (~100M row-gathers/s) plus per-step HLO overhead. For scenes
whose node table fits VMEM this kernel keeps the traversal loop on-core:
the "gather" is a one-hot matmul on the MXU —
    g[c, j] = sum_m nodesT[c, m] * (m == node[j])
so each step is one [C,M]x[M,NB] matmul + elementwise slab/triangle tests,
with zero HBM traffic. This is the TPU answer to DXR's RayQuery for
moderate scenes; larger scenes fall back to the XLA path (dispatch in
accel/traverse.py) until the treelet-streaming kernel lands.

Structure note: `lax.while_loop` inside a Mosaic kernel faults current TPU
runtimes (verified empirically; `fori_loop` is fine), so the kernel runs a
fixed K-step fori and an *outer* XLA while_loop relaunches it until every
lane's node pointer is -1. State rides in two packed arrays (f32/i32)
with input/output aliasing.

Table layout: nodesT [24, Mpad] f32 (transposed ThreadedBVH.nodes):
rows 0:3 aabb min, 3:6 aabb max, 6 prim, 7 miss, 8:17 tri v0/e1/e2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Max nodes for the VMEM path: onehot chunk [MC, NB] + table dominate VMEM.
MAX_VMEM_NODES = 4096
_NB = 512          # rays per grid block
_MC = 1024         # node-chunk for the onehot matmul (VMEM bound)
_C = 24            # padded component rows (17 used)
_K = 24            # traversal steps per kernel launch


def _pad_nodes_t(nodes: jnp.ndarray) -> jnp.ndarray:
    """[M,17] -> [24, Mpad] transposed, zero-padded, padding nodes
    terminate immediately (prim=-1, miss=-1)."""
    m = nodes.shape[0]
    mpad = max(int(np.ceil(m / 128)) * 128, 128)
    t = jnp.zeros((_C, mpad), jnp.float32)
    t = t.at[:17, :m].set(nodes.T)
    if mpad > m:
        t = t.at[6, m:].set(-1.0)
        t = t.at[7, m:].set(-1.0)
    return t


def _step_kernel(nodes_ref, o_ref, d_ref, lim_ref, fstate_ref, istate_ref,
                 fout_ref, iout_ref, *, m_nodes: int, any_hit: bool):
    """K traversal steps for one ray block.

    fstate/fout [4, NB]: t, u, v, front ; istate/iout [1, NB]: node|prim
    packed as node*2^? -> two rows: [2, NB]: node, prim.
    lim [2, NB]: tmin, tmax(unused beyond init).
    """
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    tmin = lim_ref[0:1, :]

    def safe_inv(v):
        mag = jnp.abs(v)
        sgn = jnp.where(v >= 0.0, 1.0, -1.0)
        return jnp.where(mag > 1e-24, 1.0 / jnp.where(mag > 1e-24, v, 1.0),
                         sgn * 1e30)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    nchunks = (m_nodes + _MC - 1) // _MC

    def body(_, s):
        node, prim, t, u, v, front = s
        active = node >= 0
        nd = jnp.maximum(node, 0)

        g = jnp.zeros((_C, _NB), jnp.float32)
        for c in range(nchunks):
            lo = c * _MC
            size = min(_MC, m_nodes - lo)
            iota = lo + jax.lax.broadcasted_iota(jnp.int32, (size, _NB), 0)
            oh = (iota == nd).astype(jnp.float32)
            g = g + jnp.dot(nodes_ref[:, lo:lo + size], oh,
                            preferred_element_type=jnp.float32)

        pr = g[6:7].astype(jnp.int32)
        miss_link = g[7:8].astype(jnp.int32)

        tx0 = (g[0:1] - ox) * ix
        tx1 = (g[3:4] - ox) * ix
        ty0 = (g[1:2] - oy) * iy
        ty1 = (g[4:5] - oy) * iy
        tz0 = (g[2:3] - oz) * iz
        tz1 = (g[5:6] - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                     jnp.minimum(ty0, ty1)),
                         jnp.maximum(jnp.minimum(tz0, tz1), tmin))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                     jnp.maximum(ty0, ty1)),
                         jnp.minimum(jnp.maximum(tz0, tz1), t))
        aabb_hit = (tn <= tf) & active

        v0x, v0y, v0z = g[8:9], g[9:10], g[10:11]
        e1x, e1y, e1z = g[11:12], g[12:13], g[13:14]
        e2x, e2y, e2z = g[14:15], g[15:16], g[16:17]
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        fr = det > 0.0
        ok_det = jnp.abs(det) > 1e-9
        inv_det = jnp.where(ok_det, 1.0 / jnp.where(ok_det, det, 1.0), 0.0)
        tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
        uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        th = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        is_leaf = pr >= 0
        tri_hit = (ok_det & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                   & (th > tmin) & (th < t) & is_leaf & aabb_hit)

        t = jnp.where(tri_hit, th, t)
        prim = jnp.where(tri_hit, pr, prim)
        u = jnp.where(tri_hit, uu, u)
        v = jnp.where(tri_hit, vv, v)
        front = jnp.where(tri_hit, fr.astype(jnp.float32), front)

        descend = aabb_hit & ~is_leaf
        nxt = jnp.where(descend, nd + 1, miss_link)
        if any_hit:
            nxt = jnp.where(tri_hit, -1, nxt)
        node = jnp.where(active, nxt, -1)
        return (node, prim, t, u, v, front)

    node0 = istate_ref[0:1, :]
    prim0 = istate_ref[1:2, :]
    t0 = fstate_ref[0:1, :]
    u0 = fstate_ref[1:2, :]
    v0 = fstate_ref[2:3, :]
    fr0 = fstate_ref[3:4, :]
    node, prim, t, u, v, front = jax.lax.fori_loop(
        0, _K, body, (node0, prim0, t0, u0, v0, fr0))
    iout_ref[0:1, :] = node
    iout_ref[1:2, :] = prim
    fout_ref[0:1, :] = t
    fout_ref[1:2, :] = u
    fout_ref[2:3, :] = v
    fout_ref[3:4, :] = front


@functools.partial(jax.jit, static_argnames=("any_hit", "m_nodes"))
def _traverse_call(nodes_t, o_t, d_t, lim, any_hit: bool, m_nodes: int):
    n = o_t.shape[1]
    grid = n // _NB
    kern = functools.partial(_step_kernel, m_nodes=m_nodes, any_hit=any_hit)

    block = lambda r: pl.BlockSpec((r, _NB), lambda b: (0, b),
                                   memory_space=pltpu.VMEM)
    launch = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_C, nodes_t.shape[1]), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            block(3), block(3), block(2), block(4), block(2),
        ],
        out_specs=(block(4), block(2)),
        out_shape=(
            jax.ShapeDtypeStruct((4, n), jnp.float32),
            jax.ShapeDtypeStruct((2, n), jnp.int32),
        ),
        input_output_aliases={4: 0, 5: 1},
    )

    fstate = jnp.concatenate([lim[1:2], jnp.zeros((3, n), jnp.float32)])
    istate = jnp.concatenate([jnp.zeros((1, n), jnp.int32),
                              jnp.full((1, n), -1, jnp.int32)])

    def cond(s):
        return jnp.any(s[1][0] >= 0)

    def body(s):
        return launch(nodes_t, o_t, d_t, lim, s[0], s[1])

    fstate, istate = jax.lax.while_loop(cond, body, (fstate, istate))
    return fstate, istate


def traverse_vmem(bvh_nodes: jnp.ndarray, o, d, tmin, tmax, any_hit: bool):
    """VMEM traversal over rays [N,3]; N padded to _NB internally.

    Returns dict(t [N], prim [N] packed-leaf index (-1 miss), uv [N,2],
    front [N] bool)."""
    n = o.shape[0]
    npad = max(int(np.ceil(n / _NB)) * _NB, _NB)
    nodes_t = _pad_nodes_t(bvh_nodes)

    def pad(x, fill=0.0):
        if npad == n:
            return x
        return jnp.concatenate(
            [x, jnp.full((npad - n, *x.shape[1:]), fill, x.dtype)])

    o_t = pad(o).T
    d_t = pad(d, 1.0).T
    lim = jnp.stack([pad(tmin), pad(tmax, -1.0)])   # padded rays idle

    fstate, istate = _traverse_call(nodes_t, o_t, d_t, lim, any_hit,
                                    int(nodes_t.shape[1]))
    return dict(
        t=fstate[0, :n],
        prim=istate[1, :n],
        uv=fstate[1:3, :n].T,
        front=fstate[3, :n] > 0.5,
    )
