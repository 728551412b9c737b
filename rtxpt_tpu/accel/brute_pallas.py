"""Pallas kernel for the MXU brute-force intersector (accel/brute.py).

The XLA version materializes ~8 [N,T] intermediates in HBM per query
(~10x the roofline cost). This kernel tiles rays x triangles in VMEM:
per (ray-block, tri-chunk) it runs the four small matmuls on the MXU and
keeps only the running closest-hit per ray, so HBM traffic is O(rays).

No dependent gathers, no while_loop — a fixed fori over triangle chunks —
i.e. none of the Mosaic constructs that faulted the traversal kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NB = 512     # rays per grid block
_TC = 512     # triangle chunk (lanes of the [NB, TC] tiles)
_BIG = 1e30


def _kernel(tri_ref, v0n_ref, o_ref, d_ref, lim_ref,
            t_out, prim_out, uvf_out, *, n_chunks: int, any_hit: bool):
    """tri_ref [16, Tpad]: rows 0:3 e1, 3:6 e2, 6:9 n, 9:12 v0xe2,
    12:15 v0xe1, 15 pad; v0n_ref [1, Tpad]; o/d [NB,3]; lim [NB,2]."""
    o = o_ref[:]                       # [NB,3]
    d = d_ref[:]
    tmin = lim_ref[:, 0:1]             # [NB,1]
    tmax = lim_ref[:, 1:2]
    oxd = jnp.cross(o, d)

    def mm(a, b):                      # [NB,3] @ [3,TC]
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def body(c, carry):
        best_t, best_meta = carry      # [NB,1], [NB,4] (prim,u,v,front)
        lo = c * _TC
        e1 = tri_ref[0:3, pl.dslice(lo, _TC)]
        e2 = tri_ref[3:6, pl.dslice(lo, _TC)]
        nn = tri_ref[6:9, pl.dslice(lo, _TC)]
        v0xe2 = tri_ref[9:12, pl.dslice(lo, _TC)]
        v0xe1 = tri_ref[12:15, pl.dslice(lo, _TC)]
        v0n = v0n_ref[0:1, pl.dslice(lo, _TC)]

        det = -mm(d, nn)
        u_num = mm(oxd, e2) + mm(d, v0xe2)
        v_num = -mm(oxd, e1) - mm(d, v0xe1)
        t_num = mm(o, nn) - v0n

        ok = jnp.abs(det) > 1e-12
        inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        u = u_num * inv
        v = v_num * inv
        t = t_num * inv
        valid = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                 & (t > tmin) & (t < tmax) & (t < best_t))
        t_m = jnp.where(valid, t, _BIG)                    # [NB,TC]
        t_c = jnp.min(t_m, axis=1, keepdims=True)          # [NB,1]
        hit_c = t_c < best_t
        # manual argmin: smallest lane index attaining t_c
        iota = jax.lax.broadcasted_iota(jnp.int32, (_NB, _TC), 1)
        j = jnp.min(jnp.where(t_m <= t_c, iota, _TC * n_chunks + 1),
                    axis=1, keepdims=True)                  # [NB,1]
        sel = (iota == j)
        def pick(x):
            return jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)
        prim_c = (j + lo).astype(jnp.float32)
        u_c = pick(u)
        v_c = pick(v)
        f_c = pick((det > 0.0).astype(jnp.float32))
        meta_c = jnp.concatenate([prim_c, u_c, v_c, f_c], axis=1)
        best_meta = jnp.where(hit_c, meta_c, best_meta)
        best_t = jnp.where(hit_c, t_c, best_t)
        return (best_t, best_meta)

    init = (jnp.full((_NB, 1), _BIG, jnp.float32),
            jnp.concatenate([jnp.full((_NB, 1), -1.0, jnp.float32),
                             jnp.zeros((_NB, 3), jnp.float32)], axis=1))
    best_t, best_meta = jax.lax.fori_loop(0, n_chunks, body, init)
    hit = best_t[:, 0] < _BIG
    t_out[:, 0] = jnp.where(hit, best_t[:, 0], tmax[:, 0])
    prim_out[:, 0] = jnp.where(hit, best_meta[:, 0].astype(jnp.int32), -1)
    uvf_out[:] = best_meta[:, 1:4]


@functools.partial(jax.jit, static_argnames=("n_chunks", "any_hit"))
def _call(tri_pack, v0n, o, d, lim, n_chunks: int, any_hit: bool):
    n = o.shape[0]
    grid = n // _NB
    kern = functools.partial(_kernel, n_chunks=n_chunks, any_hit=any_hit)
    tpad = tri_pack.shape[1]
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((16, tpad), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tpad), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NB, 3), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NB, 3), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NB, 2), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_NB, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NB, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NB, 3), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 3), jnp.float32),
        ),
    )(tri_pack, v0n, o, d, lim)


def pack_tris(brute) -> tuple:
    """BruteTris -> ([16, Tpad] f32, [1, Tpad] f32, n_chunks)."""
    t = brute.num_triangles
    tpad = max(int(np.ceil(t / _TC)) * _TC, _TC)
    pack = jnp.zeros((16, tpad), jnp.float32)
    pack = pack.at[0:3, :t].set(brute.e1_t)
    pack = pack.at[3:6, :t].set(brute.e2_t)
    pack = pack.at[6:9, :t].set(brute.n_t)
    pack = pack.at[9:12, :t].set(brute.v0xe2_t)
    pack = pack.at[12:15, :t].set(brute.v0xe1_t)
    v0n = jnp.zeros((1, tpad), jnp.float32).at[0, :t].set(brute.v0n)
    # padding triangles: n = 0 -> det = 0 -> never valid
    return pack, v0n, tpad // _TC


def intersect_brute_pallas(brute, o, d, tmin, tmax, any_hit: bool):
    """Dispatch entry: same contract as brute._intersect_chunk over [N]."""
    n = o.shape[0]
    npad = max(int(np.ceil(n / _NB)) * _NB, _NB)
    pack, v0n, n_chunks = pack_tris(brute)

    def pad(x, fill=0.0):
        if npad == n:
            return x
        return jnp.concatenate(
            [x, jnp.full((npad - n, *x.shape[1:]), fill, x.dtype)])

    lim = jnp.stack([pad(tmin), pad(tmax, -1.0)], axis=1)
    t_o, prim_o, uvf_o = _call(pack, v0n, pad(o), pad(d, 1.0), lim,
                               n_chunks, any_hit)
    return dict(
        t=t_o[:n, 0],
        prim=prim_o[:n, 0],
        uv=uvf_o[:n, 0:2],
        front=uvf_o[:n, 2] > 0.5,
    )
