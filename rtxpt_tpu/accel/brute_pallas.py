"""Pallas kernel for the MXU brute-force intersector (accel/brute.py).

The XLA version materializes ~8 [N,T] intermediates in HBM per query.
This kernel tiles rays x triangles in VMEM and keeps only the running
closest hit per ray, so HBM traffic is O(rays).

MXU formulation: all four Möller-Trumbore quantities are linear in the
per-ray vector r = [d, oxd, o, 1] (see accel/brute.py), so ONE
[NB,128] @ [128, 4*TC] matmul per chunk yields det/u_num/v_num/t_num
together — K is padded to 128 (free: the MXU pads internally anyway, and
Mosaic requires lane-aligned contracting dims).

Runtime-safety (docs/PERF_NOTES.md): no in-kernel while/fori, no dynamic
slices — chunks are python-unrolled, all slicing static.
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
_K = 128      # padded contracting dim (rows 0:3 d, 3:6 oxd, 6:9 o, 9 one)
PALLAS_MAX_TRIS = 2048   # rhs must stay VMEM-resident: [128, 4*Tpad]
_BIG = 1e30


def _kernel(tri_ref, rays_ref, lim_ref, t_out, prim_out, uvf_out,
            *, n_chunks: int):
    """tri_ref [K, 4*Tpad] (per-chunk groups of [det|u|v|t] blocks);
    rays_ref [NB, K]; lim [NB,2] (tmin, tmax)."""
    rays = rays_ref[:]
    tmin = lim_ref[:, 0:1]
    tmax = lim_ref[:, 1:2]

    best_t = jnp.full((_NB, 1), _BIG, jnp.float32)
    best_meta = jnp.concatenate(
        [jnp.full((_NB, 1), -1.0, jnp.float32),
         jnp.zeros((_NB, 3), jnp.float32)], axis=1)

    for c in range(n_chunks):
        base = 4 * c * _TC
        g = jax.lax.dot_general(
            rays, tri_ref[:, base:base + 4 * _TC],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)      # [NB, 4*TC]
        det = g[:, 0:_TC]
        u_num = g[:, _TC:2 * _TC]
        v_num = g[:, 2 * _TC:3 * _TC]
        t_num = g[:, 3 * _TC:4 * _TC]

        ok = jnp.abs(det) > 1e-12
        inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        u = u_num * inv
        v = v_num * inv
        t = t_num * inv
        valid = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                 & (t > tmin) & (t < tmax) & (t < best_t))
        t_m = jnp.where(valid, t, _BIG)
        t_c = jnp.min(t_m, axis=1, keepdims=True)
        hit_c = t_c < best_t
        iota = jax.lax.broadcasted_iota(jnp.int32, (_NB, _TC), 1)
        j = jnp.min(jnp.where(t_m <= t_c, iota, _TC), axis=1, keepdims=True)
        sel = iota == j

        def pick(x):
            return jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)

        meta_c = jnp.concatenate(
            [(j + c * _TC).astype(jnp.float32), pick(u), pick(v),
             pick((det > 0.0).astype(jnp.float32))], axis=1)
        best_meta = jnp.where(hit_c, meta_c, best_meta)
        best_t = jnp.where(hit_c, t_c, best_t)

    hit = best_t[:, 0:1] < _BIG
    t_out[:] = jnp.where(hit, best_t, tmax)
    prim_out[:] = jnp.where(hit, best_meta[:, 0:1].astype(jnp.int32), -1)
    uvf_out[:] = best_meta[:, 1:4]


@functools.partial(jax.jit, static_argnames=("n_chunks",))
def _call(tri_pack, rays, lim, n_chunks: int):
    n = rays.shape[0]
    grid = n // _NB
    kern = functools.partial(_kernel, n_chunks=n_chunks)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_K, tri_pack.shape[1]), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NB, _K), lambda b: (b, 0),
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
    )(tri_pack, rays, lim)


def pack_tris_np(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
                 n: np.ndarray) -> np.ndarray:
    """Host-side [K, 4*Tpad] operand table in per-chunk [det|u|v|t] groups.

    Linearization (accel/brute.py factorization):
      det   = d.(-n)
      u_num = d.(v0xe2)  + oxd.(e2)
      v_num = d.(-v0xe1) + oxd.(-e1)
      t_num = o.(n)      + 1*(-v0n)
    """
    t = len(v0)
    tpad = max(int(np.ceil(t / _TC)) * _TC, _TC)
    rhs = np.zeros((_K, 4 * tpad), np.float32)
    v0xe2 = np.cross(v0, e2).T
    v0xe1 = np.cross(v0, e1).T
    v0n = np.einsum("tj,tj->t", v0, n)
    e1t, e2t, nt = e1.T, e2.T, n.T
    for c in range(tpad // _TC):
        lo = c * _TC
        hi = min(lo + _TC, t)
        w = hi - lo
        if w <= 0:
            continue
        base = 4 * c * _TC
        rhs[0:3, base:base + w] = -nt[:, lo:hi]
        rhs[0:3, base + _TC:base + _TC + w] = v0xe2[:, lo:hi]
        rhs[3:6, base + _TC:base + _TC + w] = e2t[:, lo:hi]
        rhs[0:3, base + 2 * _TC:base + 2 * _TC + w] = -v0xe1[:, lo:hi]
        rhs[3:6, base + 2 * _TC:base + 2 * _TC + w] = -e1t[:, lo:hi]
        rhs[6:9, base + 3 * _TC:base + 3 * _TC + w] = nt[:, lo:hi]
        rhs[9, base + 3 * _TC:base + 3 * _TC + w] = -v0n[lo:hi]
    return rhs


def pack_tris(brute):
    """Return (rhs [K, 4*Tpad], n_chunks) — the table is baked at
    scene-prep time (brute_from_edges)."""
    if brute.pallas_rhs is None:
        raise ValueError(
            "BruteTris.pallas_rhs missing; build via brute_from_edges")
    return brute.pallas_rhs, brute.pallas_rhs.shape[1] // (4 * _TC)


def pack_rays(o, d):
    """[N,3]x2 -> [N, K] ray operand rows [d | oxd | o | 1 | 0...]."""
    n = o.shape[0]
    oxd = jnp.cross(o, d)
    ones = jnp.ones((n, 1), jnp.float32)
    pad = jnp.zeros((n, _K - 10), jnp.float32)
    return jnp.concatenate([d, oxd, o, ones, pad], axis=1)


def intersect_brute_pallas(brute, o, d, tmin, tmax):
    """Closest-hit over rays [N,3] via the VMEM-tiled kernel. Returns the
    same dict contract as brute._intersect_chunk."""
    n = o.shape[0]
    npad = max(int(np.ceil(n / _NB)) * _NB, _NB)
    rhs, n_chunks = pack_tris(brute)

    def pad(x, fill=0.0):
        if npad == n:
            return x
        return jnp.concatenate(
            [x, jnp.full((npad - n, *x.shape[1:]), fill, x.dtype)])

    rays = pack_rays(pad(o), pad(d, 1.0))
    lim = jnp.stack([pad(tmin), pad(tmax, -1.0)], axis=1)
    t_o, prim_o, uvf_o = _call(rhs, rays, lim, n_chunks)
    return dict(
        t=t_o[:n, 0],
        prim=prim_o[:n, 0],
        uv=uvf_o[:n, 0:2],
        front=uvf_o[:n, 2] > 0.5,
    )
