"""Wavefront stream ops: sort-by-key and compaction.

TPU-native stand-ins for two reference mechanisms (SURVEY.md §2.6):
  * SER (shader execution reordering, PathTracerSample.hlsl:136-151 +
    SERUtils.hlsli) -> sort the ray wavefront by a coherence key (material
    id / hit cluster) between bounce rounds so gathers hit the same cache
    lines and lobe branches agree within a vector;
  * GPUSort (FFX ParallelSort port, GPUSort/*) -> the same sort primitive,
    also used for light-proxy ordering in the NEE-AT baker.

Round 1 uses XLA's `jnp.argsort` (a bitonic/stable sort on TPU); the Pallas
radix sort replaces the internals later without changing this API.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sort_by_key(keys, *payloads):
    """Sort payload arrays by uint32/int32 keys ascending.

    Returns (perm, sorted_payloads...). perm can re-scatter results back
    with `unsort(perm, x)`."""
    perm = jnp.argsort(keys)
    return (perm,) + tuple(jnp.take(p, perm, axis=0) for p in payloads)


def unsort(perm, x):
    """Inverse of sort_by_key's permutation (scatter back to ray order)."""
    inv = jnp.argsort(perm)
    return jnp.take(x, inv, axis=0)


def hit_sort_key(prim, mat_id, active):
    """Coherence key: inactive lanes last, then material, then primitive
    (the reference sorts by a terminate-hint + hit key)."""
    key = (mat_id.astype(jnp.uint32) << 20) | (
        jnp.clip(prim, 0, (1 << 20) - 1).astype(jnp.uint32))
    return jnp.where(active, key, jnp.uint32(0xFFFFFFFF))


def compact_mask_prefix(active):
    """Stable partition indices: active lanes first. Returns (perm, n_active).
    perm[i] = old index of the lane that should sit at slot i."""
    order = jnp.argsort(jnp.where(active, 0, 1), stable=True)
    return order, jnp.sum(active.astype(jnp.int32))


def _spread6(v):
    v = (v | (v << 8)) & 0x00F00F
    v = (v | (v << 4)) & 0x0C30C3
    v = (v | (v << 2)) & 0x249249
    return v


def sort_rows_by_key(key, rows):
    """Sort stacked rows [K, N] by int32 keys ascending, carrying every
    row through XLA's sort network as a payload operand. On TPU this is
    ~3x faster than argsort + permutation-gather for wide wavefronts
    (measured 26 ms vs 51 ms at 14x2M f32): the sort's data movement is
    sequential, while a 2M-lane random gather is not.

    Returns (sorted_key, sorted_rows [K,N])."""
    out = jax.lax.sort(
        (key,) + tuple(rows[i] for i in range(rows.shape[0])), num_keys=1)
    return out[0], jnp.stack(out[1:])


def unsort_rows(src, rows):
    """Undo a lane permutation: `src[i]` = original lane index now living
    at slot i (carried through sort_rows_by_key as a payload). Sorting by
    `src` ascending restores original order — again through the sort
    network instead of a gather."""
    out = jax.lax.sort(
        (src,) + tuple(rows[i] for i in range(rows.shape[0])), num_keys=1)
    return jnp.stack(out[1:])


def pixel_morton_key(px, py):
    """22-bit image-space Morton key. Sorting the primary wavefront by it
    turns 1024-lane ray groups from 1920x0.5 scanline strips into ~32x32
    pixel tiles, which shrinks the clustered tier's per-group candidate
    lists ~2x (measured 60 -> 35 mean on the 340k-tri city)."""
    def spread16(v):
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v
    x = px.astype(jnp.int32)
    y = py.astype(jnp.int32)
    return (spread16(y) << 1) | spread16(x)


def ray_coherence_key(o3, d3, scene_lo, scene_ext, active):
    """SER-analog coherence key for inter-bounce ray sorting.

    Bit layout (high to low): 3-bit direction octant, 2-bit dominant
    axis, 15-bit origin-cell Morton (32^3 grid over the scene bounds);
    inactive lanes sort last (which doubles as compaction — their groups
    get empty candidate lists).

    Direction bits ride HIGH deliberately: the clustered tier's cull is
    an interval slab test, and a group mixing direction octants has
    per-component direction intervals spanning [-1,1] — the beam covers
    the whole scene and the candidate list saturates. Sign-pure groups
    (octant) with a shared dominant axis cut cull overflow ~4.4x on the
    city bounce-1 wavefront (658k -> 149k @ k=64). Reference:
    PathTracerSample.hlsl:136-151 + SERUtils.hlsli:22-50."""
    q = jnp.clip(((o3 - scene_lo[:, None]) / scene_ext[:, None]) * 31.0,
                 0.0, 31.0).astype(jnp.int32)
    cell = (_spread6(q[0]) << 2) | (_spread6(q[1]) << 1) | _spread6(q[2])
    octant = ((d3[0] > 0).astype(jnp.int32)
              | ((d3[1] > 0).astype(jnp.int32) << 1)
              | ((d3[2] > 0).astype(jnp.int32) << 2))
    dom = jnp.argmax(jnp.abs(d3), axis=0).astype(jnp.int32)
    key = (((octant << 2) | dom) << 15) | cell
    return jnp.where(active, key, jnp.int32(2 ** 30))
