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


def ray_coherence_key(o3, d3, scene_lo, scene_ext, active):
    """SER-analog coherence key for inter-bounce ray sorting: 18-bit
    origin-cell Morton (64^3 grid over the scene bounds) + 3-bit
    direction octant; inactive lanes sort last (which doubles as
    compaction — their groups get empty candidate lists). Used by the
    clustered driver (pt/bounce_clustered.py); reference:
    PathTracerSample.hlsl:136-151 + SERUtils.hlsli:22-50."""
    q = jnp.clip(((o3 - scene_lo[:, None]) / scene_ext[:, None]) * 63.0,
                 0.0, 63.0).astype(jnp.int32)
    cell = (_spread6(q[0]) << 2) | (_spread6(q[1]) << 1) | _spread6(q[2])
    octant = ((d3[0] > 0).astype(jnp.int32)
              | ((d3[1] > 0).astype(jnp.int32) << 1)
              | ((d3[2] > 0).astype(jnp.int32) << 2))
    return jnp.where(active, (cell << 3) | octant, jnp.int32(2 ** 30))
