"""Opacity baking + alpha-tested traversal (OMM analog).

The reference bakes opacity micromaps so alpha-tested triangles resolve
opacity inside the traversal without anyhit shader round-trips (reference:
OpacityMicroMap/* OmmBaker + OmmBuildQueue, wired at Sample.cpp:2067-2076;
per-micro-triangle 2-bit states at subdivision level N, OmmBuildQueue.h:
31-142). TPU equivalent:

  * bake: per alpha-tested triangle, sample its base-color texture alpha
    over the UV footprint and classify OPAQUE / MIXED / TRANSPARENT.
    TRANSPARENT triangles are dropped from the BVH entirely; OPAQUE ones
    need no runtime test. MIXED triangles additionally get a level-2
    barycentric micromap: 16 micro-triangles x 2-bit state
    (0 opaque / 1 unknown / 2 transparent) packed into ONE uint32.
  * traversal: the leaf test inside the BVH while_loop decodes the hit's
    micro-triangle state — micro-TRANSPARENT hits are rejected *inside*
    the loop (the anyhit-free OMM fast path; one extra [T] gather per
    step), so foliage-class geometry no longer pays a full re-traversal
    per rejected hit.
  * runtime: only micro-UNKNOWN hits fall back to the texture alpha test
    + bounded masked re-trace over the wavefront.

The micro bake is sampled (not texel-exhaustive): decisive states need
every sample in the micro-triangle to agree, mirroring the reference's
conservative bake intent with a Monte-Carlo footprint.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

OPAQUE, MIXED, TRANSPARENT = 0, 1, 2
# micro-triangle 2-bit states (packed little-endian by micro index)
MICRO_OPAQUE, MICRO_UNKNOWN, MICRO_TRANSPARENT = 0, 1, 2
MICRO_LEVEL = 2                      # 4^2 = 16 micro-tris = 32 bits
_BAKE_SAMPLES = 64
_MICRO_SAMPLES = 16
MAX_ALPHA_RETRACE = 4


def micro_index(u, v, level: int = MICRO_LEVEL):
    """Micro-triangle index of barycentric (u, v) at `level` (S = 2^level
    rows): row b holds 2*(S-b)-1 cells (upright/inverted interleaved).
    Works for numpy and jnp inputs; matches the bake below (a consistent
    bake/decode pair is the whole contract — the reference's bird curve
    ordering is an SDK-internal detail)."""
    S = 1 << level
    eps = 1e-7
    uu = u * S
    vv = v * S
    if isinstance(u, np.ndarray) or np.isscalar(u):
        a = np.minimum(np.floor(uu), S - 1)
        b = np.minimum(np.floor(vv), S - 1)
        inv = ((uu - a) + (vv - b) > 1.0 + eps)
        a = np.minimum(a, S - 1 - b)
        idx = (b * (2 * S - b) + 2 * a
               + np.where(inv & (a + b < S - 1), 1, 0))
        return idx.astype(np.int64) if isinstance(idx, np.ndarray) else int(idx)
    a = jnp.minimum(jnp.floor(uu), S - 1)
    b = jnp.minimum(jnp.floor(vv), S - 1)
    inv = ((uu - a) + (vv - b) > 1.0 + eps)
    a = jnp.minimum(a, S - 1 - b)
    idx = (b * (2 * S - b) + 2 * a
           + jnp.where(inv & (a + b < S - 1), 1.0, 0.0))
    return idx.astype(jnp.int32)


def _micro_sample_grid(level: int):
    """Per-micro-triangle barycentric sample points: returns
    (uv_upright [M,2], uv_inverted [M,2]) local (s1, s2) with s1+s2<=1."""
    rng = np.random.default_rng(13)
    s1 = rng.uniform(0, 1, _MICRO_SAMPLES)
    s2 = rng.uniform(0, 1, _MICRO_SAMPLES)
    flip = s1 + s2 > 1
    s1 = np.where(flip, 1 - s1, s1)
    s2 = np.where(flip, 1 - s2, s2)
    return np.stack([s1, s2], -1)


def bake_opacity(host_scene, materials, textures_np) -> Optional[np.ndarray]:
    """Classify every flattened triangle. Returns [T] uint8 or None when
    the scene has no alpha-tested materials (OmmBaker analog)."""
    out = bake_opacity_micromaps(host_scene, materials, textures_np)
    return None if out is None else out[0]


def bake_opacity_micromaps(host_scene, materials, textures_np):
    """Full OMM bake: returns (classes [T] uint8, micromaps [T] uint32,
    cover_unknown [T] f32) or None. micromaps pack 16 2-bit
    micro-triangle states (level 2, micro_index order) — decisive micro
    states resolve alpha inside the traversal (OmmBuildQueue.h:31-142
    subdivision analog). cover_unknown is the mean alpha-pass fraction
    over the UNKNOWN cells — the Pallas shadow kernels resolve UNKNOWN
    occlusion stochastically against it. Host numpy."""
    cutoff = np.asarray(materials.alpha_cutoff)
    tex_idx = np.asarray(materials.base_color_tex)
    if not (cutoff >= 0).any() or textures_np is None:
        return None

    rng = np.random.default_rng(7)
    b1 = rng.uniform(0, 1, _BAKE_SAMPLES)
    b2 = rng.uniform(0, 1, _BAKE_SAMPLES)
    flip = b1 + b2 > 1
    b1 = np.where(flip, 1 - b1, b1)
    b2 = np.where(flip, 1 - b2, b2)

    S = 1 << MICRO_LEVEL
    n_micro = S * S
    ss = _micro_sample_grid(MICRO_LEVEL)                 # [M,2]
    # precompute per-micro-cell (u,v) sample points in micro_index order
    micro_uv = np.zeros((n_micro, _MICRO_SAMPLES, 2), np.float64)
    for b in range(S):
        for a in range(S - b):
            up = (np.stack([a + ss[:, 0], b + ss[:, 1]], -1)) / S
            idx_up = b * (2 * S - b) + 2 * a
            micro_uv[idx_up] = up
            if a + b < S - 1:
                inv = (np.stack([a + 1 - ss[:, 0], b + 1 - ss[:, 1]],
                                -1)) / S
                micro_uv[idx_up + 1] = inv
    micro_uv = micro_uv.reshape(-1, 2)                   # [n_micro*M, 2]
    w0 = 1.0 - micro_uv[:, 0] - micro_uv[:, 1]

    classes = []
    micromaps = []
    covers = []
    for inst in host_scene.instances:
        uv = inst.uvs
        for t in range(len(inst.indices)):
            mat = int(inst.material[t])
            if cutoff[mat] < 0 or tex_idx[mat] < 0:
                classes.append(OPAQUE)
                micromaps.append(0)
                covers.append(1.0)
                continue
            img = textures_np[int(tex_idx[mat])]
            if img.shape[-1] < 4:
                classes.append(OPAQUE)
                micromaps.append(0)
                covers.append(1.0)
                continue
            i0, i1, i2 = inst.indices[t]

            def alpha_at(uvpts, wts=None):
                h, w = img.shape[:2]
                xi = np.clip((uvpts[:, 0] % 1.0) * w, 0, w - 1).astype(int)
                yi = np.clip((uvpts[:, 1] % 1.0) * h, 0, h - 1).astype(int)
                a = img[yi, xi, 3]
                if a.dtype == np.uint8:
                    a = a.astype(np.float32) / 255.0
                return a

            uvs = (uv[i0][None] * (1 - b1 - b2)[:, None]
                   + uv[i1][None] * b1[:, None]
                   + uv[i2][None] * b2[:, None])
            a = alpha_at(uvs)
            frac = float((a >= cutoff[mat]).mean())
            if frac >= 1.0 - 1e-6:
                classes.append(OPAQUE)
                micromaps.append(0)
                covers.append(1.0)
            elif frac <= 1e-6:
                classes.append(TRANSPARENT)
                micromaps.append(0)
                covers.append(0.0)
            else:
                classes.append(MIXED)
                # level-2 micromap: texture uv at each micro sample point
                uvm = (uv[i0][None] * w0[:, None]
                       + uv[i1][None] * micro_uv[:, 0:1]
                       + uv[i2][None] * micro_uv[:, 1:2])
                am = alpha_at(uvm).reshape(n_micro, _MICRO_SAMPLES)
                passed = (am >= cutoff[mat])
                st = np.where(passed.all(-1), MICRO_OPAQUE,
                              np.where(~passed.any(-1), MICRO_TRANSPARENT,
                                       MICRO_UNKNOWN)).astype(np.uint32)
                word = np.uint32(0)
                for k in range(n_micro):
                    word |= np.uint32(st[k]) << np.uint32(2 * k)
                micromaps.append(int(word))
                unk = st == MICRO_UNKNOWN
                covers.append(float(passed[unk].mean()) if unk.any()
                              else float(frac))
    return (np.asarray(classes, np.uint8),
            np.asarray(micromaps, np.uint32),
            np.asarray(covers, np.float32))


def intersect_any_alpha(scene, o, d, tmin, tmax):
    """Visibility with alpha testing: a MIXED hit whose alpha fails the
    cutoff does not occlude — re-trace past it (bounded)."""
    hit = intersect_closest_alpha(scene, o, d, tmin, tmax)
    return ~hit.miss


def intersect_closest_alpha(scene, o, d, tmin, tmax):
    """Closest-hit with alpha testing: re-trace past MIXED hits whose
    texture alpha fails the material cutoff (Bridge::AlphaTest analog,
    PathTracerBridgeDonut.hlsli:968)."""
    from rtxpt_tpu.accel.traverse import intersect_closest
    from rtxpt_tpu.scene.textures import sample_texture

    geo = scene.geometry
    mats = scene.materials
    n = o.shape[0]
    hit = intersect_closest(scene.bvh, o, d, tmin, tmax)
    if scene.tri_opacity is None or scene.textures is None:
        return hit

    cur_tmin = tmin
    for _ in range(MAX_ALPHA_RETRACE):
        prim = jnp.maximum(hit.prim, 0)
        klass = jnp.take(scene.tri_opacity, prim)
        mixed = (~hit.miss) & (klass == MIXED)
        # sample alpha at the hit uv
        tri = jnp.take(geo.indices, prim, axis=0)
        t0 = jnp.take(geo.uvs, tri[..., 0], axis=0)
        t1 = jnp.take(geo.uvs, tri[..., 1], axis=0)
        t2 = jnp.take(geo.uvs, tri[..., 2], axis=0)
        u = hit.bary[..., 0:1]
        v = hit.bary[..., 1:2]
        uv = (1 - u - v) * t0 + u * t1 + v * t2
        mid = jnp.take(geo.tri_material, prim)
        tex = jnp.take(mats.base_color_tex, mid)
        cut = jnp.take(mats.alpha_cutoff, mid)
        rgba = sample_texture(scene.textures, tex, uv,
                              jnp.zeros((n,), jnp.float32))
        tex_fail = (rgba[..., 3] < cut) & (cut >= 0.0)
        if getattr(scene, "tri_micromap", None) is not None:
            # per-micro-triangle states: decisive ones never reach the
            # texture test (micro-TRANSPARENT final hits only occur on
            # traversal paths that skip the in-loop micromap, e.g. the
            # MXU brute intersector)
            mm = jnp.take(scene.tri_micromap, prim)
            mi = micro_index(hit.bary[..., 0], hit.bary[..., 1])
            st = (mm >> (2 * mi)) & 3
            fail = mixed & ((st == MICRO_TRANSPARENT)
                            | ((st == MICRO_UNKNOWN) & tex_fail))
        else:
            fail = mixed & tex_fail
        # re-trace from just past the rejected hit (bounded fixed loop; a
        # traced early-out is not possible under jit)
        # Relative epsilon: an absolute +1e-4 underflows in f32 for t >~1e3
        # (t + 1e-4 == t) and the retrace re-finds the same rejected hit.
        cur_tmin = jnp.where(fail, hit.t * (1.0 + 1e-4) + 1e-5, cur_tmin)
        hit2 = intersect_closest(scene.bvh, o, d, cur_tmin, tmax)
        hit = jax.tree.map(
            lambda a, b: jnp.where(
                fail.reshape(fail.shape + (1,) * (a.ndim - 1)), b, a),
            hit, hit2)
    return hit
