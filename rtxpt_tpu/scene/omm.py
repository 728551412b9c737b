"""Opacity baking + alpha-tested traversal (OMM analog).

The reference bakes opacity micromaps so alpha-tested triangles resolve
opacity inside the traversal without anyhit shader round-trips (reference:
OpacityMicroMap/* OmmBaker + OmmBuildQueue, wired at Sample.cpp:2067-2076).
TPU equivalent:

  * bake: per alpha-tested triangle, sample its base-color texture alpha
    over the UV footprint and classify OPAQUE / MIXED / TRANSPARENT
    (a 1-state-per-triangle micromap; subdivision levels are a later
    refinement). TRANSPARENT triangles are dropped from the BVH entirely;
    OPAQUE ones need no runtime test.
  * runtime: closest-hit queries re-trace past MIXED hits whose sampled
    alpha fails the cutoff — a bounded masked loop over the wavefront.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

OPAQUE, MIXED, TRANSPARENT = 0, 1, 2
_BAKE_SAMPLES = 64
MAX_ALPHA_RETRACE = 4


def bake_opacity(host_scene, materials, textures_np) -> Optional[np.ndarray]:
    """Classify every flattened triangle. Returns [T] uint8 or None when the
    scene has no alpha-tested materials. Host-side numpy (OmmBaker analog)."""
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

    classes = []
    for inst in host_scene.instances:
        uv = inst.uvs
        for t in range(len(inst.indices)):
            mat = int(inst.material[t])
            if cutoff[mat] < 0 or tex_idx[mat] < 0:
                classes.append(OPAQUE)
                continue
            img = textures_np[int(tex_idx[mat])]
            if img.shape[-1] < 4:
                classes.append(OPAQUE)
                continue
            i0, i1, i2 = inst.indices[t]
            uvs = (uv[i0][None] * (1 - b1 - b2)[:, None]
                   + uv[i1][None] * b1[:, None]
                   + uv[i2][None] * b2[:, None])
            h, w = img.shape[:2]
            xi = np.clip((uvs[:, 0] % 1.0) * w, 0, w - 1).astype(int)
            yi = np.clip((uvs[:, 1] % 1.0) * h, 0, h - 1).astype(int)
            a = img[yi, xi, 3]
            if a.dtype == np.uint8:
                a = a.astype(np.float32) / 255.0
            frac = float((a >= cutoff[mat]).mean())
            if frac >= 1.0 - 1e-6:
                classes.append(OPAQUE)
            elif frac <= 1e-6:
                classes.append(TRANSPARENT)
            else:
                classes.append(MIXED)
    return np.asarray(classes, np.uint8)


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
        fail = mixed & (rgba[..., 3] < cut) & (cut >= 0.0)
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
