"""Local light probe: ray-traced radiance probe + GGX prefilter + SH.

Analog of IntroSample's local cubemap pipeline (reference:
IntroSample.cpp:110 UpdateLocalCubemap/ProcessLocalCubemap,
Shaders/IntroSample/LocalCubemapRT.hlsl + CubemapProcessing.hlsl —
ray-traced cubemap at a probe point, GGX-prefiltered MIP chain for
split-sum specular IBL, SH-projected irradiance for ambient diffuse).

TPU-first redesign:
  * the probe is an EQUIRECT map (matches lighting/envmap.py; no cubemap
    face plumbing) traced as ONE ray wavefront from the probe center,
    shaded with emissive + one-sample NEE direct + env on miss — the
    same "direct-lit scene" content LocalCubemapRT.hlsl renders;
  * GGX prefiltering is a dense [texels_out, texels_in] matmul per
    roughness level — weights depend only on the direction grid, so the
    operator is built once per resolution and the per-bake cost is a
    handful of MXU matmuls instead of a filtering pass hierarchy;
  * irradiance is an exact SH-9 projection (CubemapProcessing.hlsl SH
    path) evaluated per pixel with the cosine-convolution constants.

Split-sum environment BRDF uses Karis' analytic approximation instead
of a baked 2D LUT (BRDF LUT analog with zero bake cost).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, NamedTuple

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.utils import math as m

PROBE_H, PROBE_W = 32, 64
_MIP_ROUGHNESS = (0.12, 0.25, 0.45, 0.7, 1.0)


class LocalProbe(NamedTuple):
    base: jnp.ndarray          # [H,W,3] traced radiance (mip 0)
    mips: jnp.ndarray          # [L,H,W,3] GGX-prefiltered levels
    sh: jnp.ndarray            # [9,3] radiance SH coefficients
    center: jnp.ndarray        # [3]


def _equirect_dirs(h: int, w: int):
    """Direction + solid angle per texel (matches lighting/envmap.py's
    equirect convention: v=theta/pi, u=phi/2pi)."""
    v = (np.arange(h) + 0.5) / h
    u = (np.arange(w) + 0.5) / w
    theta = v * np.pi
    phi = u * 2.0 * np.pi
    st = np.sin(theta)[:, None]
    d = np.stack([st * np.cos(phi)[None, :],
                  np.broadcast_to(np.cos(theta)[:, None], (h, w)),
                  st * np.sin(phi)[None, :]], axis=-1)
    domega = (np.pi / h) * (2.0 * np.pi / w) * st
    return d.reshape(-1, 3), np.broadcast_to(domega, (h, w)).reshape(-1)


@lru_cache(maxsize=4)
def _ggx_operators(h: int, w: int):
    """Per-mip [N,N] row-stochastic GGX-NDF filtering operators."""
    d, dw = _equirect_dirs(h, w)
    cosm = np.clip(d @ d.T, -1.0, 1.0)          # [N,N] n.l
    ops = []
    for r in _MIP_ROUGHNESS:
        a2 = max(r * r, 1e-3) ** 2
        # NDF(m = half-way of mirror pair) approximated by the standard
        # prefilter convention: weight by D(cos) * cos over the sphere
        c = np.clip(cosm, 0.0, 1.0)
        dd = c * c * (a2 - 1.0) + 1.0
        wgt = (a2 / np.maximum(np.pi * dd * dd, 1e-9)) * c * dw[None, :]
        wgt /= np.maximum(wgt.sum(-1, keepdims=True), 1e-12)
        ops.append(wgt.astype(np.float32))
    return np.stack(ops)                        # [L,N,N]


_SH_C = np.asarray([0.282095,
                    0.488603, 0.488603, 0.488603,
                    1.092548, 1.092548, 0.315392, 1.092548, 0.546274],
                   np.float32)
# cosine-lobe convolution constants (Ramamoorthi & Hanrahan)
_SH_A = np.asarray([np.pi,
                    2.0943951, 2.0943951, 2.0943951,
                    0.785398, 0.785398, 0.785398, 0.785398, 0.785398],
                   np.float32)


def _sh_basis(d):
    """SH-9 basis rows for directions d [...,3] (y-up)."""
    lib = np if isinstance(d, np.ndarray) else jnp
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    B = [lib.ones_like(x), y, z, x, x * y, y * z,
         3.0 * z * z - 1.0, x * z, x * x - y * y]
    return lib.stack([_SH_C[i] * B[i] for i in range(9)], axis=-1)


def bake_probe(scene, center=None, res=(PROBE_H, PROBE_W),
               frame_index: int = 0) -> LocalProbe:
    """Trace + process the probe (UpdateLocalCubemap + ProcessLocalCubemap
    analog; amortize by re-baking every few frames like the reference's
    3-frame split)."""
    from rtxpt_tpu.accel.traverse import scene_any, scene_closest
    from rtxpt_tpu.lighting.envmap import env_eval
    from rtxpt_tpu.lighting.lights_baker import sample_light
    from rtxpt_tpu.pt import bsdf as B
    from rtxpt_tpu.pt.surface import load_surface, ray_offset
    from rtxpt_tpu.utils import rng

    h, w = res
    if center is None:
        pos = np.asarray(scene.geometry.positions)
        center = (pos.min(0) + pos.max(0)) * 0.5
    center = jnp.asarray(np.asarray(center, np.float32))

    d_np, _ = _equirect_dirs(h, w)
    n = h * w
    d = jnp.asarray(d_np.astype(np.float32))
    o = jnp.broadcast_to(center, (n, 3))
    f32 = jnp.float32

    hit = scene_closest(scene, o, d, jnp.full((n,), 1e-4, f32),
                        jnp.full((n,), 1e30, f32))
    surf = load_surface(scene, hit, o, d, jnp.zeros((n,), f32))
    rad = surf.emissive
    if scene.lights is not None and int(np.asarray(scene.lights.num)) > 0:
        seed = rng.hash_combine(jnp.arange(n, dtype=jnp.uint32),
                                jnp.uint32(frame_index * 7919 + 0x51))
        ls = sample_light(scene.lights, scene.envmap, surf.pos,
                          rng.uniform_sample(seed, 0),
                          rng.uniform_sample(seed, 1),
                          rng.uniform_sample(seed, 2))
        wo_l = m.to_local(-d, surf.sh_n)
        wi_l = m.to_local(ls["wi"], surf.sh_n)
        f = B.bsdf_eval(surf.bsdf, wo_l, wi_l)
        so = ray_offset(surf.pos, surf.geo_n, ls["wi"])
        do = (~hit.miss) & ls["valid"]
        occ = scene_any(scene, so, ls["wi"], jnp.zeros((n,), f32),
                        jnp.where(do, ls["dist"] * (1 - 1e-4), 0.0))
        rad = rad + jnp.where((do & ~occ)[:, None],
                              f * ls["Li"]
                              / jnp.maximum(ls["pdf"], 1e-9)[:, None], 0.0)
    if scene.envmap is not None:
        rad = jnp.where(hit.miss[:, None], env_eval(scene.envmap, d), rad)
    rad = jnp.where(jnp.isfinite(rad), rad, 0.0)

    ops = jnp.asarray(_ggx_operators(h, w))            # [L,N,N]
    mips = jnp.einsum("lij,jc->lic", ops, rad)         # MXU matmuls
    _, dw = _equirect_dirs(h, w)
    sh = jnp.asarray(_sh_basis(d_np) * dw[:, None]).T @ rad   # [9,3]
    return LocalProbe(base=rad.reshape(h, w, 3),
                      mips=mips.reshape(len(_MIP_ROUGHNESS), h, w, 3),
                      sh=sh, center=center)


def probe_irradiance(probe: LocalProbe, normal):
    """Cosine-convolved SH irradiance / pi at `normal` [N,3] -> [N,3]
    (the Lambert-lobe ambient term; divide-by-pi folded so the caller
    multiplies by diffuse albedo directly)."""
    basis = _sh_basis(normal)                           # [N,9]
    conv = probe.sh * jnp.asarray(_SH_A)[:, None]       # [9,3]
    out = basis @ conv / jnp.pi
    return jnp.maximum(out, 0.0)


def probe_specular(probe: LocalProbe, refl_dir, roughness):
    """Prefiltered-probe lookup at the reflection direction with a
    roughness-interpolated level (split-sum first term)."""
    h, w = probe.base.shape[:2]
    x, y, z = refl_dir[..., 0], refl_dir[..., 1], refl_dir[..., 2]
    theta = jnp.arccos(jnp.clip(y, -1.0, 1.0))
    phi = jnp.arctan2(z, x) % (2.0 * jnp.pi)
    ti = jnp.clip((theta / jnp.pi) * h, 0, h - 1).astype(jnp.int32)
    pi_ = jnp.clip((phi / (2.0 * jnp.pi)) * w, 0, w - 1).astype(jnp.int32)
    flat = ti * w + pi_
    r = jnp.clip(roughness, 0.0, 1.0)
    lv = jnp.searchsorted(jnp.asarray(_MIP_ROUGHNESS), r).astype(jnp.int32)
    lv = jnp.clip(lv, 0, len(_MIP_ROUGHNESS) - 1)
    lv0 = jnp.maximum(lv - 1, 0)
    r0 = jnp.take(jnp.asarray(_MIP_ROUGHNESS), lv0)
    r1 = jnp.take(jnp.asarray(_MIP_ROUGHNESS), lv)
    t = jnp.where(lv > lv0, (r - r0) / jnp.maximum(r1 - r0, 1e-6), 0.0)
    flatmips = probe.mips.reshape(len(_MIP_ROUGHNESS), -1, 3)
    c = jnp.take(flatmips, flat, axis=1)               # [L,N,3]
    a = jnp.take_along_axis(c, lv0[None, :, None], axis=0)[0]
    b = jnp.take_along_axis(c, lv[None, :, None], axis=0)[0]
    return a * (1.0 - t[:, None]) + b * t[:, None]


def env_brdf_approx(f0, roughness, ndv):
    """Karis mobile split-sum environment BRDF (the BRDF-LUT analog):
    returns the scale/bias-combined specular reflectance [N,3]."""
    r = jnp.clip(roughness, 0.0, 1.0)[..., None]
    ndv = jnp.clip(ndv, 0.0, 1.0)[..., None]
    c0 = jnp.asarray([-1.0, -0.0275, -0.572, 0.022], jnp.float32)
    c1 = jnp.asarray([1.0, 0.0425, 1.04, -0.04], jnp.float32)
    x = r * c0 + c1                                       # [N,4]
    a004 = jnp.minimum(x[..., 0] * x[..., 0],
                       jnp.exp2(-9.28 * ndv[..., 0])) * x[..., 0] + x[..., 1]
    scale = a004 * -1.04 + x[..., 2]
    bias = a004 * 1.04 + x[..., 3]
    return f0 * scale[..., None] + bias[..., None]
