"""Environment map: equirect radiance + flat-CDF importance sampling.

TPU-native analog of the reference's distant-light stack (reference:
Lighting/Distant/EnvMapBaker.{h,cpp} — bakes sources into a cubemap;
EnvMapImportanceSamplingBaker builds a MIP-descent importance map;
device sampling in Shaders/PathTracer/Lighting/EnvMap.hlsli).

Design: instead of the equal-area-octahedral cubemap + MIP descent (a
texture-unit-shaped structure), we keep the equirect lat-long image
HBM-resident and importance-sample through a single flattened texel CDF —
binary search = log2(H*W) gathers per ray, fully vectorized. Azimuthal
rotation is applied in the direction<->uv mapping like the reference's
rotation transform.

Coordinate convention: y-up; u = azimuth around +y from +x toward +z,
v = polar angle from +y.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
from flax import struct

from rtxpt_tpu.utils import math as m


@struct.dataclass
class EnvMap:
    image: jnp.ndarray       # [H,W,3] radiance (pre-scaled)
    row_cdf: jnp.ndarray     # [H] inclusive CDF of the row marginal
    cond_cdf: jnp.ndarray    # [H,W] inclusive CDF of each row's conditional
    texel_pdf: jnp.ndarray   # [H,W] discrete selection pdf per texel
    cos_rot: jnp.ndarray     # [] azimuth rotation
    sin_rot: jnp.ndarray     # []
    mean_radiance: jnp.ndarray  # [3]

    @property
    def shape(self):
        return self.image.shape[:2]


def resample_equirect(image: np.ndarray, h: int, w: int) -> np.ndarray:
    """Box-average an equirect [H,W,3] down/up to (h,w) (energy-preserving
    per solid-angle bin; used to bake the kernel-resolution env copy)."""
    image = np.asarray(image, np.float32)
    sh, sw = image.shape[:2]
    ys = (np.arange(h * 2) * sh) // (h * 2)
    xs = (np.arange(w * 2) * sw) // (w * 2)
    up = image[np.clip(ys, 0, sh - 1)][:, np.clip(xs, 0, sw - 1)]
    return up.reshape(h, 2, w, 2, 3).mean((1, 3))


def bake_envmap(image: Optional[np.ndarray], scale: float = 1.0,
                rotation: float = 0.0, res=None) -> EnvMap:
    """Build device EnvMap from an equirect [H,W,3] image (None = black).

    `res=(h,w)` resamples the source — prepare() uses this to bake the
    fixed kernel resolution shared by the Pallas and XLA paths (the
    reference similarly bakes distant light into a fixed-res cubemap +
    reduced-res importance map, Lighting/Distant/EnvMapBaker.h:40-60).

    Importance sampling uses a TWO-LEVEL CDF (row marginal + per-row
    conditional) with exact residue-rescaling — identical math in the
    XLA sampler below and in the Pallas kernels' in-register inverse
    (pt/bounce_pallas.py), so both paths draw the same texel from the
    same uniforms."""
    if image is None:
        image = np.zeros((4, 8, 3), np.float32)
    image = np.asarray(image, np.float32) * scale
    if res is not None and tuple(image.shape[:2]) != tuple(res):
        image = resample_equirect(image, res[0], res[1])
    h, w = image.shape[:2]
    lum = (image[..., 0] * 0.2126 + image[..., 1] * 0.7152
           + image[..., 2] * 0.0722)
    theta = (np.arange(h) + 0.5) / h * np.pi
    weight = lum * np.sin(theta)[:, None]
    total = weight.sum()
    if total <= 0.0:
        weight = np.ones_like(weight)
        total = weight.sum()
    pdf = weight / total                      # [h,w] texel selection pmf
    row_p = pdf.sum(axis=1)                   # [h] row marginal
    row_cdf = np.cumsum(row_p)
    row_cdf[-1] = 1.0
    cond = pdf / np.maximum(row_p[:, None], 1e-12)
    cond = np.where(row_p[:, None] > 0, cond, 1.0 / w)
    cond_cdf = np.cumsum(cond, axis=1)
    cond_cdf[:, -1] = 1.0
    # Solid angle per texel row: dOmega = (2pi/w)*(pi/h)*sin(theta)
    return EnvMap(
        image=jnp.asarray(image),
        row_cdf=jnp.asarray(row_cdf.astype(np.float32)),
        cond_cdf=jnp.asarray(cond_cdf.astype(np.float32)),
        texel_pdf=jnp.asarray(pdf.astype(np.float32)),
        cos_rot=jnp.float32(np.cos(rotation)),
        sin_rot=jnp.float32(np.sin(rotation)),
        # Cosine-free sphere average, sin-weighted for equirect area measure.
        mean_radiance=jnp.asarray(
            (image * np.sin(theta)[:, None, None]).sum((0, 1))
            / max(np.sin(theta).sum() * image.shape[1], 1e-9)),
    )


def _dir_to_uv(env: EnvMap, d):
    """World direction -> (u,v) in [0,1)^2 with rotation."""
    x = env.cos_rot * d[..., 0] + env.sin_rot * d[..., 2]
    z = -env.sin_rot * d[..., 0] + env.cos_rot * d[..., 2]
    u = (jnp.arctan2(z, x) / (2.0 * jnp.pi)) % 1.0
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi
    return u, v


def _uv_to_dir(env: EnvMap, u, v):
    phi = u * 2.0 * jnp.pi
    theta = v * jnp.pi
    st = jnp.sin(theta)
    x = st * jnp.cos(phi)
    z = st * jnp.sin(phi)
    y = jnp.cos(theta)
    xr = env.cos_rot * x - env.sin_rot * z
    zr = env.sin_rot * x + env.cos_rot * z
    return jnp.stack([xr, y, zr], axis=-1)


def env_eval(env: EnvMap, d):
    """Radiance from direction d (nearest texel), [N,3]."""
    h, w = env.shape
    u, v = _dir_to_uv(env, d)
    xi = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    return env.image[yi, xi]


def _texel_solid_angle(env: EnvMap, yi):
    h, w = env.shape
    theta = (yi.astype(jnp.float32) + 0.5) / h * jnp.pi
    return (2.0 * jnp.pi / w) * (jnp.pi / h) * jnp.maximum(
        jnp.sin(theta), 1e-6)


def env_pdf(env: EnvMap, d):
    """Solid-angle pdf of env_sample() producing direction d, [N]."""
    h, w = env.shape
    u, v = _dir_to_uv(env, d)
    xi = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    return env.texel_pdf[yi, xi] / _texel_solid_angle(env, yi)


def env_sample(env: EnvMap, u1, u2):
    """Importance-sample the env map. Returns (dir [N,3], radiance [N,3],
    pdf [N]). Two-level inversion: u1 -> row (marginal CDF), u2 -> column
    (conditional CDF); the rescaled residues of both give the exact
    sub-texel jitter, so two uniforms suffice (standard inversion trick;
    matches the in-kernel sampler in pt/bounce_pallas.py bit-for-bit)."""
    h, w = env.shape
    u1 = jnp.clip(u1, 0.0, 1.0 - 1e-7)
    u2 = jnp.clip(u2, 0.0, 1.0 - 1e-7)
    yi = jnp.clip(jnp.sum((env.row_cdf[None, :] <= u1[..., None])
                          .astype(jnp.int32), axis=-1), 0, h - 1)
    c_lo = jnp.where(yi > 0, env.row_cdf[jnp.maximum(yi - 1, 0)], 0.0)
    c_hi = env.row_cdf[yi]
    jv = jnp.clip((u1 - c_lo) / jnp.maximum(c_hi - c_lo, 1e-12), 0.0,
                  1.0 - 1e-6)
    cond = env.cond_cdf[yi]                                # [N,w]
    xi = jnp.clip(jnp.sum((cond <= u2[..., None]).astype(jnp.int32),
                          axis=-1), 0, w - 1)
    d_lo = jnp.where(xi > 0,
                     jnp.take_along_axis(cond,
                                         jnp.maximum(xi - 1, 0)[..., None],
                                         axis=-1)[..., 0], 0.0)
    d_hi = jnp.take_along_axis(cond, xi[..., None], axis=-1)[..., 0]
    ju = jnp.clip((u2 - d_lo) / jnp.maximum(d_hi - d_lo, 1e-12), 0.0,
                  1.0 - 1e-6)
    u = (xi.astype(jnp.float32) + ju) / w
    v = (yi.astype(jnp.float32) + jv) / h
    d = _uv_to_dir(env, u, v)
    radiance = env.image[yi, xi]
    pdf = env.texel_pdf[yi, xi] / _texel_solid_angle(env, yi)
    return d, radiance, pdf
