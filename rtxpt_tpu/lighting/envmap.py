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
    flat_cdf: jnp.ndarray    # [H*W] inclusive normalized CDF over texels
    texel_pdf: jnp.ndarray   # [H,W] discrete selection pdf per texel
    cos_rot: jnp.ndarray     # [] azimuth rotation
    sin_rot: jnp.ndarray     # []
    mean_radiance: jnp.ndarray  # [3]

    @property
    def shape(self):
        return self.image.shape[:2]


def bake_envmap(image: Optional[np.ndarray], scale: float = 1.0,
                rotation: float = 0.0) -> EnvMap:
    """Build device EnvMap from an equirect [H,W,3] image (None = black)."""
    if image is None:
        image = np.zeros((4, 8, 3), np.float32)
    image = np.asarray(image, np.float32) * scale
    h, w = image.shape[:2]
    lum = (image[..., 0] * 0.2126 + image[..., 1] * 0.7152
           + image[..., 2] * 0.0722)
    theta = (np.arange(h) + 0.5) / h * np.pi
    weight = lum * np.sin(theta)[:, None]
    total = weight.sum()
    if total <= 0.0:
        weight = np.ones_like(weight)
        total = weight.sum()
    pdf = weight / total
    cdf = np.cumsum(pdf.reshape(-1))
    cdf[-1] = 1.0
    # Solid angle per texel row: dOmega = (2pi/w)*(pi/h)*sin(theta)
    return EnvMap(
        image=jnp.asarray(image),
        flat_cdf=jnp.asarray(cdf.astype(np.float32)),
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
    pdf [N]). Uses u1 for texel selection, u2 for sub-texel jitter."""
    h, w = env.shape
    flat = jnp.searchsorted(env.flat_cdf, jnp.clip(u1, 0.0, 1.0 - 1e-7))
    flat = jnp.clip(flat, 0, h * w - 1)
    yi = flat // w
    xi = flat % w
    # Decorrelated sub-texel jitter from u2.
    ju = (u2 * 64.0) % 1.0
    jv = (u2 * 4096.0) % 1.0
    u = (xi.astype(jnp.float32) + ju) / w
    v = (yi.astype(jnp.float32) + jv) / h
    d = _uv_to_dir(env, u, v)
    radiance = env.image[yi, xi]
    pdf = env.texel_pdf[yi, xi] / _texel_solid_angle(env, yi)
    return d, radiance, pdf
