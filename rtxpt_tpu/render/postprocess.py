"""Post-processing: tone mapping + exposure (+ bloom later).

Analog of the reference's ToneMapper/* (histogram auto-exposure + tone
curves, ToneMappingPasses.h:70) and final blit. Round 1: fixed exposure +
ACES-fitted / Reinhard curves; histogram auto-exposure is an incremental
addition on the same luminance buffer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rtxpt_tpu.utils import math as m


def aces_film(x):
    """ACES filmic fit (Narkowicz)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def reinhard(x):
    return x / (1.0 + x)


def tonemap(hdr, exposure: float = 1.0, curve: str = "aces"):
    """Linear HDR [H,W,3] -> display sRGB [H,W,3] in [0,1]."""
    x = hdr * exposure
    if curve == "aces":
        x = aces_film(x)
    elif curve == "reinhard":
        x = reinhard(x)
    elif curve == "linear":
        x = jnp.clip(x, 0.0, 1.0)
    elif curve == "none":
        return x
    return m.linear_to_srgb(x)


def auto_exposure(hdr, key: float = 0.18, lo: float = -8.0, hi: float = 8.0):
    """Log-average luminance auto-exposure (256-bin histogram analog,
    ToneMappingPasses.h:153 — we use the exact log-mean instead)."""
    lum = m.luminance(hdr)
    log_mean = jnp.mean(jnp.log2(jnp.clip(lum, 2.0 ** lo, 2.0 ** hi)))
    return key / jnp.maximum(2.0 ** log_mean, 1e-8)
