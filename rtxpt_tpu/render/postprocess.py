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
    """Log-average luminance auto-exposure (simple log-mean variant)."""
    lum = m.luminance(hdr)
    log_mean = jnp.mean(jnp.log2(jnp.clip(lum, 2.0 ** lo, 2.0 ** hi)))
    return key / jnp.maximum(2.0 ** log_mean, 1e-8)


def auto_exposure_histogram(hdr, key: float = 0.18, lo: float = -8.0,
                            hi: float = 8.0, low_pct: float = 0.6,
                            high_pct: float = 0.95, bins: int = 256):
    """256-bin log-luminance histogram auto-exposure
    (ToneMappingPasses.h:153 m_histogram + percentile filtering): the
    exposure targets the mean of the [low_pct, high_pct] percentile band,
    so small very-bright emitters (the sun in frame, specular hotspots)
    and large dark regions do not drag the exposure the way the plain
    log-mean does. Built as one one-hot reduce — TPU-friendly."""
    lum = m.luminance(hdr).reshape(-1)
    logl = jnp.clip(jnp.log2(jnp.maximum(lum, 1e-12)), lo, hi)
    b = jnp.clip(((logl - lo) / (hi - lo) * bins).astype(jnp.int32),
                 0, bins - 1)
    hist = jnp.zeros((bins,), jnp.float32).at[b].add(1.0)
    cdf = jnp.cumsum(hist)
    total = cdf[-1]
    # fractional overlap of each bin's CDF span with the percentile band
    # (bins straddling the band edges contribute partially)
    w = jnp.maximum(0.0,
                    jnp.minimum(cdf, high_pct * total)
                    - jnp.maximum(cdf - hist, low_pct * total))
    centers = lo + (jnp.arange(bins, dtype=jnp.float32) + 0.5) \
        * (hi - lo) / bins
    wsum = jnp.sum(w)
    log_mean = jnp.sum(w * centers) / jnp.maximum(wsum, 1e-6)
    return key / jnp.maximum(2.0 ** log_mean, 1e-8)
