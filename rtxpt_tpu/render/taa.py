"""Temporal anti-aliasing + bloom.

Analog of Donut's TemporalAntiAliasingPass and BloomPass used by the
reference (Sample.h:242,246; resolve at Sample.cpp:2630-2639). TAA:
reproject history by motion vectors, clamp to the 3x3 neighborhood color
bounds (variance clipping-lite), exponential blend. Bloom: threshold +
separable gaussian pyramid add.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from rtxpt_tpu.render.denoise import _bilinear_sample, _shift2d


def taa_resolve(color, motion, history: Optional[jnp.ndarray],
                alpha: float = 0.1):
    """color [H,W,3], motion [H,W,2] (prev = cur + motion), history or None.
    Returns (resolved, new_history)."""
    if history is None:
        return color, color
    h, w = color.shape[:2]
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] + motion[..., 1]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] + motion[..., 0]
    prev = _bilinear_sample(history, yy, xx)

    cmin = color
    cmax = color
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nb = _shift2d(color, dy, dx)
            cmin = jnp.minimum(cmin, nb)
            cmax = jnp.maximum(cmax, nb)
    prev = jnp.clip(prev, cmin, cmax)

    inside = ((yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1))
    a = jnp.where(inside, alpha, 1.0)[..., None]
    out = prev * (1.0 - a) + color * a
    return out, out


def _blur_separable(img, radius: int = 2):
    w = [1.0, 4.0, 6.0, 4.0, 1.0]
    total = sum(w)
    out = jnp.zeros_like(img)
    for i, wi in enumerate(w):
        out = out + wi * _shift2d(img, 0, (i - 2) * radius)
    out = out / total
    out2 = jnp.zeros_like(out)
    for i, wi in enumerate(w):
        out2 = out2 + wi * _shift2d(out, (i - 2) * radius, 0)
    return out2 / total


def bloom(hdr, threshold: float = 1.0, intensity: float = 0.05):
    """Simple thresholded multi-scale bloom add on linear HDR."""
    bright = jnp.maximum(hdr - threshold, 0.0)
    b = _blur_separable(bright, 1)
    b = b + _blur_separable(bright, 3)
    b = b + _blur_separable(bright, 7)
    return hdr + intensity * b
